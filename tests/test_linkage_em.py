"""Fellegi-Sunter EM: engine lockstep at the unit level (the Spark
checkpoint chain vs DuckDB's MATERIALIZED evaluation of the SAME
generated text), planted-truth separation, and determinism."""

import duckdb


def _pairs_df(spark, counts):
    """Explode {pattern_id: n} into a boolean (g0, g1, g2) pair frame."""
    rows = []
    for p, n in counts.items():
        rows += [(bool(p & 1), bool(p & 2), bool(p & 4))] * n
    return spark.createDataFrame(rows, "g0 boolean, g1 boolean, g2 boolean")


def test_fs_em_matches_duckdb_unit(spark):
    from careers_spark.operators.linkage_em import em_query, fs_em_linkage

    counts = {0: 500, 1: 40, 2: 35, 3: 30, 5: 25, 6: 10, 7: 60}
    out = fs_em_linkage(_pairs_df(spark, counts), ["g0", "g1", "g2"], iters=10)
    got = {(r.g0, r.g1, r.g2): r for r in out.collect()}

    count_sql = (
        "SELECT "
        + ", ".join(f"{counts.get(p, 0)} AS n{p}" for p in range(8))
        + f", {sum(counts.values())} AS ntot"
    )
    duck = duckdb.connect().execute(em_query(count_sql, 3, 10))
    cols = [d[0] for d in duck.description]
    fin = dict(zip(cols, duck.fetchall()[0]))
    for p, n in counts.items():
        r = got[(bool(p & 1), bool(p & 2), bool(p & 4))]
        assert r.n_pairs == n
        assert r.gamma == fin[f"gam{p}"], p
        assert r.lam == fin["lam"]
        assert (r.m0, r.m1, r.m2) == (fin["m0"], fin["m1"], fin["m2"])
        assert (r.u0, r.u1, r.u2) == (fin["u0"], fin["u1"], fin["u2"])


def test_fs_em_planted_truth_separates(spark):
    """Two planted populations: 10% of pairs agree on everything
    (matches), the rest agree on ~nothing — EM must assign the
    all-agree pattern a high posterior and the all-disagree pattern a
    low one, with m_k > u_k for every feature."""
    from careers_spark.operators.linkage_em import fs_em_linkage

    counts = {7: 100, 6: 5, 5: 5, 0: 850, 1: 20, 2: 20}
    out = {
        (r.g0, r.g1, r.g2): r
        for r in fs_em_linkage(
            _pairs_df(spark, counts), ["g0", "g1", "g2"], iters=15
        ).collect()
    }
    hi = out[(True, True, True)]
    lo = out[(False, False, False)]
    assert hi.gamma > 0.9 and lo.gamma < 0.1
    assert hi.m0 > hi.u0 and hi.m1 > hi.u1 and hi.m2 > hi.u2


def test_fs_em_parallelism_invariant(spark):
    from careers_spark.operators.linkage_em import fs_em_linkage

    counts = {0: 300, 3: 30, 7: 45, 4: 12}
    df = _pairs_df(spark, counts)
    a = fs_em_linkage(df, ["g0", "g1", "g2"], iters=8).collect()
    b = fs_em_linkage(
        df.repartition(17), ["g0", "g1", "g2"], iters=8
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fs_em_empty_raises(spark):
    import pytest

    from careers_spark.operators.linkage_em import fs_em_linkage

    df = spark.createDataFrame([], "g0 boolean, g1 boolean, g2 boolean")
    with pytest.raises(ValueError, match="no candidate pairs"):
        fs_em_linkage(df, ["g0", "g1", "g2"])
