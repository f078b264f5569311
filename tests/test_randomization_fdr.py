"""randomization_test_2s + bh_fdr — goldens and md5 replay."""

import hashlib

import pytest


def _h64(key):
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def _units(spark, rows):
    return spark.createDataFrame(
        rows, "unit long, stratum string, grp boolean, value long"
    )


def test_randomization_planted_effect_vs_null(spark):
    """A stratum with a huge group effect gets a small p; a perfectly
    symmetric null stratum gets a large one; a one-sided stratum is
    NULL (test undefined)."""
    from careers_spark.operators.evaluation import randomization_test_2s

    rows = []
    uid = 0
    for i in range(20):  # effect: A = 1000, B = 0
        rows.append((uid, "eff", i < 10, 1000 if i < 10 else 0))
        uid += 1
    for i in range(20):  # null: identical constant values
        rows.append((uid, "nul", i < 10, 500))
        uid += 1
    for i in range(10):  # one-sided: only group A present
        rows.append((uid, "one", True, i))
        uid += 1
    out = {
        r["stratum"]: r
        for r in randomization_test_2s(
            _units(spark, rows), unit="unit", n_reps=64
        ).collect()
    }
    assert out["eff"]["p"] < out["nul"]["p"]
    # every re-labeling of a constant column ties the observed |diff|=0
    assert out["nul"]["p_num"] == 65 and out["nul"]["p"] == 1.0
    assert out["one"]["p"] is None and out["one"]["p_num"] is None
    assert out["eff"]["diff_obs"] == 1000.0


def test_randomization_python_replay(spark):
    """Exact p replay: md5 coins, integer cross-multiplied extremity,
    add-one rational."""
    from careers_spark.operators.evaluation import randomization_test_2s

    rows = [
        (u, "s", u % 3 == 0, (u * 17) % 50 + (100 if u % 3 == 0 else 0))
        for u in range(30)
    ]
    got = randomization_test_2s(
        _units(spark, rows), unit="unit", n_reps=16, salt="rt9"
    ).collect()[0]

    na = sum(1 for r in rows if r[2])
    sa = sum(r[3] for r in rows if r[2])
    nb = len(rows) - na
    sb = sum(r[3] for r in rows) - sa
    num_o, den_o = abs(sa * nb - sb * na), na * nb
    n_ext = 0
    for b in range(1, 17):
        ra = sra = rb = srb = 0
        for u, _s, _g, v in rows:
            if _h64(f"{u}|{b}|rt9") % 2 == 0:
                ra += 1
                sra += v
            else:
                rb += 1
                srb += v
        if ra == 0 or rb == 0 or abs(sra * rb - srb * ra) * den_o >= num_o * (ra * rb):
            n_ext += 1
    assert got["p_num"] == 1 + n_ext and got["p_den"] == 17
    assert got["p"] == round((1 + n_ext) / 17, 6)
    assert got["diff_obs"] == round(sa / na - sb / nb, 6)


def _tests_df(spark, rows):
    return spark.createDataFrame(
        rows, "test_id string, p_num long, p_den long"
    )


def test_bh_textbook_cutoff(spark):
    """ps = .01, .03, .50, .90 at alpha=.1, m=4: thresholds k/40 —
    k*=2, first two rejected; a NULL test passes through unranked and
    doesn't count toward m."""
    from careers_spark.operators.evaluation import bh_fdr

    rows = [
        ("t1", 1, 100),
        ("t2", 3, 100),
        ("t3", 50, 100),
        ("t4", 90, 100),
        ("t5", None, None),
    ]
    out = {r["test_id"]: r for r in bh_fdr(_tests_df(spark, rows)).collect()}
    assert out["t1"]["reject"] is True and out["t2"]["reject"] is True
    assert out["t3"]["reject"] is False and out["t4"]["reject"] is False
    assert out["t1"]["k_star"] == 2
    assert out["t5"]["reject"] is None and out["t5"]["rank"] is None


def test_bh_step_up_rescue(spark):
    """The step-up property: p=(.04, .06) at alpha=.1, m=2 — .06 <=
    2*.05 holds at k=2, so BOTH reject even though .06 fails its own
    per-rank Bonferroni-style cut."""
    from careers_spark.operators.evaluation import bh_fdr

    rows = [("a", 4, 100), ("b", 6, 100)]
    out = {r["test_id"]: r for r in bh_fdr(_tests_df(spark, rows)).collect()}
    assert out["a"]["reject"] is True and out["b"]["reject"] is True
    assert out["b"]["k_star"] == 2


def test_bh_nothing_rejected(spark):
    from careers_spark.operators.evaluation import bh_fdr

    rows = [("a", 60, 100), ("b", 90, 100)]
    out = {r["test_id"]: r for r in bh_fdr(_tests_df(spark, rows)).collect()}
    assert all(r["reject"] is False for r in out.values())
    assert out["a"]["k_star"] == 0


def test_randomization_validation(spark):
    from careers_spark.operators.evaluation import randomization_test_2s

    with pytest.raises(ValueError):
        randomization_test_2s(
            _units(spark, [(1, "s", True, 1)]), n_reps=0
        )
