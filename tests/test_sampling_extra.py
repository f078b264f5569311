"""Exact-n hash sampling and deterministic dataset splits."""

import hashlib

from careers_spark.operators.sampling import dataset_split, hash_topn_sample


def _h(key, salt):
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8], 16)


def _docs(spark, n=50):
    rows = [(i, "en" if i % 5 else "sw") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_topn_exact_size_and_python_lockstep(spark):
    out = hash_topn_sample(_docs(spark), n=3, salt="s0").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert {l: len(v) for l, v in by_lang.items()} == {"en": 3, "sw": 3}
    # python recompute of the winners: first 3 by (md5, doc_id)
    ids = {"en": [], "sw": []}
    for i in range(50):
        ids["en" if i % 5 else "sw"].append(i)
    for lang, members in ids.items():
        exp = sorted(members, key=lambda k: (_h(k, "s0"), k))[:3]
        got = [r.doc_id for r in sorted(by_lang[lang], key=lambda r: r.rk)]
        assert got == exp, lang


def test_hash_topn_salt_changes_pick_not_size(spark):
    a = {r.doc_id for r in hash_topn_sample(_docs(spark), 5, salt="a").collect()}
    b = {r.doc_id for r in hash_topn_sample(_docs(spark), 5, salt="b").collect()}
    assert len(a) == len(b) == 10
    assert a != b


def test_hash_topn_n_larger_than_stratum_keeps_all(spark):
    out = hash_topn_sample(_docs(spark, 12), n=100).collect()
    assert len(out) == 12


def test_dataset_split_membership_and_determinism(spark):
    df = _docs(spark, 200)
    out = {r.doc_id: r for r in dataset_split(df).collect()}
    assert len(out) == 200
    for i, r in out.items():
        b = _h(i, "split0") % 100
        assert r.bucket == b
        assert r.split == ("train" if b < 90 else "val" if b < 95 else "test")
    out2 = {r.doc_id: r.split for r in dataset_split(df).collect()}
    assert out2 == {i: r.split for i, r in out.items()}


def test_dataset_split_stable_under_corpus_growth(spark):
    # the classic leakage bug: adding rows must not move existing rows
    small = {r.doc_id: r.split for r in dataset_split(_docs(spark, 50)).collect()}
    big = {r.doc_id: r.split for r in dataset_split(_docs(spark, 200)).collect()}
    assert all(big[i] == s for i, s in small.items())


def test_salt_charset_rejected(spark):
    import pytest

    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        hash_topn_sample(df, 2, salt="o'brien").collect()
    with pytest.raises(ValueError):
        dataset_split(df, salt="s\\n0").collect()


def _dsir_py(rows, target_ids, B=64):
    """Independent python re-derivation of the hashed-model weights."""
    import hashlib
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal
    import math

    def toks(t):
        import re

        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    def h(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B

    def feats(t):
        ts = toks(t)
        return [h(f) for f in ts + [" ".join(ts[i:i + 2]) for i in range(len(ts) - 1)]]

    raw, tgt = Counter(), Counter()
    for did, text in rows:
        fs = feats(text)
        raw.update(fs)
        if did in target_ids:
            tgt.update(fs)
    n_raw, n_tgt = sum(raw.values()), sum(tgt.values())

    def q9(x):
        return int(Decimal(repr(x * 1e9)).quantize(Decimal("1"), ROUND_HALF_UP))

    out = {}
    for did, text in rows:
        fs = feats(text)
        fp = sum(
            q9(
                math.log((tgt[b] + 1) / (n_tgt + B))
                - math.log((raw[b] + 1) / (n_raw + B))
            )
            for b in fs
        )
        out[did] = (
            len(fs),
            float(Decimal(repr(fp / 1e9)).quantize(Decimal("1e-6"), ROUND_HALF_UP)),
        )
    return out


def test_dsir_weights_python_lockstep(spark):
    from careers_spark.operators.sampling import dsir_log_weights

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "der hund sitzt auf dem baumstamm"),
        (4, "cat dog mat log the on"),
        (5, "völlig anderes vokabular hier"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_feats, r.log_ir)
        for r in dsir_log_weights(df, "doc_id <= 2", n_buckets=64).collect()
    }
    want = _dsir_py(rows, {1, 2}, B=64)
    assert got == want
    # target-vocabulary doc 4 must outscore disjoint-vocabulary doc 5
    assert got[4][1] > got[5][1]


def test_dsir_resample_deterministic_and_salted(spark):
    from careers_spark.operators.sampling import dsir_resample

    rows = [(i, f"token{i % 7} common word filler text {i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = dsir_resample(df, "doc_id % 4 = 0", k=5, n_buckets=64).collect()
    b = dsir_resample(
        df.repartition(9), "doc_id % 4 = 0", k=5, n_buckets=64
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 5 and all(r.rk <= 5 for r in a)
    # no target doc is ever drawn
    assert all(r.doc_id % 4 != 0 for r in a)
    c = dsir_resample(
        df, "doc_id % 4 = 0", k=5, n_buckets=64, salt="other"
    ).collect()
    assert {r.doc_id for r in c} != {r.doc_id for r in a}


def test_poisson_bootstrap_python_lockstep(spark):
    """Full python re-derivation: hashed uniforms -> Poisson weights ->
    replicate means -> rank-percentile bounds."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.sampling import _POIS_CDF, poisson_bootstrap_ci

    rows = [(i, 100 + 7 * (i % 13)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, value long")
    B = 40
    r = poisson_bootstrap_ci(df, value="value", key="id", n_reps=B).collect()[0]

    cdf = [float(t) for t in _POIS_CDF]

    def weight(i, b):
        h = int(
            hashlib.md5(f"{i}|{b}boot0".encode()).hexdigest()[:8], 16
        )
        u = ((h % 1000000) + 0.5) / 1000000
        for w, t in enumerate(cdf):
            if u < t:
                return w
        return 6

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    means = []
    for b in range(B):
        s = n = 0
        for i, v in rows:
            w = weight(i, b)
            s += w * v
            n += w
        if n > 0:
            means.append((r6(s / n), b))
    means.sort()
    lo = means[-(-25 * B // 1000) - 1][0]
    hi = means[-(-975 * B // 1000) - 1][0]
    assert r.n_rows == 50
    assert r.mean_full == r6(sum(v for _, v in rows) / 50)
    assert r.n_replicates == len(means)
    assert (r.ci_lo, r.ci_hi) == (lo, hi)
    assert r.ci_lo <= r.mean_full <= r.ci_hi


def test_poisson_bootstrap_deterministic_and_salted(spark):
    from careers_spark.operators.sampling import poisson_bootstrap_ci

    rows = [(i, 50 + (i * 17) % 31) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, value long")
    a = poisson_bootstrap_ci(df, value="value", key="id", n_reps=60).collect()
    b = poisson_bootstrap_ci(
        df.repartition(13), value="value", key="id", n_reps=60
    ).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))
    c = poisson_bootstrap_ci(
        df, value="value", key="id", n_reps=60, salt="other"
    ).collect()[0]
    # same data, different draws: the interval moves but the full mean
    # cannot
    assert c.mean_full == a[0].mean_full
    assert (c.ci_lo, c.ci_hi) != (a[0].ci_lo, a[0].ci_hi)


def test_rendezvous_minimal_disruption(spark):
    """Adding a shard moves ONLY the keys the new shard wins — the
    property that distinguishes rendezvous from pmod placement."""
    from careers_spark.operators.sampling import rendezvous_shards

    ids = spark.range(500)
    before = {
        r.id: r.shard
        for r in rendezvous_shards(ids, "id", ["s0", "s1", "s2"]).collect()
    }
    after = {
        r.id: r.shard
        for r in rendezvous_shards(
            ids, "id", ["s0", "s1", "s2", "s3"]
        ).collect()
    }
    moved = {k for k in before if before[k] != after[k]}
    assert moved, "some keys must move to the new shard"
    assert all(after[k] == "s3" for k in moved)
    # ~1/4 of keys expected to move; generous band
    assert 0.10 <= len(moved) / 500 <= 0.40


def test_rendezvous_matches_python_recompute(spark):
    """Winner = argmax of the same md5-derived 32-bit draws."""
    import hashlib

    from careers_spark.operators.sampling import rendezvous_shards

    shards = ["a", "b", "c"]

    def h(key, s):
        return int(hashlib.md5(f"{key}|{s}".encode()).hexdigest()[:8], 16)

    got = {
        r.id: (r.shard, r.shard_h)
        for r in rendezvous_shards(spark.range(100), "id", shards).collect()
    }
    for k in range(100):
        win = max(shards, key=lambda s: (h(k, s), s))
        assert got[k] == (win, h(k, win))


def test_rendezvous_rejects_bad_shards(spark):
    import pytest

    from careers_spark.operators.sampling import rendezvous_shards

    with pytest.raises(ValueError):
        rendezvous_shards(spark.range(5), "id", [])
    with pytest.raises(ValueError):
        rendezvous_shards(spark.range(5), "id", ["x", "x"])


def test_rendezvous_rejects_output_column_clash(spark):
    """An input that already carries `shard` would silently produce
    ambiguous duplicate columns — rejected loudly instead."""
    import pytest

    from careers_spark.operators.sampling import rendezvous_shards

    df = spark.createDataFrame([(1, "x")], "id long, shard string")
    with pytest.raises(ValueError, match="ambiguous"):
        rendezvous_shards(df, "id", ["a", "b"])


def _es_lk(key, w_int, salt="es0"):
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    h = int(hashlib.md5((str(key) + salt).encode()).hexdigest()[:8], 16)
    u = (h + 1) / 4294967296.0
    lnu = float(
        Decimal(repr(math.log(u))).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )
    return lnu / w_int


def test_weighted_sample_python_lockstep(spark):
    import random

    from careers_spark.operators.sampling import weighted_sample_topk

    rng = random.Random(13)
    rows = [
        (i, "ab"[i % 2], rng.randrange(1, 1000000) / 1e6)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
    got = sorted(
        (r.lang, r.rk, r.doc_id, r.w_int, r.lk)
        for r in weighted_sample_topk(df, n=7).collect()
    )
    want = []
    for lang in "ab":
        cand = [
            (i, round(q * 1e6)) for i, lg, q in rows if lg == lang
        ]
        ranked = sorted(
            cand, key=lambda t: (-_es_lk(t[0], t[1]), t[0])
        )[:7]
        want += [
            (lang, rk + 1, i, w, _es_lk(i, w))
            for rk, (i, w) in enumerate(ranked)
        ]
    assert got == sorted(want)


def test_weighted_sample_heavy_weight_wins(spark):
    from careers_spark.operators.sampling import weighted_sample_topk

    rows = [(0, "x", 1.0)] + [(i, "x", 0.000001) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
    top = weighted_sample_topk(df, n=1).collect()
    assert len(top) == 1 and top[0].doc_id == 0


def test_weighted_sample_zero_weight_excluded(spark):
    from careers_spark.operators.sampling import weighted_sample_topk

    rows = [(1, "x", 0.0), (2, "x", 0.5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
    got = weighted_sample_topk(df, n=5).collect()
    assert [r.doc_id for r in got] == [2]
