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
