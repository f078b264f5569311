"""Goldens for dedup.containment_pairs."""

from careers_spark.operators.dedup import containment_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    # doc 0 (short) is fully embedded in doc 1 (long): containment of
    # 0-in-1 is 1.0 while Jaccard is far below any dedup threshold
    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    rows = containment_pairs(_docs(spark, [short, long_]), num=9, den=10).collect()
    got = {(r["contained_id"], r["container_id"]): r for r in rows}
    assert set(got) == {(0, 1)}  # only the short-in-long direction
    r = got[(0, 1)]
    assert r["containment"] == 1.0
    assert r["n_inter"] == r["n_contained"] == 3  # 5 words -> 3 trigrams


def test_containment_threshold_is_exact_rational(spark):
    # contained doc has exactly 10 distinct trigrams, 9 shared: the
    # 9/10 boundary must KEEP (>=), and 8/10 must drop
    base = [f"t{i}" for i in range(12)]  # 12 tokens -> 10 trigrams
    contained = " ".join(base)
    # container shares trigrams 1..9 (drop the first token -> loses
    # only trigram 0), plus unrelated tail
    container = " ".join(base[1:]) + " zz qq pp rr ss tt uu vv ww"
    rows = containment_pairs(
        _docs(spark, [contained, container]), num=9, den=10
    ).collect()
    kept = {(r["contained_id"], r["container_id"]) for r in rows}
    assert (0, 1) in kept
    # tighten to 19/20: 9/10 < 19/20 -> dropped
    rows2 = containment_pairs(
        _docs(spark, [contained, container]), num=19, den=20
    ).collect()
    assert not [r for r in rows2 if (r["contained_id"], r["container_id"]) == (0, 1)]


def test_containment_identical_docs_bidirectional(spark):
    t = "one two three four five six"
    rows = containment_pairs(_docs(spark, [t, t])).collect()
    dirs = {(r["contained_id"], r["container_id"]) for r in rows}
    assert dirs == {(0, 1), (1, 0)}
    assert all(r["containment"] == 1.0 for r in rows)
