"""Count-Min heavy hitters, trigram substring search, column profile."""

import pytest

from careers_spark.operators.profiling import column_profile
from careers_spark.operators.retrieval import trigram_substring_search
from careers_spark.operators.sketches import count_min_heavy_hitters


# ------------------------------------------------------------ count-min

def _corpus(spark):
    rows = []
    for i in range(30):
        rows.append((i, "hot " * 10 + "warm " * 3 + f"rare{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_count_min_exact_when_collision_free(spark):
    # w large vs vocabulary -> no collisions, est == true everywhere
    out = {
        r.term: r
        for r in count_min_heavy_hitters(
            _corpus(spark), d=4, w=4096, threshold=50
        ).collect()
    }
    assert set(out) == {"hot", "warm"}
    assert out["hot"].est == out["hot"].true_cnt == 300
    assert out["warm"].est == out["warm"].true_cnt == 90
    assert all(r.overcount == 0 and r.is_true_heavy for r in out.values())


def test_count_min_no_false_negatives_and_overcount_one_sided(spark):
    # w=2 forces heavy collisions: every estimate >= its true count and
    # every true heavy hitter still screens in (the CM theorem)
    out = count_min_heavy_hitters(_corpus(spark), d=2, w=2, threshold=90).collect()
    terms = {r.term for r in out}
    assert {"hot", "warm"} <= terms  # true counts 300 / 90 both >= 90
    assert all(r.overcount >= 0 for r in out)


def test_count_min_threshold_screens(spark):
    out = count_min_heavy_hitters(
        _corpus(spark), d=4, w=4096, threshold=100
    ).collect()
    assert {r.term for r in out} == {"hot"}  # warm=90 < 100, collision-free


# ------------------------------------------------------ trigram search

def test_trigram_search_matches_python(spark):
    docs = [
        (1, "Distributed query engines SHUFFLE data between stages"),
        (2, "the quick brown fox"),
        (3, "no shuffling here, only shuffle boards"),
        (4, "ab"),          # shorter than a trigram
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.first_pos
        for r in trigram_substring_search(df, "shuffle").collect()
    }
    exp = {
        d: t.lower().index("shuffle") + 1
        for d, t in docs
        if "shuffle" in t.lower()
    }
    assert got == exp and set(got) == {1, 3}


def test_trigram_search_prunes_collision_doc(spark):
    # contains every trigram of "abcdef" (abc,bcd,cde,def) but not the
    # string itself -> candidate by pruning, removed by the verify
    df = spark.createDataFrame(
        [(1, "abcdxcdef"), (2, "xxabcdefyy")], "doc_id long, text string"
    )
    got = {r.doc_id: r.first_pos for r in
           trigram_substring_search(df, "abcdef").collect()}
    assert got == {2: 3}


def test_trigram_search_rejects_short_query(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        trigram_substring_search(df, "ab")


# ------------------------------------------------------------- profile

def test_column_profile_golden(spark):
    df = spark.createDataFrame(
        [(1, "a", 2), (2, "a", 10), (3, None, None), (4, "b", 10)],
        "id long, s string, v long",
    )
    got = {r.column: r for r in column_profile(df, ["id", "s", "v"]).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["id"].n_nulls, got["id"].n_distinct) == (0, 4)
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (1, 2)
    # numeric extrema compare numerically BEFORE the string cast
    assert (got["v"].min_str, got["v"].max_str) == ("2", "10")
    assert (got["s"].min_str, got["s"].max_str) == ("a", "b")


def test_column_profile_awkward_column_names(spark):
    df = (
        spark.createDataFrame([(1, 2), (3, None)], "a long, b long")
        .withColumnRenamed("a", "n-chars")
        .withColumnRenamed("b", "order date")
    )
    got = {r.column: r for r in
           column_profile(df, ["n-chars", "order date"]).collect()}
    assert got["n-chars"].n_nulls == 0 and got["n-chars"].n_distinct == 2
    assert got["order date"].n_nulls == 1 and got["order date"].n_distinct == 1


def test_trigram_search_rejects_unescapable_query(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    for bad in ("a\\nb", "o'brien"):
        with pytest.raises(ValueError):
            trigram_substring_search(df, bad)


def test_hll_python_lockstep_and_accuracy(spark):
    """Registers and estimate re-derived in python from the same md5
    hash; estimate within the theoretical error band (~1.04/sqrt(m) ~
    6.5% at m=256, allow 3 sigma)."""
    import hashlib
    import math

    from careers_spark.operators.sketches import hll_distinct

    rows = [(i, "all", f"user{i % 700}") for i in range(5000)]
    df = spark.createDataFrame(rows, "event_id long, g string, uid string")
    r = {x.grp: x for x in hll_distinct(
        df, "g", "uid", p=8, with_merged_total=False
    ).collect()}
    got = r["all"]
    assert got.n_exact == 700

    # python re-derivation
    m, wbits, scale = 256, 24, 26
    regs = {}
    for _, _, uid in rows:
        h = int(hashlib.md5(uid.encode()).hexdigest()[:8], 16)
        b, w = h % m, h // m
        if w == 0:
            rho = wbits + 1
        else:
            rho = wbits - w.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    s_int = sum(1 << (scale - M) for M in regs.values())
    n_present = len(regs)
    s_full = s_int + (m - n_present) * (1 << scale)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m * (1 << scale) / s_full
    v = m - n_present
    if raw <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    else:
        est = raw
    from decimal import ROUND_HALF_UP, Decimal

    want = float(Decimal(repr(est)).quantize(Decimal("1e-4"), ROUND_HALF_UP))
    assert got.n_est == want
    assert abs(got.n_est - 700) / 700 < 3 * 1.04 / math.sqrt(m)


def test_hll_merge_equals_direct_global(spark):
    """Union-by-max of per-group registers must equal the sketch built
    directly over all rows — the mergeability property."""
    from careers_spark.operators.sketches import hll_distinct, hll_registers
    from pyspark.sql import functions as F

    rows = [(i, "g%d" % (i % 3), "u%d" % (i % 450)) for i in range(3000)]
    df = spark.createDataFrame(rows, "event_id long, grp string, uid string")
    merged = {
        r.grp: r.n_est
        for r in hll_distinct(df, "grp", "uid", p=8).collect()
    }
    direct = hll_distinct(
        df.withColumn("one", F.lit("x")), "one", "uid", p=8,
        with_merged_total=False,
    ).collect()[0]
    assert merged["__all__"] == direct.n_est


def test_hll_overlap_controlled_sets(spark):
    """Two groups with a planted 50% overlap: the inclusion-exclusion
    estimate lands within the sketch's error band of the truth, and a
    disjoint pair estimates near zero."""
    import math

    from careers_spark.operators.sketches import hll_overlap

    rows = (
        [(i, "a", "u%d" % i) for i in range(400)]           # a: 0..399
        + [(i, "b", "u%d" % (i + 200)) for i in range(400)]  # b: 200..599
        + [(i, "c", "v%d" % i) for i in range(300)]          # c: disjoint
    )
    df = spark.createDataFrame(rows, "event_id long, grp string, uid string")
    got = {
        (r.grp_a, r.grp_b): r for r in hll_overlap(df, "grp", "uid").collect()
    }
    band = 3 * 1.04 / math.sqrt(256)  # 3 sigma relative
    ab = got[("a", "b")]
    assert abs(ab.est_overlap - 200) <= 3 * band * 600
    ac = got[("a", "c")]
    assert abs(ac.est_overlap) <= 3 * band * 700
    # union never smaller than either side
    for r in got.values():
        assert r.est_union >= max(r.est_a, r.est_b) - 1e-9


def test_join_size_estimate_exact_and_one_sided(spark):
    """Hand-computable exact size; CM estimate >= exact always, and
    with 3 keys in 1024 cells, collision-free -> equality."""
    from careers_spark.operators.sketches import join_size_estimate

    left = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "k string"
    )
    right = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("c",)], "k string"
    )
    (r,) = join_size_estimate(left, right, "k", "k").collect()
    assert r.exact_size == 2 * 1 + 1 * 2
    assert r.cms_estimate >= r.exact_size
    assert r.cms_estimate == r.exact_size  # no collisions at this size
    assert r.overestimate_ratio == 1.0


def test_join_size_estimate_tiny_sketch_overcounts(spark):
    """Forcing collisions (w=2) makes the estimate strictly one-sided
    on disjoint key sets: exact 0, estimate > 0, ratio NULL."""
    from careers_spark.operators.sketches import join_size_estimate

    left = spark.createDataFrame([(f"l{i}",) for i in range(8)], "k string")
    right = spark.createDataFrame([(f"r{i}",) for i in range(8)], "k string")
    (r,) = join_size_estimate(left, right, "k", "k", d=2, w=2).collect()
    assert r.exact_size == 0
    assert r.cms_estimate > 0
    assert r.overestimate_ratio is None


def test_term_postings_blocks_and_order(spark):
    from careers_spark.operators.retrieval import term_postings

    docs = [
        (3, "apple banana apple"),
        (1, "apple"),
        (2, "apple banana"),
        (9, "apple"),
        (4, "cherry"),  # df=1 -> filtered at min_df=2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.term, r.block_id): (r.df, r.n_docs_in_block, r.postings)
        for r in term_postings(df, min_df=2, block_size=2).collect()
    }
    # apple: docs 1,2,3,9 (tf 1,1,2,1) -> blocks [1,2], [3,9]
    assert got[("apple", 0)] == (4, 2, "1:1 2:1")
    assert got[("apple", 1)] == (4, 2, "3:2 9:1")
    assert got[("banana", 0)] == (2, 2, "2:1 3:1")
    assert not any(t == "cherry" for t, _ in got)


def test_bitmap_distinct_exact_and_mergeable(spark):
    """Bitmap count == exact distinct per group; the __ALL__ row is
    built ONLY from per-group masks and equals the direct global
    distinct (the mergeability property, with overlap across groups
    so naive summing would be wrong)."""
    from careers_spark.operators.sketches import bitmap_distinct

    rows = [
        ("a", 0), ("a", 1), ("a", 63), ("a", 1),   # 3 distinct, 2 words
        ("b", 1), ("b", 64), ("b", 126),           # 3 distinct; 1 shared w/ a
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {
        r.event_type: (r.n_distinct_bitmap, r.n_distinct_exact, r.words_used)
        for r in bitmap_distinct(df).collect()
    }
    assert got["a"] == (3, 3, 2)
    assert got["b"] == (3, 3, 3)  # words 0, 1, 2 (ids 1, 64, 126)
    # union is 5 (id 1 shared), NOT 6 — merge must dedupe across groups
    assert got["__ALL__"][0] == 5 and got["__ALL__"][1] == 5


def test_bitmap_distinct_word_boundaries(spark):
    """ids 62 and 63 land in different 63-bit words; no sign-bit use."""
    from careers_spark.operators.sketches import bitmap_distinct

    df = spark.createDataFrame(
        [("x", 62), ("x", 63), ("x", 125), ("x", 126)],
        "event_type string, user_id long",
    )
    got = {
        r.event_type: (r.n_distinct_bitmap, r.words_used)
        for r in bitmap_distinct(df).collect()
    }
    assert got["x"] == (4, 3)  # words 0 (62), 1 (63, 125), 2 (126)
