"""Prefix-filter exact set-similarity join + vocabulary coverage curve."""

import itertools
import random

from careers_spark.operators.dedup import prefix_filter_jaccard_pairs
from careers_spark.operators.textstats import vocab_coverage


def _jaccard(a, b):
    sa, sb = set(a), set(b)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _brute(docs, num, den):
    out = {}
    for (da, ta), (db, tb) in itertools.combinations(docs, 2):
        sa, sb = set(ta.lower().split()), set(tb.lower().split())
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and den * inter >= num * union:
            out[(min(da, db), max(da, db))] = round(inter / union, 6)
    return out


def test_prefix_join_golden(spark):
    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),   # J = 3/5 with doc 1
        (3, "zeta eta theta"),
        (4, "alpha zeta"),                 # J with 1 = 1/5 < 3/5
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(df, 3, 5).collect()
    }
    assert got == {(1, 2): round(3 / 5, 6)}


def test_prefix_join_matches_bruteforce_random(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.sample(vocab, rng.randint(3, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for num, den in [(1, 2), (3, 5), (4, 5)]:
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in prefix_filter_jaccard_pairs(df, num, den).collect()
        }
        assert got == _brute(docs, num, den), (num, den)


def test_prefix_join_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(5)], "doc_id long, text string"
    )
    plan = prefix_filter_jaccard_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_join_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z")], "doc_id long, text string"
    )
    got = prefix_filter_jaccard_pairs(df, 4, 5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in got] == [(1, 2, 1.0)]


# ------------------------------------------------------- vocab coverage

def test_vocab_coverage_hand_golden(spark):
    # counts: hot=5, mid=2, rare=1  -> total 8
    df = spark.createDataFrame(
        [(1, "hot hot hot mid"), (2, "hot hot mid rare")],
        "doc_id long, text string",
    )
    got = {r.min_count: r for r in vocab_coverage(df, (1, 2, 3)).collect()}
    assert (got[1].vocab_size, got[1].covered, got[1].total) == (3, 8, 8)
    assert got[1].coverage == 1.0
    assert (got[2].vocab_size, got[2].covered) == (2, 7)
    assert got[2].coverage == round(7 / 8, 6)
    assert (got[3].vocab_size, got[3].covered) == (1, 5)
    assert got[3].coverage == round(5 / 8, 6)


def test_vocab_coverage_monotone(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e " + f"u{i}") for i in range(20)],
        "doc_id long, text string",
    )
    rows = sorted(vocab_coverage(df).collect(), key=lambda r: r.min_count)
    sizes = [r.vocab_size for r in rows]
    covs = [r.coverage for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert covs == sorted(covs, reverse=True)
    assert all(r.total == rows[0].total for r in rows)


def test_prefix_join_shingles_matches_shared_element_path(spark):
    """Same near-dup semantics, different candidate strategy: the
    prefix-filter join on 3-gram shingle sets must return exactly the
    pairs the shared-shingle blocking path returns at J >= 1/2."""
    from careers_spark.operators.dedup import jaccard_pairs

    rng = random.Random(11)
    base = ["the quick brown fox jumps over the lazy dog " * 2,
            "pack my box with five dozen liquor jugs " * 2]
    docs = []
    for i in range(40):
        t = base[i % 2].split()
        if i % 3 == 0 and len(t) > 4:           # plant near-dups
            t[rng.randrange(len(t))] = f"mut{i}"
        rng.shuffle(t) if i % 7 == 0 else None  # and a few shuffled ones
        docs.append((i, " ".join(t)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(df, 1, 2, n=3).collect()
    }
    ref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, threshold=0.5, n=3).collect()
    }
    assert got == ref and len(got) > 0


def test_blocking_quality_golden(spark):
    from careers_spark.operators.dedup import (
        blocking_quality,
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(0, base), (1, base), (2, base.replace("dog", "cat")),
            (3, "completely different text with many unrelated words here"),
            (4, "ab")]  # shingle-free: must not count in n_docs
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = blocking_quality(df, 1, 2).collect()[0]
    assert row.n_docs == 4 and row.n_all_pairs == 6
    n_cand = lsh_candidate_pairs(df).count()
    n_true = jaccard_pairs(df, threshold=0.5).count()
    assert row.n_candidates == n_cand
    assert row.n_true == n_true
    assert row.n_found <= row.n_true and row.n_found <= row.n_candidates
    assert row.reduction_ratio == round(1 - n_cand / 6, 6)
    assert row.pair_completeness == round(row.n_found / n_true, 6)
    # identical docs land in the same bands: (0,1) must be found
    assert row.n_found >= 1
