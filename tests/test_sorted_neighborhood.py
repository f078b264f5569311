"""Sorted-neighborhood blocking (dedup.sorted_neighborhood_pairs):
adjacent-in-sort near-dups pair with the exact Jaccard, rank-window and
block boundaries are respected, and the executed plan has no cartesian
product."""

from careers_spark.operators.dedup import jaccard_pairs, sorted_neighborhood_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_adjacent_near_dups_pair_with_exact_jaccard(spark):
    # two docs sharing a long prefix sort adjacently; jaccard must equal
    # the exact shared-shingle operator's value for the same pair
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "zzz yyy xxx www vvv uuu"),
    ]
    df = _docs(spark, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in sorted_neighborhood_pairs(df, window=3, threshold=0.2).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.2).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] == exact[(1, 2)]
    assert all(3 not in pair for pair in got)


def test_window_bound_excludes_distant_ranks(spark):
    # four docs with the same first char, sorted b1 < b2 < b3 < b4 by
    # key; with window=2 only adjacent ranks are candidates, so the
    # identical pair (b1, b4) is NOT emitted — the documented
    # heuristic miss of sorted-neighborhood blocking.
    rows = [
        (1, "apple aaa common tail words here"),
        (2, "apple bbb common tail words here"),
        (3, "apple ccc common tail words here"),
        (4, "apple aaa common tail words here"),  # dup of 1, far in sort? no — same key
    ]
    # make 4 sort FAR from 1: same block (first char 'a'), different key
    rows[3] = (4, "apple zzz common tail words here")
    df = _docs(spark, rows)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in sorted_neighborhood_pairs(df, window=2, threshold=0.1).collect()
    }
    # rank order by key: 1 (aaa), 2 (bbb), 3 (ccc), 4 (zzz)
    assert (1, 2) in got and (2, 3) in got and (3, 4) in got
    assert (1, 4) not in got and (1, 3) not in got


def test_blocks_never_pair_across(spark):
    # near-identical docs whose keys start with different chars land in
    # different blocks and are never candidates
    rows = [
        (1, "apple one two three four five"),
        (2, "bapple one two three four five"),
    ]
    df = _docs(spark, rows)
    assert sorted_neighborhood_pairs(df, window=4, threshold=0.1).count() == 0


def test_no_cartesian_in_plan(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b d")])
    plan = sorted_neighborhood_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
