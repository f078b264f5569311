"""hodges_lehmann + cliffs_delta — goldens and brute-force lockstep."""

import statistics

import pytest


def _g(spark, a_vals, b_vals):
    rows = [(True, v) for v in a_vals] + [(False, v) for v in b_vals]
    return spark.createDataFrame(rows, "grp boolean, value long")


def test_hl_pure_shift_recovered_exactly(spark):
    """B = A + 7 elementwise: every pairwise difference distribution
    is centered so the HL estimate of A - B is exactly -7."""
    from careers_spark.operators.evaluation import hodges_lehmann

    a = [3, 9, 4, 12, 6, 8]
    b = [v + 7 for v in a]
    out = hodges_lehmann(_g(spark, a, b)).collect()[0]
    assert out["hl_shift"] == -7.0
    assert out["n_pairs"] == 36


def test_hl_brute_force_lockstep(spark):
    """Median of all pairwise differences, duplicates included."""
    from careers_spark.operators.evaluation import hodges_lehmann

    a = [1, 1, 5, 9, 14, 2, 2]
    b = [3, 3, 3, 8, 10]
    out = hodges_lehmann(_g(spark, a, b)).collect()[0]
    diffs = sorted(x - y for x in a for y in b)
    assert out["hl_shift"] == statistics.median(diffs)
    assert out["n_a"] == 7 and out["n_b"] == 5
    assert out["n_pairs"] == 35


def test_hl_empty_side_null(spark):
    from careers_spark.operators.evaluation import hodges_lehmann

    out = hodges_lehmann(_g(spark, [1, 2], [])).collect()[0]
    assert out["hl_shift"] is None and out["n_pairs"] is None


def test_cliffs_textbook_values(spark):
    """Disjoint ranges: every pair dominates -> delta = 1, large;
    identical samples -> delta = 0, negligible."""
    from careers_spark.operators.evaluation import cliffs_delta

    hi = cliffs_delta(_g(spark, [10, 11, 12], [1, 2, 3])).collect()[0]
    assert hi["delta"] == 1.0 and hi["magnitude"] == "large"
    same = cliffs_delta(_g(spark, [1, 2, 3], [1, 2, 3])).collect()[0]
    assert same["delta"] == 0.0 and same["magnitude"] == "negligible"


def test_cliffs_brute_force_lockstep_with_ties(spark):
    from careers_spark.operators.evaluation import cliffs_delta

    a = [1, 2, 2, 3, 5, 5, 8]
    b = [2, 2, 4, 5, 6]
    out = cliffs_delta(_g(spark, a, b)).collect()[0]
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    assert out["n_gt"] == gt and out["n_lt"] == lt
    d = (gt - lt) / (len(a) * len(b))
    assert out["delta"] == round(d, 6)
    cuts = [(0.147, "negligible"), (0.33, "small"), (0.474, "medium")]
    want = "large"
    for c, lab in cuts:
        if abs(d) < c:
            want = lab
            break
    assert out["magnitude"] == want


def test_cliffs_magnitude_boundary_integer_exact(spark):
    """delta exactly at a Romano cut goes UP a class (strict <):
    gt-lt = 147, pairs = 1000 -> 'small', not 'negligible'."""
    from careers_spark.operators.evaluation import cliffs_delta

    # b nets per a-element: a>100 -> +10, 3<a<100 -> +4, a=3 -> +2,
    # 1<a<3 -> 0, a=1 -> -5. 13*10 + 5*4 + 1*2 - 5 = 147 over
    # 100 x 10 = 1000 pairs.
    b = [1] * 5 + [3] * 2 + [100] * 3
    a = [101] * 13 + [50] * 5 + [3] * 1 + [1] * 1 + [2] * 80
    out = cliffs_delta(_g(spark, a, b)).collect()[0]
    assert out["n_gt"] - out["n_lt"] == 147
    assert out["magnitude"] == "small"
