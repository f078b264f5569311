"""Goldens for the rank/distribution statistics trio: Spearman rho
(doubled-average-rank construction), two-sample Kolmogorov-Smirnov,
and the Gini concentration coefficient. Expected values are computed
here from the textbook formulas, independently of the operators'
DataFrame construction."""

import math

from careers_spark.operators.evaluation import (
    gini_concentration,
    ks_two_sample,
    spearman_corr,
)


def _spearman_expected(xs, ys):
    def avg_ranks(vs):
        return [
            (sum(1 for o in vs if o < v) + (sum(1 for o in vs if o == v) + 1) / 2)
            for v in vs
        ]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    return round(num / den, 6)


def test_spearman_monotone_with_ties(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 20), (3, 40)], "x long, y long"
    )
    row = spearman_corr(df).collect()[0]
    assert row.rho == 1.0
    assert (row.n, row.sx, row.sy) == (4, 20, 20)


def test_spearman_nonlinear_monotone_is_one(spark):
    # y = x^3 breaks Pearson linearity but not rank order
    df = spark.createDataFrame(
        [(i, i**3) for i in range(1, 8)], "x long, y long"
    )
    assert spearman_corr(df).collect()[0].rho == 1.0


def test_spearman_mixed_matches_formula(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    assert spearman_corr(df).collect()[0].rho == _spearman_expected(xs, ys)


def test_spearman_constant_column_is_null(spark):
    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x long, y long")
    assert spearman_corr(df).collect()[0].rho is None


def test_ks_disjoint_supports_is_one(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 0), (5, 0), (6, 0)],
        "value long, grp int",
    )
    row = ks_two_sample(df).collect()[0]
    assert (row.n1, row.n2, row.d_num, row.at_value, row.ks_d) == (
        3,
        3,
        9,
        3,
        1.0,
    )


def test_ks_identical_samples_is_zero(spark):
    rows = [(v, g) for v in (1, 2, 3, 4) for g in (0, 1)]
    df = spark.createDataFrame(rows, "value long, grp int")
    row = ks_two_sample(df).collect()[0]
    assert row.d_num == 0 and row.ks_d == 0.0
    # tie-break: smallest value among the all-zero numerators
    assert row.at_value == 1


def test_ks_shifted_sample(spark):
    # g1 = {1,2,3,4}, g0 = {3,4,5,6}: D = 1/2 at v=2 (F1=2/4, F0=0)
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (3, 0), (4, 0), (5, 0), (6, 0)],
        "value long, grp int",
    )
    row = ks_two_sample(df).collect()[0]
    assert (row.d_num, row.at_value, row.ks_d) == (8, 2, 0.5)


def test_gini_equal_is_zero_and_concentrated(spark):
    eq = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 10), ("d", 10)],
        "key string, amount long",
    )
    assert gini_concentration(eq).collect()[0].gini == 0.0
    conc = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("d", 100)],
        "key string, amount long",
    )
    # one-holder Gini = 1 - 1/n = 0.75
    assert gini_concentration(conc).collect()[0].gini == 0.75


def test_gini_textbook_example(spark):
    # incomes 1,2,3,4: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "key string, amount long"
    )
    assert gini_concentration(df).collect()[0].gini == 0.25


def test_gini_aggregates_rows_per_key(spark):
    # two rows per key collapse to the per-key sums first
    df = spark.createDataFrame(
        [("a", 1), ("a", 0), ("b", 1), ("b", 1), ("c", 1), ("c", 2), ("d", 2), ("d", 2)],
        "key string, amount long",
    )
    assert gini_concentration(df).collect()[0].gini == 0.25
