"""anova_oneway + kruskal_wallis — hand goldens and scipy-free
lockstep against textbook formulas computed in exact Fractions."""

from fractions import Fraction

import pytest


def _anova_fractions(groups: dict[str, list[int]]):
    """Reference one-way ANOVA in exact rational arithmetic."""
    all_v = [v for vs in groups.values() for v in vs]
    n = len(all_v)
    k = len(groups)
    mean = Fraction(sum(all_v), n)
    ssb = sum(
        len(vs) * (Fraction(sum(vs), len(vs)) - mean) ** 2
        for vs in groups.values()
    )
    ssw = sum(
        sum((v - Fraction(sum(vs), len(vs))) ** 2 for v in vs)
        for vs in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k)) if ssw > 0 else None
    return float(ssb), float(ssw), (None if f is None else float(f))


def _rows(groups):
    return [(v, g) for g, vs in groups.items() for v in vs]


def test_anova_textbook_lockstep(spark):
    from careers_spark.operators.evaluation import anova_oneway

    groups = {
        "a": [10, 12, 14, 11, 13],
        "b": [20, 22, 19, 21],
        "c": [15, 15, 16, 14, 15, 15],
    }
    df = spark.createDataFrame(_rows(groups), "value long, grp string")
    r = anova_oneway(df).collect()[0]
    ssb, ssw, f = _anova_fractions(groups)
    assert (r.k_groups, r.n_total, r.df1, r.df2) == (3, 15, 2, 12)
    # 1e-6 mean lattice: agreement to ~1e-4 on these magnitudes
    assert r.ssb == pytest.approx(ssb, abs=1e-4)
    assert r.ssw == pytest.approx(ssw, abs=1e-4)
    assert r.f_stat == pytest.approx(f, rel=1e-6)


def test_anova_zero_within_variance_null_f(spark):
    from careers_spark.operators.evaluation import anova_oneway

    groups = {"a": [5, 5, 5], "b": [9, 9]}
    df = spark.createDataFrame(_rows(groups), "value long, grp string")
    r = anova_oneway(df).collect()[0]
    # ssw_fp <= 0 (exactly zero within-variance) -> NULL F, ssb exact
    assert r.f_stat is None
    ssb, _, _ = _anova_fractions(groups)
    assert r.ssb == pytest.approx(ssb, abs=1e-4)


def test_anova_single_group_null(spark):
    from careers_spark.operators.evaluation import anova_oneway

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (5, "a")], "value long, grp string"
    )
    r = anova_oneway(df).collect()[0]
    assert r.k_groups == 1 and r.f_stat is None


def _kruskal_reference(groups: dict[str, list[int]]):
    """Textbook H with average ranks and tie correction, in floats
    (values small enough that everything is exact)."""
    all_v = sorted(v for vs in groups.values() for v in vs)
    n = len(all_v)
    # average rank per distinct value
    ranks = {}
    i = 0
    while i < len(all_v):
        j = i
        while j < len(all_v) and all_v[j] == all_v[i]:
            j += 1
        ranks[all_v[i]] = (i + 1 + j) / 2.0
        i = j
    h = 0.0
    for vs in groups.values():
        rsum = sum(ranks[v] for v in vs)
        h += rsum * rsum / len(vs)
    h = 12.0 * h / (n * (n + 1)) - 3.0 * (n + 1)
    from collections import Counter

    t3 = sum(c**3 - c for c in Counter(all_v).values())
    c_tie = 1.0 - t3 / float(n**3 - n)
    return h, c_tie, (h / c_tie if c_tie > 0 else None)


def test_kruskal_textbook_with_ties(spark):
    from careers_spark.operators.evaluation import kruskal_wallis

    groups = {
        "a": [1, 2, 2, 3, 7],
        "b": [2, 4, 4, 5],
        "c": [3, 3, 6, 6, 7],
    }
    df = spark.createDataFrame(_rows(groups), "value long, grp string")
    r = kruskal_wallis(df).collect()[0]
    h, c_tie, h_adj = _kruskal_reference(groups)
    assert (r.k_groups, r.n_total, r.n_distinct) == (3, 14, 7)
    assert r.h_stat == pytest.approx(h, abs=1e-4)
    assert r.tie_correction == pytest.approx(c_tie, abs=1e-6)
    assert r.h_adj == pytest.approx(h_adj, abs=1e-4)


def test_kruskal_all_tied_null_adj(spark):
    from careers_spark.operators.evaluation import kruskal_wallis

    df = spark.createDataFrame(
        [(4, "a"), (4, "a"), (4, "b"), (4, "b")], "value long, grp string"
    )
    r = kruskal_wallis(df).collect()[0]
    assert r.tie_correction == 0.0
    assert r.h_adj is None
    assert r.h_stat == pytest.approx(0.0, abs=1e-6)


def test_kruskal_equals_mann_whitney_two_groups(spark):
    """With k=2 and no ties, H equals the squared standardized
    Mann-Whitney z (chi-square(1) identity) — cross-operator pin."""
    from careers_spark.operators.evaluation import kruskal_wallis

    groups = {"a": [1, 3, 5, 9, 11], "b": [2, 4, 6, 8, 10, 12]}
    df = spark.createDataFrame(_rows(groups), "value long, grp string")
    r = kruskal_wallis(df).collect()[0]
    n1, n2 = 5, 6
    n = n1 + n2
    # U from ranks of group a
    all_v = sorted(v for vs in groups.values() for v in vs)
    ranks = {v: i + 1 for i, v in enumerate(all_v)}
    r1 = sum(ranks[v] for v in groups["a"])
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    var = n1 * n2 * (n + 1) / 12.0
    z2 = (u1 - mu) ** 2 / var
    assert r.h_stat == pytest.approx(z2, abs=1e-4)
