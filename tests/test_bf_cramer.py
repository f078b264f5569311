"""brown_forsythe + cramers_v — goldens and lockstep."""

import math

import pytest


def _g(spark, rows):
    return spark.createDataFrame(rows, "grp string, value long")


def test_brown_forsythe_detects_spread_difference(spark):
    """Two groups with EQUAL means but wildly different spreads:
    ANOVA on means would see nothing; Brown-Forsythe fires."""
    from careers_spark.operators.evaluation import (
        anova_oneway,
        brown_forsythe,
    )

    rows = [("tight", 100 + d) for d in (-1, 0, 0, 1) * 5] + [
        ("wide", 100 + d) for d in (-50, -20, 0, 20, 50) * 4
    ]
    df = _g(spark, rows)
    bf = brown_forsythe(df).collect()[0]
    an = anova_oneway(df).collect()[0]
    assert bf["f_stat"] > 10
    assert an["f_stat"] < 1  # means identical


def test_brown_forsythe_identical_groups_zero_f(spark):
    """Same distribution in both groups: deviations identical, SSB on
    z is 0, F = 0."""
    from careers_spark.operators.evaluation import brown_forsythe

    rows = [(g, v) for g in ("a", "b") for v in (1, 2, 3, 4, 9)]
    out = brown_forsythe(_g(spark, rows)).collect()[0]
    assert out["ssb"] == 0.0
    assert out["f_stat"] == 0.0


def test_brown_forsythe_median_python_lockstep(spark):
    """Replay doubled medians + the scipy BF definition (F on |x-med|;
    scale-invariance makes the doubled form identical)."""
    from careers_spark.operators.evaluation import brown_forsythe

    import statistics

    groups = {
        "a": [3, 1, 4, 1, 5, 9, 2, 6],
        "b": [2, 7, 1, 8, 2, 8, 1, 8, 2],
        "c": [5, 5, 5, 6, 5, 4],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    out = brown_forsythe(_g(spark, rows)).collect()[0]

    zs = {
        g: [abs(v - statistics.median(vs)) for v in vs]
        for g, vs in groups.items()
    }
    allz = [z for vs in zs.values() for z in vs]
    gm = sum(allz) / len(allz)
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in zs.values()
    )
    ssw = sum(
        (z - sum(vs) / len(vs)) ** 2 for vs in zs.values() for z in vs
    )
    k, n = 3, len(allz)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["f_stat"] == pytest.approx(f, rel=1e-5)


def _xy(spark, rows):
    return spark.createDataFrame(rows, "x string, y string")


def test_cramers_v_perfect_association(spark):
    """x determines y exactly on a square table: V = 1."""
    from careers_spark.operators.evaluation import cramers_v

    rows = [(c, c.upper()) for c in "aabbcc"]
    out = cramers_v(_xy(spark, rows)).collect()[0]
    assert out["v"] == pytest.approx(1.0, abs=1e-6)


def test_cramers_v_independence_zero(spark):
    """Balanced independent table: chi2 = 0, V = 0."""
    from careers_spark.operators.evaluation import cramers_v

    rows = [(a, b) for a in "ab" for b in "xy" for _ in range(5)]
    out = cramers_v(_xy(spark, rows)).collect()[0]
    assert out["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert out["v"] == pytest.approx(0.0, abs=1e-6)


def test_cramers_v_constant_column_null(spark):
    from careers_spark.operators.evaluation import cramers_v

    out = cramers_v(_xy(spark, [("a", "x"), ("a", "y")])).collect()[0]
    assert out["v"] is None


def test_cramers_v_empty_cells_python_lockstep(spark):
    """Sparse table with genuinely empty cells: the folded-mass
    identity must equal the full-grid chi2."""
    from careers_spark.operators.evaluation import cramers_v

    rows = (
        [("a", "x")] * 7 + [("a", "y")] * 1
        + [("b", "y")] * 5 + [("b", "z")] * 2
        + [("c", "x")] * 3
    )
    out = cramers_v(_xy(spark, rows)).collect()[0]

    from collections import Counter

    cnt = Counter(rows)
    xs = sorted({r[0] for r in rows})
    ys = sorted({r[1] for r in rows})
    n = len(rows)
    rx = {a: sum(c for (p, _q), c in cnt.items() if p == a) for a in xs}
    cy = {b: sum(c for (_p, q), c in cnt.items() if q == b) for b in ys}
    chi2 = sum(
        (cnt.get((a, b), 0) - rx[a] * cy[b] / n) ** 2 / (rx[a] * cy[b] / n)
        for a in xs
        for b in ys
    )
    v = math.sqrt(chi2 / (n * (min(len(xs), len(ys)) - 1)))
    assert out["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert out["v"] == pytest.approx(v, abs=1e-6)
