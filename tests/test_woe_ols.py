"""woe_iv + ols_simple — hand goldens and exact-fraction lockstep."""

import math
from fractions import Fraction

import pytest


def _woe_reference(cells):
    """cells: {cat: (good, bad)} -> {cat: (woe, iv_term)}, iv_total."""
    g_all = sum(g for g, _ in cells.values())
    b_all = sum(b for _, b in cells.values())
    k = len(cells)
    out = {}
    iv_fp_total = 0
    for c, (g, b) in cells.items():
        woe = math.log(
            (2 * g + 1.0) * (2 * b_all + k) / ((2 * b + 1.0) * (2 * g_all + k))
        )
        dgdb = (2 * g + 1.0) / (2 * g_all + k) - (2 * b + 1.0) / (2 * b_all + k)
        iv_fp = round(dgdb * woe * 1e9)
        out[c] = (woe, iv_fp / 1e9)
        iv_fp_total += iv_fp
    return out, iv_fp_total / 1e9


def test_woe_iv_lockstep(spark):
    from careers_spark.operators.features import woe_iv

    cells = {"a": (30, 10), "b": (5, 25), "c": (10, 10)}
    rows = []
    for c, (g, b) in cells.items():
        rows += [(c, 1)] * g + [(c, 0)] * b
    df = spark.createDataFrame(rows, "feature string, label int")
    got = {r.feature: r for r in woe_iv(df).collect()}
    ref, iv_total = _woe_reference(cells)
    assert len(got) == 3
    for c, (woe, iv) in ref.items():
        assert got[c].woe == pytest.approx(woe, abs=1e-6)
        assert got[c].iv_term == pytest.approx(iv, abs=1e-6)
        assert got[c].iv_total == pytest.approx(iv_total, abs=1e-6)
    # monotone-sense check: the good-heavy cell has positive WoE
    assert got["a"].woe > 0 > got["b"].woe


def test_woe_iv_empty_cell_finite(spark):
    from careers_spark.operators.features import woe_iv

    rows = [("a", 1)] * 4 + [("b", 0)] * 3
    df = spark.createDataFrame(rows, "feature string, label int")
    got = {r.feature: r for r in woe_iv(df).collect()}
    # half-count smoothing keeps pure cells finite
    assert math.isfinite(got["a"].woe) and math.isfinite(got["b"].woe)
    assert got["a"].iv_total > 0


def _ols_fractions(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num = Fraction(n * sxy - sx * sy)
    dx = Fraction(n * sxx - sx * sx)
    dy = Fraction(n * syy - sy * sy)
    slope = num / dx
    intercept = (sy - slope * sx) / n
    r2 = num * num / (dx * dy)
    sse = (dy / n) * (1 - r2)
    se2 = (sse / (n - 2)) / (dx / n)
    t = float(slope) / math.sqrt(float(se2)) if se2 > 0 else None
    return float(slope), float(intercept), float(r2), t


def test_ols_exact_line(spark):
    from careers_spark.operators.evaluation import ols_simple

    pts = [(x, 3 * x + 7) for x in range(1, 12)]
    df = spark.createDataFrame(pts, "x long, y long")
    r = ols_simple(df).collect()[0]
    assert (r.slope, r.intercept, r.r2) == (3.0, 7.0, 1.0)
    # perfect fit: SSE = 0 -> t undefined
    assert r.t_slope is None


def test_ols_noisy_lockstep(spark):
    from careers_spark.operators.evaluation import ols_simple

    pts = [(1, 10), (2, 19), (3, 33), (4, 38), (5, 52), (6, 59), (7, 75)]
    df = spark.createDataFrame(pts, "x long, y long")
    r = ols_simple(df).collect()[0]
    slope, intercept, r2, t = _ols_fractions(pts)
    assert r.slope == pytest.approx(slope, abs=1e-6)
    assert r.intercept == pytest.approx(intercept, abs=1e-6)
    assert r.r2 == pytest.approx(r2, abs=1e-6)
    assert r.t_slope == pytest.approx(t, abs=1e-4)


def test_ols_constant_x_null(spark):
    from careers_spark.operators.evaluation import ols_simple

    df = spark.createDataFrame(
        [(4, 1), (4, 5), (4, 9)], "x long, y long"
    )
    r = ols_simple(df).collect()[0]
    assert r.slope is None and r.intercept is None and r.r2 is None
