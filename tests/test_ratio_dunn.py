"""ratio_metric_ci + dunn_posthoc — goldens and lockstep."""

import math

import pytest


def _units(spark, rows):
    return spark.createDataFrame(rows, "variant string, num long, den long")


def test_ratio_ci_python_lockstep(spark):
    """Delta-method variance replayed from raw moments."""
    from careers_spark.operators.evaluation import ratio_metric_ci

    rows = []
    for i in range(60):
        v = "a" if i % 2 == 0 else "b"
        rows.append((v, (i * 7) % 40, 1 + (i * 3) % 9))
    out = {
        r["variant"]: r for r in ratio_metric_ci(_units(spark, rows)).collect()
    }
    for v in ("a", "b"):
        xs = [(n, d) for vv, n, d in rows if vv == v]
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        r = sx / sy
        vxx = (n * sum(x * x for x, _ in xs) - sx * sx) / (n * (n - 1))
        vyy = (n * sum(y * y for _, y in xs) - sy * sy) / (n * (n - 1))
        vxy = (n * sum(x * y for x, y in xs) - sx * sy) / (n * (n - 1))
        var = (vxx + r * r * vyy - 2 * r * vxy) / (n * (sy / n) ** 2)
        got = out[v]
        assert got["ratio"] == round(r, 6)
        assert got["se"] == pytest.approx(math.sqrt(var), abs=1e-5)
        assert got["lo95"] == pytest.approx(r - 1.96 * math.sqrt(var), abs=1e-4)


def test_ratio_ci_constant_ratio_zero_se(spark):
    """num = 3*den for every unit: the ratio is exactly 3 with zero
    delta-method variance (the metric carries no unit-level noise)."""
    from careers_spark.operators.evaluation import ratio_metric_ci

    rows = [("a", 3 * d, d) for d in (1, 2, 5, 9, 4)]
    out = ratio_metric_ci(_units(spark, rows)).collect()[0]
    assert out["ratio"] == 3.0
    assert out["se"] == pytest.approx(0.0, abs=1e-9)
    assert out["lo95"] == out["hi95"] == 3.0


def test_ratio_ci_degenerate_null(spark):
    from careers_spark.operators.evaluation import ratio_metric_ci

    out = {
        r["variant"]: r
        for r in ratio_metric_ci(
            _units(spark, [("z", 5, 0), ("z", 3, 0), ("s", 1, 2)])
        ).collect()
    }
    assert out["z"]["ratio"] is None and out["z"]["se"] is None
    assert out["s"]["se"] is None  # n < 2


def _vals(spark, rows):
    return spark.createDataFrame(rows, "grp string, value long")


def test_dunn_separated_groups(spark):
    """Three groups on disjoint value ranges: the extreme pair rejects
    at the Bonferroni crit, mean ranks ordered."""
    from careers_spark.operators.evaluation import dunn_posthoc

    rows = (
        [("lo", v) for v in range(10)]
        + [("mid", v) for v in range(20, 30)]
        + [("hi", v) for v in range(40, 50)]
    )
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in dunn_posthoc(_vals(spark, rows)).collect()
    }
    hl = out[("hi", "lo")]
    assert hl["reject"] is True and hl["z"] > 0
    assert hl["mean_rank_a"] > out[("hi", "mid")]["mean_rank_b"]


def test_dunn_identical_groups_no_reject(spark):
    from careers_spark.operators.evaluation import dunn_posthoc

    rows = [(g, v) for g in ("a", "b") for v in (1, 2, 3, 4, 5) * 3]
    out = dunn_posthoc(_vals(spark, rows)).collect()[0]
    assert out["z"] == 0.0 and out["reject"] is False
    assert out["mean_rank_a"] == out["mean_rank_b"]


def test_dunn_scipy_convention_lockstep(spark):
    """Tie-corrected z replayed in python with literal midranks."""
    from careers_spark.operators.evaluation import dunn_posthoc

    groups = {"a": [1, 2, 2, 3, 7], "b": [2, 4, 4, 5], "c": [6, 6, 7, 8, 9]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in dunn_posthoc(_vals(spark, rows)).collect()
    }
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)

    def midrank(v):
        lo = sum(1 for x in allv if x < v)
        t = sum(1 for x in allv if x == v)
        return lo + (t + 1) / 2

    from collections import Counter

    t3 = sum(t**3 - t for t in Counter(allv).values())
    for ga, gb in [("a", "b"), ("a", "c"), ("b", "c")]:
        ra = sum(midrank(v) for v in groups[ga]) / len(groups[ga])
        rb = sum(midrank(v) for v in groups[gb]) / len(groups[gb])
        sig2 = (n * (n + 1) / 12 - t3 / (12 * (n - 1))) * (
            1 / len(groups[ga]) + 1 / len(groups[gb])
        )
        z = (ra - rb) / math.sqrt(sig2)
        assert out[(ga, gb)]["z"] == pytest.approx(z, abs=1e-5)
        assert out[(ga, gb)]["mean_rank_a"] == pytest.approx(ra, abs=1e-6)
