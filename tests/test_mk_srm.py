"""mann_kendall + srm_check — hand goldens and python lockstep."""

import datetime
import math

import pytest


def _hourly(spark, counts):
    base = datetime.datetime(2024, 5, 1)
    rows = []
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append((base + datetime.timedelta(hours=h, seconds=i),))
    return spark.createDataFrame(rows, "ts timestamp")


def test_mk_strict_increase(spark):
    """Strictly increasing series: S = n(n-1)/2 (every pair
    concordant), no value ties, z > 0."""
    from careers_spark.operators.temporal import mann_kendall

    out = mann_kendall(_hourly(spark, [1, 2, 3, 4, 5, 6])).collect()[0]
    n = 6
    assert out["s_stat"] == n * (n - 1) // 2 == 15
    var = n * (n - 1) * (2 * n + 5) / 18
    assert out["var_s"] == pytest.approx(var, abs=1e-6)
    assert out["z"] == pytest.approx((15 - 1) / math.sqrt(var), abs=1e-6)


def test_mk_constant_series_null_z(spark):
    """All hours tied: tie term cancels the variance, z undefined."""
    from careers_spark.operators.temporal import mann_kendall

    out = mann_kendall(_hourly(spark, [3, 3, 3, 3])).collect()[0]
    assert out["s_stat"] == 0
    assert out["var_s"] == 0.0
    assert out["z"] is None


def test_mk_python_lockstep_with_gaps_and_ties(spark):
    """Series with a silent hour (gap-filled zero) and value ties —
    replay S, tie term, and z exactly."""
    from careers_spark.operators.temporal import mann_kendall

    counts = [2, 0, 5, 2, 7, 0, 5]
    out = mann_kendall(_hourly(spark, [c for c in counts])).collect()[0]
    # NOTE: hours with 0 events vanish from the input but reappear as
    # gap-filled zeros; build the effective series accordingly
    xs = counts  # hours 0..6 inclusive, zeros included by gap fill
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
    )
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    assert out["n_hours"] == n and out["s_stat"] == s
    assert out["var_s"] == round(var, 6)
    want_z = (s - 1) / math.sqrt(var) if s > 0 else (
        (s + 1) / math.sqrt(var) if s < 0 else 0.0
    )
    assert out["z"] == round(want_z, 6)


def _assign(spark, counts):
    rows = []
    uid = 0
    for variant, n in counts.items():
        for _ in range(n):
            rows.append((uid, variant))
            uid += 1
    return spark.createDataFrame(rows, "unit long, variant string")


def test_srm_balanced_split_quiet(spark):
    """4000/4000 on a designed 50/50: chi2 = 0, no alarm."""
    from careers_spark.operators.funnel import srm_check

    out = {
        r["variant"]: r
        for r in srm_check(
            _assign(spark, {"control": 4000, "treatment": 4000}),
            weights_mille={"control": 500, "treatment": 500},
        ).collect()
    }
    assert out["control"]["chi2_total"] == 0.0
    assert out["control"]["srm_alarm"] is False
    assert out["control"]["expected"] == 4000.0


def test_srm_textbook_mismatch_alarms(spark):
    """4100/3900 on 50/50: chi2 = 2*(100^2/4000) = 5 > 3.841 -> alarm
    (the canonical Fabijan example shape)."""
    from careers_spark.operators.funnel import srm_check

    out = srm_check(
        _assign(spark, {"control": 4100, "treatment": 3900}),
        weights_mille={"control": 500, "treatment": 500},
    ).collect()
    assert out[0]["chi2_total"] == pytest.approx(5.0, abs=1e-6)
    assert all(r["srm_alarm"] is True for r in out)


def test_srm_undesigned_variant_always_alarms(spark):
    """A variant outside the design trips the alarm even when the
    designed split itself is perfect; designed-but-absent variants
    contribute their full expected mass."""
    from careers_spark.operators.funnel import srm_check

    out = {
        r["variant"]: r
        for r in srm_check(
            _assign(spark, {"control": 50, "treatment": 50, "ghost": 1}),
            weights_mille={"control": 450, "treatment": 450, "holdout": 100},
        ).collect()
    }
    assert out["ghost"]["w_mille"] is None
    assert out["ghost"]["contrib"] is None
    assert all(r["srm_alarm"] is True for r in out.values())
    assert out["holdout"]["n_obs"] == 0
    assert out["holdout"]["contrib"] > 0


def test_srm_validation(spark):
    from careers_spark.operators.funnel import srm_check

    df = _assign(spark, {"a": 1})
    with pytest.raises(ValueError):
        srm_check(df, weights_mille={})
    with pytest.raises(ValueError):
        srm_check(df, weights_mille={"a": 400, "b": 500})
