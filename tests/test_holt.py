"""holt_linear_forecast — weight exactness + recurrence lockstep."""

from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction as Fr

import pytest


def _r6(x) -> float:
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _python_holt(ys):
    """Direct Fraction recurrence: l1 = y1, b1 = 0; alpha = beta = 1/2."""
    level, b = Fr(ys[0]), Fr(0)
    for y in ys[1:]:
        nl = (Fr(y) + level + b) / 2
        b = (nl - level) / 2 + b / 2
        level = nl
    return level, b


def test_holt_weights_equal_recurrence():
    from careers_spark.operators.temporal import holt_weights

    ys = [5, 0, 3, 10, 2, 2, 8, 1]
    wl, wb, k = holt_weights(len(ys))
    level, b = _python_holt(ys)
    assert sum(w * y for w, y in zip(wl, ys)) == level * (1 << k)
    assert sum(w * y for w, y in zip(wb, ys)) == b * (1 << k)


def test_holt_weights_linear_trend_is_tracked():
    """On an exact linear series the smoothed trend converges toward
    the true slope and one-step forecasts stay on the line's side."""
    from careers_spark.operators.temporal import holt_weights

    ys = [100 + 10 * t for t in range(20)]
    wl, wb, k = holt_weights(len(ys))
    level = sum(w * y for w, y in zip(wl, ys)) / (1 << k)
    b = sum(w * y for w, y in zip(wb, ys)) / (1 << k)
    assert abs(b - 10) < 1.0
    assert abs(level + b - (100 + 10 * 20)) < 3.0


def test_holt_forecast_spark_lockstep(spark):
    from careers_spark.operators.temporal import holt_linear_forecast

    # one purchase per day with varying cents; a gap day (no purchases)
    days = [1, 2, 3, 5, 6, 7, 8]
    vals = [5.00, 6.00, 4.00, 10.00, 2.50, 3.25, 8.00]
    rows = [
        (i, datetime(2024, 1, d, 12, 0, 0), "purchase", v)
        for i, (d, v) in enumerate(zip(days, vals))
    ] + [(99, datetime(2024, 1, 4, 1, 0, 0), "view", 9.99)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {
        r.h: r.forecast_cents
        for r in holt_linear_forecast(df, horizons=(1, 3)).collect()
    }
    # dense daily cents, day 4 gap-filled with 0
    ys = [500, 600, 400, 0, 1000, 250, 325, 800]
    level, b = _python_holt(ys)
    assert got[1] == _r6(level + b)
    assert got[3] == _r6(level + 3 * b)


def test_holt_weights_reject_empty():
    from careers_spark.operators.temporal import holt_weights

    with pytest.raises(ValueError):
        holt_weights(0)


# ---------------------------------------------------------------------------
# seasonal_adjusted_anomalies


def _hourly_events(spark, counts_by_hour):
    """counts_by_hour: {hour_index: n_events} on 2024-01-01+."""
    from datetime import datetime, timedelta

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for h, n in counts_by_hour.items():
        for _ in range(n):
            rows.append((eid, base + timedelta(hours=h, minutes=1)))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_seasonal_anomaly_flags_spike_not_rhythm(spark):
    from careers_spark.operators.temporal import seasonal_adjusted_anomalies

    # 6 days of a clean daily rhythm (10 + hod pattern), one spiked hour
    counts = {}
    for d in range(6):
        for hod in range(24):
            counts[d * 24 + hod] = 10 + (5 if 8 <= hod <= 17 else 0)
    # +24 over 6 days: the spike leaks -4 into its hod siblings through
    # the mean seasonal profile (classical-decomposition behavior),
    # below the 5-count floor band, so only the spike itself fires
    spike_h = 2 * 24 + 12
    counts[spike_h] += 24
    got = {
        r.h: r
        for r in seasonal_adjusted_anomalies(
            _hourly_events(spark, counts)
        ).collect()
    }
    h0 = min(got)
    flagged = {h - h0 for h, r in got.items() if r.is_anomaly}
    assert spike_h in flagged
    # the pure rhythm never fires
    assert flagged == {spike_h}


def test_seasonal_anomaly_edges_null_not_dropped(spark):
    from careers_spark.operators.temporal import seasonal_adjusted_anomalies

    counts = {h: 5 for h in range(72)}
    got = seasonal_adjusted_anomalies(_hourly_events(spark, counts)).collect()
    # centered 24h MA leaves NULL residuals at both edges; rows remain
    nulls = [r for r in got if r.residual is None]
    assert len(nulls) >= 12
    assert all(r.is_anomaly is None for r in nulls)
    assert len(got) == 72
