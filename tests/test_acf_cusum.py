"""Goldens for the hourly-series statistics pair: sample
autocorrelation (exact scaled-centered integer sums) and the CUSUM
Brownian-bridge changepoint. Expected values come from the textbook
formulas computed in pure python here."""

import math
from datetime import datetime, timedelta, timezone

from careers_spark.operators.temporal import acf_hourly, cusum_changepoint

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _events(spark, counts):
    """One row per event; hour i carries counts[i] events (0 = gap-fill
    must synthesize the hour)."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, _T0 + timedelta(hours=i)))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def _acf_expected(xs, k):
    n = len(xs)
    m = sum(xs) / n
    num = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
    den = sum((x - m) ** 2 for x in xs)
    return round(num / den, 6)


def test_acf_alternating_series(spark):
    xs = [1, 2, 1, 2, 1, 2, 1, 2]
    got = {
        r.lag: r for r in acf_hourly(_events(spark, xs), max_lag=3).collect()
    }
    assert set(got) == {1, 2, 3}
    for k in (1, 2, 3):
        assert got[k].acf == _acf_expected(xs, k)
        assert got[k].n == len(xs)
    assert got[1].acf < 0 < got[2].acf


def test_acf_gap_hours_count_as_zero(spark):
    # hours 0 and 3 have events, 1-2 are silent -> series [2, 0, 0, 2]
    xs = [2, 0, 0, 2]
    got = {
        r.lag: r for r in acf_hourly(_events(spark, xs), max_lag=2).collect()
    }
    assert got[1].acf == _acf_expected(xs, 1)
    assert got[2].acf == _acf_expected(xs, 2)


def test_acf_constant_series_is_null(spark):
    rows = acf_hourly(_events(spark, [3, 3, 3, 3]), max_lag=2).collect()
    assert all(r.acf is None and r.den == 0 for r in rows)


def test_cusum_level_shift(spark):
    # [1,1,1,11,11,11]: argmax at k=3 (last 'before' hour),
    # g = |6*3 - 3*36| = 90, stat = 90 / sqrt(6*(6*366 - 36^2))
    xs = [1, 1, 1, 11, 11, 11]
    row = cusum_changepoint(_events(spark, xs)).collect()[0]
    assert (row.n, row.s, row.sxx, row.g_num) == (6, 36, 366, 90)
    h0 = int(_T0.timestamp() // 3600)
    assert row.at_hour == h0 + 2  # third hour = end of the low prefix
    assert row.cusum_stat == round(90 / math.sqrt(6 * (6 * 366 - 36**2)), 6)


def test_cusum_constant_series_null_stat(spark):
    row = cusum_changepoint(_events(spark, [5, 5, 5, 5])).collect()[0]
    assert row.cusum_stat is None
    assert row.g_num == 0
    # tie-break: earliest hour among the all-zero numerators
    assert row.at_hour == int(_T0.timestamp() // 3600)
