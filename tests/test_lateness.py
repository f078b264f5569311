"""Watermark lateness profile / drop rates (operators/temporal.py)."""

from datetime import datetime, timezone

from careers_spark.operators.temporal import (
    event_lateness_profile,
    watermark_drop_rates,
)


def _mk(spark, rows):
    # rows: (event_ts_s, arrival_s)
    data = [
        (
            datetime.fromtimestamp(ev, tz=timezone.utc).replace(
                tzinfo=None
            ),
            arr * 1_000_000,
        )
        for ev, arr in rows
    ]
    return spark.createDataFrame(data, "ts timestamp, arrival_us long")


HOUR = 3600


def test_lateness_hand_golden(spark):
    # bucket 0 carries max event-time 7000; an event with ts=100
    # arriving in bucket 1 is 6900 s late; in-order events are 0.
    rows = [
        (7000, 10),          # early arrival, big event time
        (50, 20),            # same bucket: frontier not yet visible
        (100, HOUR + 5),     # next bucket: late by 6900
        (8000, HOUR + 6),    # next bucket: ahead of frontier -> 0
    ]
    (r,) = event_lateness_profile(_mk(spark, rows)).collect()
    assert r.n_events == 4
    assert r.n_late == 1
    assert r.max_late_s == 6900
    assert r.late_frac == 0.25
    # order statistics over distinct values {0 (x3), 6900}
    assert r.p50_s == 0 and r.p90_s == 6900 and r.p99_s == 6900


def test_lateness_in_order_stream_all_zero(spark):
    rows = [(i * 100, i * 100) for i in range(50)]
    (r,) = event_lateness_profile(_mk(spark, rows)).collect()
    assert (r.n_late, r.max_late_s) == (0, 0)
    assert r.p99_s == 0


def test_drop_rates_monotone_and_exact(spark):
    rows = [
        (7000, 10),
        (100, HOUR + 5),     # late 6900
        (6000, HOUR + 6),    # late 1000
        (8000, HOUR + 7),    # 0
    ]
    out = {
        r.delay_s: r
        for r in watermark_drop_rates(
            _mk(spark, rows), delays_s=(0, 500, 2000, 7000)
        ).collect()
    }
    assert out[0].n_dropped == 2       # both late events
    assert out[500].n_dropped == 2
    assert out[2000].n_dropped == 1    # only the 6900-late one
    assert out[7000].n_dropped == 0
    assert out[0].drop_rate == 0.5
    # monotone non-increasing in delay
    ds = sorted(out)
    for a, b in zip(ds, ds[1:]):
        assert out[a].n_dropped >= out[b].n_dropped


def test_lateness_python_lockstep(spark):
    import random

    rng = random.Random(71)
    rows = []
    for i in range(300):
        ev = rng.randrange(0, 20000)
        arr = ev + rng.randrange(0, 5000)
        rows.append((ev, arr))
    # python recompute of the hour-frontier lateness
    from collections import defaultdict

    mx = defaultdict(int)
    for ev, arr in rows:
        hr = (arr * 1_000_000) // (3600 * 1_000_000)
        mx[hr] = max(mx[hr], ev * 1_000_000)
    lates = []
    for ev, arr in rows:
        hr = (arr * 1_000_000) // (3600 * 1_000_000)
        prior = [mx[h] for h in mx if h < hr]
        f = max(prior) if prior else None
        us = ev * 1_000_000
        lates.append((f - us) // 1_000_000 if f and f > us else 0)
    n_late = sum(1 for x in lates if x > 0)
    (r,) = event_lateness_profile(_mk(spark, rows)).collect()
    assert r.n_events == 300
    assert r.n_late == n_late
    assert r.max_late_s == max(lates)
    sl = sorted(lates)
    import math

    def q(p):
        # smallest value with cum share >= p over the multiset
        cum = 0
        from collections import Counter

        c = Counter(sl)
        for v in sorted(c):
            cum += c[v]
            if cum * 100 >= p * 300:
                return v

    assert r.p50_s == q(50) and r.p90_s == q(90) and r.p99_s == q(99)
