"""Temporal operators (temporal.py): as-of join, bounded range join,
hypertable rollup — plus the k-minimums sketch (sketches.py) and HITS
(graph.py).

Each operator is pinned by a hand-computed golden covering its boundary
semantics (strict vs non-strict ties, window edges, bucket boundaries)
and, where the operator has an obvious brute force, a seeded randomized
cross-check against it.
"""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from careers_spark.operators.graph import hits
from careers_spark.operators.sketches import distinct_sketch
from careers_spark.operators.temporal import (
    asof_join,
    time_bucket_rollup,
    windowed_count_join,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def clickstream(spark):
    # user 1: clicks at 10, 20, 20 (two ids share ts=20), purchase at 20
    #   (strict: the ts=20 clicks must NOT qualify; last prior is ts=10)
    #   and purchase at 30 (qualifies: ts=20, tie -> larger event_id 103)
    # user 2: purchase at 5 with NO prior click; click at 7; purchase at 8
    purchases = [(201, 1, _ts(20)), (202, 1, _ts(30)), (203, 2, _ts(5)), (204, 2, _ts(8))]
    clicks = [
        (101, 1, _ts(10), 1.5),
        (102, 1, _ts(20), 2.5),
        (103, 1, _ts(20), 3.5),
        (104, 2, _ts(7), 4.5),
    ]
    p = spark.createDataFrame(purchases, "event_id long, user_id long, ts timestamp")
    c = spark.createDataFrame(clicks, "event_id long, user_id long, ts timestamp, value double")
    return p, c


def test_asof_strict_golden(spark, clickstream):
    p, c = clickstream
    got = {
        r.event_id: (r.event_id_asof, r.value_asof)
        for r in asof_join(
            p, c, key="user_id", ts="ts", tiebreak="event_id",
            payload=["event_id", "value"], strict=True,
        ).collect()
    }
    assert got == {
        201: (101, 1.5),   # equal-ts clicks excluded under strict
        202: (103, 3.5),   # ts tie between 102/103 -> larger event_id
        203: (None, None), # no prior click
        204: (104, 4.5),
    }


def test_asof_nonstrict_includes_equal_ts(spark, clickstream):
    p, c = clickstream
    got = {
        r.event_id: r.event_id_asof
        for r in asof_join(
            p, c, key="user_id", ts="ts", tiebreak="event_id",
            payload=["event_id"], strict=False,
        ).collect()
    }
    assert got[201] == 103  # ts=20 clicks now qualify, tie -> 103


def test_asof_randomized_vs_bruteforce(spark):
    rng = random.Random(7)
    lefts, rights = [], []
    for i in range(120):
        lefts.append((1000 + i, rng.randrange(5), _ts(rng.randrange(50))))
    for j in range(200):
        rights.append((j, rng.randrange(5), _ts(rng.randrange(50)), float(j)))
    p = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
    c = spark.createDataFrame(rights, "event_id long, user_id long, ts timestamp, value double")
    got = {
        r.event_id: r.event_id_asof
        for r in asof_join(
            p, c, key="user_id", ts="ts", tiebreak="event_id",
            payload=["event_id"], strict=True,
        ).collect()
    }
    for eid, u, ts in lefts:
        cand = [(r_ts, rid) for rid, ru, r_ts, _ in rights if ru == u and r_ts < ts]
        want = max(cand)[1] if cand else None
        assert got[eid] == want, eid


def test_windowed_count_boundaries(spark):
    # window = 10s: click at exactly ts-10 counts (>=), click at exactly
    # ts does not (<); clicks land in both the same and the previous band
    p = spark.createDataFrame(
        [(1, 7, _ts(100)), (2, 7, _ts(25)), (3, 8, _ts(40))],
        "event_id long, user_id long, ts timestamp",
    )
    c = spark.createDataFrame(
        [(7, _ts(90)), (7, _ts(95)), (7, _ts(100)), (7, _ts(89)),
         (7, _ts(16)), (7, _ts(24))],
        "user_id long, ts timestamp",
    )
    got = {
        r.event_id: r.n
        for r in windowed_count_join(
            p, c, key="user_id", ts="ts", window_us=10_000_000, out="n"
        ).collect()
    }
    # event 1: 90 (== ts-10, in) + 95 in; 100 (== ts) out; 89 out -> 2
    # event 2: 16 (== ts-9, prev band) + 24 in -> 2 ; event 3: no user-8 clicks
    assert got == {1: 2, 2: 2, 3: 0}


def test_windowed_count_randomized_vs_bruteforce(spark):
    rng = random.Random(11)
    lefts = [(i, rng.randrange(4), _ts(rng.randrange(300))) for i in range(100)]
    rights = [(rng.randrange(4), _ts(rng.randrange(300))) for _ in range(300)]
    p = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
    c = spark.createDataFrame(rights, "user_id long, ts timestamp")
    w = 37_000_000  # a window that is NOT a divisor of anything round
    got = {
        r.event_id: r.n
        for r in windowed_count_join(p, c, key="user_id", ts="ts", window_us=w, out="n").collect()
    }
    for eid, u, ts in lefts:
        lo = ts - dt.timedelta(microseconds=w)
        want = sum(1 for ru, rts in rights if ru == u and lo <= rts < ts)
        assert got[eid] == want, eid


def test_rollup_coarse_equals_raw(spark):
    rows = [
        ("click", _ts(0), 1.11),          # exact hour boundary
        ("click", _ts(299), 2.22),        # same 5-min bucket
        ("click", _ts(300), 3.33),        # next 5-min bucket, same hour
        ("click", _ts(3600), 4.44),       # next hour
        ("error", _ts(10), 5.555),        # cents rounding: 555.5 -> 556? no: 5.555*100
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = time_bucket_rollup(ev, dims=["event_type"]).collect()
    fine = {(r.event_type, r.bucket_us): (r.n, r.sum_cents) for r in out if r.grain == "fine"}
    coarse = {(r.event_type, r.bucket_us): (r.n, r.sum_cents) for r in out if r.grain == "coarse"}
    base = int(T0.timestamp()) * 1_000_000
    assert fine[("click", base)] == (2, 111 + 222)
    assert fine[("click", base + 300_000_000)] == (1, 333)
    assert fine[("click", base + 3_600_000_000)] == (1, 444)
    # coarse re-aggregates the fine rows exactly
    assert coarse[("click", base)] == (3, 111 + 222 + 333)
    assert coarse[("click", base + 3_600_000_000)] == (1, 444)
    # raw-vs-rollup identity on the whole frame
    raw_coarse = {}
    for et, ts, v in rows:
        b = (int(ts.timestamp() * 1_000_000) // 3_600_000_000) * 3_600_000_000
        n, s = raw_coarse.get((et, b), (0, 0))
        raw_coarse[(et, b)] = (n + 1, s + round(v * 100))
    assert coarse == raw_coarse


def test_rolling_window_boundaries_and_peers(spark):
    from careers_spark.operators.temporal import rolling_window_agg

    day = lambda d: T0 + dt.timedelta(days=d)  # noqa: E731
    # cust 1: orders on days 0, 5, 6, 7, 7 — the 7-day frame [d-6, d]
    # at day 6 includes day 0 (exactly 6 back) but at day 7 drops it;
    # the two day-7 orders are RANGE peers and share one rolling value
    rows = [
        (10, 1, day(0), 1.00),
        (11, 1, day(5), 2.00),
        (12, 1, day(6), 4.00),
        (13, 1, day(7), 8.00),
        (14, 1, day(7), 16.00),
        (15, 2, day(6), 32.00),  # other key: isolated
    ]
    o = spark.createDataFrame(
        rows, "k long, cust long, d timestamp, price double"
    )
    got = {
        r.k: (r.roll_n, r.roll_cents)
        for r in rolling_window_agg(
            o, key="cust", ts="d", value="price", days=7
        ).collect()
    }
    assert got[10] == (1, 100)
    assert got[11] == (2, 300)
    assert got[12] == (3, 700)                  # day 0 still inside
    assert got[13] == (4, 3000)                 # day 0 dropped; peers
    assert got[14] == (4, 3000)                 # identical peer value
    assert got[15] == (1, 3200)


def test_rolling_window_randomized_vs_bruteforce(spark):
    from careers_spark.operators.temporal import rolling_window_agg

    rng = random.Random(23)
    rows = [
        (i, rng.randrange(3), T0 + dt.timedelta(days=rng.randrange(20)),
         round(rng.uniform(1, 50), 2))
        for i in range(120)
    ]
    o = spark.createDataFrame(rows, "k long, cust long, d timestamp, price double")
    got = {
        r.k: (r.roll_n, r.roll_cents)
        for r in rolling_window_agg(o, key="cust", ts="d", value="price", days=7).collect()
    }
    for k, cust, d, price in rows:
        lo = d - dt.timedelta(days=6)
        matches = [r for r in rows if r[1] == cust and lo <= r[2] <= d]
        assert got[k] == (len(matches), sum(round(p * 100) for *_, p in matches)), k


def test_sketch_estimates_and_python_lockstep(spark):
    # 3 groups with known cardinalities; estimator must match a pure-
    # python recompute of the identical hash/fold arithmetic exactly
    import hashlib

    from careers_spark.operators.dedup import (
        MINHASH_A0, MINHASH_A_STEP, MINHASH_B0, MINHASH_B_STEP, MINHASH_P,
    )

    rows = [(f"g{i % 3}", f"k{i % (200 * (1 + i % 3))}") for i in range(3000)]
    df = spark.createDataFrame(rows, "grp string, key string")
    got = {r.grp: (r.n_exact, r.n_est, r.rel_err) for r in
           distinct_sketch(df, "grp", "key", k=64).collect()}

    by_grp = {}
    for g, kv in rows:
        by_grp.setdefault(g, set()).add(kv)
    for g, keys in by_grp.items():
        mins = [MINHASH_P] * 64
        for kv in keys:
            h = int(hashlib.md5(kv.encode()).hexdigest()[:8], 16)
            for j in range(64):
                a = MINHASH_A0 + j * MINHASH_A_STEP
                b = MINHASH_B0 + j * MINHASH_B_STEP
                mins[j] = min(mins[j], (h * a + b) % MINHASH_P)
        s = 0.0
        for j in range(64):  # fixed fold order, as in the SQL
            s += mins[j] / float(MINHASH_P)
        est = round(64.0 / s - 1.0, 4)
        n = len(keys)
        assert got[g] == (n, est, round(abs(est - n) / n, 4))
        assert abs(est - n) / n < 0.5  # k=64 -> ~12% stderr; 4 sigma


def test_hits_star_golden(spark):
    # a -> {b, c, d}: a is the only hub (hub=1), b/c/d equal authorities
    e = spark.createDataFrame([("a", "b"), ("a", "c"), ("a", "d")], "src string, dst string")
    got = {r.node: (r.hub, r.auth) for r in hits(e).collect()}
    assert got["a"] == (1.0, 0.0)
    for n in "bcd":
        assert got[n] == (0.0, pytest.approx(1 / 3, abs=1e-9))


def test_hits_matches_python_unroll(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    hub = {x: 1.0 / n for x in nodes}
    for _ in range(6):
        raw = {x: 0.0 for x in nodes}
        for u, v in edges:
            raw[v] += hub[u]
        s = sum(raw[x] for x in nodes)
        auth = {x: round(raw[x] / s, 10) for x in nodes}
        raw = {x: 0.0 for x in nodes}
        for u, v in edges:
            raw[u] += auth[v]
        s = sum(raw[x] for x in nodes)
        hub = {x: round(raw[x] / s, 10) for x in nodes}
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: (r.hub, r.auth) for r in hits(df).collect()}
    assert got == {x: (hub[x], auth[x]) for x in nodes}


def test_temporal_plan_shapes(spark):
    # the scale contracts: as-of is sort-based (NO join operator at
    # all); the range join is a band-bucketed equi-join (no cartesian,
    # no nested-loop range probe)
    p = spark.createDataFrame(
        [(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    c = spark.createDataFrame(
        [(2, 1, _ts(5), 1.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    asof_plan = asof_join(
        p, c, key="user_id", ts="ts", tiebreak="event_id", payload=["event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in asof_plan, asof_plan
    assert "Union" in asof_plan and "Window" in asof_plan

    rj_plan = windowed_count_join(
        p, c.select("user_id", "ts"), key="user_id", ts="ts", window_us=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rj_plan, rj_plan
    assert "BroadcastNestedLoopJoin" not in rj_plan, rj_plan


def test_rollup_anomalies_golden(spark):
    """Constant baseline -> zero variance: a spike must STILL flag (the
    integer inequality's rhs is 0) with z NULL; the spike then inflates
    the next bucket's baseline variance; short baselines never flag."""
    import math

    from careers_spark.operators.temporal import rollup_anomalies

    H = 3600
    rows = []
    for b in range(24):                      # buckets 0..23: 3 events each
        rows += [("e", _ts(b * H + i)) for i in range(3)]
    rows += [("e", _ts(24 * H + i)) for i in range(15)]   # spike: 15
    rows += [("e", _ts(25 * H + i)) for i in range(3)]    # back to normal
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        int(r.bucket_us // (H * 1_000_000)) - int(T0.timestamp()) // H:
            (r.n_events, r.baseline_n, r.z, r.is_anomaly)
        for r in rollup_anomalies(ev, dims=["event_type"]).collect()
    }
    # first 12 buckets: baseline too short -> never anomalous, z NULL
    for b in range(12):
        assert out[b][1] == b and out[b][2] is None and not out[b][3]
    # bucket 23: 23-bucket constant baseline, zero variance, x == mean
    assert out[23] == (3, 23, None, False)
    # bucket 24 (the spike): zero-variance baseline, x != mean -> flags
    assert out[24] == (15, 24, None, True)
    # bucket 25: baseline now holds the spike; hand-computed z
    n, s, q, x = 24, 23 * 3 + 15, 23 * 9 + 225, 3
    z = round((x * n - s) / math.sqrt(n * q - s * s), 6)
    assert out[25] == (3, 24, z, False)
    assert (x * n - s) ** 2 <= 9 * (n * q - s * s)


def test_rollup_anomalies_gap_resets_baseline(spark):
    """RANGE frame over bucket values: a gap wider than the baseline
    leaves the frame empty, so the resumed bucket has baseline_n 0."""
    from careers_spark.operators.temporal import rollup_anomalies

    H = 3600
    rows = [("e", _ts(b * H)) for b in range(14)] + [("e", _ts(60 * H))]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        int(r.bucket_us // (H * 1_000_000)) - int(T0.timestamp()) // H:
            (r.baseline_n, r.is_anomaly)
        for r in rollup_anomalies(ev, dims=["event_type"]).collect()
    }
    assert got[60] == (0, False)


def test_scd2_history_golden(spark):
    from careers_spark.operators.temporal import scd2_history

    rows = [
        # user 1: three versions; middle two share a timestamp
        (1, 1, _ts(0), "a"),
        (2, 1, _ts(10), "b"),
        (3, 1, _ts(10), "c"),   # same ts as event 2 -> zero-length for 2
        (4, 1, _ts(30), "d"),
        # user 2: single version, current from the start
        (5, 2, _ts(5), "x"),
    ]
    ev = spark.createDataFrame(
        [(eid, ts, uid, et, 0.0, "{}") for eid, uid, ts, et in rows],
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    got = {
        r.event_id: (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(ev).collect()
    }
    assert got == {
        1: (_ts(0), _ts(10), False),
        2: (_ts(10), _ts(10), False),  # zero-length: superseded same-ts
        3: (_ts(10), _ts(30), False),
        4: (_ts(30), None, True),
        5: (_ts(5), None, True),
    }
    # intervals chain gaplessly per key: each valid_to IS the next
    # version's valid_from, and exactly one current row per key
    assert sum(1 for v in got.values() if v[2]) == 2


def test_scd2_point_in_time_probe(spark):
    """The defining SCD2 property: for any probe instant, from <= t < to
    selects EXACTLY ONE version per key that has started."""
    from careers_spark.operators.temporal import scd2_history

    random.seed(11)
    rows = [
        (i, i % 7, _ts(random.randrange(0, 1000)))
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        [(eid, ts, uid, "t", 0.0, "{}") for eid, uid, ts in rows],
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    hist = scd2_history(ev).collect()
    for probe_s in (0, 137, 500, 999):
        t = _ts(probe_s)
        per_key = {}
        for r in hist:
            if r.valid_from <= t and (r.valid_to is None or t < r.valid_to):
                per_key.setdefault(r.user_id, []).append(r.event_id)
        started = {u for _, u, ts in rows if ts <= t}
        assert set(per_key) == started
        assert all(len(v) == 1 for v in per_key.values())


def test_rolling_active_users_golden(spark):
    from careers_spark.operators.temporal import rolling_active_users

    day = 86_400
    rows = [
        # (user, day): u1 on days 0, 1; u2 on day 1 (twice -> one
        # presence); u3 on day 10 (isolated)
        (1, 0 * day), (1, 1 * day + 5),
        (2, 1 * day), (2, 1 * day + 99),
        (3, 10 * day),
    ]
    ev = spark.createDataFrame(
        [(i, u, _ts(s)) for i, (u, s) in enumerate(rows)],
        schema="event_id long, user_id long, ts timestamp",
    )
    got = {
        r.day_us // 86_400_000_000: r.n_active
        for r in rolling_active_users(ev, window_days=7).collect()
    }
    # observed days are 0, 1 (plus the T0 offset) and 10; day 1's
    # trailing week covers both users' presences; day 10's window
    # [4, 10] contains only u3
    base = next(iter(sorted(got)))
    rel = {d - base: n for d, n in got.items()}
    assert rel == {0: 1, 1: 2, 10: 1}


def test_rolling_active_users_window_edges(spark):
    from careers_spark.operators.temporal import rolling_active_users

    day = 86_400
    # u1 active day 0 only; u2 active on day 6 and day 7:
    # day 6 window [0,6] sees u1+u2; day 7 window [1,7] sees u2 only
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 2, _ts(6 * day)), (3, 2, _ts(7 * day))],
        schema="event_id long, user_id long, ts timestamp",
    )
    got = {
        r.day_us // 86_400_000_000: r.n_active
        for r in rolling_active_users(ev, window_days=7).collect()
    }
    base = min(got)
    rel = {d - base: n for d, n in got.items()}
    assert rel == {0: 1, 6: 2, 7: 1}


def test_rolling_active_users_equals_bruteforce(spark):
    from careers_spark.operators.temporal import rolling_active_users

    random.seed(23)
    day = 86_400
    rows = [
        (i, random.randrange(1, 12), _ts(random.randrange(0, 40) * day + random.randrange(day)))
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id long, user_id long, ts timestamp"
    )
    got = {
        r.day_us // 86_400_000_000: r.n_active
        for r in rolling_active_users(ev, window_days=7).collect()
    }
    pres = {(u, int(ts.timestamp()) // day) for _, u, ts in rows}
    obs_days = sorted({d for _, d in pres})
    want = {
        d: len({u for u, pd in pres if d - 6 <= pd <= d}) for d in obs_days
    }
    assert got == want


def test_trend_slopes_golden(spark):
    from careers_spark.operators.temporal import trend_slopes

    day = 86_400
    rows = []
    eid = 0
    # 'up': counts 1, 2, 3 on consecutive days -> slope exactly 1.0
    for d, n in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(n):
            rows.append((eid, "up", _ts(d * day + eid))); eid += 1
    # 'flat': 2, 2 on days 5, 9 -> slope 0.0 (gap doesn't matter)
    for d in (5, 5, 9, 9):
        rows.append((eid, "flat", _ts(d * day + eid))); eid += 1
    # 'single': one day only -> NULL slope
    rows.append((eid, "single", _ts(100 * day)))
    ev = spark.createDataFrame(
        rows, schema="event_id long, event_type string, ts timestamp"
    )
    got = {
        r.event_type: (r.n_days, r.total_events, r.slope_per_day)
        for r in trend_slopes(ev).collect()
    }
    assert got["up"] == (3, 6, 1.0)
    assert got["flat"] == (2, 4, 0.0)
    assert got["single"] == (1, 1, None)


def test_trend_slopes_shift_invariant(spark):
    from careers_spark.operators.temporal import trend_slopes

    day = 86_400
    def build(offset_days):
        rows = []
        eid = 0
        for d, n in [(0, 5), (3, 2), (7, 9), (11, 1)]:
            for _ in range(n):
                rows.append((eid, "t", _ts((d + offset_days) * day + eid)))
                eid += 1
        return spark.createDataFrame(
            rows, schema="event_id long, event_type string, ts timestamp"
        )

    a = trend_slopes(build(0)).collect()[0]
    b = trend_slopes(build(5000)).collect()[0]
    assert a.slope_per_day == b.slope_per_day
    # cross-check against numpy polyfit
    import numpy as np

    x = np.array([0, 3, 7, 11], dtype=float)
    y = np.array([5, 2, 9, 1], dtype=float)
    want = np.polyfit(x, y, 1)[0]
    assert abs(a.slope_per_day - want) < 1e-9


def test_merge_upsert_golden(spark):
    from careers_spark.operators.temporal import merge_upsert

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    base = spark.createDataFrame(
        [(1, _ts(0), 1, "a"), (2, _ts(0), 2, "b"), (3, _ts(0), 3, "c")],
        schema=schema,
    )
    changes = spark.createDataFrame(
        [
            (10, _ts(100), 1, "a2"),   # update u1
            (11, _ts(200), 1, "a3"),   # later update u1 wins
            (12, _ts(100), 4, "new"),  # insert u4
        ],
        schema=schema,
    )
    got = {
        r.user_id: (r.event_id, r.event_type)
        for r in merge_upsert(base, changes, key="user_id").collect()
    }
    assert got == {
        1: (11, "a3"),   # latest change wins
        2: (2, "b"),     # untouched
        3: (3, "c"),     # untouched
        4: (12, "new"),  # inserted
    }


def test_merge_upsert_delete_marker(spark):
    from careers_spark.operators.temporal import merge_upsert

    schema = "event_id long, ts timestamp, user_id long"
    base = spark.createDataFrame([(1, _ts(0), 1), (2, _ts(0), 2)], schema=schema)
    changes = spark.createDataFrame(
        [
            (10, _ts(100), 1, True),    # delete u1
            (11, _ts(100), 2, False),   # update u2
            (12, _ts(200), 2, True),    # ...then delete u2: winner deletes
        ],
        schema=schema + ", is_delete boolean",
    )
    got = merge_upsert(
        base, changes, key="user_id", delete_col="is_delete"
    ).collect()
    assert got == []  # both keys deleted; delete winners mask base rows


def test_merge_equals_full_recompute(spark):
    """The MERGE invariant on seeded data: split at any cut, apply the
    late slice to the early snapshot, get the full-history compaction."""
    from careers_spark.operators.temporal import latest_state, merge_upsert

    random.seed(31)
    schema = "event_id long, ts timestamp, user_id long"
    rows = [(i, _ts(random.randrange(0, 10_000)), random.randrange(1, 20))
            for i in range(400)]
    ev = spark.createDataFrame(rows, schema=schema)
    for cut_s in (0, 5_000, 10_001):
        cut = _ts(cut_s)
        base = latest_state(ev.filter(F.col("ts") < cut))
        merged = merge_upsert(base, ev.filter(F.col("ts") >= cut), key="user_id")
        want = sorted(map(tuple, latest_state(ev).collect()))
        assert sorted(map(tuple, merged.collect())) == want


def test_ohlc_golden(spark):
    from careers_spark.operators.temporal import ohlc_bars

    # one symbol, one day: open = value at earliest ts, close = value
    # at latest; a second day and a second symbol isolate the grouping
    rows = [
        (1, "a", _ts(100), 5.0),
        (2, "a", _ts(10), 2.0),   # earliest -> open
        (3, "a", _ts(500), 1.0),  # low
        (4, "a", _ts(900), 4.0),  # latest -> close
        (5, "a", _ts(300), 9.0),  # high
        (6, "a", _ts(86400 + 50), 7.25),  # next day: single event
        (7, "b", _ts(60), 3.5),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, sym string, ts timestamp, value double"
    )
    got = {
        (r.sym, r.bucket_us): r
        for r in ohlc_bars(e, ["sym"], tiebreak="event_id").collect()
    }
    base = int(
        (T0 - dt.datetime(1970, 1, 1)).total_seconds()
    ) * 1_000_000  # 2024-01-01 is UTC midnight, so it IS a bucket edge
    d0 = got[("a", base)]
    assert (d0.open, d0.high, d0.low, d0.close) == (2.0, 9.0, 1.0, 4.0)
    assert d0.n_events == 5 and d0.vol_cents == 2100
    d1 = got[("a", base + 86400 * 1_000_000)]
    assert (d1.open, d1.close, d1.vol_cents) == (7.25, 7.25, 725)
    b = got[("b", base)]
    assert (b.open, b.high, b.low, b.close) == (3.5, 3.5, 3.5, 3.5)


def test_ohlc_duplicate_ts_tiebreak(spark):
    from careers_spark.operators.temporal import ohlc_bars

    # all three events share one timestamp: open is the smallest
    # event_id's value, close the largest's — never partition order
    rows = [(10, _ts(5), 1.0), (11, _ts(5), 2.0), (12, _ts(5), 3.0)]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    r = ohlc_bars(e, [], tiebreak="event_id").collect()[0]
    assert (r.open, r.close, r.high, r.low) == (1.0, 3.0, 3.0, 1.0)


def test_ohlc_equals_bruteforce(spark):
    from careers_spark.operators.temporal import ohlc_bars

    rng = random.Random(3)
    rows = [
        (i, rng.choice("xy"), _ts(rng.randrange(0, 3 * 86400)),
         round(rng.uniform(0.5, 99.5), 2))
        for i in range(300)
    ]
    e = spark.createDataFrame(
        rows, "event_id long, sym string, ts timestamp, value double"
    )
    got = {
        (r.sym, r.bucket_us): (r.n_events, r.open, r.high, r.low, r.close,
                               r.vol_cents)
        for r in ohlc_bars(e, ["sym"]).collect()
    }
    want = {}
    day_us = 86_400_000_000
    by_key = {}
    for eid, sym, ts, v in rows:
        us = int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        by_key.setdefault((sym, us // day_us * day_us), []).append((us, eid, v))
    for k, evs in by_key.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        want[k] = (len(evs), evs[0][2], max(vals), min(vals), evs[-1][2],
                   sum(round(v * 100) for v in vals))
    assert got == want


def test_ewma_hourly_hand_golden(spark):
    from datetime import datetime

    from careers_spark.operators.temporal import ewma_hourly

    # counts: h0=4, h1=2, h3=8 (h2 missing -> contributes zero)
    def rows_at(h, n):
        return [(i, datetime(2024, 1, 1, h, 30), "a") for i in range(n)]

    data = rows_at(0, 4) + rows_at(1, 2) + rows_at(3, 8)
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string"
    )
    got = {
        r.hour.hour: (r.n_events, r.ewma)
        for r in ewma_hourly(df, dims=["event_type"]).collect()
    }
    # ewma(h) = sum_i count(h-i) * 2^-(i+1), truncated window
    assert got[0] == (4, 4 / 2)
    assert got[1] == (2, 2 / 2 + 4 / 4)
    # hour 2 has no events -> no output row (spine join), but hour 3
    # still sees h1 and h0 through the window with h2 contributing 0
    assert 2 not in got
    assert got[3] == (8, 8 / 2 + 0 / 4 + 2 / 8 + 4 / 16)


def test_ewma_hourly_exact_dyadic_and_deterministic(spark):
    from datetime import datetime, timedelta

    from careers_spark.operators.temporal import ewma_hourly

    base = datetime(2024, 3, 1)
    data = [
        (i, base + timedelta(hours=i % 30, minutes=i % 60), "t%d" % (i % 3))
        for i in range(900)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string"
    )
    a = sorted(map(tuple, ewma_hourly(df).collect()))
    b = sorted(map(tuple, ewma_hourly(df.repartition(13)).collect()))
    assert a == b
    # every ewma is an exact multiple of 2^-24 (the dyadic lattice)
    for row in a:
        v = row[-1] * (1 << 24)
        assert v == int(v)


def test_bucketed_interval_join_matches_naive(spark):
    """The bucketed strategy equals the naive all-pairs overlap join
    for every bucket size (recall is exact, not approximate), and
    overlap_us is the exact closed-interval intersection."""
    import random

    from careers_spark.operators.temporal import bucketed_interval_join

    rng = random.Random(3)
    L = [(i, rng.randrange(0, 500), 0) for i in range(25)]
    L = [(i, s, s + rng.randrange(0, 120)) for i, s, _ in L]
    R = [(100 + i, rng.randrange(0, 500), 0) for i in range(25)]
    R = [(i, s, s + rng.randrange(0, 120)) for i, s, _ in R]
    lf = spark.createDataFrame(L, "l_id long, l_start_us long, l_end_us long")
    rf = spark.createDataFrame(R, "r_id long, r_start_us long, r_end_us long")

    naive = {
        (li, ri): min(le, re_) - max(ls, rs)
        for li, ls, le in L
        for ri, rs, re_ in R
        if ls <= re_ and rs <= le
    }
    for bucket in (7, 64, 1000):
        got = {
            (r.l_id, r.r_id): r.overlap_us
            for r in bucketed_interval_join(lf, rf, bucket_us=bucket).collect()
        }
        assert got == naive, f"bucket={bucket}"


def test_bucketed_interval_join_touching_endpoints(spark):
    from careers_spark.operators.temporal import bucketed_interval_join

    lf = spark.createDataFrame(
        [(1, 0, 10)], "l_id long, l_start_us long, l_end_us long"
    )
    rf = spark.createDataFrame(
        [(2, 10, 20), (3, 11, 20)], "r_id long, r_start_us long, r_end_us long"
    )
    got = {(r.l_id, r.r_id): r.overlap_us
           for r in bucketed_interval_join(lf, rf, bucket_us=4).collect()}
    # closed semantics: touching at 10 overlaps with 0 us; 11 does not
    assert got == {(1, 2): 0}


def test_user_sessions_bounds_and_gap(spark):
    from datetime import datetime

    from careers_spark.operators.temporal import user_sessions

    def ev(i, u, mins):
        return (i, u, datetime(2024, 1, 1, mins // 60, mins % 60))

    rows = [
        ev(1, 7, 0), ev(2, 7, 10), ev(3, 7, 20),   # session 1
        ev(4, 7, 60), ev(5, 7, 65),                 # 40min gap -> session 2
        ev(6, 9, 5),                                # single-event session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_id): (r.l_start_us, r.l_end_us, r.n_events)
        for r in user_sessions(df, gap_s=1800).collect()
    }
    base = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    m = 60_000_000
    assert got[(7, 1)] == (base, base + 20 * m, 3)
    assert got[(7, 2)] == (base + 60 * m, base + 65 * m, 2)
    assert got[(9, 1)] == (base + 5 * m, base + 5 * m, 1)


def test_forecast_backtest_hand_golden(spark):
    from datetime import datetime

    from careers_spark.operators.temporal import forecast_backtest

    # counts at consecutive hours 0..5; window=2, season=3:
    # f(h) = x(h-1)/2 + x(h-2)/4; scored hours need BOTH full-forecast
    # contributions present (inner join keeps any hour with >= 1
    # contribution; here hours 1..5 get one or two) AND x(h-3)
    def rows_at(h, n):
        return [(h * 100 + i, datetime(2024, 1, 1, h), "a") for i in range(n)]

    counts = {0: 4, 1: 2, 2: 6, 3: 4, 4: 8, 5: 2}
    data = [r for h, n in counts.items() for r in rows_at(h, n)]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string"
    )
    r = forecast_backtest(df, window=2, season=3).collect()[0]
    # scored hours: 3, 4, 5 (seasonal ancestor exists; forecast rows
    # exist from the fan-out)
    f = {h: counts[h - 1] / 2 + counts[h - 2] / 4 for h in (3, 4, 5)}
    e_ewma = [abs(counts[h] - f[h]) for h in (3, 4, 5)]
    e_naive = [abs(counts[h] - counts[h - 3]) for h in (3, 4, 5)]
    assert r.n_scored == 3
    assert r.mae_ewma == sum(e_ewma) / 3
    assert r.mae_naive == sum(e_naive) / 3
    from decimal import ROUND_HALF_UP, Decimal

    want_mase = float(
        Decimal(repr(sum(e_ewma) / sum(e_naive))).quantize(
            Decimal("1e-6"), ROUND_HALF_UP
        )
    )
    assert r.mase == want_mase


def test_forecast_backtest_zero_naive_error_null(spark):
    from datetime import datetime

    from careers_spark.operators.temporal import forecast_backtest

    # perfectly periodic series: seasonal-naive error is 0 -> NULL mase
    data = [
        (h * 10 + i, datetime(2024, 1, 1, h), "a")
        for h in range(6)
        for i in range(3)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string"
    )
    r = forecast_backtest(df, window=2, season=1).collect()[0]
    assert r.mase is None and r.mae_naive == 0.0


def test_burstiness_clockwork_vs_bursty(spark):
    """Clockwork arrivals -> sigma=0 -> B=-1, cv=0; a burst-and-gap
    pattern -> B>0; hand-checked Goh-Barabasi values."""
    import datetime as dt
    import math

    from careers_spark.operators.temporal import interarrival_burstiness

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: perfectly regular, 60s apart (5 events -> 4 gaps of 60)
    for i in range(5):
        rows.append((i, t0 + dt.timedelta(seconds=60 * i), 1))
    # user 2: burst of 3 at 1s gaps, then a 3600s silence, then one more
    offs = [0, 1, 2, 3602]
    for j, o in enumerate(offs):
        rows.append((100 + j, t0 + dt.timedelta(seconds=o), 2))
    # user 3: single event -> no gaps -> absent from output
    rows.append((200, t0, 3))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        r.user_id: r for r in interarrival_burstiness(df, min_gaps=2).collect()
    }
    r1 = got[1]
    assert (r1.n_gaps, r1.mean_gap_s, r1.cv, r1.burstiness) == (4, 60.0, 0.0, -1.0)
    r2 = got[2]
    gaps = [1, 1, 3600]
    n, sd, sd2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
    sig = math.sqrt(n * sd2 - sd * sd)
    assert r2.n_gaps == 3
    assert r2.mean_gap_s == round(sd / n, 6)
    assert r2.cv == round(sig / sd, 6)
    assert r2.burstiness == round((sig - sd) / (sig + sd), 6)
    assert r2.burstiness > 0  # bursty side of the Poisson point
    assert 3 not in got


def test_burstiness_min_gaps_guard_and_poisson_band(spark):
    """A single gap reports NULL cv/B; md5-spread arrivals (approx
    exponential ranks) land in a sane band around B ~ 0."""
    import datetime as dt

    from careers_spark.operators.temporal import interarrival_burstiness

    t0 = dt.datetime(2024, 1, 1)
    rows = [(0, t0, 7), (1, t0 + dt.timedelta(seconds=50), 7)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    (r,) = interarrival_burstiness(df, min_gaps=2).collect()
    assert r.n_gaps == 1 and r.cv is None and r.burstiness is None
    assert r.mean_gap_s == 50.0


def test_rolling_median_hand_frames(spark):
    """Trailing 3-day median per key: frames, peers, and the
    interpolated even-count convention — hand values."""
    import datetime as dt

    from careers_spark.operators.temporal import rolling_median

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 7: days 0,1,2,4 with values 10, 30, 20, 100
        (1, t0, 7, 10.0),
        (2, t0 + dt.timedelta(days=1), 7, 30.0),
        (3, t0 + dt.timedelta(days=2), 7, 20.0),
        (4, t0 + dt.timedelta(days=4), 7, 100.0),
        # same-day peers for user 8: both rows in one frame
        (5, t0, 8, 1.0),
        (6, t0, 8, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r.user_id, r.day): (r.n_in_window, r.median_val)
        for r in rolling_median(df, window_days=3).collect()
    }
    d0 = (t0 - dt.datetime(1970, 1, 1)).days
    assert got[(7, d0)] == (1, 10.0)
    assert got[(7, d0 + 1)] == (2, 20.0)        # (10+30)/2
    assert got[(7, d0 + 2)] == (3, 20.0)        # median(10,30,20)
    # day 4's trailing-3 frame covers days 2..4 only -> (20, 100)
    assert got[(7, d0 + 4)] == (2, 60.0)
    assert got[(8, d0)] == (2, 2.0)             # same-day peers
    assert len(got) == 5  # one row per (key, day)


def test_rolling_median_robust_to_spike(spark):
    """The monitoring property: a one-day spike drags the rolling mean
    but not the rolling median."""
    import datetime as dt

    from careers_spark.operators.temporal import rolling_median

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, 10.0 if i != 3 else 10000.0)
        for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    meds = {
        r.day: r.median_val
        for r in rolling_median(df, window_days=7).collect()
    }
    assert all(m == 10.0 for m in meds.values())


def _ts_day(d):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d)


def test_theil_sen_hand_golden(spark):
    """Days with volumes 1,2,3,100: six pairwise slopes
    {1,1,33,1,49,97} -> median (1+33)/2 = 17 beats OLS, which the
    spike drags far higher."""
    from careers_spark.operators.temporal import theil_sen_slopes, trend_slopes

    rows = []
    for d, n in [(0, 1), (1, 2), (2, 3), (3, 100)]:
        rows += [("g", _ts_day(d))] * n
    df = spark.createDataFrame(rows, "grp string, ts timestamp")
    (r,) = theil_sen_slopes(df, dims=["grp"]).collect()
    assert (r.n_days, r.n_pairs) == (4, 6)
    assert r.ts_slope == 17.0
    (ols,) = trend_slopes(df, dims=["grp"]).collect()
    assert ols.slope_per_day > 25


def test_theil_sen_python_lockstep_by_dim(spark):
    import statistics

    from careers_spark.operators.temporal import theil_sen_slopes

    rng = random.Random(41)
    counts = {
        (g, d): rng.randrange(1, 30) for g in ("a", "b") for d in range(12)
    }
    rows = [
        (g, _ts_day(d))
        for (g, d), n in counts.items()
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "grp string, ts timestamp")
    got = {r.grp: r for r in theil_sen_slopes(df, dims=["grp"]).collect()}
    for g in ("a", "b"):
        slopes = sorted(
            (counts[(g, db)] - counts[(g, da)]) / (db - da)
            for da in range(12)
            for db in range(da + 1, 12)
        )
        want = round(statistics.median(slopes), 9)
        assert got[g].n_days == 12 and got[g].n_pairs == 66
        assert got[g].ts_slope == want


def test_theil_sen_single_day_null(spark):
    from careers_spark.operators.temporal import theil_sen_slopes

    df = spark.createDataFrame([(_ts_day(0),), (_ts_day(0),)], "ts timestamp")
    (r,) = theil_sen_slopes(df, dims=[]).collect()
    assert (r.n_days, r.n_pairs, r.ts_slope) == (1, 0, None)


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """Plant y = 10 + hod%4 (pure period-4 cycle, flat trend): the
    decomposition recovers trend ~ constant, the centered seasonal
    profile, and ~0 residuals away from the edges."""
    from careers_spark.operators.temporal import seasonal_decompose

    rows = []
    for h in range(40):
        n = 10 + (h % 4)
        rows += [(_ts_day(0) + dt.timedelta(hours=h),)] * n
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r.h - min(x.h for x in seasonal_decompose(df, period=4).collect()): r
           for r in seasonal_decompose(df, period=4).collect()}
    mid = got[10]
    assert mid.y == 10 + (mid.hod % 4)
    assert mid.trend == 11.5  # mean of 10,11,12,13
    # centered seasonal: hod offsets {0,1,2,3} - 1.5
    assert mid.seasonal == (mid.hod % 4) - 1.5
    assert mid.residual == 0.0
    # edges: first half-window has no trend
    assert got[0].trend is None and got[0].residual is None


def test_seasonal_decompose_python_lockstep(spark):
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.temporal import seasonal_decompose

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    rng = random.Random(61)
    counts = {h: rng.randrange(1, 20) for h in range(60)}
    rows = [
        (_ts_day(0) + dt.timedelta(hours=h),)
        for h, n in counts.items()
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = seasonal_decompose(df, period=6).collect()
    h0 = min(r.h for r in out)
    got = {r.h - h0: r for r in out}
    y = [counts.get(h, 0) for h in range(60)]
    trend = {}
    for i in range(60):
        lo, hi = i - 2, i + 3
        if lo >= 0 and hi < 60:
            trend[i] = r6(sum(y[lo:hi + 1]) / 6)
    dq = {i: round((y[i] - trend[i]) * 1e6) for i in trend}
    import statistics
    sq = {}
    for hod in range(6):
        vals = [d for i, d in dq.items() if i % 6 == hod]
        sq[hod] = int(
            Decimal(repr(sum(vals) / len(vals))).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
    c = int(
        Decimal(repr(statistics.mean(sq.values()))).quantize(
            Decimal("1"), ROUND_HALF_UP
        )
    )
    for i in range(60):
        r = got[i]
        assert r.y == y[i]
        if i in trend:
            assert r.trend == trend[i]
            want_s = r6((sq[i % 6] - c) / 1e6)
            assert r.seasonal == want_s
            assert r.residual == r6(y[i] - trend[i] - want_s)
        else:
            assert r.trend is None and r.residual is None
