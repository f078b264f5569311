"""Goldens for funnel.multi_touch_attribution and funnel.rfm_segments."""

from datetime import datetime, timedelta

import numpy as np

from careers_spark.operators.funnel import multi_touch_attribution, rfm_segments

T0 = datetime(2024, 1, 10, 12, 0, 0)
DAY_US = 86_400_000_000


def _ev(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_offset, value)"""
    return spark.createDataFrame(
        [
            (eid, T0 + timedelta(seconds=off), uid, et, float(v), "{}")
            for eid, uid, et, off, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_attribution_hand_golden(spark):
    ev = _ev(
        spark,
        [
            (1, 100, "click", 0, 1.0),
            (2, 100, "click", 60, 1.0),
            (3, 100, "purchase", 120, 10.0),
        ],
    )
    got = {
        r["touch_id"]: (
            r["credit_first_cents"],
            r["credit_last_cents"],
            r["credit_linear"],
        )
        for r in multi_touch_attribution(ev).collect()
    }
    assert got == {1: (1000, 0, 500.0), 2: (0, 1000, 500.0)}


def test_attribution_window_boundaries_and_ties(spark):
    w = 3600_000_000  # 1h window for a tight boundary check
    ev = _ev(
        spark,
        [
            # click exactly at purchase ts: EXCLUDED (strict <)
            (1, 7, "click", 3600, 1.0),
            # click exactly at ts - W: INCLUDED (>=)
            (2, 7, "click", 0, 1.0),
            # equal-ts pair: first -> smaller id, last -> larger id
            (3, 7, "click", 100, 1.0),
            (4, 7, "click", 100, 1.0),
            (5, 7, "purchase", 3600, 6.0),
            # zero-touch purchase: absent from output
            (6, 8, "purchase", 50, 9.0),
        ],
    )
    rows = multi_touch_attribution(ev, window_us=w).collect()
    got = {
        r["touch_id"]: (r["credit_first_cents"], r["credit_last_cents"])
        for r in rows
    }
    assert set(got) == {2, 3, 4}
    assert got[2] == (600, 0)  # earliest
    assert got[4] == (0, 600)  # equal-ts tie: last takes larger id
    assert got[3] == (0, 0)
    assert all(r["credit_linear"] == 200.0 for r in rows)
    assert not [r for r in rows if r["conv_id"] == 6]


def test_attribution_matches_inequality_join(spark):
    # seeded random corpus; band-bucketed candidates must equal the
    # straightforward range-join ground truth
    rng = np.random.default_rng(42)
    rows = []
    eid = 0
    for uid in range(12):
        for _ in range(30):
            eid += 1
            et = "click" if rng.random() < 0.6 else "purchase"
            rows.append((eid, uid, et, int(rng.integers(0, 5 * 86400)), 2.0))
    ev = _ev(spark, rows)
    got = sorted(
        (r["conv_id"], r["touch_id"])
        for r in multi_touch_attribution(ev, window_us=DAY_US).collect()
    )
    base = {
        (eid, uid, et, off)
        for eid, uid, et, off, _ in rows
    }
    want = sorted(
        (ce, te)
        for ce, cu, cet, coff in base
        if cet == "purchase"
        for te, tu, tet, toff in base
        if tet == "click"
        and tu == cu
        and coff - 86400 <= toff < coff
    )
    assert got == want


def test_rfm_lockstep_and_boundaries(spark):
    rows = []
    eid = 0
    rng = np.random.default_rng(7)
    for uid in range(20):
        for _ in range(int(rng.integers(1, 8))):
            eid += 1
            rows.append(
                (eid, uid, "purchase", int(rng.integers(0, 30 * 86400)),
                 float(rng.integers(1, 500)) / 10)
            )
    ev = _ev(spark, rows)
    got = {r["user_id"]: r.asDict() for r in rfm_segments(ev).collect()}

    # python recompute
    per_user = {}
    for _, uid, _, off, v in rows:
        m = per_user.setdefault(uid, {"last": -1, "f": 0, "m": 0})
        m["last"] = max(m["last"], off)
        m["f"] += 1
        m["m"] += round(v * 100)
    ref = max(m["last"] for m in per_user.values())
    for m in per_user.values():
        m["r"] = (ref - m["last"]) * 1_000_000 // DAY_US

    def q(vals, p):
        return round(float(np.percentile(vals, p, method="linear")), 6)

    rv = [m["r"] for m in per_user.values()]
    fv = [m["f"] for m in per_user.values()]
    mv = [m["m"] for m in per_user.values()]
    for uid, m in per_user.items():
        r_s = 1 + sum(m["r"] <= q(rv, p) for p in (25, 50, 75))
        f_s = 1 + sum(m["f"] >= q(fv, p) for p in (75, 50, 25))
        m_s = 1 + sum(m["m"] >= q(mv, p) for p in (75, 50, 25))
        g = got[uid]
        assert (g["recency_days"], g["frequency"], g["monetary_cents"]) == (
            m["r"], m["f"], m["m"],
        )
        assert (g["r_score"], g["f_score"], g["m_score"]) == (r_s, f_s, m_s)
        assert g["segment"] == r_s * 100 + f_s * 10 + m_s
    assert set(got) == set(per_user)
