"""causal operators — hand goldens + python lockstep.

did_lift / exact_matching_att / ips_policy_eval
"""

import hashlib
import math
import random
from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal


def _r(x: float, nd: int) -> float:
    """Spark/DuckDB round(): decimal HALF_UP on the shortest repr."""
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


def _arm(uid: int, salt: str = "did") -> int:
    return int(hashlib.md5(f"{uid}|{salt}".encode()).hexdigest()[:8], 16) % 2


CUT = "2024-01-16"
_CUT_DT = datetime(2024, 1, 16)


def _ev(uid, day, etype, value):
    return (uid, datetime(2024, 1, day, 12, 0, 0), etype, float(value))


_EV_SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _python_did(rows):
    """Lockstep recompute of did_lift on (uid, ts, etype, value) rows."""
    per = {}
    for uid, ts, etype, value in rows:
        pre, post = per.setdefault(uid, [0, 0])
        if etype == "purchase":
            c = int(Decimal(repr(value * 100)).quantize(Decimal("1"), ROUND_HALF_UP))
            if ts < _CUT_DT:
                per[uid][0] += c
            else:
                per[uid][1] += c
    d = {0: [], 1: []}
    for uid, (pre, post) in per.items():
        d[_arm(uid)].append(post - pre)
    n0, n1 = len(d[0]), len(d[1])
    sd0, sd1 = sum(d[0]), sum(d[1])
    did = _r(sd1 / n1 - sd0 / n0, 6)
    ssd0 = sum(x * x for x in d[0])
    ssd1 = sum(x * x for x in d[1])
    v0 = (ssd0 - sd0 * sd0 / n0) / (n0 - 1)
    v1 = (ssd1 - sd1 * sd1 / n1) / (n1 - 1)
    se2 = v1 / n1 + v0 / n0
    t = None if se2 == 0 else _r((sd1 / n1 - sd0 / n0) / math.sqrt(se2), 6)
    return n0, n1, did, t


def test_did_lockstep_random(spark):
    from careers_spark.operators.causal import did_lift

    rng = random.Random(7)
    rows = []
    for uid in range(40):
        for _ in range(rng.randint(1, 6)):
            day = rng.randint(1, 30)
            etype = rng.choice(["purchase", "view", "click"])
            value = rng.randint(1, 9999) / 100.0
            rows.append(_ev(uid, day, etype, value))
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    got = did_lift(df, CUT).collect()[0]
    n0, n1, did, t = _python_did(rows)
    assert (got.n_0, got.n_1) == (n0, n1)
    assert got.did_cents == did
    assert got.t_stat == t


def test_did_parallel_trend_cancels(spark):
    """A post-period bump every unit receives (a shared time trend)
    leaves the DiD estimate unchanged."""
    from careers_spark.operators.causal import did_lift

    rng = random.Random(11)
    base = []
    for uid in range(30):
        base.append(_ev(uid, rng.randint(1, 15), "purchase", rng.randint(1, 500) / 100.0))
        base.append(_ev(uid, rng.randint(16, 30), "purchase", rng.randint(1, 500) / 100.0))
    bumped = base + [_ev(uid, 20, "purchase", 7.00) for uid in range(30)]
    d1 = did_lift(spark.createDataFrame(base, _EV_SCHEMA), CUT).collect()[0]
    d2 = did_lift(spark.createDataFrame(bumped, _EV_SCHEMA), CUT).collect()[0]
    assert d1.did_cents == d2.did_cents
    # ... while a treated-only bump moves it by exactly the bump size
    treated = [u for u in range(30) if _arm(u) == 1]
    t_bumped = base + [_ev(uid, 20, "purchase", 7.00) for uid in treated]
    d3 = did_lift(spark.createDataFrame(t_bumped, _EV_SCHEMA), CUT).collect()[0]
    assert d3.did_cents == _r(d1.did_cents + 700.0, 6)


def test_did_panel_membership_is_outcome_free(spark):
    """Units with only non-conversion events still sit in the panel
    with d = 0 (no selection on the dependent variable)."""
    from careers_spark.operators.causal import did_lift

    rows = [_ev(u, 5, "purchase", 1.00) for u in range(8)] + [
        _ev(u, 25, "view", 3.00) for u in range(8, 20)
    ]
    got = did_lift(spark.createDataFrame(rows, _EV_SCHEMA), CUT).collect()[0]
    assert got.n_0 + got.n_1 == 20


# ---------------------------------------------------------------------------
_UNIT_SCHEMA = "cell string, treat int, y_cents long"


def test_matching_hand_golden(spark):
    from careers_spark.operators.causal import exact_matching_att

    rows = [
        # cell A: treated mean 200, control mean 100 -> diff 100
        ("A", 1, 300),
        ("A", 1, 100),
        ("A", 0, 100),
        # cell B: treated mean 500, control mean 300 -> diff 200
        ("B", 1, 500),
        ("B", 0, 200),
        ("B", 0, 400),
        # cell C: treated only -> unmatched, excluded
        ("C", 1, 999),
        # cell D: control only -> contributes nothing
        ("D", 0, 5),
    ]
    df = spark.createDataFrame(rows, _UNIT_SCHEMA)
    got = exact_matching_att(df, ["cell"]).collect()[0]
    assert got.n_cells_matched == 2
    assert got.n_treated_matched == 3
    assert got.n_control_matched == 3
    assert got.n_treated_unmatched == 1
    # ATT = (100 * 2 + 200 * 1) / 3
    assert got.att_cents == _r(400 / 3, 6)


def test_matching_no_overlap_null(spark):
    from careers_spark.operators.causal import exact_matching_att

    rows = [("A", 1, 100), ("B", 0, 200)]
    df = spark.createDataFrame(rows, _UNIT_SCHEMA)
    got = exact_matching_att(df, ["cell"]).collect()[0]
    assert got.n_cells_matched == 0
    assert got.n_treated_unmatched == 1
    assert got.att_cents is None


def test_matching_weighting_by_treated_count(spark):
    """A cell with 3x the treated units gets 3x the weight."""
    from careers_spark.operators.causal import exact_matching_att

    rows = (
        [("A", 1, 100)] * 3
        + [("A", 0, 0)]
        + [("B", 1, 500), ("B", 0, 0)]
    )
    df = spark.createDataFrame(rows, _UNIT_SCHEMA)
    got = exact_matching_att(df, ["cell"]).collect()[0]
    assert got.att_cents == _r((100 * 3 + 500 * 1) / 4, 6)


# ---------------------------------------------------------------------------
_DEC_SCHEMA = "ctx int, action string, r_cents long"


def _python_ips(rows, target):
    """Lockstep: rows = (ctx, action, r_cents); target = dict ctx->action."""
    cnt, m, r = {}, {}, {}
    for ctx, a, rc in rows:
        cnt[a] = cnt.get(a, 0) + 1
        if target[ctx] == a:
            m[a] = m.get(a, 0) + 1
            r[a] = r.get(a, 0) + rc
    sv = sum(
        int(
            Decimal(repr(_r(r.get(a, 0) / (cnt[a] * 100.0), 9) * 1e9)).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
        for a in cnt
    )
    sw = sum(
        int(
            Decimal(repr(_r(m.get(a, 0) / cnt[a], 9) * 1e9)).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
        for a in cnt
    )
    ips = _r(sv / 1e9, 6)
    snips = None if sw == 0 else _r(sv / sw, 6)
    return ips, snips


def test_ips_hand_golden_full_coverage(spark):
    """Target always plays 'x'; IPS reduces to mean reward of the 'x'
    rows and SNIPS agrees exactly."""
    from careers_spark.operators.causal import ips_policy_eval

    rows = [(0, "x", 100), (0, "x", 200), (0, "y", 1000), (0, "y", 1000)]
    df = spark.createDataFrame(rows, _DEC_SCHEMA)
    got = ips_policy_eval(df, "'x'").collect()[0]
    assert (got.n, got.n_matched) == (4, 2)
    assert got.match_rate == 0.5
    assert got.ips_value == 1.5  # (100+200)/(2 rows of x)/100 dollars
    assert got.snips_value == 1.5


def test_ips_no_match_null_snips(spark):
    from careers_spark.operators.causal import ips_policy_eval

    rows = [(0, "x", 100), (0, "y", 50)]
    df = spark.createDataFrame(rows, _DEC_SCHEMA)
    got = ips_policy_eval(df, "'z'").collect()[0]
    assert got.n_matched == 0
    assert got.ips_value == 0.0
    assert got.snips_value is None


def test_ips_lockstep_random(spark):
    from careers_spark.operators.causal import ips_policy_eval

    rng = random.Random(23)
    actions = ["view", "click", "purchase"]
    rows = [
        (rng.randint(0, 2), rng.choice(actions), rng.randint(0, 5000))
        for _ in range(300)
    ]
    target = {0: "purchase", 1: "click", 2: "view"}
    case = (
        "case when ctx = 0 then 'purchase' "
        "when ctx = 1 then 'click' else 'view' end"
    )
    df = spark.createDataFrame(rows, _DEC_SCHEMA)
    got = ips_policy_eval(df, case).collect()[0]
    ips, snips = _python_ips(rows, target)
    assert got.ips_value == ips
    assert got.snips_value == snips


# ---------------------------------------------------------------------------
# training_feature_snapshot (driver-query composition; legs are the
# tested asof_join / windowed_count_join / prior-spend window)


def test_feature_snapshot_is_leakage_free(spark, tmp_path):
    import __spark_entry__ as E

    rows = [
        # user 1: click 10:00, purchase 11:30 ($2), purchase 12:00 ($3,
        # with a click AT 12:00 exactly -> strictly-earlier excludes it)
        (1, 1, datetime(2024, 1, 5, 10, 0, 0), "click", 0.10),
        (2, 1, datetime(2024, 1, 5, 11, 30, 0), "purchase", 2.00),
        (3, 1, datetime(2024, 1, 5, 12, 0, 0), "click", 0.10),
        (4, 1, datetime(2024, 1, 5, 12, 0, 0), "purchase", 3.00),
        # user 2: purchase with no clicks ever
        (5, 2, datetime(2024, 1, 6, 9, 0, 0), "purchase", 7.00),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r.event_id: r
        for r in E.queries()["training_feature_snapshot"](spark, d).collect()
    }
    # purchase 2: click 90 min earlier; no prior spend
    assert got[2].gap_since_click_us == 90 * 60 * 1_000_000
    assert got[2].prior_spend_cents == 0
    assert got[2].n_clicks_1h == 0  # click is 90 min back, outside 1h
    # purchase 4: the same-ts click is NOT visible (strict as-of), so
    # the gap reaches back to 10:00; prior spend = purchase 2 only
    assert got[4].gap_since_click_us == 120 * 60 * 1_000_000
    assert got[4].prior_spend_cents == 200
    assert got[4].n_clicks_1h == 0
    # purchase 5: no click ever -> NULL gap, zero features
    assert got[5].gap_since_click_us is None
    assert got[5].prior_spend_cents == 0 and got[5].n_clicks_1h == 0
