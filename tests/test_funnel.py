"""Ordered funnel + cohort retention (funnel.py)."""

import datetime as dt

from careers_spark.operators.funnel import (
    WEEK_US,
    cohort_retention,
    funnel_summary,
    funnel_user_stages,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_ordering_golden(spark):
    """Strict ordering: pre-stage events, same-timestamp chains, and
    out-of-order later stages must all be excluded."""
    ev = _ev(spark, [
        # user 1: clean full funnel
        (1, "view", _ts(10)), (1, "click", _ts(20)), (1, "purchase", _ts(30)),
        # user 2: click BEFORE the view doesn't count; click AT the view
        # ts doesn't chain (strict >); purchase at 12 precedes t2=15
        (2, "click", _ts(5)), (2, "view", _ts(10)), (2, "click", _ts(10)),
        (2, "click", _ts(15)), (2, "purchase", _ts(12)),
        # user 3: purchase first, then view, never clicks
        (3, "purchase", _ts(1)), (3, "view", _ts(2)),
        # user 4: never views -> not in the funnel at all
        (4, "click", _ts(1)), (4, "purchase", _ts(2)),
    ])
    base = int(T0.timestamp()) * 1_000_000
    got = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in funnel_user_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (base + 10e6, base + 20e6, base + 30e6)
    assert got[2] == (base + 10e6, base + 15e6, None)
    assert got[3] == (base + 2e6, None, None)

    s = {
        r.stage: (r.stage_idx, r.n_users, r.conv_from_prev, r.total_lag_us)
        for r in funnel_summary(ev, ["view", "click", "purchase"]).collect()
    }
    assert s["view"] == (1, 3, 1.0, 0)
    assert s["click"] == (2, 2, round(2 / 3, 6), 10_000_000 + 5_000_000)
    assert s["purchase"] == (3, 1, 0.5, 20_000_000)


def test_funnel_empty_later_stage(spark):
    ev = _ev(spark, [(1, "view", _ts(1))])
    s = {r.stage: (r.n_users, r.conv_from_prev, r.total_lag_us) for r in
         funnel_summary(ev, ["view", "click", "purchase"]).collect()}
    assert s["view"] == (1, 1.0, 0)
    assert s["click"] == (0, 0.0, 0)
    # conversion OUT of an empty stage is undefined -> NULL, not 0/0
    assert s["purchase"] == (0, None, 0)


def test_cohort_retention_grid(spark):
    wk = lambda w, s=0: T0 + dt.timedelta(days=7 * w, seconds=s)  # noqa: E731
    ev = _ev(spark, [
        (1, "view", wk(0)), (1, "click", wk(1)), (1, "view", wk(3)),
        (2, "view", wk(1)), (2, "click", wk(1, 30)), (2, "view", wk(2)),
        (3, "view", wk(0, 5)),
    ])
    w0 = (int(T0.timestamp()) * 1_000_000) // WEEK_US
    got = {
        (r.cohort_week, r.offset_weeks): r.n_active
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        (w0, 0): 2, (w0, 1): 1, (w0, 3): 1,     # users 1, 3
        (w0 + 1, 0): 1, (w0 + 1, 1): 1,         # user 2 (dup week deduped)
    }


def test_event_transitions_hand_golden(spark):
    import datetime as dt

    from careers_spark.operators.funnel import event_transitions

    d0 = dt.datetime(2024, 1, 1)

    def t(m):
        return d0 + dt.timedelta(minutes=m)

    ev = spark.createDataFrame(
        [
            # user 1: view -> click -> view   user 2: view -> view
            (1, t(0), 10, "view"), (2, t(1), 10, "click"), (3, t(2), 10, "view"),
            (4, t(0), 20, "view"), (5, t(1), 20, "view"),
            # user 3: single event -> no hop
            (6, t(0), 30, "click"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        (r.from_event, r.to_event): (r.n, r.p)
        for r in event_transitions(ev).collect()
    }
    # hops: view->click (u1), click->view (u1), view->view (u2)
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_event_transitions_tiebreak_deterministic(spark):
    import datetime as dt

    from careers_spark.operators.funnel import event_transitions

    d0 = dt.datetime(2024, 1, 1)
    # equal timestamps: order by event_id -> a(1) -> b(2) -> c(3)
    ev = spark.createDataFrame(
        [(1, d0, 5, "a"), (2, d0, 5, "b"), (3, d0, 5, "c")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {(r.from_event, r.to_event) for r in event_transitions(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_conversion_latency_hand_golden(spark):
    import datetime as dt

    from careers_spark.operators.funnel import conversion_latency

    d0 = dt.datetime(2024, 1, 1)

    def t(s):
        return d0 + dt.timedelta(seconds=s)

    # delays view->click: u1=10s, u2=20s, u3=40s; u4 never clicks
    ev = spark.createDataFrame(
        [
            (1, t(0), 1, "view"), (2, t(10), 1, "click"),
            (3, t(0), 2, "view"), (4, t(20), 2, "click"),
            (5, t(0), 3, "view"), (6, t(40), 3, "click"),
            (7, t(0), 4, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    rows = conversion_latency(ev, ["view", "click"]).collect()
    got = {r.q: (r.n_users, r.latency_s) for r in rows}
    assert all(r.hop == "view->click" for r in rows)
    # sorted delays [10, 20, 40]: p25=15, p50=20, p75=30, p90=36
    assert got[0.25] == (3, 15.0)
    assert got[0.5] == (3, 20.0)
    assert got[0.75] == (3, 30.0)
    assert got[0.9] == (3, 36.0)


def test_top_journeys_golden(spark):
    import datetime as dt

    from careers_spark.operators.funnel import top_journeys

    d0 = dt.datetime(2024, 1, 1)

    def t(m):
        return d0 + dt.timedelta(minutes=m)

    ev = spark.createDataFrame(
        [
            (1, t(0), 1, "view"), (2, t(1), 1, "click"),
            (3, t(0), 2, "view"), (4, t(1), 2, "click"),
            (5, t(0), 3, "view"),
            # user 4: same-ts ordering by event_id -> view>click
            (7, t(0), 4, "click"), (6, t(0), 4, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = [(r.journey, r.n_users, r.rank) for r in top_journeys(ev).collect()]
    # user 4: equal ts -> event_id order = (6 view, 7 click) = view>click
    assert got == [("view>click", 3, 1), ("view", 1, 2)]


def test_top_journeys_truncates_max_steps(spark):
    import datetime as dt

    from careers_spark.operators.funnel import top_journeys

    d0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, d0 + dt.timedelta(minutes=i), 1, f"e{i}") for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = top_journeys(ev, max_steps=3).collect()[0]
    assert got.journey == "e0>e1>e2"


def test_ab_conversion_known_counts(spark):
    """Hand-assigned variants (salt-pinned md5 draw replicated in
    python) with known conversions; z cross-checked against the
    textbook pooled formula."""
    import hashlib
    import math

    from careers_spark.operators.funnel import ab_conversion_test

    def variant(u, salt="ab"):
        return int(
            hashlib.md5(f"{u}|{salt}".encode()).hexdigest()[:8], 16
        ) % 2

    rows = []
    eid = 0
    for u in range(40):
        rows.append((eid, u, "view")); eid += 1
        # variant-1 users convert twice as often
        if (variant(u) == 1 and u % 2 == 0) or (variant(u) == 0 and u % 4 == 0):
            rows.append((eid, u, "purchase")); eid += 1
    e = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    r = ab_conversion_test(e).collect()[0]

    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    conv = {u for _, u, t in rows if t == "purchase"}
    for u in range(40):
        v = variant(u)
        n[v] += 1
        c[v] += u in conv
    assert (r.n_0, r.c_0, r.n_1, r.c_1) == (n[0], c[0], n[1], c[1])
    p = (c[0] + c[1]) / (n[0] + n[1])
    z = (c[1] / n[1] - c[0] / n[0]) / math.sqrt(
        p * (1 - p) * (1 / n[0] + 1 / n[1])
    )
    assert r.z == round(z, 6)
    assert r.rate_0 == round(c[0] / n[0], 6)
    assert r.lift == round((c[1] / n[1]) / (c[0] / n[0]) - 1, 6)


def test_ab_conversion_user_level_not_event_level(spark):
    """A user purchasing 5 times converts ONCE — the unit of analysis
    is the randomization unit."""
    from careers_spark.operators.funnel import ab_conversion_test

    rows = [(i, 1, "purchase") for i in range(5)] + [(10, 2, "view")]
    e = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    r = ab_conversion_test(e).collect()[0]
    assert r.c_0 + r.c_1 == 1 and r.n_0 + r.n_1 == 2


def test_ab_conversion_degenerate_pool_is_null(spark):
    from careers_spark.operators.funnel import ab_conversion_test

    # nobody converts -> pooled p = 0 -> z NULL, never 0/0
    rows = [(i, i, "view") for i in range(10)]
    e = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    r = ab_conversion_test(e).collect()[0]
    assert r.z is None and r.c_0 == 0 and r.c_1 == 0


def test_sequential_pattern_support_gaps_and_ties(spark):
    """Subsequence (gaps allowed) vs adjacency; simultaneous events
    support nothing; support counts each actor once."""
    import datetime as dt

    from careers_spark.operators.funnel import sequential_pattern_support

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: view .. click .. view .. purchase (gap between
        # click and purchase — still click->purchase)
        (1, "view", ts(0)), (1, "click", ts(10)),
        (1, "view", ts(20)), (1, "purchase", ts(30)),
        # user 2: click and purchase SIMULTANEOUS -> no support either way
        (2, "click", ts(5)), (2, "purchase", ts(5)),
        # user 3: purchase then click (reverse order only)
        (3, "purchase", ts(1)), (3, "click", ts(9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r.ante, r.cons): (r.n_actors, r.support_frac)
        for r in sequential_pattern_support(df, min_support=1).collect()
    }
    assert got[("click", "purchase")] == (1, round(1 / 3, 6))
    assert got[("purchase", "click")] == (1, round(1 / 3, 6))
    assert got[("view", "purchase")] == (1, round(1 / 3, 6))
    assert ("click", "click") not in got  # ante != cons
    # user 1 supports view->click once despite two views
    assert got[("view", "click")] == (1, round(1 / 3, 6))


def test_sequential_pattern_min_support_filter(spark):
    import datetime as dt

    from careers_spark.operators.funnel import sequential_pattern_support

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(4):
        rows.append((u, "a", t0))
        rows.append((u, "b", t0 + dt.timedelta(seconds=1)))
    rows.append((9, "b", t0))
    rows.append((9, "c", t0 + dt.timedelta(seconds=1)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r.ante, r.cons): r.n_actors
        for r in sequential_pattern_support(df, min_support=2).collect()
    }
    assert got == {("a", "b"): 4}  # b->c support 1 filtered


def test_markov_attribution_single_path_channel(spark):
    """Only journeys through 'click' ever convert -> click carries the
    entire removal mass; a channel that only dead-ends gets ~0."""
    import datetime as dt

    from careers_spark.operators.funnel import markov_attribution

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = []
    eid = 0
    # 3 users: view -> click -> purchase
    for u in range(3):
        for i, et in enumerate(["view", "click", "purchase"]):
            rows.append((eid, u, ts(i), et))
            eid += 1
    # 2 users: view only (NULL absorb)
    for u in (10, 11):
        rows.append((eid, u, ts(0), "view"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r.channel: r
        for r in markov_attribution(df, ["view", "click"]).collect()
    }
    # removing click kills all conversion; removing view also does here
    # (every path starts with view), so both removals equal p_base and
    # attribution splits 50/50
    assert got["click"].p_without_fp == 0
    assert got["view"].p_without_fp == 0
    assert got["click"].removal_effect == 1.0
    assert got["click"].attribution == 0.5 and got["view"].attribution == 0.5
    assert got["click"].p_base_fp == got["view"].p_base_fp > 0


def test_markov_attribution_matches_python_unroll(spark):
    """Lockstep with an independent integer value-iteration recompute
    on a branching graph (some users bypass click), and
    post-conversion events are ignored."""
    import datetime as dt

    from careers_spark.operators.funnel import markov_attribution

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    journeys = {
        0: ["view", "click", "purchase", "view"],  # tail ignored
        1: ["view", "purchase"],
        2: ["view", "click"],
        3: ["click", "purchase"],
        4: ["view"],
        5: ["view", "click", "view", "purchase"],
    }
    rows = []
    eid = 0
    for u, seq in journeys.items():
        for i, et in enumerate(seq):
            rows.append((eid, u, ts(i), et))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    channels = ["view", "click"]
    got = {
        r.channel: r
        for r in markov_attribution(df, channels).collect()
    }

    # independent recompute
    trans = {}
    for u, seq in journeys.items():
        cut = seq
        if "purchase" in seq:
            cut = seq[: seq.index("purchase") + 1]
        states = ["START"] + [
            "CONV" if e == "purchase" else e for e in cut
        ]
        if states[-1] != "CONV":
            states.append("NULL")
        for a, b in zip(states, states[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    n_out = {}
    for (a, _), n in trans.items():
        n_out[a] = n_out.get(a, 0) + n
    scale = 10_000_000_000

    def solve(removed):
        v = {s: 0 for s in ["START"] + channels}
        v["CONV"] = scale
        v["NULL"] = 0
        for _ in range(6):
            nv = {}
            for s in ["START"] + channels:
                if s == removed or n_out.get(s, 0) == 0:
                    nv[s] = 0
                    continue
                num = sum(
                    n * (0 if t == removed else v.get(t, 0))
                    for (a, t), n in trans.items()
                    if a == s
                )
                den = n_out[s]
                nv[s] = (2 * num + den) // (2 * den)
            nv["CONV"] = scale
            nv["NULL"] = 0
            v = nv
        return v["START"]

    pb = solve(None)
    rems = {c: pb - solve(c) for c in channels}
    tot = sum(rems.values())
    for c in channels:
        assert got[c].p_base_fp == pb
        assert got[c].removal_fp == rems[c]
        assert got[c].removal_effect == round(rems[c] / pb, 6)
        assert got[c].attribution == round(rems[c] / tot, 6)


def test_survival_km_hand_curve(spark):
    """Hand KM with one censored user: 5 users, lifetimes 0,1,1,2,3d;
    the 3d user is censored (active at corpus end) — S steps only on
    churn days and the censored user still inflates earlier risk
    sets."""
    import datetime as dt

    from careers_spark.operators.funnel import survival_km

    t0 = dt.datetime(2024, 1, 1)

    def d(days):
        return t0 + dt.timedelta(days=days)

    rows = []
    eid = 0
    for u, (start, life) in enumerate(
        [(0, 0), (0, 1), (1, 1), (0, 2), (0, 3)]
    ):
        rows.append((eid, u, d(start), "view")); eid += 1
        if life:
            rows.append((eid, u, d(start + life), "click")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r.day: r for r in survival_km(df, censor_days=1).collect()}
    # corpus max = day 3; user 4 (lifetime 3, last day 3) is censored
    scale = 10_000_000_000
    s0 = (2 * scale * 4 + 5) // (2 * 5)            # day 0: 1 churn of 5
    s1 = (2 * s0 * 2 + 4) // (2 * 4)               # day 1: 2 churns of 4
    s2 = (2 * s1 * 1 + 2) // (2 * 2)               # day 2: 1 churn of 2
    assert (got[0].n_at_risk, got[0].n_churned, got[0].surv_fp) == (5, 1, s0)
    assert (got[1].n_at_risk, got[1].n_churned, got[1].surv_fp) == (4, 2, s1)
    assert (got[2].n_at_risk, got[2].n_churned, got[2].surv_fp) == (2, 1, s2)
    # day 3: censored only -> survival unchanged
    assert (got[3].n_churned, got[3].n_censored, got[3].surv_fp) == (0, 1, s2)
    assert got[3].n_at_risk == 1


def test_survival_km_all_censored_is_flat(spark):
    """Everyone still active near corpus end -> no churn, S stays 1."""
    import datetime as dt

    from careers_spark.operators.funnel import survival_km

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, u, t0 + dt.timedelta(hours=u), "view") for u in range(4)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = survival_km(df, censor_days=7).collect()
    assert all(r.survival == 1.0 and r.n_churned == 0 for r in out)


def test_logrank_matches_python_recompute(spark):
    """Lockstep with an independent python computation of the
    Mantel-Cox O/E/V sums on the same md5 arms, plus the textbook
    identity checks (E sums to ~O under symmetric arms is NOT
    asserted — arms are hash-random — only exact arithmetic is)."""
    import datetime as dt
    import hashlib

    from careers_spark.operators.funnel import logrank_test

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    lifetimes = [0, 1, 1, 2, 3, 3, 4, 5, 5, 6, 8, 9]
    for u, life in enumerate(lifetimes):
        rows.append((eid, u, t0, "view")); eid += 1
        if life:
            rows.append((eid, u, t0 + dt.timedelta(days=life), "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    (r,) = logrank_test(df, censor_days=2, salt="t").collect()

    def arm(u):
        return int(hashlib.md5(f"{u}|t".encode()).hexdigest()[:8], 16) % 2

    max_day = max(lifetimes)
    users = [
        (life, (max_day - life) < 2, arm(u))
        for u, life in enumerate(lifetimes)
    ]
    days = sorted({life for life, _, _ in users})
    O = E = V = 0
    for d in days:
        n_t = sum(1 for life, _, _ in users if life >= d)
        n_1t = sum(1 for life, _, a in users if life >= d and a == 1)
        d_all = sum(1 for life, c, _ in users if life == d and not c)
        d_1 = sum(
            1 for life, c, a in users if life == d and not c and a == 1
        )
        O += d_1
        if d_all > 0:
            num = 2 * d_all * n_1t * 10**9 + n_t
            E += num // (2 * n_t)
            if n_t > 1:
                vn = (
                    2 * d_all * n_1t * (n_t - n_1t) * (n_t - d_all)
                    * 10**8 + n_t * n_t * (n_t - 1)
                )
                V += vn // (2 * n_t * n_t * (n_t - 1))
    assert (r.observed_1, r.expected_1_fp, r.variance_fp) == (O, E, V)
    assert r.n_users_0 + r.n_users_1 == len(lifetimes)
    if V > 0:
        import math

        assert r.z == round((O - E / 1e9) / math.sqrt(V / 1e8), 6)


def test_logrank_identical_arms_z_small(spark):
    """Hazards genuinely shared across arms -> |z| well inside the
    rejection region on a 60-user grid."""
    import datetime as dt

    from careers_spark.operators.funnel import logrank_test

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(60):
        life = u % 5
        rows.append((eid, u, t0, "view")); eid += 1
        rows.append((eid, u, t0 + dt.timedelta(days=life, hours=1), "x"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    (r,) = logrank_test(df, censor_days=1, salt="s").collect()
    assert r.z is not None and abs(r.z) < 2.5
