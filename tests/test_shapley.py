"""shapley_attribution — hand golden + python lockstep."""

import random
from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal


def _r(x: float, nd: int) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


_SCHEMA = "user_id long, event_type string"


def _ev(rows):
    # shapley_attribution only reads (user_id, event_type)
    return [(u, t) for u, t in rows]


def _python_shapley(rows):
    per = {}
    for u, t in rows:
        chans, conv = per.setdefault(u, [set(), 0])
        if t == "purchase":
            per[u][1] = 1
        else:
            per[u][0].add(t)
    sets = {}
    for chans, conv in per.values():
        if not chans:
            continue
        k = "|".join(sorted(chans))
        n, c = sets.setdefault(k, [0, 0])
        sets[k][0] += 1
        sets[k][1] += conv
    v_fp = {
        k: int(
            Decimal(repr(_r(c / n, 9) * 1e9)).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
        for k, (n, c) in sets.items()
    }
    phi_fp, n_sets = {}, {}
    for k, vf in v_fp.items():
        members = k.split("|")
        for ch in members:
            rk = "|".join(m for m in members if m != ch)
            vr = v_fp.get(rk, 0)
            term = int(
                Decimal(
                    repr(_r((vf - vr) / (len(members) * 1e9), 9) * 1e9)
                ).quantize(Decimal("1"), ROUND_HALF_UP)
            )
            phi_fp[ch] = phi_fp.get(ch, 0) + term
            n_sets[ch] = n_sets.get(ch, 0) + 1
    return {ch: (n_sets[ch], _r(phi_fp[ch] / 1e9, 6)) for ch in phi_fp}


def test_shapley_hand_golden(spark):
    from careers_spark.operators.funnel import shapley_attribution

    rows = _ev(
        [
            (1, "a"), (1, "purchase"),        # {a} conv
            (2, "a"),                          # {a} no conv -> v({a}) = .5
            (3, "a"), (3, "b"), (3, "purchase"),
            (4, "b"), (4, "a"), (4, "purchase"),  # v({a,b}) = 1.0
            (5, "b"),                          # v({b}) = 0.0
        ]
    )
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r.channel: (r.n_sets, r.phi)
        for r in shapley_attribution(df).collect()
    }
    # phi(a) = .5/1 (from {a}) + (1.0 - v({b}))/2 = 1.0
    # phi(b) = 0/1 (from {b}) + (1.0 - v({a}))/2 = 0.25
    assert got == {"a": (2, 1.0), "b": (2, 0.25)}


def test_shapley_converting_channel_gets_more_credit(spark):
    from careers_spark.operators.funnel import shapley_attribution

    rows = []
    uid = 0
    for _ in range(10):  # {good} always converts
        rows += [(uid, "good"), (uid, "purchase")]
        uid += 1
    for _ in range(10):  # {bad} never does
        rows += [(uid, "bad")]
        uid += 1
    for _ in range(10):  # {good, bad} converts
        rows += [(uid, "good"), (uid, "bad"), (uid, "purchase")]
        uid += 1
    got = {
        r.channel: r.phi
        for r in shapley_attribution(
            spark.createDataFrame(rows, _SCHEMA)
        ).collect()
    }
    assert got["good"] > got["bad"]


def test_shapley_lockstep_random(spark):
    from careers_spark.operators.funnel import shapley_attribution

    rng = random.Random(17)
    types = ["view", "click", "email", "ad"]
    rows = []
    for uid in range(120):
        for _ in range(rng.randint(1, 5)):
            rows.append((uid, rng.choice(types)))
        if rng.random() < 0.4:
            rows.append((uid, "purchase"))
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r.channel: (r.n_sets, r.phi)
        for r in shapley_attribution(df).collect()
    }
    assert got == _python_shapley(rows)
