"""pr_curve + group_sequential_looks."""

import random
from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# pr_curve


def test_pr_curve_hand_golden(spark):
    from careers_spark.operators.evaluation import pr_curve

    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.7, 1), (0.1, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r.threshold: r for r in pr_curve(df).collect()}
    assert (got[0.9].tp, got[0.9].fp, got[0.9].fn) == (1, 0, 2)
    assert got[0.9].precision == 1.0 and got[0.9].recall == _r6(1 / 3)
    assert (got[0.7].tp, got[0.7].fp) == (3, 1)
    assert got[0.7].precision == 0.75 and got[0.7].recall == 1.0
    assert got[0.7].f1 == _r6(6 / 7)
    assert got[0.1].recall == 1.0 and got[0.1].precision == 0.6


def test_pr_curve_lockstep_random(spark):
    from careers_spark.operators.evaluation import pr_curve

    rng = random.Random(59)
    rows = [
        (round(rng.random(), 1), 1 if rng.random() < 0.4 else 0)
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r.threshold: (r.tp, r.fp, r.precision, r.recall) for r in pr_curve(df).collect()}
    p_all = sum(y for _, y in rows)
    for t in sorted({s for s, _ in rows}):
        tp = sum(1 for s, y in rows if s >= t and y == 1)
        fp = sum(1 for s, y in rows if s >= t and y == 0)
        assert got[t] == (tp, fp, _r6(tp / (tp + fp)), _r6(tp / p_all))


# ---------------------------------------------------------------------------
# group_sequential_looks

_E_SCHEMA = "user_id long, ts timestamp, event_type string"


def test_gsq_final_look_equals_ab_z_and_counts_monotone(spark):
    from careers_spark.operators.funnel import (
        ab_conversion_test,
        group_sequential_looks,
    )

    rng = random.Random(61)
    rows = []
    for uid in range(80):
        d0 = rng.randint(1, 28)
        rows.append((uid, datetime(2024, 1, d0, 9, 0, 0), "view"))
        if rng.random() < 0.35:
            rows.append(
                (uid, datetime(2024, 1, rng.randint(d0, 28), 15, 0, 0), "purchase")
            )
    df = spark.createDataFrame(rows, _E_SCHEMA)
    looks = {r.look: r for r in group_sequential_looks(df, looks=4).collect()}
    ab = ab_conversion_test(df).collect()[0]
    final = looks[4]
    assert (final.n_0, final.c_0, final.n_1, final.c_1) == (
        ab.n_0, ab.c_0, ab.n_1, ab.c_1,
    )
    assert final.z == ab.z
    for k in (2, 3, 4):
        assert looks[k].n_0 + looks[k].n_1 >= looks[k - 1].n_0 + looks[k - 1].n_1
        assert looks[k].c_0 + looks[k].c_1 >= looks[k - 1].c_0 + looks[k - 1].c_1
    # OBF boundaries decrease toward ~C at the final look
    bs = [looks[k].boundary for k in (1, 2, 3, 4)]
    assert bs == sorted(bs, reverse=True)
    assert bs[3] == 2.024


def test_gsq_conversion_not_counted_before_cutoff(spark):
    from careers_spark.operators.funnel import group_sequential_looks

    # one user seen day 1, converts day 28: looks 1-3 must show c = 0
    rows = [
        (1, datetime(2024, 1, 1, 9, 0, 0), "view"),
        (1, datetime(2024, 1, 28, 9, 0, 0), "purchase"),
        (2, datetime(2024, 1, 1, 9, 0, 0), "view"),
    ]
    df = spark.createDataFrame(rows, _E_SCHEMA)
    looks = {r.look: r for r in group_sequential_looks(df, looks=4).collect()}
    for k in (1, 2, 3):
        assert looks[k].c_0 + looks[k].c_1 == 0
        assert looks[k].n_0 + looks[k].n_1 == 2
    assert looks[4].c_0 + looks[4].c_1 == 1
