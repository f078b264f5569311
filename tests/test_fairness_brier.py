"""fairness_audit, brier_decomposition, ab_power_mde."""

import hashlib
import math
import random
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# fairness_audit

_F_SCHEMA = "grp string, label int, pred int"


def test_fairness_hand_golden(spark):
    from careers_spark.operators.audit import fairness_audit

    rows = (
        # group A: 4 rows, 2 pos; preds: tp=2, fp=1 -> sel 3/4
        [("A", 1, 1), ("A", 1, 1), ("A", 0, 1), ("A", 0, 0)]
        # group B: 4 rows, 2 pos; preds: tp=1, fp=0 -> sel 1/4
        + [("B", 1, 1), ("B", 1, 0), ("B", 0, 0), ("B", 0, 0)]
    )
    df = spark.createDataFrame(rows, _F_SCHEMA)
    got = {
        r.grp: r for r in fairness_audit(df, "grp", "label", "pred").collect()
    }
    assert got["A"].selection_rate == 0.75
    assert got["A"].tpr == 1.0
    assert got["A"].fpr == 0.5
    assert got["B"].selection_rate == 0.25
    assert got["B"].tpr == 0.5
    assert got["B"].fpr == 0.0
    # overall selection 4/8 = .5
    assert got["A"].dp_gap == 0.25
    assert got["B"].dp_gap == -0.25


def test_fairness_null_cells(spark):
    from careers_spark.operators.audit import fairness_audit

    rows = [("A", 0, 1), ("A", 0, 0), ("B", 1, 1), ("B", 1, 0)]
    df = spark.createDataFrame(rows, _F_SCHEMA)
    got = {
        r.grp: r for r in fairness_audit(df, "grp", "label", "pred").collect()
    }
    assert got["A"].tpr is None  # no positives in A
    assert got["B"].fpr is None  # no negatives in B


# ---------------------------------------------------------------------------
# brier_decomposition

_B_SCHEMA = "score double, label int"


def test_brier_hand_golden_and_identity(spark):
    from careers_spark.operators.evaluation import brier_decomposition

    rows = [(0.2, 1), (0.2, 0), (0.2, 0), (0.8, 1), (0.8, 1)]
    df = spark.createDataFrame(rows, _B_SCHEMA)
    r = brier_decomposition(df).collect()[0]
    assert (r.n, r.n_pos, r.n_bins) == (5, 3, 2)
    assert r.brier == 0.16
    assert r.reliability == _r6((3 * (0.2 - 1 / 3) ** 2 + 2 * 0.04) / 5)
    assert r.resolution == _r6((3 * (1 / 3 - 0.6) ** 2 + 2 * 0.16) / 5)
    assert r.uncertainty == 0.24
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 2e-6


def test_brier_perfectly_calibrated_zero_reliability(spark):
    from careers_spark.operators.evaluation import brier_decomposition

    # each bin's empirical rate equals its forecast exactly
    rows = [(0.5, 1), (0.5, 0), (0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)]
    r = brier_decomposition(spark.createDataFrame(rows, _B_SCHEMA)).collect()[0]
    assert r.reliability == 0.0


def test_brier_identity_random(spark):
    from careers_spark.operators.evaluation import brier_decomposition

    rng = random.Random(29)
    rows = [
        (round(rng.random(), 2), 1 if rng.random() < 0.3 else 0)
        for _ in range(400)
    ]
    r = brier_decomposition(spark.createDataFrame(rows, _B_SCHEMA)).collect()[0]
    # python brier
    bs = sum((s - y) ** 2 for s, y in rows) / len(rows)
    assert abs(r.brier - bs) < 1e-6
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 2e-6


# ---------------------------------------------------------------------------
# ab_power_mde

_E_SCHEMA = "user_id long, event_type string"


def _arm(uid: int) -> int:
    return int(hashlib.md5(f"{uid}|ab".encode()).hexdigest()[:8], 16) % 2


def test_mde_lockstep(spark):
    from careers_spark.operators.funnel import ab_power_mde

    rng = random.Random(31)
    rows = []
    for uid in range(60):
        rows.append((uid, "view"))
        if rng.random() < 0.3:
            rows.append((uid, "purchase"))
    df = spark.createDataFrame(rows, _E_SCHEMA)
    got = ab_power_mde(df).collect()[0]
    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    conv = {u for u, t in rows if t == "purchase"}
    for uid in range(60):
        a = _arm(uid)
        n[a] += 1
        c[a] += 1 if uid in conv else 0
    assert (got.n_0, got.n_1, got.c_0, got.c_1) == (n[0], n[1], c[0], c[1])
    p = (c[0] + c[1]) / 60
    mde = _r6(
        (1.959963984540054 + 0.8416212335729143)
        * math.sqrt(p * (1 - p) * (1 / n[0] + 1 / n[1]))
    )
    assert got.mde_abs == mde
    assert got.mde_rel == _r6(mde / p)


def test_mde_degenerate_all_convert(spark):
    from careers_spark.operators.funnel import ab_power_mde

    rows = [(u, "purchase") for u in range(10)]
    got = ab_power_mde(spark.createDataFrame(rows, _E_SCHEMA)).collect()[0]
    assert got.mde_abs is None and got.mde_rel is None
    assert got.rate_pooled == 1.0


def test_mde_shrinks_with_sample_size(spark):
    from careers_spark.operators.funnel import ab_power_mde

    small = [(u, "purchase" if u % 5 == 0 else "view") for u in range(40)]
    big = [(u, "purchase" if u % 5 == 0 else "view") for u in range(400)]
    m_small = ab_power_mde(spark.createDataFrame(small, _E_SCHEMA)).collect()[0]
    m_big = ab_power_mde(spark.createDataFrame(big, _E_SCHEMA)).collect()[0]
    assert m_big.mde_abs < m_small.mde_abs
