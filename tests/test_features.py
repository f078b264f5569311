"""target_encode_loo — hand golden, leakage property, python lockstep."""

import random
from decimal import ROUND_HALF_UP, Decimal

import pytest


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _python_loo(rows, m):
    n_all = len(rows)
    s_all = sum(y for _, _, y in rows)
    per = {}
    for _, c, y in rows:
        n, s = per.setdefault(c, [0, 0])
        per[c][0] += 1
        per[c][1] += y
    gm = s_all / n_all
    return {
        i: _r6((per[c][1] - y + m * gm) / (per[c][0] - 1 + m))
        for i, c, y in rows
    }


_SCHEMA = "id long, cat string, y int"


def test_loo_hand_golden(spark):
    from careers_spark.operators.features import target_encode_loo

    # cat A: [1, 0, 1]; cat B: [0]; global mean 0.5; m = 1
    rows = [(0, "A", 1), (1, "A", 0), (2, "A", 1), (3, "B", 0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r.id: r.enc
        for r in target_encode_loo(df, "cat", "y", m=1).collect()
    }
    # row 0: (2-1 + 0.5)/(3-1+1) = 0.5 ; row 1: (2-0+0.5)/3
    assert got[0] == 0.5
    assert got[1] == _r6(2.5 / 3)
    assert got[2] == 0.5
    # singleton B: (0-0+0.5)/(0+1) = global mean
    assert got[3] == 0.5


def test_loo_excludes_own_label(spark):
    """Two rows in one category with different labels get DIFFERENT
    encodings (a leaky per-category mean would give them the same)."""
    from careers_spark.operators.features import target_encode_loo

    rows = [(0, "A", 1), (1, "A", 0), (2, "A", 1), (3, "A", 0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r.id: r.enc for r in target_encode_loo(df, "cat", "y", m=2).collect()}
    assert got[0] == got[2] and got[1] == got[3]
    assert got[0] != got[1]
    # the positive row sees FEWER positives among its peers
    assert got[0] < got[1]


def test_loo_lockstep_random(spark):
    from careers_spark.operators.features import target_encode_loo

    rng = random.Random(3)
    rows = [
        (i, rng.choice(["a", "b", "c", "d"]), rng.randint(0, 1))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r.id: r.enc for r in target_encode_loo(df, "cat", "y", m=10).collect()}
    assert got == _python_loo(rows, 10)


def test_loo_rejects_m_zero(spark):
    from careers_spark.operators.features import target_encode_loo

    df = spark.createDataFrame([(0, "A", 1)], _SCHEMA)
    with pytest.raises(ValueError):
        target_encode_loo(df, "cat", "y", m=0)
