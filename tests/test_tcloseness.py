"""t_closeness_audit — hand golden, boundary exactness, lockstep."""

import random
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


_SCHEMA = "qi string, sv string"


def _python_tv(rows):
    from collections import Counter

    n_all = len(rows)
    gl = Counter(sv for _, sv in rows)
    cells = {}
    for qi, sv in rows:
        cells.setdefault(qi, []).append(sv)
    out = {}
    for qi, svs in cells.items():
        n_c = len(svs)
        cc = Counter(svs)
        num = sum(abs(cc.get(v, 0) * n_all - g * n_c) for v, g in gl.items())
        out[qi] = (n_c, num, _r6(num / (2.0 * n_c * n_all)))
    return out


def test_tcloseness_hand_golden(spark):
    from careers_spark.operators.privacy import t_closeness_audit

    # corpus: 4 x, 4 y -> p = (.5, .5)
    # cell A: 3 x, 1 y -> TV = .25 ; cell B: 1 x, 3 y -> TV = .25
    rows = [("A", "x")] * 3 + [("A", "y")] + [("B", "x")] + [("B", "y")] * 3
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r.qi: r for r in t_closeness_audit(df, ["qi"], "sv", t_mille=250).collect()
    }
    assert got["A"].tv == 0.25 and got["B"].tv == 0.25
    # boundary: t = .25 exactly -> meets (integer comparison, no
    # rounding ambiguity)
    assert got["A"].meets_t and got["B"].meets_t
    tight = {
        r.qi: r.meets_t
        for r in t_closeness_audit(df, ["qi"], "sv", t_mille=249).collect()
    }
    assert tight == {"A": False, "B": False}


def test_tcloseness_absent_value_counts_full_mass(spark):
    from careers_spark.operators.privacy import t_closeness_audit

    # cell B never sees 'x': its TV must include x's whole corpus share
    rows = [("A", "x")] * 2 + [("A", "y")] * 2 + [("B", "y")] * 4
    got = {
        r.qi: r.tv
        for r in t_closeness_audit(
            spark.createDataFrame(rows, _SCHEMA), ["qi"], "sv"
        ).collect()
    }
    # corpus p(x) = .25; B: |0 - .25| + |1 - .75| = .5 -> TV = .25
    assert got["B"] == 0.25


def test_tcloseness_lockstep_random(spark):
    from careers_spark.operators.privacy import t_closeness_audit

    rng = random.Random(53)
    rows = [
        (rng.choice(["A", "B", "C"]), rng.choice(["u", "v", "w", "z"]))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r.qi: (r.n_c, r.tv_num, r.tv)
        for r in t_closeness_audit(df, ["qi"], "sv").collect()
    }
    assert got == _python_tv(rows)
