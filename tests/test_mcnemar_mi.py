"""mcnemar_paired + mutual_information — hand goldens and exact
math.log lockstep."""

import math

import pytest


def test_mcnemar_textbook(spark):
    from careers_spark.operators.evaluation import mcnemar_paired

    # classic 2x2: n00=59, n01=6, n10=16, n11=80
    rows = (
        [(0, 0)] * 59 + [(0, 1)] * 6 + [(1, 0)] * 16 + [(1, 1)] * 80
    )
    df = spark.createDataFrame(rows, "flag_a int, flag_b int")
    r = mcnemar_paired(df).collect()[0]
    assert (r.n_units, r.n00, r.n01, r.n10, r.n11) == (161, 59, 6, 16, 80)
    assert r.chi2_cc == pytest.approx((abs(6 - 16) - 1) ** 2 / 22.0, abs=1e-6)


def test_mcnemar_no_discordant_null(spark):
    from careers_spark.operators.evaluation import mcnemar_paired

    df = spark.createDataFrame(
        [(0, 0), (1, 1), (1, 1)], "flag_a int, flag_b int"
    )
    r = mcnemar_paired(df).collect()[0]
    assert r.chi2_cc is None and r.n01 == 0 and r.n10 == 0


def _mi_reference(pairs):
    from collections import Counter

    n = len(pairs)
    joint = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    # the operator's 1e-9 lattice, reproduced exactly
    mi_fp = sum(
        c * round(math.log(c * n / (cx[x] * cy[y])) * 1e9)
        for (x, y), c in joint.items()
    )
    hx_fp = sum(c * round(math.log(c / n) * 1e9) for c in cx.values())
    hy_fp = sum(c * round(math.log(c / n) * 1e9) for c in cy.values())
    return mi_fp / (n * 1e9), -hx_fp / (n * 1e9), -hy_fp / (n * 1e9)


def test_mutual_info_lockstep(spark):
    from careers_spark.operators.evaluation import mutual_information

    pairs = [
        ("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 2),
        ("b", 3), ("c", 3), ("c", 1), ("a", 3), ("b", 1),
    ]
    df = spark.createDataFrame(pairs, "x string, y int")
    r = mutual_information(df).collect()[0]
    mi, hx, hy = _mi_reference(pairs)
    assert r.n_rows == 10 and r.n_x == 3 and r.n_y == 3
    assert r.mi == pytest.approx(mi, abs=1e-6)
    assert r.h_x == pytest.approx(hx, abs=1e-6)
    assert r.h_y == pytest.approx(hy, abs=1e-6)
    assert r.nmi == pytest.approx(mi / min(hx, hy), abs=1e-5)


def test_mutual_info_independent_is_zero(spark):
    from careers_spark.operators.evaluation import mutual_information

    # perfectly independent product distribution -> MI exactly 0
    pairs = [(x, y) for x in ("a", "b") for y in (1, 2, 3) for _ in range(4)]
    df = spark.createDataFrame(pairs, "x string, y int")
    r = mutual_information(df).collect()[0]
    assert r.mi == 0.0 and r.nmi == 0.0


def test_mutual_info_identical_columns_nmi_one(spark):
    from careers_spark.operators.evaluation import mutual_information

    pairs = [("a", "a")] * 3 + [("b", "b")] * 5 + [("c", "c")] * 2
    df = spark.createDataFrame(pairs, "x string, y string")
    r = mutual_information(df).collect()[0]
    # X == Y: MI = H(X) = H(Y), NMI = 1
    assert r.mi == pytest.approx(r.h_x, abs=1e-6)
    assert r.nmi == pytest.approx(1.0, abs=1e-6)


def test_mutual_info_constant_column_null_nmi(spark):
    from careers_spark.operators.evaluation import mutual_information

    pairs = [("k", y) for y in (1, 2, 3, 1, 2)]
    df = spark.createDataFrame(pairs, "x string, y int")
    r = mutual_information(df).collect()[0]
    assert r.mi == 0.0 and r.h_x == 0.0 and r.nmi is None
