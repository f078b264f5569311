"""cochran_q + friedman_test — textbook goldens and python lockstep."""

import pytest


def _cells(spark, rows, schema="unit long, treatment string, flag long"):
    return spark.createDataFrame(rows, schema)


def test_cochran_textbook(spark):
    """Hand 2x-checkable example (k=3, 4 units):
    unit flags: (1,1,0), (1,0,0), (1,1,1), (0,0,0).
    T = (3, 2, 1), x = (2, 1, 3, 0):
    Q = 2*(3*14 - 36)/(3*6 - 14) = 12/4 = 3."""
    from careers_spark.operators.evaluation import cochran_q

    rows = []
    flags = [(1, 1, 0), (1, 0, 0), (1, 1, 1), (0, 0, 0)]
    for u, fs in enumerate(flags):
        for j, f in enumerate(fs):
            rows.append((u, f"t{j}", f))
    out = cochran_q(_cells(spark, rows)).collect()[0]
    assert out["k_treatments"] == 3 and out["n_units"] == 4
    assert out["df"] == 2
    assert out["q_stat"] == pytest.approx(3.0, abs=1e-9)


def test_cochran_mcnemar_consistency(spark):
    """k=2 Cochran's Q equals McNemar's UNcorrected chi2
    (b-c)^2/(b+c) — the textbook identity."""
    from careers_spark.operators.evaluation import cochran_q

    # 10 units: b = 4 (1,0), c = 1 (0,1), 3 concordant-1, 2 concordant-0
    flags = [(1, 0)] * 4 + [(0, 1)] * 1 + [(1, 1)] * 3 + [(0, 0)] * 2
    rows = [
        (u, f"t{j}", f)
        for u, fs in enumerate(flags)
        for j, f in enumerate(fs)
    ]
    out = cochran_q(_cells(spark, rows)).collect()[0]
    assert out["q_stat"] == pytest.approx((4 - 1) ** 2 / (4 + 1), abs=1e-9)


def test_cochran_degenerate_null(spark):
    """Every unit all-1 or all-0: denominator zero, Q undefined."""
    from careers_spark.operators.evaluation import cochran_q

    flags = [(1, 1), (0, 0), (1, 1)]
    rows = [
        (u, f"t{j}", f)
        for u, fs in enumerate(flags)
        for j, f in enumerate(fs)
    ]
    out = cochran_q(_cells(spark, rows)).collect()[0]
    assert out["q_stat"] is None


def test_friedman_textbook_no_ties(spark):
    """scipy-checkable: 3 units ranking 3 treatments identically
    (values 1<2<3 each): rank sums (3,6,9), chi2 = 12/(3*3*4)*
    (9+36+81) - 3*3*4 = 42 - 36 = 6 (the k=3,n=3 maximum)."""
    from careers_spark.operators.evaluation import friedman_test

    rows = [
        (u, f"t{j}", v)
        for u in range(3)
        for j, v in enumerate([1, 2, 3])
    ]
    out = friedman_test(
        _cells(spark, rows, "unit long, treatment string, value long")
    ).collect()[0]
    assert out["chi2"] == pytest.approx(6.0, abs=1e-9)
    assert out["tie_correction"] == 1.0
    assert out["chi2_adj"] == pytest.approx(6.0, abs=1e-9)


def test_friedman_all_tied_null(spark):
    """Every unit's values all equal: C = 0, adjusted stat undefined."""
    from careers_spark.operators.evaluation import friedman_test

    rows = [(u, f"t{j}", 7) for u in range(4) for j in range(3)]
    out = friedman_test(
        _cells(spark, rows, "unit long, treatment string, value long")
    ).collect()[0]
    assert out["tie_correction"] == 0.0
    assert out["chi2_adj"] is None


def test_friedman_ragged_raises(spark):
    from careers_spark.operators.evaluation import friedman_test

    rows = [(0, "a", 1), (0, "b", 2), (1, "a", 3)]
    with pytest.raises(ValueError, match="ragged"):
        friedman_test(
            _cells(spark, rows, "unit long, treatment string, value long")
        )


def test_friedman_midrank_python_lockstep(spark):
    """Tied values within units: doubled midranks replayed in python,
    chi2 and the tie correction must match exactly."""
    from careers_spark.operators.evaluation import friedman_test

    import collections

    rows = []
    for u in range(12):
        vals = [(u * 7 + j * 3) % 4 for j in range(3)]  # many ties
        for j, v in enumerate(vals):
            rows.append((u, f"t{j}", v))
    out = friedman_test(
        _cells(spark, rows, "unit long, treatment string, value long")
    ).collect()[0]

    byu = collections.defaultdict(list)
    for u, t, v in rows:
        byu[u].append((t, v))
    r2 = collections.Counter()
    st3 = 0
    for u, tv in byu.items():
        vs = sorted(v for _t, v in tv)
        cnt = collections.Counter(vs)
        st3 += sum(c**3 - c for c in cnt.values())
        for t, v in tv:
            rank = 1 + sum(1 for x in vs if x < v)
            ties = cnt[v]
            r2[t] += 2 * rank + ties - 1
    n, k = len(byu), 3
    srr = sum(x * x for x in r2.values())
    chi2 = 3.0 * srr / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    corr = 1.0 - st3 / (n * k * (k * k - 1))
    assert out["chi2"] == round(chi2, 6)
    assert out["tie_correction"] == round(corr, 6)
    assert out["chi2_adj"] == round(chi2 / corr, 6)
