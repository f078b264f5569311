"""sprt_monitor + capture_recapture_dupes — goldens and lockstep."""

import datetime
import math

import pytest


def _ev(spark, per_hour):
    """per_hour: list of (n_trials, n_successes) per consecutive hour."""
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for h, (n, k) in enumerate(per_hour):
        for i in range(n):
            rows.append(
                (base + datetime.timedelta(hours=h, seconds=i), i < k)
            )
    return spark.createDataFrame(rows, "ts timestamp, is_success boolean")


def test_sprt_rejects_under_h1_rate(spark):
    """A stream running at ~30% conversion against H0 p=10% vs H1
    p=13% accumulates positive LLR and crosses the reject boundary
    exactly once (first crossing flagged)."""
    from careers_spark.operators.funnel import sprt_monitor

    out = (
        sprt_monitor(
            _ev(spark, [(100, 30)] * 10),
            p0_mille=100,
            p1_mille=130,
            alpha_mille=50,
            beta_mille=200,
        )
        .orderBy("hour")
        .collect()
    )
    decisions = [r["decision"] for r in out]
    assert decisions[-1] == "reject_h0"
    firsts = [r for r in out if r["is_first_decision"]]
    assert len(firsts) == 1
    assert firsts[0]["decision"] == "reject_h0"
    # llr grows monotonically for a constant super-H1 rate
    llrs = [r["llr"] for r in out]
    assert llrs == sorted(llrs)


def test_sprt_accepts_under_h0_rate(spark):
    """A stream at exactly p0 drifts the LLR downward to accept_h0."""
    from careers_spark.operators.funnel import sprt_monitor

    out = (
        sprt_monitor(
            _ev(spark, [(200, 20)] * 10),
            p0_mille=100,
            p1_mille=130,
            alpha_mille=50,
            beta_mille=200,
        )
        .orderBy("hour")
        .collect()
    )
    assert out[-1]["decision"] == "accept_h0"


def test_sprt_python_lockstep(spark):
    """Replay the fixed-point LLR and both integer boundaries."""
    from careers_spark.operators.funnel import sprt_monitor

    per_hour = [(40, 6), (35, 2), (50, 9), (45, 4), (60, 11)]
    out = (
        sprt_monitor(
            _ev(spark, per_hour),
            p0_mille=100,
            p1_mille=130,
            alpha_mille=50,
            beta_mille=200,
        )
        .orderBy("hour")
        .collect()
    )
    c1 = int(round(math.log(0.13 / 0.10) * 1e9))
    c0 = int(round(math.log(0.87 / 0.90) * 1e9))
    up = int(round(math.log(0.8 / 0.05) * 1e9))
    lo = int(round(math.log(0.2 / 0.95) * 1e9))
    n = k = 0
    seen_decision = False
    for r, (nh, kh) in zip(out, per_hour):
        n += nh
        k += kh
        fp = k * c1 + (n - k) * c0
        assert r["n_cum"] == n and r["k_cum"] == k
        assert r["llr"] == round(fp / 1e9, 6)
        want = (
            "reject_h0"
            if fp >= up
            else ("accept_h0" if fp <= lo else "continue")
        )
        assert r["decision"] == want
        assert r["is_first_decision"] == (
            want != "continue" and not seen_decision
        )
        seen_decision = seen_decision or want != "continue"


def test_sprt_validation(spark):
    from careers_spark.operators.funnel import sprt_monitor

    df = _ev(spark, [(1, 0)])
    with pytest.raises(ValueError):
        sprt_monitor(df, p0_mille=100, p1_mille=100)
    with pytest.raises(ValueError):
        sprt_monitor(df, p0_mille=0)


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_chapman_textbook(spark):
    """n1=10, n2=8, m=4: N_hat = 11*9/5 - 1 = 18.8; both screens'
    union (14) is below the estimate — residual dups inferred."""
    from careers_spark.operators.dedup import capture_recapture_dupes

    s1 = _pairs(spark, [(i, i + 100) for i in range(10)])
    s2 = _pairs(spark, [(i, i + 100) for i in range(6, 14)])
    out = capture_recapture_dupes(s1, s2).collect()[0]
    assert out["n_screen_a"] == 10 and out["n_screen_b"] == 8
    assert out["n_both"] == 4
    assert out["n_hat"] == pytest.approx(11 * 9 / 5 - 1, abs=1e-9)
    var = 11 * 9 * 6 * 4 / (25 * 6)
    assert out["se"] == pytest.approx(math.sqrt(var), abs=1e-6)
    assert out["lo95"] >= 0.0


def test_chapman_identical_screens_no_misses(spark):
    """Perfect overlap: N_hat collapses to the observed count (the
    estimator says nothing was missed) and se is 0."""
    from careers_spark.operators.dedup import capture_recapture_dupes

    s = _pairs(spark, [(1, 2), (3, 4), (5, 6)])
    out = capture_recapture_dupes(s, s).collect()[0]
    assert out["n_hat"] == pytest.approx(3.0, abs=1e-9)
    assert out["se"] == 0.0


def test_chapman_canonicalizes_and_dedups(spark):
    """Reversed and duplicated pairs collapse before counting."""
    from careers_spark.operators.dedup import capture_recapture_dupes

    s1 = _pairs(spark, [(1, 2), (2, 1), (1, 2), (3, 4)])
    s2 = _pairs(spark, [(2, 1)])
    out = capture_recapture_dupes(s1, s2).collect()[0]
    assert out["n_screen_a"] == 2 and out["n_screen_b"] == 1
    assert out["n_both"] == 1
