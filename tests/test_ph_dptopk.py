"""page_hinkley + dp_topk_exponential — constructed-stream goldens."""

import datetime

import pytest


def _ev(hour, n, typ="view"):
    base = datetime.datetime(2024, 1, 1)
    return [
        (base + datetime.timedelta(hours=hour, minutes=i % 60), typ)
        for i in range(n)
    ]


def test_page_hinkley_level_shift_alarms(spark):
    from careers_spark.operators.temporal import page_hinkley

    # 12 quiet hours at 2 events, then 12 loud hours at 30 events:
    # mean ~16, the loud tail accumulates (30-16)=+14/hour above the
    # running minimum reached at the end of the quiet prefix.
    rows = []
    for h in range(12):
        rows += _ev(h, 2)
    for h in range(12, 24):
        rows += _ev(h, 30)
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = page_hinkley(df, lambda_counts=50).orderBy("hour").collect()
    assert len(out) == 24
    # ph is 0 along the declining quiet prefix (cum deviation keeps
    # making new minima), grows in the loud half, alarms before the end
    assert all(r.ph == 0.0 for r in out[:12])
    assert out[-1].ph > 50
    assert out[-1].alarm and not out[0].alarm
    # first alarm exactly where (m2 - m2min) first exceeds 50*N:
    # deviation grows 14/hour -> ceil(50/14) = 4 loud hours
    first_alarm = next(i for i, r in enumerate(out) if r.alarm)
    assert first_alarm == 15


def test_page_hinkley_constant_series_never_alarms(spark):
    from careers_spark.operators.temporal import page_hinkley

    rows = []
    for h in range(10):
        rows += _ev(h, 5)
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = page_hinkley(df, lambda_counts=1).collect()
    assert all(r.ph == 0.0 and not r.alarm for r in out)


def test_page_hinkley_gap_fill(spark):
    from careers_spark.operators.temporal import page_hinkley

    # events only in hours 0 and 5 -> grid has 6 rows, silent hours 0
    rows = _ev(0, 3) + _ev(5, 3)
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = page_hinkley(df).orderBy("hour").collect()
    assert len(out) == 6
    assert [r.n_events for r in out] == [3, 0, 0, 0, 0, 3]


def test_dp_topk_shape_and_determinism(spark):
    from careers_spark.operators.privacy import dp_topk_exponential

    rows = (
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 10 + [("d",)] * 5
    )
    df = spark.createDataFrame(rows, "cat string")
    out1 = dp_topk_exponential(df, ["cat"], k=2, salt="t").collect()
    out2 = dp_topk_exponential(df, ["cat"], k=2, salt="t").collect()
    assert [r.cat for r in out1] == [r.cat for r in out2]
    assert [r.rank for r in out1] == [1, 2]
    # at this count gap and eps=1.0, the true argmax wins despite noise
    assert out1[0].cat == "a"


def test_dp_topk_reseed_changes_noise(spark):
    from careers_spark.operators.privacy import dp_topk_exponential

    rows = [("a",)] * 3 + [("b",)] * 3
    df = spark.createDataFrame(rows, "cat string")
    k1 = {r.cat: r.noisy_key for r in dp_topk_exponential(df, ["cat"], k=2, salt="s1").collect()}
    k2 = {r.cat: r.noisy_key for r in dp_topk_exponential(df, ["cat"], k=2, salt="s2").collect()}
    assert k1 != k2  # different salt -> different Gumbel draws


def test_dp_topk_high_eps_recovers_truth(spark):
    from careers_spark.operators.privacy import dp_topk_exponential

    rows = [("a",)] * 40 + [("b",)] * 25 + [("c",)] * 12 + [("d",)] * 2
    df = spark.createDataFrame(rows, "cat string")
    # eps = 100: noise scale 2/eps = 0.02 -> ordering is the true one
    out = dp_topk_exponential(df, ["cat"], k=3, eps_mille=100000).collect()
    assert [r.cat for r in out] == ["a", "b", "c"]
