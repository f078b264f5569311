"""Key-skew report: hand-computed shares/skew factor, deterministic
tie-break, and the TakeOrdered plan shape (no global sort of raw
data)."""

from careers_spark.operators.skew import key_skew_report


def test_skew_report_golden(spark):
    # key 'a' x6, 'b' x2, 'c' x1, 'd' x1 -> total 10, 4 keys, max 6
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, schema="k string")
    got = {
        r.rank: (r.key_value, r.n_rows, r.share, r.n_keys_total, r.skew_factor)
        for r in key_skew_report(df, "k", top_k=3).collect()
    }
    assert got == {
        1: ("a", 6, 0.6, 4, 2.4),   # skew factor = max/mean = 6/(10/4)
        2: ("b", 2, 0.2, 4, 2.4),
        3: ("c", 1, 0.1, 4, 2.4),   # tie with 'd' -> smaller key wins
    }


def test_skew_report_uniform_has_factor_one(spark):
    rows = [(str(i % 5),) for i in range(25)]
    df = spark.createDataFrame(rows, schema="k string")
    out = key_skew_report(df, "k", top_k=5).collect()
    assert all(r.skew_factor == 1.0 and r.n_rows == 5 for r in out)
    assert [r.key_value for r in sorted(out, key=lambda r: r.rank)] == [
        "0", "1", "2", "3", "4"
    ]


def test_skew_report_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(str(i),) for i in range(100)], schema="k string")
    plan = (
        key_skew_report(df, "k", top_k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_salt_advisor_prescription(spark):
    from careers_spark.operators.skew import salt_advisor

    rows = (
        [("hot", i) for i in range(250)]
        + [("warm", i) for i in range(101)]
        + [("cold", i) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "k string, v long")
    out = {r.key_value: r for r in salt_advisor(df, "k", 100).collect()}
    # cold is under budget -> absent
    assert set(out) == {"hot", "warm"}
    h = out["hot"]
    assert (h.n_rows, h.salt_factor) == (250, 3)
    assert h.post_salt_max_rows == 84  # ceil(250/3)
    w = out["warm"]
    assert (w.n_rows, w.salt_factor, w.post_salt_max_rows) == (
        101, 2, 51,
    )
    # the prescription actually lands under budget
    for r in out.values():
        assert r.post_salt_max_rows <= 100
