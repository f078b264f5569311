"""Constraint audit (injected violations) and blocked fuzzy matching
(hand-computed edit distances, blocking exclusions), plus a CUBE
subtotal golden."""

from pyspark.sql import functions as F

from careers_spark.operators.audit import constraint_audit
from careers_spark.operators.dedup import fuzzy_name_pairs


def test_constraint_audit_counts_injected_violations(spark):
    customer = spark.createDataFrame(
        [(1,), (2,), (2,)], schema="c_custkey long"  # duplicate key
    )
    orders = spark.createDataFrame(
        # custkey 9 dangles; one NULL custkey
        [(10, 1), (11, 2), (12, 9), (13, None)],
        schema="o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        # orderkey 99 dangles; one non-positive quantity
        [(10, 5.0), (11, -1.0), (99, 2.0)],
        schema="l_orderkey long, l_quantity double",
    )
    documents = spark.createDataFrame(
        [(1, 10), (1, 20), (2, -3)], schema="doc_id long, n_chars long"
    )
    events = spark.createDataFrame(
        [(1, None)], schema="event_id long, ts timestamp"
    )
    got = {
        r.check_name: (r.n_checked, r.n_violations, r.ok)
        for r in constraint_audit(
            spark,
            {
                "customer": customer,
                "orders": orders,
                "lineitem": lineitem,
                "documents": documents,
                "events": events,
            },
        ).collect()
    }
    assert got["customer.c_custkey unique"] == (3, 1, False)
    assert got["documents.doc_id unique"] == (3, 1, False)
    assert got["orders.o_custkey not_null"] == (4, 1, False)
    assert got["events.ts not_null"] == (1, 1, False)
    # NULL custkey is not_null's violation, NOT a dangling reference
    assert got["orders.o_custkey -> customer"] == (4, 1, False)
    assert got["lineitem.l_orderkey -> orders"] == (3, 1, False)
    assert got["lineitem.l_quantity positive"] == (3, 1, False)
    assert got["documents.n_chars non_negative"] == (3, 1, False)
    assert got["orders.o_orderkey unique"] == (4, 0, True)


def test_fuzzy_pairs_golden(spark):
    rows = [
        (1, "red widget"),
        (2, "rad widget"),   # dist 1 to red widget
        (3, "bed widget"),   # dist 1 to red, 2 to rad
        (4, "red gadget"),   # other block: never compared to widgets
        (5, "rod gadget"),   # dist 1 to red gadget
    ]
    df = spark.createDataFrame(rows, schema="id long, name string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_name_pairs(
            df, "id", "name", "split(name, ' ')[1]", max_dist=3
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2, (4, 5): 1}
    # cross-block pair (1, 4) has dist 3 ("red widget" -> "red gadget")
    # but blocking must exclude it — that's the stated recall tradeoff
    assert (1, 4) not in got


def test_fuzzy_threshold_boundary(spark):
    rows = [(1, "abcd x"), (2, "wxyz x")]  # dist 4
    df = spark.createDataFrame(rows, schema="id long, name string")
    at4 = fuzzy_name_pairs(df, "id", "name", "split(name, ' ')[1]", max_dist=4)
    at3 = fuzzy_name_pairs(df, "id", "name", "split(name, ' ')[1]", max_dist=3)
    assert at4.count() == 1 and at3.count() == 0


def test_cube_subtotals(spark):
    li = spark.createDataFrame(
        [("A", "F", 10.0), ("A", "O", 20.0), ("B", "F", 5.0)],
        schema="l_returnflag string, l_linestatus string, l_extendedprice double",
    )
    cube = (
        li.withColumn(
            "cents", F.expr("cast(round(l_extendedprice * 100, 0) as bigint)")
        )
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count("*").alias("n_items"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    got = {
        (r.l_returnflag, r.l_linestatus, r.g_flag, r.g_status): (
            r.n_items,
            r.revenue_cents,
        )
        for r in cube.collect()
    }
    assert got[("A", "F", 0, 0)] == (1, 1000)
    assert got[("A", None, 0, 1)] == (2, 3000)   # subtotal over statuses
    assert got[(None, "F", 1, 0)] == (2, 1500)   # subtotal over flags
    assert got[(None, None, 1, 1)] == (3, 3500)  # grand total
    assert len(got) == 3 + 2 + 2 + 1  # populated cells + marginals + total


def test_new_op_plan_shapes(spark):
    """Scale-property regression guards: the fuzzy join is an equi-join
    on the block key (never a cartesian / nested-loop), and the k-means
    assignment stage is pure map work (no Join operator at all —
    centroids are literals in the plan)."""
    from careers_spark.operators.clustering import _assign, _quantize

    df = spark.createDataFrame(
        [(i, f"name {i % 3}") for i in range(20)], schema="id long, name string"
    )
    fz = fuzzy_name_pairs(df, "id", "name", "split(name, ' ')[1]", max_dist=2)
    fz_plan = fz._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in fz_plan, fz_plan
    assert "BroadcastNestedLoopJoin" not in fz_plan, fz_plan

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 5)]) for i in range(10)],
        schema="vec_id long, embedding array<float>",
    )
    q = _quantize(emb, "vec_id", "embedding")
    a_plan = (
        _assign(q, [[0, 0], [1_000_000, 2_000_000]])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in a_plan, a_plan
    assert "Exchange" not in a_plan, a_plan


def test_benford_hand_golden(spark):
    """Constructed amounts 1/1/19/25/3000: digits 1x3, 2x1, 3x1 —
    counts, shares, and the exact-integer chi2 numerators recomputed
    in python; zero and negative amounts are excluded."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.audit import benford_audit, _BENFORD_P9

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    df = spark.createDataFrame(
        [(1,), (1,), (19,), (25,), (3000,), (0,), (-7,)], "amount long"
    )
    rows = {r.digit: r for r in benford_audit(spark, df).collect()}
    assert len(rows) == 9  # every digit reports, absent ones at 0
    n = 5
    want_counts = {1: 3, 2: 1, 3: 1}
    for d in range(1, 10):
        r = rows[d]
        c = want_counts.get(d, 0)
        assert r.n_obs == c
        assert r.obs_share == r6(c / n)
        p9 = _BENFORD_P9[d]
        assert r.exp_share == r6(p9 / 1e9)
        diff = c * 10**9 - n * p9
        assert r.chi2_term == r6(diff * 1.0 * diff / (1e9 * n * p9))
    # sanity: the Benford masses themselves sum to ~1
    assert abs(sum(_BENFORD_P9.values()) / 1e9 - 1.0) < 1e-8
    assert math.isclose(
        _BENFORD_P9[1] / 1e9, math.log10(2), rel_tol=1e-8
    )


def test_benford_conforming_sample_small_chi2(spark):
    """A corpus drawn to the exact Benford proportions has every
    chi2 term near zero; a constant-digit corpus concentrates the
    statistic on its digit."""
    from careers_spark.operators.audit import benford_audit, _BENFORD_P9

    conform = []
    base = 10000
    k = 0
    for d in range(1, 10):
        c = round(_BENFORD_P9[d] / 1e9 * base)
        for _ in range(c):
            conform.append((d * 100 + k % 100,))
            k += 1
    df = spark.createDataFrame(conform, "amount long")
    terms = [r.chi2_term for r in benford_audit(spark, df).collect()]
    assert sum(terms) < 0.01
    flat = spark.createDataFrame([(9000 + i,) for i in range(50)], "amount long")
    rows = {r.digit: r for r in benford_audit(spark, flat).collect()}
    assert rows[9].n_obs == 50 and rows[9].chi2_term > 50
    assert rows[1].n_obs == 0 and rows[1].chi2_term > 0
