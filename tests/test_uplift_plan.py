"""uplift_deciles + partition_plan."""

import random
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


_U_SCHEMA = "score double, treat int, conv int"


def test_uplift_two_level_golden(spark):
    from careers_spark.operators.evaluation import uplift_deciles

    # two score values only: the 9 cuts collapse; high scorers in
    # decile 1, low in decile 10 (value-cut semantics)
    rows = (
        [(0.9, 1, 1)] * 8 + [(0.9, 1, 0)] * 2      # treated high: 80%
        + [(0.9, 0, 1)] * 2 + [(0.9, 0, 0)] * 8    # control high: 20%
        + [(0.1, 1, 1)] * 3 + [(0.1, 1, 0)] * 7    # treated low: 30%
        + [(0.1, 0, 1)] * 3 + [(0.1, 0, 0)] * 7    # control low: 30%
    )
    df = spark.createDataFrame(rows, _U_SCHEMA)
    got = {r.decile: r for r in uplift_deciles(df).collect()}
    top = min(got)
    bot = max(got)
    assert got[top].uplift == _r6(0.8 - 0.2)
    assert got[bot].uplift == 0.0
    # qini: top term = 8 - 2*10/10 = 6; bottom adds 3 - 3 = 0
    assert got[top].qini_term == 6.0
    assert got[bot].qini_cum == 6.0


def test_uplift_lockstep_random(spark):
    from careers_spark.operators.evaluation import uplift_deciles

    rng = random.Random(79)
    rows = [
        (
            round(rng.random(), 2),
            rng.randint(0, 1),
            1 if rng.random() < 0.3 else 0,
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, _U_SCHEMA)
    got = {r.decile: r for r in uplift_deciles(df).collect()}
    # python: replicate value cuts via linear-interpolated percentiles
    import numpy as np

    scores = sorted(s for s, _, _ in rows)
    cuts = [float(np.quantile(scores, q / 10, method="linear")) for q in range(1, 10)]
    agg = {}
    for s, t, c in rows:
        d = 10 - sum(1 for cu in cuts if s > cu)
        a = agg.setdefault(d, [0, 0, 0, 0])
        a[0] += t
        a[1] += t * c
        a[2] += 1 - t
        a[3] += (1 - t) * c
    for d, (n_t, c_t, n_c, c_c) in agg.items():
        r = got[d]
        assert (r.n_t, r.c_t, r.n_c, r.c_c) == (n_t, c_t, n_c, c_c)
        if n_t and n_c:
            assert r.uplift == _r6(c_t / n_t - c_c / n_c)


def test_partition_plan_golden(spark):
    from careers_spark.operators.skew import partition_plan

    rows = [(i, "x" * 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, s string")
    # 108 bytes/row * 1000 rows = 108000; 1 MB target -> 1 partition
    got = partition_plan(df, "octet_length(s) + 8", target_mb=1).collect()[0]
    assert got.n_rows == 1000
    assert got.est_bytes == 108000
    assert got.recommended_partitions == 1
    assert got.rows_per_partition == 1000
    assert got.avg_row_bytes == 108


def test_partition_plan_ceiling(spark):
    from careers_spark.operators.skew import partition_plan

    # force > 1 partition: tiny target via bytes math (1 MB target,
    # 3 MB of rows -> 3 partitions; 10 rows -> 4 per partition)
    rows = [(i, "y" * (300 * 1024)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = partition_plan(df, "octet_length(s)", target_mb=1).collect()[0]
    assert got.recommended_partitions == 3
    assert got.rows_per_partition == 4
