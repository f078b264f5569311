"""Key-skew diagnostic — the report you run BEFORE a big join or
aggregation to decide whether a key needs salting / AQE skew handling:
per-key row counts summarized as total/distinct/max plus the top-k
heaviest keys with their corpus share.

Why first-class: at 100 TB the difference between a 2-hour and a
2-day job is usually ONE skewed key (the null user, the bot account,
the empty-string source). This operator is the measurement step of the
salting recipe used throughout this repo (canonicalize's salted CC,
AQE skew-join notes): measure, THEN salt the keys that need it.

Physical shape: one partial-agg groupBy(key) (map-side combinable —
the count table is at most distinct-keys large), then a TakeOrdered
top-k (never a global sort) plus one 1-row algebraic rollup broadcast
back onto the top rows for the share division. Integer counts; the
share is one rounded division — oracle-checkable exactly.

Output: top-k rows (key_value string, n_rows, share, rank) — rank by
(count desc, key asc), deterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def key_skew_report(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    counts = (
        df.select(F.col(key).cast("string").alias("key_value"))
        .groupBy("key_value")
        .agg(F.count("*").alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("n_keys"),
        F.max("n_rows").alias("_max"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k merged on the driver — no global sort, no single-partition
    # window over the counts table); the rank window then runs over
    # just the k surviving rows
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key_value"))
    top = (
        counts.orderBy(F.col("n_rows").desc(), "key_value")
        .limit(int(top_k))
        .withColumn("rank", F.row_number().over(w))
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key_value",
            "n_rows",
            F.col("rank").cast("integer").alias("rank"),
            F.expr("round(n_rows / cast(_total as double), 6)").alias("share"),
            F.col("n_keys").cast("long").alias("n_keys_total"),
            F.expr("round(_max * n_keys / cast(_total as double), 6)").alias(
                "skew_factor"
            ),
        )
    )


def partition_plan(
    df: DataFrame,
    byte_expr: str,
    target_mb: int = 128,
) -> DataFrame:
    """Partition-sizing advisory — size `spark.sql.shuffle.partitions`
    and `files.maxPartitionBytes` from measured data instead of
    folklore: one aggregate computes exact row count and per-row byte
    mass (``byte_expr`` — an integer SQL expression over the row, e.g.
    octet_length of the string columns plus fixed widths), and the
    plan is pure integer ceiling arithmetic toward ``target_mb``
    partitions. Pairs with key_skew_report: this sizes the partitions,
    that one tells you whether a skewed key will blow one up anyway.

    Exactness: counts and byte sums are BIGINTs; ceilings are integer
    (a + b - 1) div b — no float anywhere.

    Output: one row (n_rows, est_bytes, target_bytes,
    recommended_partitions, rows_per_partition, avg_row_bytes).
    """
    tgt = int(target_mb) * 1024 * 1024
    agg = df.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.expr(f"cast({byte_expr} as bigint)")).alias("est_bytes"),
    )
    return agg.select(
        "n_rows",
        "est_bytes",
        F.lit(tgt).cast("long").alias("target_bytes"),
        F.expr(
            f"greatest((est_bytes + {tgt} - 1) div {tgt}, 1)"
        ).alias("recommended_partitions"),
        F.expr(
            f"(n_rows + greatest((est_bytes + {tgt} - 1) div {tgt}, 1) - 1)"
            f" div greatest((est_bytes + {tgt} - 1) div {tgt}, 1)"
        ).alias("rows_per_partition"),
        F.expr(
            "case when n_rows = 0 then null"
            " else est_bytes div n_rows end"
        ).alias("avg_row_bytes"),
    )


def join_cardinality_qerror(
    left: DataFrame,
    right: DataFrame,
    key: str,
) -> DataFrame:
    """Planner-diagnostics Q-error of the TEXTBOOK join-size estimate:
    every cost-based optimizer (Spark's CBO included) estimates
    |L join R| as |L| * |R| / max(ndv_L, ndv_R) under the uniformity
    assumption; this operator computes that estimate AND the exact
    actual (sum over shared keys of c_L * c_R) and reports the Q-error
    max(est/act, act/est) — the standard metric of estimator damage
    (Moerkotte et al., VLDB 2009: plan quality degrades with the
    FOURTH power of Q). A large Q-error on a production join key is
    the signal to collect a histogram / salt the key / switch join
    strategies BEFORE the 100x corpus makes the bad plan fatal.

    Exactness: per-key counts and the actual output size are exact
    BIGINT/DECIMAL(38,0) sums (c_L * c_R products ride decimal); the
    uniform estimate divides two exact integers once; Q-error is one
    shared-text double. NULL when either side is empty or the join is
    empty (Q undefined on a zero).

    Physical shape: two per-key count rollups, one equi-join of the
    COUNT tables (key-cardinality-sized, not row-sized), scalar close.

    Output: one row — (n_left, n_right, ndv_left, ndv_right,
    est_uniform, actual, q_error).
    """
    lc = left.groupBy(F.col(key).alias("k")).agg(
        F.count("*").alias("cl")
    )
    rc = right.groupBy(F.col(key).alias("k")).agg(
        F.count("*").alias("cr")
    )
    actual = lc.join(rc, "k").agg(
        F.coalesce(
            F.sum(F.col("cl").cast("decimal(19,0)") * F.col("cr")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("actual")
    )
    ls = lc.agg(
        F.sum("cl").alias("n_left"), F.count("*").alias("ndv_left")
    )
    rs = rc.agg(
        F.sum("cr").alias("n_right"), F.count("*").alias("ndv_right")
    )
    est = (
        "(n_left * cast(n_right as double)"
        " / greatest(ndv_left, ndv_right))"
    )
    return (
        ls.crossJoin(F.broadcast(rs))
        .crossJoin(F.broadcast(actual))
        .select(
            "n_left",
            "n_right",
            "ndv_left",
            "ndv_right",
            F.expr(
                f"case when n_left = 0 or n_right = 0 then null"
                f" else round({est}, 6) end"
            ).alias("est_uniform"),
            F.expr("cast(actual as double)").alias("actual"),
            F.expr(
                f"case when n_left = 0 or n_right = 0 or actual = 0"
                f" then null else round(greatest("
                f"{est} / cast(actual as double),"
                f" cast(actual as double) / {est}), 6) end"
            ).alias("q_error"),
        )
    )


def salt_advisor(
    df: DataFrame, key: str, target_rows: int = 1_000_000
) -> DataFrame:
    """Per-hot-key salting prescription — the actionable follow-up to
    key_skew_report: every key whose row count exceeds
    `target_rows` (the rows-per-task budget a shuffle partition
    should carry) gets the integer salt factor that brings its
    largest sub-key back under budget:

        salt_factor       = ceil(n_rows / target_rows)
        post_salt_max_rows = ceil(n_rows / salt_factor)

    both as exact integer ceil-divisions ((a + b - 1) div b) — this is
    the table a pipeline author turns directly into
    `hash(col, salt % k)` repartition keys, and the policy this
    engine's own canonicalization salting implements (CC_SALT).

    One partial-agg groupBy(key); only keys OVER budget emit rows (an
    empty result is the all-clear).

    Output: (key_value, n_rows, salt_factor, post_salt_max_rows).
    """
    t = int(target_rows)
    return (
        df.select(F.col(key).cast("string").alias("key_value"))
        .groupBy("key_value")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > t)
        .select(
            "key_value",
            "n_rows",
            F.expr(f"(n_rows + {t} - 1) div {t}").alias("salt_factor"),
            F.expr(
                f"(n_rows + ((n_rows + {t} - 1) div {t}) - 1)"
                f" div ((n_rows + {t} - 1) div {t})"
            ).alias("post_salt_max_rows"),
        )
    )
