"""Dataset profiling: per-column quality statistics in one pass.

The data-quality dashboard primitive every ingestion pipeline runs
before training on a new source — null rates, cardinalities, and value
ranges per column (DuckDB's SUMMARIZE, Deequ's profiler, the pandas
`describe` analogue), expressed as plain Catalyst aggregates so the
whole profile is one job and exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile over ONE aggregation pass.

    For every named column: row count, null count, exact distinct
    count, and (cast through string for a uniform schema) min / max.
    Numeric columns compare numerically BEFORE the cast, so min/max are
    the true extrema rendered as strings, not lexicographic artifacts.

    Column references use the DataFrame API (``df[c]``) and internal
    aliases are index-based, so names containing spaces, dashes, dots,
    or reserved words profile correctly — nothing user-controlled is
    ever interpolated into parsed SQL.

    Physical shape: a single groupBy().agg(...) — counts and min/max
    are algebraic; the n exact count(distinct)s expand to n passes
    (Spark's Expand) over the scan, which is the standard exact-profile
    cost; swap in approx_count_distinct at interactive scale (not the
    default here because HLL++ and DuckDB's sketch differ — exactness
    is the point of the oracle-gated profile). The result is one row
    per profiled column, stacked via a struct array built with the
    column API — no shuffle beyond the aggregate itself.

    Output: (column, n_rows, n_nulls, n_distinct, min_str, max_str).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(df[c].isNull().cast("long")).alias(f"_null_{i}"),
            F.countDistinct(df[c]).alias(f"_dist_{i}"),
            F.min(df[c]).cast("string").alias(f"_min_{i}"),
            F.max(df[c]).cast("string").alias(f"_max_{i}"),
        ]
    one = df.agg(*aggs)
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{i}").alias("n_nulls"),
                F.col(f"_dist_{i}").alias("n_distinct"),
                F.col(f"_min_{i}").alias("min_str"),
                F.col(f"_max_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(stacked).alias("s")).select("s.*")
