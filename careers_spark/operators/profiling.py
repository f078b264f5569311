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

    Physical shape: a single groupBy().agg(...) — counts and min/max
    are algebraic; the n exact count(distinct)s expand to n passes
    (Spark's Expand) over the scan, which is the standard exact-profile
    cost; swap in approx_count_distinct at interactive scale (not the
    default here because HLL++ and DuckDB's sketch differ — exactness
    is the point of the oracle-gated profile). The result is one row
    per profiled column, stacked via a literal struct array — no
    shuffle beyond the aggregate itself.

    Output: (column, n_rows, n_nulls, n_distinct, min_str, max_str).
    """
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"struct('{c}' as column, _n as n_rows, _null_{c} as n_nulls,"
        f" _dist_{c} as n_distinct, _min_{c} as min_str, _max_{c} as max_str)"
        for c in cols
    )
    return one.select(
        F.explode(F.expr(f"array({stacked})")).alias("s")
    ).select("s.*")
