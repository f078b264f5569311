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


def source_ablation(
    documents: DataFrame,
    strata: str = "source",
) -> DataFrame:
    """Leave-one-source-out ablation report — the cheap data-valuation
    pass run before dropping or renegotiating a feed: for each source,
    what the corpus profile becomes WITHOUT it (doc share, English
    share, mean length) and how far that moves each metric from the
    full-corpus value.

    Every without-s statistic is pure algebra on exact integers
    (corpus totals minus the source's own sums — one groupBy plus a
    broadcast 1-row total, no second scan per source, which is what
    makes this O(1) ablations instead of |sources| re-runs); deltas
    subtract the two ROUNDED means so the report columns are
    self-consistent. A source covering the whole corpus reports NULL
    without-metrics rather than 0/0.

    Output: (source, n_docs, share, en_share_without,
    mean_chars_without, delta_en_share, delta_mean_chars).
    """
    en = F.when(F.col("lang") == "en", 1).otherwise(0)
    ch = F.col("n_chars").cast("long")
    per = documents.groupBy(F.col(strata).alias("s")).agg(
        F.count("*").alias("n_s"),
        F.sum(en).alias("e_s"),
        F.sum(ch).alias("c_s"),
    )
    tot = documents.agg(
        F.count("*").alias("n_all"),
        F.sum(en).alias("e_all"),
        F.sum(ch).alias("c_all"),
    )
    whole = F.col("n_all") == F.col("n_s")
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias(strata),
        F.col("n_s").alias("n_docs"),
        F.expr("round(n_s * 1e0 / n_all, 6)").alias("share"),
        F.when(whole, F.lit(None).cast("double"))
        .otherwise(
            F.expr("round((e_all - e_s) * 1e0 / (n_all - n_s), 6)")
        )
        .alias("en_share_without"),
        F.when(whole, F.lit(None).cast("double"))
        .otherwise(
            F.expr("round((c_all - c_s) * 1e0 / (n_all - n_s), 6)")
        )
        .alias("mean_chars_without"),
        F.when(whole, F.lit(None).cast("double"))
        .otherwise(
            F.expr(
                "round(round((e_all - e_s) * 1e0 / (n_all - n_s), 6)"
                " - round(e_all * 1e0 / n_all, 6), 6)"
            )
        )
        .alias("delta_en_share"),
        F.when(whole, F.lit(None).cast("double"))
        .otherwise(
            F.expr(
                "round(round((c_all - c_s) * 1e0 / (n_all - n_s), 6)"
                " - round(c_all * 1e0 / n_all, 6), 6)"
            )
        )
        .alias("delta_mean_chars"),
    )


def corpus_datasheet(documents: DataFrame) -> DataFrame:
    """The dataset card in one row — the release-gate summary every
    published corpus ships (Gebru et al., "Datasheets for Datasets"),
    composed from the repo's own exact curation legs so each number
    is individually oracle-gated elsewhere and jointly here:

      n_docs / n_tokens / n_langs       basic inventory
      exact_dup_frac                    1 - distinct text hashes / docs
      near_dup_kept_frac                near_dup_canonical survivors
      gopher_keep_frac                  repetition-filter pass rate
      contaminated_frac                 eval-overlap screen hits
      pii_clean_frac                    pii_scrub all-clean share
      mean_quality                      exact: quality rides its 1e-6
                                        lattice, so the SUM is an
                                        exact integer and the mean one
                                        division

    Pure composition — five leg operators plus two trivial rollups,
    each a partial-agg pass; the close is a single row of counts and
    single divisions.

    Output: one row — (n_docs, n_tokens, n_langs, exact_dup_frac,
    near_dup_kept_frac, gopher_keep_frac, contaminated_frac,
    pii_clean_frac, mean_quality).
    """
    from careers_spark.operators.dedup import (
        contamination_flags,
        dedup_exact,
        near_dup_canonical,
    )
    from careers_spark.operators.privacy import pii_scrub
    from careers_spark.operators.textstats import (
        gopher_repetition,
        quality_score,
    )

    base = documents.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    ntok = (
        quality_score(documents)
        .agg(
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(
                F.expr("cast(round(quality * 1000000, 0) as long)")
            ).alias("q_sum"),
        )
    )
    dedup = dedup_exact(documents).agg(
        F.count("*").cast("long").alias("n_hashes")
    )
    nd = near_dup_canonical(documents).agg(
        F.sum(F.when(F.col("is_kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept")
    )
    gr = gopher_repetition(documents).agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_gopher_keep")
    )
    ct = contamination_flags(
        documents, eval_pred="doc_id % 97 = 0", n=3, threshold=0.05
    ).agg(
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.count("*").cast("long").alias("n_screened"),
    )
    pii = pii_scrub(documents).agg(
        F.sum(F.when(F.col("is_clean"), 1).otherwise(0))
        .cast("long")
        .alias("n_clean")
    )
    row = (
        base.crossJoin(F.broadcast(ntok))
        .crossJoin(F.broadcast(dedup))
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(gr))
        .crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(pii))
    )
    return row.select(
        "n_docs",
        "n_tokens",
        "n_langs",
        F.expr(
            "round((n_docs - n_hashes) * 1e0 / n_docs, 6)"
        ).alias("exact_dup_frac"),
        F.expr("round(n_kept * 1e0 / n_docs, 6)").alias(
            "near_dup_kept_frac"
        ),
        F.expr("round(n_gopher_keep * 1e0 / n_docs, 6)").alias(
            "gopher_keep_frac"
        ),
        F.expr(
            "round(n_contaminated * 1e0 / n_screened, 6)"
        ).alias("contaminated_frac"),
        F.expr("round(n_clean * 1e0 / n_docs, 6)").alias(
            "pii_clean_frac"
        ),
        F.expr("round(q_sum / (n_docs * 1e6), 6)").alias(
            "mean_quality"
        ),
    )
