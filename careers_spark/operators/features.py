"""Training-feature construction operators.

The curation family decides WHICH rows enter training; this module
covers the standard transformations applied to categorical columns on
the way into a model. First entry: smoothed leave-one-out target
encoding (Micci-Barreca 2001, the catboost/category_encoders
standard) — the high-cardinality-categorical workhorse that must be
computed leakage-free at corpus scale.

Exactness recipe: category and global sums are exact BIGINTs from two
partial-agg passes; each row's encoding is ONE shared-text double
expression over those integers and its own label, rounded to 6 — so
the DuckDB oracle is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat: str,
    y: str,
    m: int = 10,
    out: str = "enc",
) -> DataFrame:
    """Leave-one-out target encoding with additive (m-estimate)
    smoothing toward the global mean:

        enc_i = (sum_cat - y_i + m * global_mean) / (n_cat - 1 + m)

    Subtracting the row's OWN label is what makes the feature safe to
    train on (plain per-category target means leak the label and
    overfit high-cardinality categories catastrophically); the
    m-estimate prior keeps rare categories near the global mean
    instead of near their noisy sample mean.

    Plan shape: one groupBy(cat) for the category sums (broadcast back
    — category dims are vocabulary-sized), one 1-row global aggregate
    (broadcast cross — the documented join_size_cms combiner shape),
    then a pure map pass; nothing scales worse than the groupBy on
    ``cat``. ``y`` must be integer-valued (0/1 labels or cents).

    Output: the input columns plus ``out`` (rounded to 6).
    """
    if m < 1:
        raise ValueError("m must be >= 1 (m = 0 breaks singleton categories)")
    yv = F.col(y).cast("long")
    per_cat = df.groupBy(cat).agg(
        F.count("*").alias("n_cat"),
        F.sum(yv).alias("s_cat"),
    )
    tot = df.agg(
        F.count("*").alias("n_all"),
        F.sum(yv).alias("s_all"),
    )
    enc = (
        f"round((s_cat - {y} + {int(m)}e0 * (s_all * 1e0 / n_all))"
        f" / (n_cat - 1e0 + {int(m)}e0), 6)"
    )
    return (
        df.join(F.broadcast(per_cat), cat)
        .crossJoin(F.broadcast(tot))
        .withColumn(out, F.expr(enc))
        .drop("n_cat", "s_cat", "n_all", "s_all")
    )
