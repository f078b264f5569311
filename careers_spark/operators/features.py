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

from pyspark.sql import DataFrame, Window
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


def woe_iv(
    df: DataFrame, feature: str = "feature", label: str = "label"
) -> DataFrame:
    """Weight-of-evidence / information-value screening of a
    categorical feature against a binary label — the scorecard-
    modelling standard (Siddiqi 2006) for "how predictive is source
    of English-ness" style questions, and the ranking statistic
    credit-risk pipelines use to pick features before fitting.

    Laplace-smoothed with half a count per cell so empty cells stay
    finite, written in INTEGER form (the only float op is one ln):

        dg_g = (2*good_g + 1) / (2*G + k)     (as exact integer ratio)
        db_g = (2*bad_g  + 1) / (2*B + k)
        woe_g = ln( (2*good_g+1)*(2*B+k) / ((2*bad_g+1)*(2*G+k)) )
        iv_g  = (dg_g - db_g) * woe_g,   IV = sum_g iv_g

    Per-category counts come from ONE partial-agg groupBy; the k-row
    close broadcasts the 1-row totals back. iv terms are quantized to
    the 1e-9 lattice (BIGINT) before the cross-category sum so the
    total IV is an order-free exact integer sum (the unigram_logloss
    recipe); woe/iv_term/iv_total close as shared-text doubles.

    Output: one row per category (feature, n, n_good, n_bad, woe,
    iv_term, iv_total) — iv_total repeated for release convenience.
    """
    lab = F.col(label).cast("long")
    g = df.groupBy(feature).agg(
        F.count("*").alias("n"),
        F.sum(lab).alias("n_good"),
        F.sum(1 - lab).alias("n_bad"),
    )
    tot = g.agg(
        F.sum("n_good").alias("g_all"),
        F.sum("n_bad").alias("b_all"),
        F.count("*").alias("k_cats"),
    )
    woe = (
        "ln((2 * n_good + 1e0) * (2 * b_all + k_cats)"
        " / ((2 * n_bad + 1e0) * (2 * g_all + k_cats)))"
    )
    dgdb = (
        "((2 * n_good + 1e0) / (2 * g_all + k_cats)"
        " - (2 * n_bad + 1e0) / (2 * b_all + k_cats))"
    )
    iv_fp = f"cast(round(({dgdb}) * ({woe}) * 1e9, 0) as bigint)"
    cells = g.crossJoin(F.broadcast(tot)).withColumn(
        "iv_fp", F.expr(iv_fp)
    )
    w_all = Window.partitionBy()
    return cells.select(
        feature,
        "n",
        "n_good",
        "n_bad",
        F.expr(f"round({woe}, 6)").alias("woe"),
        F.expr("round(iv_fp / 1e9, 6)").alias("iv_term"),
        F.round(
            F.sum("iv_fp").over(w_all) / F.lit(1e9), 6
        ).alias("iv_total"),
    )
