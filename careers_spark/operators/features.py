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


def weak_lf_analysis(
    df: DataFrame,
    lfs: list[str],
    unit: str = "unit",
    gold: str | None = None,
) -> DataFrame:
    """Snorkel-style labeling-function analysis (Ratner et al., VLDB
    2018) — the diagnostic table a weak-supervision pipeline prints
    before training a label model: for each labeling function (a
    column voting 1 / 0 / NULL-abstain), its coverage (how often it
    votes), overlap (votes alongside at least one other LF), conflict
    (votes AGAINST at least one other LF), and — when a gold column is
    available on a dev slice — empirical accuracy. High coverage +
    high conflict + low accuracy is the "fire this LF" signature.

    All counts are exact integers from ONE pass over the corpus (the
    per-LF indicators are plain column expressions folded into a
    single algebraic aggregate — no explode, no window, no second
    scan); each rate is a single division rounded at 6 dp.

    Output: one row per LF — (lf, n_total, n_votes, coverage,
    n_overlap, overlap, n_conflict, conflict, n_correct, accuracy);
    the gold columns are NULL when `gold` is not given, and accuracy
    is NULL for an LF that never votes.
    """
    if len(lfs) < 2:
        raise ValueError("weak_lf_analysis needs >= 2 labeling functions")
    aggs = [F.count("*").alias("n_total")]
    for i, lf in enumerate(lfs):
        me = F.col(lf)
        others_vote = None
        others_disagree = None
        for j, other in enumerate(lfs):
            if j == i:
                continue
            ov = F.col(other).isNotNull()
            od = F.col(other).isNotNull() & (F.col(other) != me)
            others_vote = ov if others_vote is None else (others_vote | ov)
            others_disagree = (
                od if others_disagree is None else (others_disagree | od)
            )
        votes = me.isNotNull()
        aggs.append(F.sum(F.when(votes, 1).otherwise(0)).alias(f"v{i}"))
        aggs.append(
            F.sum(F.when(votes & others_vote, 1).otherwise(0)).alias(
                f"o{i}"
            )
        )
        aggs.append(
            F.sum(F.when(votes & others_disagree, 1).otherwise(0)).alias(
                f"c{i}"
            )
        )
        if gold is not None:
            aggs.append(
                F.sum(
                    F.when(votes & (me == F.col(gold)), 1).otherwise(0)
                ).alias(f"g{i}")
            )
    wide = df.agg(*aggs)
    rows = []
    for i, lf in enumerate(lfs):
        acc = (
            F.expr(
                f"case when v{i} = 0 then null"
                f" else round(g{i} * 1e0 / v{i}, 6) end"
            )
            if gold is not None
            else F.lit(None).cast("double")
        )
        rows.append(
            F.struct(
                F.lit(lf).alias("lf"),
                F.col("n_total").alias("n_total"),
                F.col(f"v{i}").alias("n_votes"),
                F.expr(f"round(v{i} * 1e0 / n_total, 6)").alias("coverage"),
                F.col(f"o{i}").alias("n_overlap"),
                F.expr(
                    f"case when v{i} = 0 then null"
                    f" else round(o{i} * 1e0 / v{i}, 6) end"
                ).alias("overlap"),
                F.col(f"c{i}").alias("n_conflict"),
                F.expr(
                    f"case when v{i} = 0 then null"
                    f" else round(c{i} * 1e0 / v{i}, 6) end"
                ).alias("conflict"),
                (
                    F.col(f"g{i}")
                    if gold is not None
                    else F.lit(None).cast("long")
                ).alias("n_correct"),
                acc.alias("accuracy"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def weak_label_votes(
    df: DataFrame, lfs: list[str], unit: str = "unit"
) -> DataFrame:
    """Per-unit majority vote over labeling functions — the simplest
    Snorkel label model (their MajorityLabelVoter): count 1-votes and
    0-votes across the LF columns, emit the winner; TIES AND
    ALL-ABSTAIN yield NULL (the unit stays unlabeled rather than
    getting a coin flip — determinism over coverage). Pure map work:
    the vote is a per-row expression, no shuffle at any scale.

    Output: (unit, n_pos, n_neg, vote).
    """
    if not lfs:
        raise ValueError("weak_label_votes needs >= 1 labeling function")
    pos = None
    neg = None
    for lf in lfs:
        p = F.when(F.col(lf) == 1, 1).otherwise(0)
        ng = F.when(F.col(lf) == 0, 1).otherwise(0)
        pos = p if pos is None else pos + p
        neg = ng if neg is None else neg + ng
    return df.select(
        F.col(unit).alias("unit"),
        pos.cast("int").alias("n_pos"),
        neg.cast("int").alias("n_neg"),
    ).withColumn(
        "vote",
        F.when(F.col("n_pos") > F.col("n_neg"), F.lit(1))
        .when(F.col("n_neg") > F.col("n_pos"), F.lit(0))
        .otherwise(F.lit(None).cast("int")),
    )
