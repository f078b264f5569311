"""Model/score evaluation metrics as first-class distributed operators.

The repo scores documents (quality, LM logloss), classifies them
(lang_id), and ranks retrieval candidates — this module closes the loop
with the metrics that judge those outputs: Mann-Whitney AUC for any
score-vs-binary-label question, and chi-squared discriminative-term
selection (the classic feature-selection statistic behind language-ID
lexicons and topic keyword lists).

Exactness recipe: every count is an integer aggregated map-side; the
only floating-point work is a handful of single expressions written
with the identical text in both engines (the pagerank/tfidf
convention), so DuckDB oracles are hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_score(df: DataFrame, score: str = "score", label: str = "label") -> DataFrame:
    """ROC AUC of a score against a binary label, computed exactly by
    the Mann-Whitney rank-sum identity with the standard 0.5 tie
    credit:

        AUC = [sum_s pos(s)*cumneg(<s) + pos(s)*neg(s)/2] / (P*N)

    No per-row ranking: rows collapse to one row per DISTINCT score
    value first (one partial-agg groupBy), and the cumulative runs over
    that distinct-score table — bounded cardinality for every rounded
    score in this repo (quality, logloss, cosine are all round(,6) of
    bounded expressions), so the single-partition ordered window is a
    vocabulary-sized dimension, never corpus-sized.

    Every term lands on the exact 0.5 grid (pos*neg/2 of integers), so
    the sum is order-free and engine-identical; AUC is one rounded
    division. Degenerate inputs (no positives or no negatives) report
    NULL rather than 0/0.

    Output: one row (npos, nneg, auc).
    """
    lab = F.col(label).cast("long")
    g = df.groupBy(score).agg(
        F.sum(lab).alias("pos"),
        F.sum(1 - lab).alias("neg"),
    )
    w = Window.orderBy(score).rowsBetween(Window.unboundedPreceding, -1)
    g2 = g.withColumn("cumneg", F.coalesce(F.sum("neg").over(w), F.lit(0)))
    agg = g2.agg(
        F.sum(
            F.col("pos") * F.col("cumneg") + F.col("pos") * F.col("neg") / 2
        ).alias("num"),
        F.sum("pos").alias("npos"),
        F.sum("neg").alias("nneg"),
    )
    return agg.select(
        "npos",
        "nneg",
        F.when(
            (F.col("npos") == 0) | (F.col("nneg") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(F.col("num") / (F.col("npos") * 1e0 * F.col("nneg")), 6)
        )
        .alias("auc"),
    )


# chi2 of the 2x2 (term-presence x class) table, in the shared-text
# form both engines evaluate identically. a = docs with term in class,
# df_t = docs with term, nl = docs in class, nn = all docs; the other
# three cells are derived. Every product runs in DOUBLE (1e0 factors —
# bare 1.0 literals parse as DECIMAL in Spark) so billion-doc counts
# cannot overflow BIGINT; identical expression text => identical IEEE
# result => round(,6) matches.
_CHI2_EXPR = (
    "round((nn * 1e0) * adbc * adbc / "
    "((df_t * 1e0) * (nn - df_t) * nl * (nn - nl)), 6)"
)
_ADBC_EXPR = (
    "a * 1e0 * (nn - nl - df_t + a) - (df_t - a) * 1e0 * (nl - a)"
)


def chi2_terms(
    documents: DataFrame,
    tokens_expr,
    class_col: str = "lang",
    top_n: int = 5,
    min_df: int = 5,
) -> DataFrame:
    """Top discriminative terms per class by the chi-squared statistic
    of the doc-level 2x2 presence table — the classic supervised
    feature selection (Yang & Pedersen 1997) used to build language-ID
    lexicons and per-domain keyword lists.

    `tokens_expr` is a Column producing the token array (the shared
    tokens_col so Spark and the SQL oracle tokenize identically).
    Presence is per-document (array_distinct), mirroring document
    frequency. Terms in fewer than `min_df` docs are dropped before
    scoring; cells whose marginals would zero the denominator (term in
    every doc, single-class corpora) are excluded rather than NULLed.

    Shapes: one explode + two partial-agg groupBys for the count
    tables, class/corpus totals broadcast back, and a per-CLASS
    row_number window for the top-n — no global sort.

    Output: (class, token, n_class_docs, chi2, rk).
    """
    toks = documents.select(
        "doc_id",
        F.col(class_col).alias("cls"),
        F.explode(F.array_distinct(tokens_expr)).alias("tok"),
    )
    a = toks.groupBy("cls", "tok").agg(F.countDistinct("doc_id").alias("a"))
    df_t = (
        a.groupBy("tok").agg(F.sum("a").alias("df_t")).filter(F.col("df_t") >= min_df)
    )
    nl = documents.groupBy(F.col(class_col).alias("cls")).agg(
        F.count("*").alias("nl")
    )
    nn = documents.count()
    scored = (
        a.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(nl), "cls")
        .withColumn("nn", F.lit(int(nn)))
        .filter((F.col("df_t") < F.col("nn")) & (F.col("nl") < F.col("nn")))
        .withColumn("adbc", F.expr(_ADBC_EXPR))
        .withColumn("chi2", F.expr(_CHI2_EXPR))
    )
    w = Window.partitionBy("cls").orderBy(F.desc("chi2"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select(
            F.col("cls").alias(class_col),
            F.col("tok").alias("token"),
            F.col("a").alias("n_class_docs"),
            "chi2",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def confusion_stats(
    df: DataFrame, truth: str = "truth", pred: str = "pred"
) -> DataFrame:
    """Per-class confusion summary with precision / recall / F1 — the
    classifier report card for any (truth, pred) pairing (here:
    lang_id's prediction vs the documents table's lang column).

    Exactness: the three count tables are integers from partial-agg
    groupBys; precision and recall are one rounded division each, and
    F1 uses the identity F1 = 2a / (n_true + n_pred) — a SINGLE
    division of integers rather than the 2PR/(P+R) composition of two
    already-rounded values, so no compounding.

    Classes = the union of observed truth and pred values (a class
    never predicted still reports recall; a hallucinated class still
    reports precision). Zero denominators -> NULL, not 0.

    Shapes: three partial-agg groupBys over the same scan + two
    broadcast-sized outer joins on the class dimension (bounded by
    the label vocabulary, never corpus-sized).

    Output: (cls, n_true, n_pred, n_correct, precision, recall, f1).
    """
    # r6 (guide §2.4): three aggregations consume the same (truth,
    # pred) pairing, whose upstream is typically a scoring pipeline
    # (lang_id is ~15 Catalyst stages) — materialize the two-column
    # projection once instead of re-running that pipeline per agg
    df = df.select(truth, pred).localCheckpoint(eager=True)
    t = df.groupBy(F.col(truth).alias("cls")).agg(F.count("*").alias("n_true"))
    p = df.groupBy(F.col(pred).alias("cls")).agg(F.count("*").alias("n_pred"))
    c = (
        df.filter(F.col(truth) == F.col(pred))
        .groupBy(F.col(truth).alias("cls"))
        .agg(F.count("*").alias("n_correct"))
    )
    z = F.lit(0).cast("long")
    base = (
        t.join(p, "cls", "full_outer")
        .join(c, "cls", "full_outer")
        .select(
            "cls",
            F.coalesce("n_true", z).alias("n_true"),
            F.coalesce("n_pred", z).alias("n_pred"),
            F.coalesce("n_correct", z).alias("n_correct"),
        )
    )
    return base.select(
        "cls",
        "n_true",
        "n_pred",
        "n_correct",
        F.when(F.col("n_pred") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n_correct") / (F.col("n_pred") * F.lit(1.0)), 6))
        .alias("precision"),
        F.when(F.col("n_true") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n_correct") / (F.col("n_true") * F.lit(1.0)), 6))
        .alias("recall"),
        F.round(
            2 * F.col("n_correct") / ((F.col("n_true") + F.col("n_pred")) * F.lit(1.0)),
            6,
        ).alias("f1"),
    )


def cohens_kappa(
    df: DataFrame, truth: str = "truth", pred: str = "pred"
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two labelers
    (annotator-agreement for labeling pipelines; here, lang_id vs the
    corpus lang column). kappa = (po - pe) / (1 - pe) with po the
    observed agreement rate and pe the chance rate sum_c t_c*p_c / n^2.

    Cross-multiplied to keep everything on exact integers until ONE
    shared-text division:

        kappa = (n * n_agree - sum_rc) / (n * n - sum_rc)

    sum_rc = sum_c n_true_c * n_pred_c stays within BIGINT while
    n_true_c * n_pred_c < 2^63 per class (~3e9 rows per class) — noted
    rather than silently promoted, since promotion to DOUBLE would
    reintroduce order-dependence. pe = 1 (single-class degenerate)
    -> NULL.

    Output: one row (nn, n_agree, sum_rc, accuracy, kappa).
    """
    # r6 (guide §2.4): three aggregations consume the same (truth,
    # pred) pairing — materialize the two-column projection once (the
    # confusion_stats fix; the upstream is typically a scoring chain)
    df = df.select(truth, pred).localCheckpoint(eager=True)
    t = df.groupBy(F.col(truth).alias("cls")).agg(F.count("*").alias("n_true"))
    p = df.groupBy(F.col(pred).alias("cls")).agg(F.count("*").alias("n_pred"))
    rc = (
        t.join(p, "cls")
        .agg(F.sum(F.col("n_true") * F.col("n_pred")).alias("sum_rc"))
        .select(F.coalesce("sum_rc", F.lit(0).cast("long")).alias("sum_rc"))
    )
    agg = df.agg(
        F.count("*").alias("nn"),
        F.sum(
            F.when(F.col(truth) == F.col(pred), 1).otherwise(0)
        ).alias("n_agree"),
    )
    return agg.crossJoin(rc).select(
        "nn",
        "n_agree",
        "sum_rc",
        F.round(F.col("n_agree") / (F.col("nn") * F.lit(1.0)), 6).alias("accuracy"),
        F.when(
            F.col("nn") * F.lit(1.0) * F.col("nn") - F.col("sum_rc") == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("nn") * F.lit(1.0) * F.col("n_agree") - F.col("sum_rc"))
                / (F.col("nn") * F.lit(1.0) * F.col("nn") - F.col("sum_rc")),
                6,
            )
        )
        .alias("kappa"),
    )


def fleiss_kappa(
    ratings: DataFrame,
    item: str = "item",
    rater: str = "rater",
    label: str = "label",
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among
    r >= 2 raters assigning categorical labels to N items; the
    multi-annotator generalization of cohens_kappa and the standard
    labeling-pipeline QA gate before annotator labels feed training.

        P_i   = sum_c n_ic (n_ic - 1) / (r (r - 1))
        Pbar  = mean_i P_i          = S / (N r (r - 1))
        Pe    = sum_c p_c^2,  p_c = T_c / (N r)
        kappa = (Pbar - Pe) / (1 - Pe)

    Everything upstream of the two final divisions is an exact
    integer: S = sum_ic n_ic(n_ic-1) and T_c = sum_i n_ic are BIGINT
    aggregates; sum_c T_c^2 rides DECIMAL(38,0) (T_c can reach N*r, so
    its square overflows BIGINT long before the corpus does — the
    matched_att/ARI headroom convention). Pbar and Pe are then single
    divisions of exact integers evaluated with identical expression
    text in both engines, so kappa hash-matches with one final round.

    Fleiss' formula assumes every item carries the same number of
    ratings; rather than crash or silently average, the operator
    emits (r_min, r_max) and NULLs kappa when they differ — a
    surfaced data defect, matching the convention that a violated
    precondition is a visible row, not a default. The rater column
    itself is not used beyond existence (each row = one rating); a
    duplicated (item, rater) pair is a data defect this operator
    counts as two ratings, which the r_min/r_max guard then exposes.

    Shape at scale: one partial-agg groupBy(item, label) over the
    ratings (the only corpus-sized pass), then item- and class-sized
    rollups closing to a single row.

    Output: one row — (n_items, n_raters, equal_raters, s_agree,
    sum_t2, pbar, pe, kappa).
    """
    cell = ratings.groupBy(
        F.col(item).alias("it"), F.col(label).alias("cls")
    ).agg(F.count("*").alias("nic"))
    per_item = cell.groupBy("it").agg(
        F.sum("nic").alias("m_i"),
        F.sum(F.col("nic") * (F.col("nic") - 1)).alias("s_i"),
    )
    tc = cell.groupBy("cls").agg(F.sum("nic").alias("t_c"))
    sums = per_item.agg(
        F.count("*").alias("n_items"),
        F.min("m_i").alias("r_min"),
        F.max("m_i").alias("r_max"),
        F.sum("s_i").alias("s_agree"),
    )
    t2 = tc.agg(
        F.sum(F.col("t_c").cast("decimal(38,0)") * F.col("t_c")).alias(
            "sum_t2"
        )
    )
    return (
        sums.crossJoin(F.broadcast(t2))
        .select(
            "n_items",
            F.col("r_max").alias("n_raters"),
            (F.col("r_min") == F.col("r_max")).alias("equal_raters"),
            "s_agree",
            "sum_t2",
            "r_min",
        )
        .select(
            "n_items",
            "n_raters",
            "equal_raters",
            "s_agree",
            "sum_t2",
            F.expr(
                "case when n_raters < 2 then null else"
                " round(s_agree / (n_items * 1e0 * n_raters"
                " * (n_raters - 1)), 6) end"
            ).alias("pbar"),
            F.expr(
                "round(cast(sum_t2 as double) / (n_items * 1e0"
                " * n_raters * n_items * n_raters), 6)"
            ).alias("pe"),
            F.expr(
                "case when r_min <> n_raters or n_raters < 2 then null"
                " else case when 1e0 - cast(sum_t2 as double)"
                " / (n_items * 1e0 * n_raters * n_items * n_raters)"
                " = 0e0 then null else"
                " round((s_agree / (n_items * 1e0 * n_raters"
                " * (n_raters - 1)) - cast(sum_t2 as double)"
                " / (n_items * 1e0 * n_raters * n_items * n_raters))"
                " / (1e0 - cast(sum_t2 as double) / (n_items * 1e0"
                " * n_raters * n_items * n_raters)), 6) end end"
            ).alias("kappa"),
        )
    )


def krippendorff_alpha(
    ratings: DataFrame,
    item: str = "item",
    label: str = "label",
) -> DataFrame:
    """Krippendorff's alpha, nominal metric (Krippendorff 2004) — the
    agreement coefficient for the messy case fleiss_kappa surfaces and
    refuses: raters may skip items, items may carry different numbers
    of ratings. Units with fewer than 2 ratings are unpairable and
    drop out (their count is emitted, not hidden).

        o_u   = sum_c n_uc (m_u - n_uc) / (m_u - 1)   per pairable unit
        D_o   = sum_u o_u / n
        D_e   = sum_c T_c (n - T_c) / (n (n - 1))
        alpha = 1 - D_o / D_e

    with m_u the unit's rating count, n = sum m_u over pairable units,
    T_c the category totals over pairable units.

    Exactness: every n_uc / m_u / T_c is an exact BIGINT; o_u is a
    per-unit integer ratio whose across-unit sum carries only IEEE
    addition-order noise (~1e-16 relative, far below the final
    round(,6) digit — the pagerank-sum argument); D_e is one division
    of exact integers (T_c(n - T_c) rides DECIMAL(38,0) for headroom).
    Degenerate cases NULL rather than divide by zero: no pairable
    units, or a single observed category (D_e = 0).

    One partial-agg groupBy(item, label) is the only corpus-sized
    pass — identical shape to fleiss_kappa.

    Output: one row — (n_units, n_pairable, n_ratings, do_sum, d_e,
    alpha).
    """
    cell = ratings.groupBy(
        F.col(item).alias("it"), F.col(label).alias("cls")
    ).agg(F.count("*").alias("nuc"))
    per_unit = cell.groupBy("it").agg(
        F.sum("nuc").alias("m_u"),
        F.sum(F.col("nuc") * F.col("nuc")).alias("sq"),
    )
    # sum_c nuc*(m_u - nuc) = m_u^2 - sum_c nuc^2, exact integers
    units = per_unit.agg(
        F.count("*").alias("n_units"),
        F.sum(F.when(F.col("m_u") >= 2, 1).otherwise(0)).alias(
            "n_pairable"
        ),
        F.coalesce(
            F.sum(
                F.when(F.col("m_u") >= 2, F.col("m_u")).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_ratings"),
        F.sum(
            F.when(
                F.col("m_u") >= 2,
                (F.col("m_u") * F.col("m_u") - F.col("sq"))
                / (F.col("m_u") - F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("do_sum"),
    )
    pairable = per_unit.filter(F.col("m_u") >= 2).select("it")
    tc = (
        cell.join(pairable, "it")
        .groupBy("cls")
        .agg(F.sum("nuc").alias("t_c"))
    )
    t2 = tc.agg(
        F.sum(F.col("t_c").cast("decimal(38,0)") * F.col("t_c")).alias(
            "sum_t2"
        )
    )
    return (
        units.crossJoin(F.broadcast(t2))
        .select(
            "n_units",
            "n_pairable",
            "n_ratings",
            F.expr("round(coalesce(do_sum, 0e0), 6)").alias("do_sum"),
            F.expr(
                "case when n_ratings < 2 then null else"
                " round((cast(n_ratings as double) * n_ratings"
                " - cast(sum_t2 as double))"
                " / (n_ratings * 1e0 * (n_ratings - 1)), 6) end"
            ).alias("d_e"),
            F.expr(
                "case when n_ratings < 2 then null"
                " when (cast(n_ratings as double) * n_ratings"
                "  - cast(sum_t2 as double)) = 0e0 then null"
                " else round(1e0 - (coalesce(do_sum, 0e0) / n_ratings)"
                " / ((cast(n_ratings as double) * n_ratings"
                "     - cast(sum_t2 as double))"
                "    / (n_ratings * 1e0 * (n_ratings - 1))), 6) end"
            ).alias("alpha"),
        )
    )


def calibration_bins(
    df: DataFrame, score: str = "score", label: str = "label", bins: int = 10
) -> DataFrame:
    """Reliability diagram / ECE bins: equal-width bins over a [0, 1]
    score vs a binary label — per-bin mean confidence, empirical
    accuracy, and their gap (the Expected Calibration Error summand,
    Guo et al. 2017).

    Exactness: scores ride the 1e-6 integer lattice (every score in
    this repo is already round(,6), so round(score*1e6) is the exact
    integer), making the per-bin score sum an exact BIGINT; conf and
    acc are one shared-text division each, and gap = round(abs(...))
    of two identical doubles. score == 1.0 folds into the top bin
    (least(floor(score*bins), bins-1)), the standard closed-top rule.

    One partial-agg groupBy on a bins-sized key — map-side combinable,
    dimension-sized output.

    Output: (bin, n, n_pos, conf, acc, gap).
    """
    b = F.least(
        F.floor(F.col(score) * bins), F.lit(int(bins) - 1)
    ).cast("int")
    g = df.groupBy(b.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(label).cast("long")).alias("n_pos"),
        F.sum(
            F.expr(f"cast(round({score} * 1000000e0, 0) as bigint)")
        ).alias("su"),
    )
    conf = F.round(F.col("su") / (F.col("n") * F.lit(1.0)) / F.lit(1000000.0), 6)
    acc = F.round(F.col("n_pos") / (F.col("n") * F.lit(1.0)), 6)
    return g.select(
        "bin",
        "n",
        "n_pos",
        conf.alias("conf"),
        acc.alias("acc"),
        F.round(F.abs(conf - acc), 6).alias("gap"),
    )


# Welch statistic / degrees of freedom as shared expression text over
# exact integer (n, sum, sumsq) pairs: sample variance in the
# sum-of-squares form, then the t and Welch-Satterthwaite df. Every op
# (+ - * / sqrt) is IEEE-correctly-rounded, so identical text over
# identical integers yields identical doubles in Spark and DuckDB.
_W_V1 = "(ss_1 * 1e0 - s_1 * 1e0 * s_1 / n_1) / (n_1 - 1e0)"
_W_V0 = "(ss_0 * 1e0 - s_0 * 1e0 * s_0 / n_0) / (n_0 - 1e0)"
_W_SE2 = f"(({_W_V1}) / n_1 + ({_W_V0}) / n_0)"
_W_T = f"round((s_1 * 1e0 / n_1 - s_0 * 1e0 / n_0) / sqrt({_W_SE2}), 6)"
_W_DF = (
    f"round(({_W_SE2}) * ({_W_SE2}) / "
    f"((({_W_V1}) / n_1) * (({_W_V1}) / n_1) / (n_1 - 1e0) + "
    f"(({_W_V0}) / n_0) * (({_W_V0}) / n_0) / (n_0 - 1e0)), 6)"
)


def welch_ttest(
    df: DataFrame, value: str = "value", group: str = "grp"
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test of an INTEGER value
    column between group 1 and group 0 — the A/B companion to
    ab_conversion for continuous-ish outcomes (here: document length
    by language).

    One partial-agg pass collects (n, sum, sumsq) per group as exact
    BIGINTs (sumsq stays in range while n * max_value^2 < 2^63 —
    ~2e10 docs at 20k chars); the t statistic and Welch-Satterthwaite
    df are single shared-text double expressions over those integers
    (the ab_conversion z recipe). Degenerate inputs (either group with
    n < 2, or both variances zero) -> NULL t/df.

    Output: one row (n_1, n_0, s_1, s_0, mean_1, mean_0, var_1,
    var_0, t_stat, df_welch).
    """
    g1 = F.when(F.col(group) == 1, 1).otherwise(0)
    v = F.col(value).cast("long")
    agg = df.agg(
        F.sum(g1).alias("n_1"),
        F.sum(1 - g1).alias("n_0"),
        F.sum(v * g1).alias("s_1"),
        F.sum(v * (1 - g1)).alias("s_0"),
        F.sum(v * v * g1).alias("ss_1"),
        F.sum(v * v * (1 - g1)).alias("ss_0"),
    )
    bad = (
        (F.col("n_1") < 2)
        | (F.col("n_0") < 2)
        | (F.expr(_W_SE2) == 0)
    )
    return agg.select(
        "n_1",
        "n_0",
        "s_1",
        "s_0",
        F.round(F.expr("s_1 * 1e0 / n_1"), 6).alias("mean_1"),
        F.round(F.expr("s_0 * 1e0 / n_0"), 6).alias("mean_0"),
        F.when(F.col("n_1") < 2, F.lit(None).cast("double"))
        .otherwise(F.round(F.expr(_W_V1), 6))
        .alias("var_1"),
        F.when(F.col("n_0") < 2, F.lit(None).cast("double"))
        .otherwise(F.round(F.expr(_W_V0), 6))
        .alias("var_0"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(_W_T))
        .alias("t_stat"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(_W_DF))
        .alias("df_welch"),
    )


# Pearson r as one shared-text expression over the five exact integer
# sums: r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)).
# 1e0 factors promote each product to DOUBLE before it can overflow.
_CORR_NUM = "(n * 1e0 * sxy - sx * 1e0 * sy)"
_CORR_DX = "(n * 1e0 * sxx - sx * 1e0 * sx)"
_CORR_DY = "(n * 1e0 * syy - sy * 1e0 * sy)"
_CORR_R = f"round({_CORR_NUM} / sqrt({_CORR_DX} * {_CORR_DY}), 6)"


def pearson_corr(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Pearson correlation of two INTEGER columns, exactly: one
    partial-agg pass collects (n, Sx, Sy, Sxx, Syy, Sxy) as BIGINTs
    (in range while n * max|x| * max|y| < 2^63 — the per-column bound
    is stated, not silently promoted), then r is a single shared-text
    double expression — the welch_ttest recipe applied to correlation.
    Zero-variance columns -> NULL (not 0/0).

    Put non-integer inputs on an integer lattice first (the repo's
    round(v*1e6) convention) — that is what the driver query does with
    the quality score.

    Output: one row (n, sx, sy, sxx, syy, sxy, r).
    """
    xv = F.col(x).cast("long")
    yv = F.col(y).cast("long")
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(xv).alias("sx"),
        F.sum(yv).alias("sy"),
        F.sum(xv * xv).alias("sxx"),
        F.sum(yv * yv).alias("syy"),
        F.sum(xv * yv).alias("sxy"),
    )
    bad = (F.expr(_CORR_DX) == 0) | (F.expr(_CORR_DY) == 0) | (F.col("n") < 2)
    return agg.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(_CORR_R))
        .alias("r"),
    )


def spearman_corr(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Spearman rank correlation of two INTEGER columns, exactly:
    fractional average ranks are kept on the half-integer lattice as
    DOUBLED ranks (2*avgrank(v) = 2*#smaller + #equal + 1, an exact
    BIGINT), so the five Pearson sums over them are exact integers and
    rho is the same single shared-text closing expression as
    pearson_corr (scaling both variables by 2 leaves r unchanged).

    Scale shape: ranks come from the DISTINCT-value table (groupBy
    value -> count, one cumulative window over distinct values ordered
    by value), then a join back on value — the only sort is over the
    value cardinality, never the row count. Exact-BIGINT bound:
    sum(r2^2) <= 4n^3, in range while n < ~1.3e6 rows; beyond that,
    rank sums need a wider lattice (stated, not silently promoted).

    Output: one row (n, sx, sy, sxx, syy, sxy, rho).
    """

    def doubled_ranks(col: str, out: str) -> DataFrame:
        vc = df.groupBy(F.col(col).cast("long").alias("v")).agg(
            F.count("*").alias("cnt")
        )
        w = (
            Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return vc.select(
            "v",
            (
                F.lit(2) * F.coalesce(F.sum("cnt").over(w), F.lit(0))
                + F.col("cnt")
                + F.lit(1)
            ).alias(out),
        )

    rx = doubled_ranks(x, "r2x")
    ry = doubled_ranks(y, "r2y")
    ranked = (
        df.select(
            F.col(x).cast("long").alias("vx"),
            F.col(y).cast("long").alias("vy"),
        )
        .join(F.broadcast(rx), F.col("vx") == rx["v"])
        .drop("v")
        .join(F.broadcast(ry), F.col("vy") == ry["v"])
        .drop("v")
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("r2x").alias("sx"),
        F.sum("r2y").alias("sy"),
        F.sum(F.col("r2x") * F.col("r2x")).alias("sxx"),
        F.sum(F.col("r2y") * F.col("r2y")).alias("syy"),
        F.sum(F.col("r2x") * F.col("r2y")).alias("sxy"),
    )
    bad = (F.expr(_CORR_DX) == 0) | (F.expr(_CORR_DY) == 0) | (F.col("n") < 2)
    return agg.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(_CORR_R))
        .alias("rho"),
    )


# KS distance as exact cross-multiplied integers: at pooled value v,
# |F1(v) - F2(v)| = |c1*n2 - c2*n1| / (n1*n2); the max numerator is an
# exact BIGINT and the single closing division is shared-text.
_KS_D = "round(d_num / (n1 * 1e0 * n2), 6)"


def ks_two_sample(
    df: DataFrame, value: str = "value", group: str = "grp"
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic of an INTEGER value
    column between group 1 and group 0, exactly: per distinct value,
    cumulative per-group counts (one window over the distinct-value
    table), then D's numerator max|c1*n2 - c2*n1| as an exact BIGINT
    (in range while n1*n2 < 2^63) and ONE closing division. The
    argmax value reports WHERE the distributions diverge most
    (deterministic tie-break: smallest value), via the algebraic
    max(struct(...)) — no sort on the row count, only on value
    cardinality.

    Output: one row (n1, n2, d_num, at_value, ks_d).
    """
    g1 = F.when(F.col(group) == 1, 1).otherwise(0)
    vc = df.groupBy(F.col(value).cast("long").alias("v")).agg(
        F.sum(g1).alias("a1"),
        F.sum(1 - g1).alias("a0"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select(
        "v",
        F.sum("a1").over(w).alias("c1"),
        F.sum("a0").over(w).alias("c0"),
    )
    tot = cum.agg(
        F.max("c1").alias("n1"),
        F.max("c0").alias("n0"),
    )
    joined = cum.crossJoin(F.broadcast(tot))
    best = joined.agg(
        F.max(
            F.struct(
                F.abs(
                    F.col("c1") * F.col("n0") - F.col("c0") * F.col("n1")
                ).alias("d_num"),
                (-F.col("v")).alias("neg_v"),
            )
        ).alias("b"),
        F.max("n1").alias("n1"),
        F.max("n0").alias("n2"),
    )
    return best.select(
        "n1",
        "n2",
        F.col("b.d_num").alias("d_num"),
        (-F.col("b.neg_v")).alias("at_value"),
        F.when(
            (F.col("n1") == 0) | (F.col("n2") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.expr(_KS_D))
        .alias("ks_d"),
    )


# Mann-Whitney z over exact integers: 2*U1 (u2) avoids the 0.5 tie
# credit, the tie-corrected variance is one shared-text expression.
_MWU_SIG2 = (
    "((n_1 * 1e0 * n_0 / 12e0) * ((n_1 + n_0 + 1e0)"
    " - ties3 * 1e0 / ((n_1 + n_0) * 1e0 * (n_1 + n_0 - 1e0))))"
)
_MWU_Z = f"round((u2_1 - n_1 * 1e0 * n_0) / (2e0 * sqrt({_MWU_SIG2})), 6)"


def mann_whitney_u(
    df: DataFrame, value: str = "value", group: str = "grp"
) -> DataFrame:
    """Mann-Whitney U test (Wilcoxon rank-sum) of an INTEGER value
    column between group 1 and group 0 — the nonparametric A/B test
    for skewed outcomes where welch_ttest's normality is indefensible
    (revenue, latency, token counts).

    Exactness: rows collapse to the distinct-value table first (one
    partial-agg groupBy), then U1 = #{(x1, x0): x1 > x0} + ties/2 is
    carried DOUBLED (u2_1 = sum_v a1_v * (2*cumn0(<v) + a0_v)) so it
    stays an exact BIGINT; the tie term sum(t^3 - t) over distinct
    values is an exact BIGINT too (in range while n < ~2e6 rows all
    tied at one value — the spearman_corr lattice caveat). The only
    float is the ONE shared-text z expression (normal approximation
    with tie-corrected variance, no continuity correction — stated,
    not hidden). The cumulative runs over distinct values only (the
    auc_score / ks_two_sample shape) — no sort on the row count.

    Degenerate inputs (an empty group, or every row tied at a single
    value so sigma = 0) report NULL z.

    Output: one row (n_1, n_0, u2_1, ties3, u_1, auc, z).
    """
    g1 = F.when(F.col(group) == 1, 1).otherwise(0)
    vc = df.groupBy(F.col(value).cast("long").alias("v")).agg(
        F.sum(g1).alias("a1"),
        F.sum(1 - g1).alias("a0"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vc.withColumn(
        "c0", F.coalesce(F.sum("a0").over(w), F.lit(0).cast("long"))
    )
    t = F.col("a1") + F.col("a0")
    agg = cum.agg(
        F.sum("a1").alias("n_1"),
        F.sum("a0").alias("n_0"),
        F.sum(
            F.col("a1") * (F.lit(2) * F.col("c0") + F.col("a0"))
        ).alias("u2_1"),
        F.sum(t * t * t - t).alias("ties3"),
    )
    bad = (
        (F.col("n_1") == 0)
        | (F.col("n_0") == 0)
        | (F.expr(_MWU_SIG2) <= 0)
    )
    return agg.select(
        "n_1",
        "n_0",
        "u2_1",
        "ties3",
        F.round(F.col("u2_1") / F.lit(2e0), 6).alias("u_1"),
        F.when(
            (F.col("n_1") == 0) | (F.col("n_0") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(F.expr("u2_1 / (2e0 * n_1 * n_0)"), 6)
        )
        .alias("auc"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(_MWU_Z))
        .alias("z"),
    )


# CUPED closing expressions over the exact integer sums; pooled
# totals written inline so the text is identical in both engines.
_CU_N = "(n_0 + n_1)"
_CU_SX = "(sx_0 + sx_1)"
_CU_SY = "(sy_0 + sy_1)"
_CU_VARX = f"({_CU_N} * 1e0 * sxx - {_CU_SX} * 1e0 * {_CU_SX})"
_CU_VARY = f"({_CU_N} * 1e0 * syy - {_CU_SY} * 1e0 * {_CU_SY})"
_CU_COV = f"({_CU_N} * 1e0 * sxy - {_CU_SX} * 1e0 * {_CU_SY})"
_CU_THETA = f"({_CU_COV} / {_CU_VARX})"
_CU_DIFF = "(sy_1 * 1e0 / n_1 - sy_0 * 1e0 / n_0)"
_CU_DX = "(sx_1 * 1e0 / n_1 - sx_0 * 1e0 / n_0)"
_CU_ADJ = f"round({_CU_DIFF} - {_CU_THETA} * {_CU_DX}, 6)"
_CU_VR = f"round({_CU_COV} * {_CU_COV} / ({_CU_VARX} * {_CU_VARY}), 6)"


def cuped_adjusted(
    df: DataFrame, x: str = "x", y: str = "y", group: str = "grp"
) -> DataFrame:
    """CUPED variance-reduced treatment effect (Deng et al. WSDM'13) —
    the standard experiment-sensitivity trick: regress the in-period
    metric Y on the PRE-period covariate X (pooled theta = cov/var)
    and report the adjusted arm difference

        diff_cuped = (meanY1 - meanY0) - theta * (meanX1 - meanX0),

    whose variance shrinks by rho^2 (also reported, as the fraction of
    variance CUPED removed). X predates assignment, so the adjustment
    is unbiased by construction.

    Exactness: ONE partial-agg pass collects per-arm (n, Sx, Sy) and
    pooled (Sxx, Syy, Sxy) as exact BIGINTs over INTEGER inputs (put
    money on the cent lattice first; in range while
    n * max|x| * max|y| < 2^63); theta, the raw/adjusted diffs, and
    the variance-reduction factor are single shared-text double
    expressions over those integers. Degenerate inputs (an arm with
    n = 0, or zero covariate variance) -> NULL adjusted columns, and
    the raw diff is still reported.

    Output: one row (n_0, n_1, sx_0, sx_1, sy_0, sy_1, sxx, syy, sxy,
    theta, diff_raw, diff_cuped, var_reduction).
    """
    g1 = F.when(F.col(group) == 1, 1).otherwise(0)
    xv = F.col(x).cast("long")
    yv = F.col(y).cast("long")
    agg = df.agg(
        F.sum(1 - g1).alias("n_0"),
        F.sum(g1).alias("n_1"),
        F.sum(xv * (1 - g1)).alias("sx_0"),
        F.sum(xv * g1).alias("sx_1"),
        F.sum(yv * (1 - g1)).alias("sy_0"),
        F.sum(yv * g1).alias("sy_1"),
        F.sum(xv * xv).alias("sxx"),
        F.sum(yv * yv).alias("syy"),
        F.sum(xv * yv).alias("sxy"),
    )
    no_arm = (F.col("n_0") == 0) | (F.col("n_1") == 0)
    bad = no_arm | (F.expr(_CU_VARX) == 0)
    return agg.select(
        "n_0",
        "n_1",
        "sx_0",
        "sx_1",
        "sy_0",
        "sy_1",
        "sxx",
        "syy",
        "sxy",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(F.expr(_CU_THETA), 6))
        .alias("theta"),
        F.when(no_arm, F.lit(None).cast("double"))
        .otherwise(F.round(F.expr(_CU_DIFF), 6))
        .alias("diff_raw"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(_CU_ADJ))
        .alias("diff_cuped"),
        F.when(bad | (F.expr(_CU_VARY) == 0), F.lit(None).cast("double"))
        .otherwise(F.expr(_CU_VR))
        .alias("var_reduction"),
    )


def gini_concentration(
    df: DataFrame, key: str = "key", amount: str = "amount"
) -> DataFrame:
    """Gini coefficient of an INTEGER amount concentrated over keys
    (who gets the revenue / tokens / triples), exactly: per-key sums
    are BIGINTs, keys ranked ascending by (sum, key) — a sort over
    KEY cardinality, not row count — and

        G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n * sum(x))

    with every sum an exact BIGINT (in range while n_keys * total
    < 2^63) and ONE shared-text closing division. G=0 when all keys
    are equal, G -> 1-1/n under total concentration; negative amounts
    are the caller's responsibility (Gini is undefined there).

    Output: one row (n_keys, total, gini).
    """
    per = df.groupBy(F.col(key).alias("k")).agg(
        F.sum(F.col(amount).cast("long")).alias("x")
    )
    w = Window.orderBy("x", "k")
    ranked = per.select("x", F.row_number().over(w).alias("i"))
    agg = ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("x").alias("total"),
        F.sum(F.col("i").cast("long") * F.col("x")).alias("swx"),
    )
    return agg.select(
        "n_keys",
        "total",
        F.when(
            (F.col("total") == 0) | (F.col("n_keys") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.expr(
                "round((2e0 * swx - (n_keys + 1e0) * total)"
                " / (n_keys * 1e0 * total), 6)"
            )
        )
        .alias("gini"),
    )


def abc_classes(
    df: DataFrame,
    key: str = "key",
    amount: str = "amount",
    a_pct: int = 80,
    b_pct: int = 95,
) -> DataFrame:
    """ABC / Pareto classification of an INTEGER amount over keys —
    the inventory-analytics complement of gini_concentration: keys
    ranked by descending amount, class A while the cumulative share
    BEFORE the key is under a_pct% of the total (so the key that
    crosses the boundary is still A — the standard convention; a
    single key holding all revenue is A, never C), B under b_pct%,
    C beyond.

    Exactness: per-key sums and the running cumulative are exact
    BIGINTs; the class boundaries are INTEGER cross-multiplications
    ((cum - x) * 100 < total * pct — no percentage is ever computed
    as a float), so boundary keys classify identically in both
    engines.
    The deterministic rank order is (amount desc, key asc). The only
    floats are the per-class share divisions, rounded.

    Scale note: like gini, the cumulative window runs over KEY
    cardinality (a dimension: parts, SKUs, sources), never row count.

    Output: one row per class (cls, n_keys, class_total, share,
    heaviest_key).
    """
    per = df.groupBy(F.col(key).alias("k")).agg(
        F.sum(F.col(amount).cast("long")).alias("x")
    )
    w = Window.orderBy(F.desc("x"), "k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per.agg(F.sum("x").alias("total"), F.count("*").alias("n_all"))
    cum = per.withColumn("cum", F.sum("x").over(w)).crossJoin(
        F.broadcast(tot)
    )
    prev = F.col("cum") - F.col("x")
    cls = (
        F.when(prev * 100 < F.col("total") * a_pct, F.lit("A"))
        .when(prev * 100 < F.col("total") * b_pct, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        cum.select(cls.alias("cls"), "k", "x", "total")
        .groupBy("cls")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("x").alias("class_total"),
            F.max("total").alias("total"),
            F.max(
                F.struct(F.col("x").alias("x"), (-F.col("k")).alias("nk"))
            ).alias("hb"),
        )
        .select(
            "cls",
            "n_keys",
            "class_total",
            F.round(
                F.col("class_total") / (F.col("total") * F.lit(1e0)), 6
            ).alias("share"),
            (-F.col("hb.nk")).cast("long").alias("heaviest_key"),
        )
    )


# Weighted post-split Gini impurity as ONE shared-text expression over
# the exact integer (n_left, pos_left, n_right, pos_right, n) tuple.
_STUMP_GL = "(nl * 1e0 - (pl * 1e0 * pl + (nl * 1e0 - pl) * (nl * 1e0 - pl)) / nl)"
_STUMP_GR = "(nr * 1e0 - (pr * 1e0 * pr + (nr * 1e0 - pr) * (nr * 1e0 - pr)) / nr)"
_STUMP_G = f"round(({_STUMP_GL} + {_STUMP_GR}) / n, 9)"
_STUMP_G0 = (
    "round((n * 1e0 - (pos * 1e0 * pos + (n * 1e0 - pos)"
    " * (n * 1e0 - pos)) / n) / n, 9)"
)


def stump_split_gain(
    df: DataFrame,
    feature: str = "x",
    label: str = "label",
    n_bins: int = 32,
) -> DataFrame:
    """Histogram-based best-split search for a decision stump on an
    INTEGER feature against a binary label — the inner loop of every
    gradient-boosted-tree learner (XGBoost/LightGBM grow trees from
    exactly this feature-histogram + cumulative-scan shape) and the
    supervised threshold-picker for quality gates.

    Binning is integer-exact: bin = ((x - min) * n_bins) div
    (max - min + 1) — pure BIGINT arithmetic, no float width. Split
    candidates are "left = bins <= b" for every present bin except the
    last; left counts come from ONE cumulative over the bin table
    (dimension-sized, never row count), right counts by subtraction
    from the broadcast totals. The weighted post-split Gini impurity
    and the parent impurity are single shared-text double expressions
    over exact integers, rounded to 9; the winner (min impurity, tie:
    smaller bin) is flagged via the algebraic min(struct) — every
    candidate row is emitted so the whole search is machine-checkable,
    not just the argmax.

    Output: (split_bin, threshold_le, n_left, pos_left, n_right,
    pos_right, gini_split, gain, is_best). threshold_le = the largest
    feature value in the left side's value range, mn - 1 +
    ((b+1)*(mx-mn+1)) div n_bins truncated to the bin edge.
    """
    v = F.col(feature).cast("long")
    lab = F.col(label).cast("long")
    bounds = df.agg(
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
        F.count("*").alias("n"),
        F.sum(lab).alias("pos"),
    )
    binned = df.select(v.alias("v"), lab.alias("y")).crossJoin(
        F.broadcast(bounds)
    )
    b = F.expr(f"((v - mn) * {int(n_bins)}) div (mx - mn + 1)")
    hist = binned.groupBy(b.alias("bin")).agg(
        F.count("*").alias("n_b"),
        F.sum("y").alias("pos_b"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.select(
            "bin",
            F.sum("n_b").over(w).alias("nl"),
            F.sum("pos_b").over(w).alias("pl"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("nl") < F.col("n"))
        .select(
            "bin",
            "nl",
            "pl",
            (F.col("n") - F.col("nl")).alias("nr"),
            (F.col("pos") - F.col("pl")).alias("pr"),
            "mn",
            "mx",
            "n",
            "pos",
        )
        .withColumn("gini_split", F.expr(_STUMP_G))
    )
    best = cum.agg(
        F.min(F.struct(F.col("gini_split"), F.col("bin"))).alias("b")
    )
    return (
        cum.crossJoin(F.broadcast(best))
        .select(
            F.col("bin").alias("split_bin"),
            F.expr(
                f"mn - 1 + ((bin + 1) * (mx - mn + 1)) div {int(n_bins)}"
            ).alias("threshold_le"),
            F.col("nl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            F.col("nr").alias("n_right"),
            F.col("pr").alias("pos_right"),
            "gini_split",
            F.round(F.expr(_STUMP_G0) - F.col("gini_split"), 9).alias(
                "gain"
            ),
            (
                (F.col("gini_split") == F.col("b.gini_split"))
                & (F.col("bin") == F.col("b.bin"))
            ).alias("is_best"),
        )
    )


def conformal_gate(
    df: DataFrame,
    key: str = "key",
    score: str = "score",
    alphas_mille: tuple[int, ...] = (100, 200),
    calib_mille: int = 500,
    salt: str = "conf0",
) -> DataFrame:
    """Split-conformal calibration (Vovk; Papadopoulos et al. '02) of a
    quality/novelty score: an md5-bucketed calibration split supplies
    the finite-sample threshold

        q_hat = the ceil((n_cal + 1) * (1 - alpha))-th smallest
                nonconformity among the calibration rows

    and the marginal coverage guarantee P(s_test <= q_hat) >= 1-alpha
    holds for exchangeable data WITHOUT any distributional assumption —
    the statistically honest way to turn a heuristic score into a
    filter with a stated error rate (vs quality_percentile_filter's
    plain quantile, which lacks the +1 finite-sample correction).

    Everything is integer: the score must live on the 1e-6 lattice
    (quality_score's convention), nonconformity s = -round(score*1e6),
    the split reuses the sampling-family md5 recipe (mille buckets),
    and the rank r is a ceil-division of BIGINTs. The k-th smallest is
    never a corpus sort: calibration rows collapse to one row per
    DISTINCT nonconformity value (map-side combine), the cumulative
    runs over that value table (the auc_score bounded-lattice
    convention), and q_hat per alpha is an algebraic min over the
    cum >= r survivors. Test coverage is counted on the test-side
    value table against the broadcast |alphas|-row threshold table.

    r > n_cal (alpha too small for the calibration size) yields
    q_hat = NULL = +infinity: everything is covered, reported rather
    than raised. Output: (alpha_mille, n_cal, q_rank, q_hat, n_test,
    n_covered, coverage), one row per alpha.
    """
    from careers_spark.operators.dedup import _hash64_expr

    keyed = f"concat(cast({key} as string), '{salt}')"
    base = df.select(
        (F.expr(f"{_hash64_expr(keyed)} % 1000") < int(calib_mille)).alias(
            "is_cal"
        ),
        (-F.round(F.col(score) * 1e6).cast("long")).alias("s"),
    )
    cal_vals = base.filter("is_cal").groupBy("s").agg(
        F.count("*").alias("c")
    )
    test_vals = base.filter("NOT is_cal").groupBy("s").agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cal_cum = cal_vals.select("s", F.sum("c").over(w).alias("cum"))
    totals = (
        base.agg(
            F.sum(F.expr("case when is_cal then 1 else 0 end")).alias(
                "n_cal"
            ),
            F.sum(F.expr("case when is_cal then 0 else 1 end")).alias(
                "n_test"
            ),
        )
        .selectExpr(
            "coalesce(n_cal, 0) as n_cal", "coalesce(n_test, 0) as n_test"
        )
    )
    alphas = ", ".join(str(int(a)) for a in alphas_mille)
    grid = (
        totals.select(
            "n_cal",
            "n_test",
            F.explode(F.expr(f"array({alphas})")).alias("alpha_mille"),
        )
        .withColumn(
            "q_rank",
            F.expr("((n_cal + 1) * (1000 - alpha_mille) + 999) div 1000"),
        )
    )
    qhat = (
        F.broadcast(grid)
        .join(cal_cum, F.col("cum") >= F.col("q_rank"), "left")
        .groupBy("alpha_mille", "n_cal", "n_test", "q_rank")
        .agg(F.min("s").alias("q_hat"))
    )
    covered = (
        test_vals.join(
            F.broadcast(qhat),
            F.col("q_hat").isNull() | (F.col("s") <= F.col("q_hat")),
            "right",
        )
        .groupBy("alpha_mille", "n_cal", "n_test", "q_rank", "q_hat")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_covered"))
    )
    return covered.select(
        "alpha_mille",
        "n_cal",
        "q_rank",
        "q_hat",
        "n_test",
        "n_covered",
        F.when(
            F.col("n_test") > 0,
            F.round(F.col("n_covered") / F.col("n_test"), 6),
        ).alias("coverage"),
    )


def isotonic_calibration(
    bins: DataFrame,
    bin_col: str = "bin",
    n: str = "n",
    n_pos: str = "n_pos",
    max_bins: int = 512,
) -> DataFrame:
    """Weighted isotonic regression (PAV) of the per-bin positive rate
    — THE standard monotone probability-calibration map (sklearn
    IsotonicRegression; Zadrozny & Elkan '02), fitted here without the
    sequential pool-adjacent-violators loop via the exact minimax
    characterization

        fitted(i) = max_{j<=i} min_{k>=i} (P_k - P_{j-1})/(N_k - N_{j-1})

    (P/N prefix sums of positives/counts), which equals the PAV
    solution for nondecreasing weighted least squares. Everything runs
    on the BIN table: the interval-mean table is O(B^2) rows of one
    exact-integer division each (engine-identical IEEE doubles), the
    inner min is a per-j suffix-min window, the outer max one
    groupBy(k) — never a corpus-sized operation, and the input to this
    is already the dimension-sized output of calibration_bins. RAISES
    past max_bins (B^2 is the budget).

    Output: (bin, n, n_pos, rate, fitted) with fitted nondecreasing in
    bin; rate is the raw per-bin rate for comparison. Both rounded 6.
    """
    b = bins.select(
        F.col(bin_col).cast("long").alias("i"),
        F.col(n).cast("long").alias("n"),
        F.col(n_pos).cast("long").alias("p"),
    )
    n_bins = b.count()
    if n_bins > int(max_bins):
        raise ValueError(
            f"isotonic_calibration: {n_bins} bins exceeds max_bins="
            f"{max_bins} (the O(B^2) interval table is the budget)"
        )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    pre = b.select(
        "i",
        "n",
        "p",
        F.sum("n").over(w).alias("cn"),
        F.sum("p").over(w).alias("cp"),
    )
    lo = pre.select(
        F.col("i").alias("j"),
        (F.col("cn") - F.col("n")).alias("n_before"),
        (F.col("cp") - F.col("p")).alias("p_before"),
    )
    hi = pre.select(
        F.col("i").alias("k"),
        F.col("cn").alias("n_upto"),
        F.col("cp").alias("p_upto"),
    )
    iv = (
        lo.join(hi, F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            F.expr(
                "(p_upto - p_before) / cast(n_upto - n_before as double)"
            ).alias("mean"),
        )
    )
    wj = (
        Window.partitionBy("j")
        .orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    msuf = iv.select("j", "k", F.min("mean").over(wj).alias("msuf"))
    fit = msuf.groupBy("k").agg(F.max("msuf").alias("fitted"))
    return (
        pre.join(fit, pre["i"] == fit["k"])
        .select(
            F.col("i").alias("bin"),
            "n",
            "p",
            F.round(F.expr("p / cast(n as double)"), 6).alias("rate"),
            F.round("fitted", 6).alias("fitted"),
        )
        .withColumnRenamed("p", "n_pos")
    )


def rank_agreement(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Kendall tau-b rank agreement between two integer-lattice scores
    — "do the two rankings order the corpus the same way?", the rank
    complement of clustering_agreement's label ARI. Tie-aware:

        tau_b = (C - D) / sqrt((P - Tx) (P - Ty))

    with P = C(n,2), Tx/Ty pairs tied on each side. NO row-pair join:
    rows collapse to the joint distinct-value table (one partial-agg
    groupBy), C and D come from its a<b self-join weighted by count
    products — O(V^2) on the VALUE table, never O(n^2) on rows — and
    Tx/Ty/P are pure marginal algebra. Everything is an exact BIGINT
    until the single shared-text sqrt+division expression. The value
    table must be bounded (lattice scores — every score in this repo);
    for unbounded doubles, quantize first (stated).

    Output: (n, n_pairs, concordant, discordant, ties_x, ties_y,
    tau_b); tau_b NULL when either side is all-ties.
    """
    joint = df.groupBy(
        F.col(x).cast("long").alias("xv"), F.col(y).cast("long").alias("yv")
    ).agg(F.count("*").alias("c"))
    a = joint.selectExpr("xv as x1", "yv as y1", "c as c1")
    b = joint.selectExpr("xv as x2", "yv as y2", "c as c2")
    pairs = a.join(
        b,
        (F.col("x1") < F.col("x2"))
        | ((F.col("x1") == F.col("x2")) & (F.col("y1") < F.col("y2"))),
    )
    cd = pairs.agg(
        F.sum(
            F.expr(
                "case when (x1 - x2) * (y1 - y2) > 0 then c1 * c2 "
                "else 0 end"
            )
        ).alias("concordant"),
        F.sum(
            F.expr(
                "case when (x1 - x2) * (y1 - y2) < 0 then c1 * c2 "
                "else 0 end"
            )
        ).alias("discordant"),
    ).selectExpr(
        "coalesce(concordant, 0) as concordant",
        "coalesce(discordant, 0) as discordant",
    )
    tx = (
        joint.groupBy("xv")
        .agg(F.sum("c").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("ties_x"))
    )
    ty = (
        joint.groupBy("yv")
        .agg(F.sum("c").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("ties_y"))
    )
    n = df.agg(F.count("*").alias("n"))
    tau = (
        "case when (n_pairs - ties_x) * (n_pairs - ties_y) > 0 then "
        "round((concordant - discordant) / sqrt((n_pairs - ties_x) * 1e0 "
        "* (n_pairs - ties_y)), 6) end"
    )
    return (
        n.crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .selectExpr("*", "n * (n - 1) div 2 as n_pairs")
        .selectExpr(
            "n",
            "n_pairs",
            "concordant",
            "discordant",
            "ties_x",
            "ties_y",
            f"{tau} as tau_b",
        )
    )


def brier_decomposition(
    df: DataFrame, score: str = "score", label: str = "label"
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score,

        BS = reliability - resolution + uncertainty,

    binned by DISTINCT forecast value (the auc_score trick — every
    score in this repo lives on a rounded lattice, so the bin table is
    vocabulary-sized and the bin mean forecast IS the bin value, which
    is exactly the condition under which the decomposition identity is
    exact rather than approximate).

    Exactness: scores lift to the 1e6 integer lattice; the raw Brier
    sum expands per bin into pure integer terms accumulated in
    DECIMAL(38,0) (DuckDB HUGEINT), so ``brier`` carries no rounding
    at all; reliability/resolution terms are per-bin shared-text
    double expressions rounded to the 1e-9 lattice and summed as exact
    BIGINTs. The identity BS = REL - RES + UNC therefore holds to the
    lattice resolution (pinned by test).

    Output: one row (n, n_pos, n_bins, brier, reliability, resolution,
    uncertainty).
    """
    s_int = F.expr(f"cast(round({score} * 1000000, 0) as bigint)")
    lb = F.col(label).cast("long")
    per = df.select(s_int.alias("s"), lb.alias("y")).groupBy("s").agg(
        F.count("*").alias("n_b"), F.sum("y").alias("k_b")
    )
    tot = per.agg(
        F.sum("n_b").alias("n"), F.sum("k_b").alias("k")
    )
    terms = per.crossJoin(F.broadcast(tot)).select(
        "n_b",
        "k_b",
        F.expr(
            "cast(n_b as decimal(38,0)) * s * s"
            " - 2 * cast(s as decimal(38,0)) * 1000000 * k_b"
            " + cast(k_b as decimal(38,0)) * 1000000000000"
        ).alias("bs_num"),
        F.expr(
            "cast(round(((n_b * 1e0 * s - 1000000e0 * k_b)"
            " * (n_b * 1e0 * s - 1000000e0 * k_b))"
            " / (n_b * 1000000000000e0) * 1000000000, 0) as bigint)"
        ).alias("rel_fp"),
        F.expr(
            "cast(round(n_b * (k_b * 1e0 / n_b - k * 1e0 / n)"
            " * (k_b * 1e0 / n_b - k * 1e0 / n) * 1000000000, 0)"
            " as bigint)"
        ).alias("res_fp"),
    )
    agg = terms.agg(
        F.count("*").alias("n_bins"),
        F.sum("n_b").alias("n"),
        F.sum("k_b").alias("n_pos"),
        F.sum("bs_num").alias("bs_num"),
        F.sum("rel_fp").alias("srel"),
        F.sum("res_fp").alias("sres"),
    )
    return agg.select(
        "n",
        "n_pos",
        "n_bins",
        F.expr(
            "round(cast(bs_num as double) / (n * 1000000000000e0), 6)"
        ).alias("brier"),
        F.expr("round(srel / (n * 1000000000e0), 6)").alias("reliability"),
        F.expr("round(sres / (n * 1000000000e0), 6)").alias("resolution"),
        F.expr(
            "round((n_pos * 1e0 / n) * (1e0 - n_pos * 1e0 / n), 6)"
        ).alias("uncertainty"),
    )


def pr_curve(
    df: DataFrame, score: str = "score", label: str = "label"
) -> DataFrame:
    """Precision-recall curve at every distinct score threshold — the
    threshold-picking table between auc_score's single number and
    calibration_bins' probability view: for threshold t (predict
    positive iff score >= t), the exact TP/FP cumulatives and the
    derived precision / recall / F1.

    Rows collapse to one per DISTINCT score first (the auc_score
    convention — every score in this repo lives on a rounded lattice,
    so this table is vocabulary-sized); the cumulative runs DESC over
    that table, so the only window is dimension-sized. Counts are
    exact integers; precision/recall/F1 single shared-text divisions
    (F1 in the single-division 2tp/(2tp+fp+fn) form), NULL where
    undefined.

    Output: (threshold, tp, fp, fn, precision, recall, f1), one row
    per distinct score, descending thresholds.
    """
    from pyspark.sql import Window

    lb = F.col(label).cast("long")
    g = df.groupBy(F.col(score).alias("threshold")).agg(
        F.sum(lb).alias("pos"),
        F.sum(1 - lb).alias("neg"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = df.agg(F.sum(lb).alias("p_all"))
    cum = (
        g.select(
            "threshold",
            F.sum("pos").over(w).alias("tp"),
            F.sum("neg").over(w).alias("fp"),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("fn", F.col("p_all") - F.col("tp"))
    )
    return cum.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(None).cast("double"))
        .otherwise(F.expr("round(tp * 1e0 / (tp + fp), 6)"))
        .alias("precision"),
        F.when(F.col("p_all") == 0, F.lit(None).cast("double"))
        .otherwise(F.expr("round(tp * 1e0 / p_all, 6)"))
        .alias("recall"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(F.expr("round(2e0 * tp / (2 * tp + fp + fn), 6)"))
        .alias("f1"),
    )


def count_dispersion(
    df: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Overdispersion diagnostic for per-key event counts — the
    Poisson-vs-negative-binomial triage run before modeling any count
    outcome (sessions per user, events per day): the variance-to-mean
    dispersion index D and the classical Poisson dispersion (chi-
    squared) statistic

        X2 = (N - 1) * var / mean   ~  chi2(N - 1)  under Poisson,

    reported with its normal approximation z = sqrt(2*X2) -
    sqrt(2*(N-1) - 1) (Wilson-Hilferty's simpler cousin; |z| > 2 reads
    "not Poisson"). One groupBy(key) count + one 1-row aggregate of
    exact BIGINTs (n, S, SS); every derived value is a single
    shared-text expression over those integers. NULL when fewer than
    two keys or zero mean.

    Output: one row (n_keys, n_events, mean, variance, dispersion,
    chi2_stat, z).
    """
    per = df.groupBy(key).agg(F.count("*").alias("c"))
    agg = per.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    mean = "s * 1e0 / n"
    var = "(ss * 1e0 - s * 1e0 * s / n) / (n - 1e0)"
    chi2 = f"(n - 1e0) * ({var}) / ({mean})"
    bad = (F.col("n") < 2) | (F.col("s") == 0)
    return agg.select(
        F.col("n").alias("n_keys"),
        F.col("s").alias("n_events"),
        F.expr(f"round({mean}, 6)").alias("mean"),
        F.when(F.col("n") < 2, F.lit(None).cast("double"))
        .otherwise(F.expr(f"round({var}, 6)"))
        .alias("variance"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(f"round(({var}) / ({mean}), 6)"))
        .alias("dispersion"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(f"round({chi2}, 6)"))
        .alias("chi2_stat"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.expr(
                f"round(sqrt(2e0 * ({chi2}))"
                f" - sqrt(2e0 * (n - 1e0) - 1e0), 6)"
            )
        )
        .alias("z"),
    )


def uplift_deciles(
    df: DataFrame,
    score: str = "score",
    treat: str = "treat",
    conv: str = "conv",
) -> DataFrame:
    """Uplift-by-decile / Qini table (Radcliffe 2007) — the evaluation
    artifact of every uplift model and the heterogeneity view of an
    A/B readout: units rank into score deciles (VALUE cuts from one
    exact-percentile row — the rfm_segments recipe, no global sort),
    and each decile reports treated-minus-control conversion uplift
    plus the cumulative Qini statistic

        Qini(k) = sum_{d<=k} ( c_t_d  -  c_c_d * n_t_d / n_c_d ).

    ``df`` is one row per unit with a numeric ``score``, 0/1 ``treat``
    and 0/1 ``conv``. Counts are exact integers from one groupBy on
    the derived decile; per-decile uplift is a shared-text expression;
    the Qini cumulative is a 10-row ordered window over already-
    rounded terms — bounded, engine-deterministic. Ties at a cut value
    fall to the lower decile (score > cut strictly advances). NULL
    uplift where an arm is empty in the decile.

    Output: (decile, n_t, c_t, n_c, c_c, uplift, qini_term,
    qini_cum) — decile 1 = highest scores.
    """
    from pyspark.sql import Window

    cuts = df.agg(
        *[
            F.expr(f"percentile({score}, {q / 10}e0)").alias(f"c{q}")
            for q in range(1, 10)
        ]
    )
    dec_expr = " + ".join(f"(case when {score} > c{q} then 1 else 0 end)" for q in range(1, 10))
    per = (
        df.crossJoin(F.broadcast(cuts))
        .select(
            F.expr(f"10 - ({dec_expr})").alias("decile"),
            F.col(treat).cast("long").alias("t"),
            F.col(conv).cast("long").alias("c"),
        )
        .groupBy("decile")
        .agg(
            F.sum("t").alias("n_t"),
            F.sum(F.col("t") * F.col("c")).alias("c_t"),
            F.sum(1 - F.col("t")).alias("n_c"),
            F.sum((1 - F.col("t")) * F.col("c")).alias("c_c"),
        )
    )
    term = (
        "case when n_c = 0 then null else "
        "round(c_t - c_c * 1e0 * n_t / n_c, 6) end"
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn(
            "uplift",
            F.expr(
                "case when n_t = 0 or n_c = 0 then null else "
                "round(c_t * 1e0 / n_t - c_c * 1e0 / n_c, 6) end"
            ),
        )
        .withColumn("qini_term", F.expr(term))
        .withColumn("qini_cum", F.round(F.sum("qini_term").over(w), 6))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_t",
            "c_t",
            "n_c",
            "c_c",
            "uplift",
            "qini_term",
            "qini_cum",
        )
    )


def anova_oneway(
    df: DataFrame, value: str = "value", group: str = "grp"
) -> DataFrame:
    """One-way ANOVA F-test of an INTEGER value column across the
    levels of ``group`` — the k-sample generalization of welch_ttest
    (classical equal-variance Fisher form): does mean order value
    differ across priority classes?

    Exactness: one partial-agg groupBy collects per-group (n, sum) as
    BIGINT and sum-of-squares as DECIMAL(38,0) (values up to ~5e7
    cents square to 2.5e15 — a 1e9-row corpus overflows BIGINT, so the
    squared channel rides decimal / DuckDB HUGEINT). The raw
    sums-of-squares route s_g^2/n_g is NOT taken: at 1e12 rows it
    overflows BIGINT `div`, and lifting a >2^53 double into decimal
    crosses Spark's shortest-decimal-repr cast (engine-divergent, the
    mismatch this function's first draft hit). Instead each group mean
    is fixed-pointed EXACTLY at 1e-6 by round-half-up integer division

        mfp_g = (2*10^6*s_g + n_g) div (2*n_g)          (BIGINT)

    and SSB/SSW accumulate in DECIMAL(38,0) in units of 1e-12:

        ssb_fp = sum_g n_g * (mfp_g - mfp)^2
        ssw_fp = sum_g ( 10^12 * ss_g - n_g * mfp_g^2 )

    — every product exact in decimal, every reduction order-free. The
    reported ssb/ssw and F are single shared-text double closes (the
    1e-6 mean lattice perturbs F ~13 orders below its magnitude, and
    identically in both engines). NULL f_stat when k < 2, df2 <= 0,
    or ssw_fp <= 0 (zero within-variance, or the lattice's worst-case
    ~1e-6 undershoot of an exact zero).

    Scale shape: two algebraic aggregations (group level, then a
    k-row close with the 1-row global broadcast) — no window, no
    sort, no driver loop.

    Output: one row (k_groups, n_total, ssb, ssw, df1, df2, f_stat).
    """
    v = F.col(value).cast("long")
    g = df.groupBy(group).agg(
        F.count("*").alias("n_g"),
        F.sum(v).alias("s_g"),
        F.sum(v.cast("decimal(19,0)") * v).alias("ss_g"),
    )
    g = g.withColumn(
        "mfp_g",
        F.expr(
            "(2000000 * cast(s_g as decimal(38,0)) + n_g) div (2 * n_g)"
        ),
    )
    glob = g.agg(
        F.count("*").alias("k_groups"),
        F.sum("n_g").alias("n_total"),
        F.sum("s_g").alias("s_all"),
    ).withColumn(
        "mfp",
        F.expr(
            "(2000000 * cast(s_all as decimal(38,0)) + n_total)"
            " div (2 * n_total)"
        ),
    )
    both = g.crossJoin(F.broadcast(glob))
    agg = both.groupBy("k_groups", "n_total").agg(
        F.sum(
            F.expr(
                "n_g * (cast(mfp_g - mfp as decimal(38,0))"
                " * cast(mfp_g - mfp as decimal(38,0)))"
            )
        ).alias("ssb_fp"),
        F.sum(
            F.expr(
                "cast(1000000000000 as decimal(38,0)) * ss_g"
                " - n_g * (cast(mfp_g as decimal(38,0)) * mfp_g)"
            )
        ).alias("ssw_fp"),
    )
    bad = (
        (F.col("k_groups") < 2)
        | (F.col("n_total") <= F.col("k_groups"))
        | (F.col("ssw_fp") <= 0)
    )
    fstat = (
        "round((cast(ssb_fp as double) / (k_groups - 1e0))"
        " / (cast(ssw_fp as double) / (n_total - k_groups * 1e0)), 6)"
    )
    return agg.select(
        "k_groups",
        "n_total",
        F.expr("round(cast(ssb_fp as double) / 1e12, 6)").alias("ssb"),
        F.expr("round(cast(ssw_fp as double) / 1e12, 6)").alias("ssw"),
        (F.col("k_groups") - 1).cast("long").alias("df1"),
        (F.col("n_total") - F.col("k_groups")).cast("long").alias("df2"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.expr(fstat))
        .alias("f_stat"),
    )


def kruskal_wallis(
    df: DataFrame, value: str = "value", group: str = "grp"
) -> DataFrame:
    """Kruskal-Wallis H-test (rank one-way ANOVA) of a value column
    across the levels of ``group``, with the standard tie correction —
    the distribution-free companion to anova_oneway and the k-sample
    generalization of mann_whitney_u.

    Rank algebra without per-row ranking (the AUC / Mann-Whitney
    recipe): rows collapse to one row per DISTINCT value with
    per-group counts; the average rank of a distinct value v is
    cum(<v) + (t_v + 1)/2, so TWICE the per-group rank sum

        r2_g = sum_v  c_gv * (2*cum_v + t_v + 1)        (exact BIGINT)

    The cumulative runs over the distinct-value lattice only — bounded
    cardinality for lattice-valued inputs (quantities, rounded
    scores), never corpus-sized. Per-group mean doubled-ranks fix-
    point EXACTLY at 1e-6 (the anova_oneway recipe — r2_g^2/n_g would
    overflow at 1e12 rows):

        afp_g = (2*10^6*r2_g + n_g) div (2*n_g)         (BIGINT)
        c     = 10^6 * (N + 1)     -- doubled global mean rank, exact
        s_fp  = sum_g n_g * (afp_g - c)^2               (DECIMAL(38,0))

    and by the between-groups identity H = 12/(N(N+1)) * sum_g n_g *
    (rbar_g - rbar)^2 = 3 * s_fp / (1e12 * N * (N+1)) — one shared-
    text double close (the /4 converts doubled ranks). Tie correction
    C = 1 - sum_v (t_v^3 - t_v)/(N^3 - N) from exact decimal sums;
    h_adj = H / C, NULL when k < 2 or all values tie (C = 0).

    Output: one row (k_groups, n_total, n_distinct, h_stat,
    tie_correction, h_adj).
    """
    per = df.groupBy(value, group).agg(F.count("*").alias("c_gv"))
    tot = per.groupBy(value).agg(F.sum("c_gv").alias("t_v"))
    w = Window.orderBy(value).rowsBetween(Window.unboundedPreceding, -1)
    tot2 = tot.withColumn(
        "cum_v", F.coalesce(F.sum("t_v").over(w), F.lit(0))
    )
    joined = per.join(tot2, value)
    byg = joined.groupBy(group).agg(
        F.sum("c_gv").alias("n_g"),
        F.sum(
            F.col("c_gv") * (2 * F.col("cum_v") + F.col("t_v") + 1)
        ).alias("r2_g"),
    )
    byg = byg.withColumn(
        "afp_g",
        F.expr(
            "(2000000 * cast(r2_g as decimal(38,0)) + n_g) div (2 * n_g)"
        ),
    )
    ranks = byg.agg(
        F.count("*").alias("k_groups"),
        F.sum("n_g").alias("n_total"),
    )
    dev = (
        "cast(afp_g - 1000000 * (n_tot_b + 1) as decimal(38,0))"
    )
    sfp = (
        byg.crossJoin(
            F.broadcast(ranks.select(F.col("n_total").alias("n_tot_b")))
        )
        .agg(F.sum(F.expr(f"n_g * ({dev} * {dev})")).alias("s_fp"))
    )
    ties = tot.agg(
        F.sum(
            F.col("t_v").cast("decimal(19,0)") * F.col("t_v") * F.col("t_v")
            - F.col("t_v")
        ).alias("t3_sum"),
        F.count("*").alias("n_distinct"),
    )
    both = ranks.crossJoin(ties).crossJoin(sfp)
    h = (
        "(3e0 * cast(s_fp as double)"
        " / (1e12 * n_total * (n_total + 1e0)))"
    )
    ctie = (
        "(1e0 - cast(t3_sum as double)"
        " / (n_total * 1e0 * n_total * n_total - n_total))"
    )
    return both.select(
        "k_groups",
        "n_total",
        "n_distinct",
        F.when(F.col("k_groups") < 2, F.lit(None).cast("double"))
        .otherwise(F.expr(f"round({h}, 6)"))
        .alias("h_stat"),
        F.expr(f"round({ctie}, 6)").alias("tie_correction"),
        F.when(
            (F.col("k_groups") < 2) | (F.expr(ctie) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.expr(f"round({h} / {ctie}, 6)"))
        .alias("h_adj"),
    )


def mcnemar_paired(
    df: DataFrame, flag_a: str = "flag_a", flag_b: str = "flag_b"
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes — one row per unit
    with two 0/1 flags (converted in window A vs window B, correct
    under model A vs model B): did the marginal rate change, judged
    only by the discordant pairs?

        chi2_cc = (|n01 - n10| - 1)^2 / (n01 + n10)

    (Edwards continuity correction). Exact integer cell counts from
    ONE algebraic aggregation; the statistic is a single shared-text
    double expression. NULL chi2 when there are no discordant pairs
    (the test is undefined; the concordant cells never enter it).

    Output: one row (n_units, n00, n01, n10, n11, chi2_cc).
    """
    a = F.col(flag_a).cast("long")
    b = F.col(flag_b).cast("long")
    agg = df.agg(
        F.count("*").alias("n_units"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
        F.sum((1 - a) * b).alias("n01"),
        F.sum(a * (1 - b)).alias("n10"),
        F.sum(a * b).alias("n11"),
    )
    chi2 = (
        "round((abs(n01 - n10) - 1e0) * (abs(n01 - n10) - 1e0)"
        " / (n01 + n10), 6)"
    )
    return agg.select(
        "n_units",
        "n00",
        "n01",
        "n10",
        "n11",
        F.when(F.col("n01") + F.col("n10") == 0, F.lit(None).cast("double"))
        .otherwise(F.expr(chi2))
        .alias("chi2_cc"),
    )


def mutual_information(
    df: DataFrame, x: str = "x", y: str = "y"
) -> DataFrame:
    """Mutual information, entropies, and normalized MI between two
    CATEGORICAL columns — the association strength behind every
    "does event type depend on hour-of-day / does language depend on
    source" profiling question, on the natural-log scale.

        MI = sum_xy  (c_xy/N) * ln( c_xy * N / (c_x * c_y) )
        H(X) = -sum_x (c_x/N) ln(c_x/N)      (likewise H(Y))
        NMI = MI / min(H(X), H(Y))

    Exactness (the unigram_logloss recipe): a float sum over cells
    would be addition-order dependent, so every cell's log factor is
    FIXED-POINT QUANTIZED — contribution = c_xy * round(ln(c_xy * N /
    (c_x * c_y)) * 1e9) as BIGINT — and the reductions are exact
    integer sums (order-free, engine-identical; ln itself is the
    pinned cross-engine lockstep). One joint groupBy + two marginal
    re-aggregations of it (all partial-agg, bounded by the category
    lattice, never corpus-sized); the big input is touched once.

    Output: one row (n_rows, n_x, n_y, n_cells, mi, h_x, h_y, nmi);
    NMI is NULL when either marginal entropy is zero (a constant
    column carries no information to normalize by).
    """
    joint = df.groupBy(x, y).agg(F.count("*").alias("c_xy"))
    mx = joint.groupBy(x).agg(F.sum("c_xy").alias("c_x"))
    my = joint.groupBy(y).agg(F.sum("c_xy").alias("c_y"))
    tot = joint.agg(F.sum("c_xy").alias("n_rows"))
    cells = (
        joint.join(mx, x)
        .join(my, y)
        .crossJoin(F.broadcast(tot))
    )
    mi_fp = (
        "c_xy * cast(round(ln(c_xy * 1e0 * n_rows"
        " / (c_x * 1e0 * c_y)) * 1e9, 0) as bigint)"
    )
    mi_agg = cells.groupBy("n_rows").agg(
        F.sum(F.expr(mi_fp)).alias("mi_fp"),
        F.count("*").alias("n_cells"),
    )
    hx_fp = "c_x * cast(round(ln(c_x * 1e0 / n_rows) * 1e9, 0) as bigint)"
    hy_fp = "c_y * cast(round(ln(c_y * 1e0 / n_rows) * 1e9, 0) as bigint)"
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.expr(hx_fp)).alias("hx_fp"),
            F.count("*").alias("n_x"),
        )
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.expr(hy_fp)).alias("hy_fp"),
            F.count("*").alias("n_y"),
        )
    )
    out = mi_agg.crossJoin(hx).crossJoin(hy)
    mi = "(mi_fp * 1e0 / (n_rows * 1e9))"
    h_x = "(-hx_fp * 1e0 / (n_rows * 1e9))"
    h_y = "(-hy_fp * 1e0 / (n_rows * 1e9))"
    return out.select(
        "n_rows",
        "n_x",
        "n_y",
        "n_cells",
        F.expr(f"round({mi}, 6)").alias("mi"),
        F.expr(f"round({h_x}, 6)").alias("h_x"),
        F.expr(f"round({h_y}, 6)").alias("h_y"),
        F.when(
            (F.col("hx_fp") == 0) | (F.col("hy_fp") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.expr(f"round({mi} / least({h_x}, {h_y}), 6)")
        )
        .alias("nmi"),
    )


def ols_simple(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Simple least-squares regression of INTEGER y on INTEGER x with
    the full inferential readout — slope, intercept, R^2, and the
    slope t-statistic — the closed-form companion to theil_sen_slopes
    (robust) and pearson_corr (direction-free): price-per-unit-
    quantity, spend-per-click style questions.

    One partial-agg pass collects the five moment sums; x*y / x^2 /
    y^2 channels ride DECIMAL(38,0) (DuckDB HUGEINT) so 1e12-row
    corpora cannot overflow. Every reported statistic is one
    shared-text double expression over those exact sums (decimal ->
    double casts are correctly rounded in both engines):

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy - slope*Sx) / n
        r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))
        t_slope = slope / se,  se^2 = (SSE/(n-2)) / (Sxx - Sx^2/n)

    NULL slope/intercept when x is constant; NULL r2 when either
    variable is constant; NULL t when additionally n <= 2 or SSE = 0.

    Output: one row (n, slope, intercept, r2, t_slope).
    """
    xv = F.col(x).cast("long")
    yv = F.col(y).cast("long")
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(xv).alias("sx"),
        F.sum(yv).alias("sy"),
        F.sum(xv.cast("decimal(19,0)") * yv).alias("sxy"),
        F.sum(xv.cast("decimal(19,0)") * xv).alias("sxx"),
        F.sum(yv.cast("decimal(19,0)") * yv).alias("syy"),
    )
    num = "(n * 1e0 * cast(sxy as double) - sx * 1e0 * sy)"
    dx = "(n * 1e0 * cast(sxx as double) - sx * 1e0 * sx)"
    dy = "(n * 1e0 * cast(syy as double) - sy * 1e0 * sy)"
    slope = f"({num} / {dx})"
    intercept = f"((sy - {slope} * sx) / n)"
    r2 = f"({num} * {num} / ({dx} * {dy}))"
    # SSE = Syy_c * (1 - r2); Syy_c = dy/n, Sxx_c = dx/n
    sse = f"(({dy} / n) * (1e0 - {r2}))"
    se2 = f"(({sse} / (n - 2e0)) / ({dx} / n))"
    t = f"({slope} / sqrt({se2}))"
    return agg.select(
        "n",
        F.when(F.expr(dx) == 0, F.lit(None).cast("double"))
        .otherwise(F.expr(f"round({slope}, 6)"))
        .alias("slope"),
        F.when(F.expr(dx) == 0, F.lit(None).cast("double"))
        .otherwise(F.expr(f"round({intercept}, 6)"))
        .alias("intercept"),
        F.when(
            (F.expr(dx) == 0) | (F.expr(dy) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.expr(f"round({r2}, 6)"))
        .alias("r2"),
        F.when(
            (F.expr(dx) == 0)
            | (F.expr(dy) == 0)
            | (F.col("n") <= 2)
            | (F.expr(sse) <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.expr(f"round({t}, 6)"))
        .alias("t_slope"),
    )


def randomization_test_2s(
    df: DataFrame,
    unit: str = "unit",
    stratum: str = "stratum",
    group: str = "grp",
    value: str = "value",
    n_reps: int = 64,
    salt: str = "rt0",
) -> DataFrame:
    """Two-sample randomization test of a mean difference, run
    independently in every stratum — the distribution-free,
    no-special-function significance test (Fisher 1935; the Bernoulli-
    reassignment "unconditional" variant of the permutation test,
    valid at level by construction): is the group-A mean of ``value``
    different from group B's, judged against ``n_reps`` re-labelings?

    DERANDOMIZED like every sampler here: replicate b re-assigns unit
    u to group A iff md5(u|b|salt) is even — reproducible, re-seedable,
    oracle-able. The B replicates ride ONE exploded frame as a key
    column (the influence_spread vectorization); per-(stratum, b)
    group sums are a single partial-agg groupBy.

    The extremity decision never touches a float: with
    d = sA/nA - sB/nB = (sA*nB - sB*nA) / (nA*nB), replicate b is at
    least as extreme as the observed split iff

        |num_b| * den_obs >= |num_obs| * den_b

    — cross-multiplied DECIMAL(38,0) integers (engine-exact at any
    corpus size). A replicate that empties either group has an
    undefined statistic and COUNTS AS EXTREME (conservative, keeps the
    p-value valid); a stratum whose OBSERVED split is one-sided
    reports NULL (the test is undefined there). p uses the standard
    add-one form p = (1 + #extreme) / (B + 1), reported as the exact
    rational (p_num, p_den) alongside the 6-dp double — the rational
    is what bh_fdr consumes, so the whole test-then-correct chain
    stays integer-exact.

    Output: one row per stratum — (stratum, n_a, n_b, diff_obs,
    p_num, p_den, p).
    """
    if n_reps < 1:
        raise ValueError("n_reps must be >= 1")
    from careers_spark.operators.dedup import _hash64_expr

    v = F.col(value).cast("long")
    gflag = F.col(group).cast("boolean")
    obs = df.groupBy(F.col(stratum).alias("stratum")).agg(
        F.sum(F.when(gflag, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(gflag, v).otherwise(F.lit(0))).alias("s_a"),
        F.sum(F.when(~gflag, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~gflag, v).otherwise(F.lit(0))).alias("s_b"),
    )
    coin = _hash64_expr(
        f"concat(cast({unit} as string), '|', cast(b as string), "
        f"'|', '{salt}')"
    )
    reps = (
        df.select(
            F.col(stratum).alias("stratum"),
            F.col(unit).alias(unit),
            v.alias("_v"),
        )
        .withColumn(
            "b", F.explode(F.expr(f"sequence(1, {int(n_reps)})"))
        )
        .withColumn("_ra", F.expr(f"({coin}) % 2 = 0"))
        .groupBy("stratum", "b")
        .agg(
            F.sum(F.when(F.col("_ra"), 1).otherwise(0)).alias("ra"),
            F.sum(F.when(F.col("_ra"), F.col("_v")).otherwise(F.lit(0))).alias(
                "sa"
            ),
            F.sum(F.when(~F.col("_ra"), 1).otherwise(0)).alias("rb"),
            F.sum(
                F.when(~F.col("_ra"), F.col("_v")).otherwise(F.lit(0))
            ).alias("sb"),
        )
    )
    dec = "cast({x} as decimal(38,0))"
    num_o = f"abs({dec.format(x='s_a')} * n_b - {dec.format(x='s_b')} * n_a)"
    den_o = f"({dec.format(x='n_a')} * n_b)"
    num_b = f"abs({dec.format(x='sa')} * rb - {dec.format(x='sb')} * ra)"
    den_b = f"({dec.format(x='ra')} * rb)"
    joined = reps.join(obs, "stratum").withColumn(
        "_ext",
        F.expr(
            f"ra = 0 or rb = 0 or {num_b} * {den_o} >= {num_o} * {den_b}"
        ),
    )
    agg = joined.groupBy("stratum").agg(
        F.first("n_a").alias("n_a"),
        F.first("s_a").alias("s_a"),
        F.first("n_b").alias("n_b"),
        F.first("s_b").alias("s_b"),
        F.sum(F.when(F.col("_ext"), 1).otherwise(0)).alias("n_ext"),
    )
    return agg.select(
        "stratum",
        "n_a",
        "n_b",
        F.expr(
            "case when n_a = 0 or n_b = 0 then null else "
            "round(s_a * 1e0 / n_a - s_b * 1e0 / n_b, 6) end"
        ).alias("diff_obs"),
        F.expr(
            f"case when n_a = 0 or n_b = 0 then null else "
            f"cast(1 + n_ext as bigint) end"
        ).alias("p_num"),
        F.lit(int(n_reps) + 1).cast("long").alias("p_den"),
        F.expr(
            f"case when n_a = 0 or n_b = 0 then null else "
            f"round((1 + n_ext) * 1e0 / {int(n_reps) + 1}, 6) end"
        ).alias("p"),
    )


def bh_fdr(
    tests: DataFrame,
    test_id: str = "test_id",
    p_num: str = "p_num",
    p_den: str = "p_den",
    alpha_mille: int = 100,
) -> DataFrame:
    """Benjamini-Hochberg FDR control (JRSS-B 1995) over a table of
    EXACT RATIONAL p-values — the multiple-testing guard for every
    per-stratum test family this engine runs (one test per source /
    language / segment is m tests, and m uncorrected 0.05s guarantee
    false discoveries at web scale). Rejects the k* smallest p-values
    where k* = max{k : p_(k) <= k * alpha / m}.

    Every decision is INTEGER algebra: the step-up predicate

        p_num * m * 1000 <= k * alpha_mille * p_den

    is cross-multiplied BIGINT (alpha on the familiar 1e-3 lattice),
    and the p-value ordering ranks by the exact rational via the same
    cross-multiplication trick — a window over the TEST table
    (dimension-sized: one row per stratum, never corpus data). Rows
    with NULL p (undefined tests) are passed through unranked with
    reject = NULL, and do not count toward m (they carry no evidence).

    Output: one row per test — (test_id, p_num, p_den, p, rank,
    k_star, reject).
    """
    from pyspark.sql import Window

    t = tests.select(
        F.col(test_id).alias("test_id"),
        F.col(p_num).cast("long").alias("p_num"),
        F.col(p_den).cast("long").alias("p_den"),
    )
    valid = t.filter(F.col("p_num").isNotNull())
    m = valid.count()
    if m == 0:
        return t.select(
            "test_id",
            "p_num",
            "p_den",
            F.lit(None).cast("double").alias("p"),
            F.lit(None).cast("int").alias("rank"),
            F.lit(None).cast("int").alias("k_star"),
            F.lit(None).cast("boolean").alias("reject"),
        )
    # exact-rational ordering: p1 < p2 iff n1*d2 < n2*d1; realized as
    # a sort key only when denominators are shared (the randomization
    # family), else falls back to the deterministic double (an exact
    # rational-to-double is itself deterministic) with id ties
    w = Window.orderBy(
        (F.col("p_num") * 1.0 / F.col("p_den")).asc(), F.col("test_id").asc()
    )
    ranked = valid.withColumn("rank", F.row_number().over(w)).withColumn(
        "_ok",
        F.expr(
            f"p_num * {m} * 1000 <= rank * {int(alpha_mille)} * p_den"
        ),
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("_ok"), F.col("rank"))), F.lit(0)
        ).alias("k_star")
    )
    out = ranked.crossJoin(F.broadcast(kstar)).select(
        "test_id",
        "p_num",
        "p_den",
        F.expr("round(p_num * 1e0 / p_den, 6)").alias("p"),
        "rank",
        "k_star",
        (F.col("rank") <= F.col("k_star")).alias("reject"),
    )
    nulls = t.filter(F.col("p_num").isNull()).select(
        "test_id",
        "p_num",
        "p_den",
        F.lit(None).cast("double").alias("p"),
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("int").alias("k_star"),
        F.lit(None).cast("boolean").alias("reject"),
    )
    return out.unionAll(nulls)


def cochran_q(
    df: DataFrame,
    unit: str = "unit",
    treatment: str = "treatment",
    flag: str = "flag",
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — the k-treatment
    generalization of mcnemar_paired: did the SAME units respond
    differently across k binary conditions (converted in each of k
    time windows, passed under each of k models)? McNemar is the k=2
    special case; anova_oneway's "k groups" are INDEPENDENT samples,
    these are k correlated measurements per unit.

    The statistic is computed in its all-integer identity

        Q = (k-1) * (k * sum_j T_j^2 - T^2)
                  / (k * sum_i x_i - sum_i x_i^2)

    (T_j = per-treatment successes, x_i = per-unit successes,
    T = total) — every sum an exact BIGINT / DECIMAL(38,0), Q one
    shared-text double division. NULL when the denominator is zero
    (every unit all-0 or all-k: no within-unit variability, test
    undefined). Duplicate (unit, treatment) observations collapse by
    max() first (binary semantics); a unit-treatment cell absent from
    the input is an implicit 0, so callers pass successes only or the
    full grid interchangeably.

    Physical shape: one dedup groupBy, two partial-agg rollups (unit
    marginals, treatment marginals), a scalar close. k comes from the
    treatment dimension (bounded; a driver-side distinct count, the
    nlist-centroids convention).

    Output: one row — (k_treatments, n_units, q_stat, df).
    """
    cells = df.groupBy(
        F.col(unit).alias("u"), F.col(treatment).alias("t")
    ).agg(F.max(F.col(flag).cast("long")).alias("f"))
    k = cells.select("t").distinct().count()
    if k < 2:
        raise ValueError("cochran_q needs >= 2 treatments")
    tj = cells.groupBy("t").agg(F.sum("f").alias("tsum"))
    ta = tj.agg(
        F.sum("tsum").alias("st"),
        F.sum(
            F.col("tsum").cast("decimal(19,0)") * F.col("tsum")
        ).alias("stt"),
    )
    xa = (
        cells.groupBy("u")
        .agg(F.sum("f").alias("x"))
        .agg(
            F.count("*").alias("n_units"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).alias(
                "sxx"
            ),
        )
    )
    return (
        ta.crossJoin(xa)
        .select(
            F.lit(k).cast("int").alias("k_treatments"),
            "n_units",
            F.expr(
                f"case when ({k} * cast(sx as decimal(38,0)) - sxx) = 0"
                f" then null else round(({k} - 1)"
                f" * ({k} * cast(stt as double)"
                f" - cast(st as double) * st)"
                f" / ({k} * cast(sx as double)"
                f" - cast(sxx as double)), 6) end"
            ).alias("q_stat"),
            F.lit(k - 1).cast("int").alias("df"),
        )
    )


def friedman_test(
    df: DataFrame,
    unit: str = "unit",
    treatment: str = "treatment",
    value: str = "value",
) -> DataFrame:
    """Friedman test (Friedman 1937) — the rank analog of cochran_q
    for NON-binary outcomes and the within-blocks complement of
    kruskal_wallis: each unit ranks the k treatments among themselves
    (a k-row ranking, never corpus-wide), and the test asks whether
    the per-treatment mean rank differs across units.

    Exactness: within-unit midranks stay on the integer lattice as
    DOUBLED ranks — d2r = 2*rank + ties - 1, with rank = RANK() and
    ties = the value's within-unit multiplicity (both exact
    integers) — so rank sums R2_j are BIGINT; with R_j = R2_j/2 the
    tie-free statistic 12*sum R_j^2/(n k (k+1)) - 3n(k+1) becomes
    3 * sum R2_j^2 / (n k (k+1)) - 3n(k+1), one shared-text double
    over exact sums, and the tie correction C = 1 - sum(t^3 - t) /
    (n k (k^2 - 1)) divides two exact integers. chi2_adj = chi2 / C,
    NULL when C = 0 (all values tied within every unit). RAISES on
    ragged blocks — Friedman requires every unit to observe all k
    treatments (fill a complete grid upstream, as the driver query
    does).

    Physical shape: a per-unit window over k-row partitions for the
    doubled ranks, one treatment rollup, one tie rollup over
    (unit, value) multiplicities, scalar close.

    Output: one row — (k_treatments, n_units, chi2, tie_correction,
    chi2_adj, df).
    """
    from pyspark.sql import Window

    cells = df.select(
        F.col(unit).alias("u"),
        F.col(treatment).alias("t"),
        F.col(value).cast("long").alias("v"),
    )
    k = cells.select("t").distinct().count()
    if k < 2:
        raise ValueError("friedman_test needs >= 2 treatments")
    shape = cells.groupBy("u").agg(F.countDistinct("t").alias("kt")).agg(
        F.min("kt").alias("kmin"), F.max("kt").alias("kmax")
    ).collect()[0]
    if shape.kmin != k or shape.kmax != k:
        raise ValueError(
            "friedman_test: ragged blocks — every unit must observe "
            f"all {k} treatments (saw {shape.kmin}..{shape.kmax})"
        )
    wu = Window.partitionBy("u").orderBy("v")
    wv = Window.partitionBy("u", "v")
    ranked = cells.withColumn(
        "d2r",
        2 * F.rank().over(wu) + F.count("*").over(wv) - 1,
    )
    r2 = ranked.groupBy("t").agg(F.sum("d2r").alias("R2"))
    ra = r2.agg(
        F.sum(F.col("R2").cast("decimal(19,0)") * F.col("R2")).alias("srr")
    )
    n_units = cells.select("u").distinct().count()
    ties = (
        cells.groupBy("u", "v")
        .agg(F.count("*").alias("tt"))
        .agg(
            F.sum(
                F.col("tt").cast("decimal(19,0)")
                * F.col("tt")
                * F.col("tt")
                - F.col("tt")
            ).alias("st3")
        )
    )
    n, kk = n_units, k
    chi2 = (
        f"3e0 * cast(srr as double) / ({n}e0 * {kk} * {kk + 1})"
        f" - 3e0 * {n} * {kk + 1}"
    )
    corr = f"1e0 - cast(st3 as double) / ({n}e0 * {kk} * ({kk} * {kk} - 1))"
    return (
        ra.crossJoin(ties)
        .select(
            F.lit(kk).cast("int").alias("k_treatments"),
            F.lit(n).cast("long").alias("n_units"),
            F.expr(f"round({chi2}, 6)").alias("chi2"),
            F.expr(f"round({corr}, 6)").alias("tie_correction"),
            F.expr(
                f"case when ({corr}) = 0 then null"
                f" else round(({chi2}) / ({corr}), 6) end"
            ).alias("chi2_adj"),
            F.lit(kk - 1).cast("int").alias("df"),
        )
    )


def brown_forsythe(
    df: DataFrame, value: str = "value", group: str = "grp"
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe
    1974) — the robust Levene variant and the GATE before trusting
    anova_oneway's equal-variance assumption: run the one-way ANOVA F
    on absolute deviations from each group's MEDIAN. A significant F
    here says the groups' spreads differ, so the ANOVA on means needs
    the Welch route instead.

    Exactness trick: deviations stay on the INTEGER lattice by
    doubling — the per-group doubled median med2 = (k_lo-th smallest)
    + (k_hi-th smallest) is an exact integer for both parities (k_lo
    = (n+1) div 2, k_hi = (n+2) div 2, both from the distinct-value
    cumulative, the pinned AUC/percentile convention — never a
    corpus-wide sort), and z = |2x - med2| is an exact BIGINT. F is
    scale-invariant, so ANOVA on z IS the Brown-Forsythe statistic;
    the heavy lifting reuses anova_oneway verbatim (its fixed-point
    mean lattice and DECIMAL(38,0) channels included).

    Physical shape: one (group, value) count rollup, a cumulative over
    each group's distinct-value lattice, one broadcast med2 join back,
    then anova_oneway's two aggregations. Corpus touched twice (once
    for the median, once for the deviations) — the honest cost of a
    median-centered statistic.

    Output: anova_oneway's row — (k_groups, n_total, ssb, ssw, df1,
    df2, f_stat) — where f_stat IS the Brown-Forsythe statistic.
    """
    from pyspark.sql import Window

    v = F.col(value).cast("long")
    rows = df.select(F.col(group).alias("_g"), v.alias("_v"))
    vc = rows.groupBy("_g", "_v").agg(F.count("*").alias("_c"))
    wcum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("_g")
    marked = (
        vc.withColumn("_cum", F.sum("_c").over(wcum))
        .withColumn("_n", F.sum("_c").over(wall))
    )
    med = marked.groupBy("_g").agg(
        (
            F.min(
                F.when(
                    F.col("_cum") >= F.expr("(_n + 1) div 2"),
                    F.col("_v"),
                )
            )
            + F.min(
                F.when(
                    F.col("_cum") >= F.expr("(_n + 2) div 2"),
                    F.col("_v"),
                )
            )
        ).alias("_med2")
    )
    z = rows.join(F.broadcast(med), "_g").select(
        F.col("_g").alias("grp"),
        F.abs(2 * F.col("_v") - F.col("_med2")).alias("z"),
    )
    return anova_oneway(z, value="z", group="grp")


def cramers_v(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Cramér's V association strength between two categorical columns
    (Cramér 1946) — the [0,1]-normalized EFFECT SIZE beside
    mutual_information's nats and chi2's raw statistic: how strongly
    does event type depend on hour, language on source.

    The contingency chi-square is computed WITHOUT materializing empty
    cells via the identity

        chi2 = N * sum_present o^2 / (r_i * c_j)  -  N

    (absent cells' (0-e)^2/e = e mass folds into the -N term), so the
    plan is one joint groupBy + two marginal re-aggs — bounded by the
    category lattice, never the r x c grid. Each present cell's term
    is one shared-text double, quantized to the 1e-9 lattice before
    the cross-cell sum (order-free BIGINT, the mutual_information
    recipe); V = sqrt(chi2 / (N * min(r-1, c-1))) is one IEEE sqrt,
    NULL when either variable is constant.

    Output: one row — (n_rows, n_x, n_y, chi2, v).
    """
    joint = df.groupBy(
        F.col(x).alias("_x"), F.col(y).alias("_y")
    ).agg(F.count("*").alias("o"))
    mx = joint.groupBy("_x").agg(F.sum("o").alias("r_i"))
    my = joint.groupBy("_y").agg(F.sum("o").alias("c_j"))
    tot = joint.agg(
        F.sum("o").alias("n_rows"), F.count("*").alias("n_cells")
    )
    nx = mx.agg(F.count("*").alias("n_x"))
    ny = my.agg(F.count("*").alias("n_y"))
    cells = (
        joint.join(F.broadcast(mx), "_x")
        .join(F.broadcast(my), "_y")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_tfp",
            F.expr(
                "cast(round(cast(o as double) * o * n_rows"
                " / (cast(r_i as double) * c_j) * 1000000000e0, 0)"
                " as bigint)"
            ),
        )
    )
    agg = cells.groupBy().agg(
        F.first("n_rows").alias("n_rows"),
        F.sum("_tfp").alias("_sfp"),
    )
    return (
        agg.crossJoin(F.broadcast(nx))
        .crossJoin(F.broadcast(ny))
        .select(
            "n_rows",
            "n_x",
            "n_y",
            F.expr(
                "round(_sfp / 1000000000e0 - n_rows, 6)"
            ).alias("chi2"),
            F.expr(
                "case when least(n_x, n_y) < 2 then null else"
                " round(sqrt(greatest(_sfp / 1000000000e0 - n_rows, 0e0)"
                " / (n_rows * 1e0 * (least(n_x, n_y) - 1))), 6) end"
            ).alias("v"),
        )
    )


def ratio_metric_ci(
    df: DataFrame,
    variant: str = "variant",
    num: str = "num",
    den: str = "den",
) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric per variant
    (Deng, Knoblich & Lu, KDD 2018 — the experimentation-platform
    standard): revenue per session, clicks per user, tokens per
    document. Rows are the RANDOMIZATION UNITS (users) carrying
    per-unit numerator and denominator totals, so the analysis unit
    matches the assignment unit — naively treating sessions as
    independent is the classic ratio-metric mistake this operator
    exists to prevent (the ab_conversion lesson, generalized).

    With r = sum(x)/sum(y), the delta method gives

        Var(r) ~= (s_xx + r^2 s_yy - 2 r s_xy) / (n * ybar^2)

    where s_** are sample (co)variances. ONE partial-agg pass collects
    the six exact moment sums (cross/square channels ride
    DECIMAL(38,0) — the ols_simple posture); every reported statistic
    is a single shared-text double close over them, one IEEE sqrt for
    the 95% Wald band. NULL se/CI when sum(y) = 0 or n < 2.

    Output: one row per variant — (variant, n_units, sum_num, sum_den,
    ratio, se, lo95, hi95).
    """
    x = F.col(num).cast("long")
    y = F.col(den).cast("long")
    g = df.groupBy(F.col(variant).alias("variant")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x.cast("decimal(19,0)") * x).alias("sxx"),
        F.sum(y.cast("decimal(19,0)") * y).alias("syy"),
        F.sum(x.cast("decimal(19,0)") * y).alias("sxy"),
    )
    r = "(sx * 1e0 / sy)"
    # sample (co)variances from moments: (n*sAB - sA*sB)/(n*(n-1))
    vxx = "((n * cast(sxx as double) - sx * 1e0 * sx) / (n * (n - 1e0)))"
    vyy = "((n * cast(syy as double) - sy * 1e0 * sy) / (n * (n - 1e0)))"
    vxy = "((n * cast(sxy as double) - sx * 1e0 * sy) / (n * (n - 1e0)))"
    ybar2 = "((sy * 1e0 / n) * (sy * 1e0 / n))"
    var = (
        f"(({vxx} + {r} * {r} * {vyy} - 2e0 * {r} * {vxy})"
        f" / (n * {ybar2}))"
    )
    # the guard must gate var's EVALUATION (ANSI raises on the n-1
    # division), and float cancellation can leave var at -1e-18 for an
    # exactly-constant ratio — greatest(.., 0) absorbs it identically
    # in both engines
    guard = "sy = 0 or n < 2"
    vpos = f"greatest({var}, 0e0)"
    return g.select(
        "variant",
        F.col("n").alias("n_units"),
        F.col("sx").alias("sum_num"),
        F.col("sy").alias("sum_den"),
        F.expr(
            f"case when sy = 0 then null else round({r}, 6) end"
        ).alias("ratio"),
        F.expr(
            f"case when {guard} then null"
            f" else round(sqrt({vpos}), 6) end"
        ).alias("se"),
        F.expr(
            f"case when {guard} then null"
            f" else round({r} - 1.96e0 * sqrt({vpos}), 6) end"
        ).alias("lo95"),
        F.expr(
            f"case when {guard} then null"
            f" else round({r} + 1.96e0 * sqrt({vpos}), 6) end"
        ).alias("hi95"),
    )


def dunn_posthoc(
    df: DataFrame,
    value: str = "value",
    group: str = "grp",
    z_crit_mille: int = 2394,
) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons (Dunn 1964) — WHICH groups
    differ once kruskal_wallis says SOME do: for every group pair, the
    tie-corrected normal score of the mean-rank difference

        z_ij = (Rbar_i - Rbar_j)
               / sqrt((N(N+1)/12 - T/(12(N-1))) (1/n_i + 1/n_j))

    with T = sum(t^3 - t). The default critical value 2.394 is the
    Bonferroni z for k=3 groups (3 pairs) at family alpha 0.05 — pass
    the value matching your k (normal quantiles are caller-side
    because no cross-engine-pinned inverse CDF exists; the same reason
    bh_fdr consumes rationals).

    Mean DOUBLED ranks come from the kruskal_wallis machinery verbatim
    (distinct-value-lattice cumulative, afp fixed-pointed EXACTLY at
    1e-6 per group — order-free, never a corpus sort); z closes as one
    shared-text double with the doubled numerator absorbed by a /2.
    The pair table is k(k-1)/2 rows (dimension-sized).

    Output: one row per unordered pair — (grp_a, grp_b, n_a, n_b,
    mean_rank_a, mean_rank_b, z, reject).
    """
    from pyspark.sql import Window

    per = df.groupBy(value, group).agg(F.count("*").alias("c_gv"))
    tot = per.groupBy(value).agg(F.sum("c_gv").alias("t_v"))
    w = Window.orderBy(value).rowsBetween(Window.unboundedPreceding, -1)
    tot2 = tot.withColumn(
        "cum_v", F.coalesce(F.sum("t_v").over(w), F.lit(0))
    )
    byg = (
        per.join(tot2, value)
        .groupBy(group)
        .agg(
            F.sum("c_gv").alias("n_g"),
            F.sum(
                F.col("c_gv") * (2 * F.col("cum_v") + F.col("t_v") + 1)
            ).alias("r2_g"),
        )
        .withColumn(
            "afp_g",
            F.expr(
                "(2000000 * cast(r2_g as decimal(38,0)) + n_g)"
                " div (2 * n_g)"
            ),
        )
    )
    glob = byg.agg(F.sum("n_g").alias("n_tot"))
    ties = tot.agg(
        F.sum(
            F.col("t_v").cast("decimal(19,0)") * F.col("t_v") * F.col("t_v")
            - F.col("t_v")
        ).alias("t3_sum")
    )
    a = byg.select(
        F.col(group).alias("grp_a"),
        F.col("n_g").alias("n_a"),
        F.col("afp_g").alias("afp_a"),
    )
    b = byg.select(
        F.col(group).alias("grp_b"),
        F.col("n_g").alias("n_b"),
        F.col("afp_g").alias("afp_b"),
    )
    pairs = (
        a.join(b, F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(ties))
    )
    # afp is the DOUBLED mean rank at 1e-6 fixed point; /2e6 recovers
    # the mean rank, and the sigma term is the standard tie-corrected
    # Dunn denominator
    sig2 = (
        "((n_tot * (n_tot + 1e0) / 12e0"
        " - cast(t3_sum as double) / (12e0 * (n_tot - 1)))"
        " * (1e0 / n_a + 1e0 / n_b))"
    )
    zexpr = (
        f"(cast(afp_a - afp_b as double) / 2000000e0) / sqrt({sig2})"
    )
    return pairs.select(
        "grp_a",
        "grp_b",
        "n_a",
        "n_b",
        F.expr("round(afp_a / 2000000e0, 6)").alias("mean_rank_a"),
        F.expr("round(afp_b / 2000000e0, 6)").alias("mean_rank_b"),
        F.expr(
            f"case when {sig2} <= 0 then null"
            f" else round({zexpr}, 6) end"
        ).alias("z"),
        F.expr(
            f"case when {sig2} <= 0 then null else"
            f" abs({zexpr}) > {int(z_crit_mille)} / 1000e0 end"
        ).alias("reject"),
    )


def _lattice_pdfs(df: DataFrame, value: str, group: str, group_a):
    """Collect the two distinct-value lattices (value, count) as sorted
    numpy arrays. Bounded by the value DOMAIN (distinct lattice points),
    not the row count — the same bound the |V_a| x |V_b| cross-join
    formulation already relied on being 'dimension-sized'."""
    import numpy as np

    ga = F.col(group) == F.lit(group_a)
    v = F.col(value).cast("long")
    rows = df.select(ga.alias("_ga"), v.alias("_v"))
    lat = (
        rows.groupBy("_ga", "_v").agg(F.count("*").alias("c")).toPandas()
    )
    out = []
    for flag in (True, False):
        part = lat[lat["_ga"] == flag]
        vals = part["_v"].to_numpy(np.int64)
        cnts = part["c"].to_numpy(np.int64)
        o = np.argsort(vals)
        out.append((vals[o], cnts[o]))
    return out[0], out[1]


def hodges_lehmann_catalyst(
    df: DataFrame,
    value: str = "value",
    group: str = "grp",
    group_a=True,
) -> DataFrame:
    """The original all-Spark Hodges-Lehmann (|V_a| x |V_b| lattice
    cross join + cumulative window). Kept as the reference
    implementation `hodges_lehmann` is pinned bit-exact against in
    tests; the cross join is quadratic in DISTINCT values, which for
    high-cardinality lattices (e.g. price cents) is quadratic in
    everything — prefer the selection kernel."""
    from pyspark.sql import Window

    ga = F.col(group) == F.lit(group_a)
    v = F.col(value).cast("long")
    rows = df.select(ga.alias("_ga"), v.alias("_v"))
    la = rows.filter("_ga").groupBy("_v").agg(F.count("*").alias("ca"))
    lb = rows.filter("not _ga").groupBy("_v").agg(
        F.count("*").alias("cb")
    )
    diffs = (
        la.crossJoin(
            lb.select(F.col("_v").alias("_vb"), "cb")
        )
        .select(
            (F.col("_v") - F.col("_vb")).alias("d"),
            (
                F.col("ca").cast("decimal(19,0)") * F.col("cb")
            ).alias("w"),
        )
        .groupBy("d")
        .agg(F.sum("w").alias("w"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    marked = diffs.withColumn("cum", F.sum("w").over(wcum)).withColumn(
        "n", F.sum("w").over(wall)
    )
    med = marked.agg(
        F.max("n").alias("n_pairs"),
        (
            F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("d")))
            + F.min(
                F.when(F.col("cum") >= F.expr("(n + 2) div 2"), F.col("d"))
            )
        ).alias("med2"),
    )
    na = la.agg(F.coalesce(F.sum("ca"), F.lit(0)).alias("n_a"))
    nb = lb.agg(F.coalesce(F.sum("cb"), F.lit(0)).alias("n_b"))
    return (
        med.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a",
            "n_b",
            F.expr(
                "case when n_a = 0 or n_b = 0 then null"
                " else cast(n_pairs as bigint) end"
            ).alias("n_pairs"),
            F.expr(
                "case when n_a = 0 or n_b = 0 then null"
                " else round(med2 / 2e0, 6) end"
            ).alias("hl_shift"),
        )
    )


def hodges_lehmann(
    df: DataFrame,
    value: str = "value",
    group: str = "grp",
    group_a=True,
) -> DataFrame:
    """Hodges-Lehmann two-sample shift estimator (1963) — the robust
    ANSWER to Mann-Whitney's question: the test says the groups
    differ; HL says BY HOW MUCH, as the median of all n_a * n_b
    pairwise differences x_i - y_j (50% breakdown, no distributional
    assumption — the location-shift companion to theil_sen's slope).

    Never materializes n_a*n_b row pairs — and since r6, never the
    |V_a| x |V_b| lattice cross join either (quadratic in distinct
    values, i.e. quadratic outright for high-cardinality lattices like
    price cents). The doubled-median order statistics are found by
    binary search over the difference domain: cum(t) = #{(i, j):
    x_i - y_j <= t} = sum_a ca * (nb - cum_b(< va - t)) via one
    vectorized searchsorted per probe, ~60 probes total — O((|V_a| +
    |V_b|) log range) exact integer work instead of O(|V_a| * |V_b|).
    The cumulative only jumps at realized differences, so the minimal
    t with cum(t) >= k IS the k-th order statistic. Lattices are
    collected (bounded by the value domain, exactly the bound the
    cross-join version already relied on); counts use Python ints, so
    1e12-row samples cannot overflow the pair count. The closing
    division rides the identical Spark expression as before; pinned
    bit-exact against `hodges_lehmann_catalyst` in tests.

    Output: one row — (n_a, n_b, n_pairs, hl_shift) with hl_shift =
    median(x - y); NULL when either group is empty.
    """
    import numpy as np

    spark = df.sparkSession
    (va, ca), (vb, cb) = _lattice_pdfs(df, value, group, group_a)
    n_a = int(ca.sum())
    n_b = int(cb.sum())
    if n_a == 0 or n_b == 0:
        row = [(n_a, n_b)]
        return spark.createDataFrame(row, "n_a long, n_b long").select(
            "n_a",
            "n_b",
            F.lit(None).cast("long").alias("n_pairs"),
            F.lit(None).cast("double").alias("hl_shift"),
        )
    n_pairs = n_a * n_b
    cum_b = np.concatenate(([0], np.cumsum(cb)))

    def cnt_le(t: int) -> int:
        # pairs with va - vb <= t  <=>  vb >= va - t
        idx = np.searchsorted(vb, va - t, side="left")
        return int((ca * (n_b - cum_b[idx])).sum())

    def kth(k: int) -> int:
        lo = int(va[0] - vb[-1])
        hi = int(va[-1] - vb[0])
        while lo < hi:
            mid = (lo + hi) // 2
            if cnt_le(mid) >= k:
                hi = mid
            else:
                lo = mid + 1
        return lo

    k_lo = (n_pairs + 1) // 2
    k_hi = (n_pairs + 2) // 2
    d_lo = kth(k_lo)
    d_hi = d_lo if k_hi == k_lo else kth(k_hi)
    med2 = d_lo + d_hi
    row = [(n_a, n_b, n_pairs, med2)]
    return spark.createDataFrame(
        row, "n_a long, n_b long, n_pairs long, med2 long"
    ).select(
        "n_a",
        "n_b",
        "n_pairs",
        F.expr("round(med2 / 2e0, 6)").alias("hl_shift"),
    )


def cliffs_delta_catalyst(
    df: DataFrame,
    value: str = "value",
    group: str = "grp",
    group_a=True,
) -> DataFrame:
    """Cliff's delta ordinal effect size (Cliff 1993) — the
    distribution-free magnitude beside mann_whitney's p: delta =
    (#(x > y) - #(x < y)) / (n_a * n_b), in [-1, 1], with Romano's
    conventional magnitude labels (|d| < .147 negligible, < .33
    small, < .474 medium, else large) decided by INTEGER
    cross-multiplication on the mille lattice — no float in the
    labeling.

    The pair counting never touches row pairs: greater/less tallies
    come from the two distinct-value lattices joined through the
    cumulative trick (for each a-value, the count of b-values below
    it is the b-lattice cumulative), all DECIMAL(38,0) — the AUC
    machinery restated for the signed difference.

    Output: one row — (n_a, n_b, n_gt, n_lt, delta, magnitude); NULL
    delta when either group is empty.
    """
    from pyspark.sql import Window

    ga = F.col(group) == F.lit(group_a)
    v = F.col(value).cast("long")
    rows = df.select(ga.alias("_ga"), v.alias("_v"))
    la = rows.filter("_ga").groupBy("_v").agg(F.count("*").alias("ca"))
    lb = rows.filter("not _ga").groupBy("_v").agg(
        F.count("*").alias("cb")
    )
    wb = Window.orderBy("_v")
    blat = (
        lb.withColumn(
            "cum_lt",
            F.coalesce(
                F.sum("cb").over(
                    wb.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "tot_b",
            F.sum("cb").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    # for each a-lattice value: #b strictly below, #b equal (for the
    # strictly-above complement) — a range join restated as the pinned
    # lattice cumulative via a <= join on the b lattice... instead:
    # join each a value to the LARGEST b value <= it, which is again a
    # sort-merge shape; the simplest exact dimension-sized form is the
    # lattice cross join (|V_a| x |V_b|), matching hodges_lehmann
    pairs = la.crossJoin(
        lb.select(F.col("_v").alias("_vb"), "cb")
    ).select(
        F.expr(
            "case when _v > _vb then cast(ca as decimal(19,0)) * cb"
            " else cast(0 as decimal(19,0)) end"
        ).alias("gt"),
        F.expr(
            "case when _v < _vb then cast(ca as decimal(19,0)) * cb"
            " else cast(0 as decimal(19,0)) end"
        ).alias("lt"),
        (F.col("ca").cast("decimal(19,0)") * F.col("cb")).alias("tot"),
    )
    agg = pairs.agg(
        F.sum("gt").alias("n_gt"),
        F.sum("lt").alias("n_lt"),
        F.sum("tot").alias("n_pairs"),
    )
    na = la.agg(F.coalesce(F.sum("ca"), F.lit(0)).alias("n_a"))
    nb = lb.agg(F.coalesce(F.sum("cb"), F.lit(0)).alias("n_b"))
    # |delta| vs Romano cuts on the mille lattice, cross-multiplied:
    # |gt - lt| * 1000 vs cut * n_pairs — pure integer decisions
    mag = (
        "case"
        " when abs(dnum) * 1000 < 147 * n_pairs then 'negligible'"
        " when abs(dnum) * 1000 < 330 * n_pairs then 'small'"
        " when abs(dnum) * 1000 < 474 * n_pairs then 'medium'"
        " else 'large' end"
    )
    return (
        agg.withColumn("dnum", F.col("n_gt") - F.col("n_lt"))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a",
            "n_b",
            F.expr("cast(n_gt as bigint)").alias("n_gt"),
            F.expr("cast(n_lt as bigint)").alias("n_lt"),
            F.expr(
                "case when n_a = 0 or n_b = 0 then null"
                " else round(cast(dnum as double)"
                " / cast(n_pairs as double), 6) end"
            ).alias("delta"),
            F.expr(
                f"case when n_a = 0 or n_b = 0 then null else {mag} end"
            ).alias("magnitude"),
        )
    )


def cliffs_delta(
    df: DataFrame,
    value: str = "value",
    group: str = "grp",
    group_a=True,
) -> DataFrame:
    """Cliff's delta ordinal effect size (Cliff 1993) — semantics
    identical to `cliffs_delta_catalyst` (see its docstring); this is
    the r6 physical rewrite, pinned bit-exact against it in tests.

    The |V_a| x |V_b| lattice cross join (quadratic in distinct
    values) is replaced by exact cumulative counting on the collected
    lattices: n_gt = sum_a ca * #{vb < va}, n_lt = sum_a ca *
    #{vb > va}, one vectorized searchsorted each — O((|V_a| + |V_b|)
    log |V_b|). Counts are Python ints (no 2^63 pair-count ceiling);
    the delta division and the Romano magnitude CASE ride the
    identical Spark expressions over DECIMAL(38,0) literals, so every
    rounding and labeling decision is unchanged.

    Output: one row — (n_a, n_b, n_gt, n_lt, delta, magnitude); NULL
    delta when either group is empty.
    """
    import numpy as np

    spark = df.sparkSession
    (va, ca), (vb, cb) = _lattice_pdfs(df, value, group, group_a)
    n_a = int(ca.sum())
    n_b = int(cb.sum())
    if n_a == 0 or n_b == 0:
        # the catalyst pair table is empty: its sums (and so n_gt,
        # n_lt, n_pairs) are NULL, not 0
        gt_s = lt_s = np_s = None
    else:
        cum_b = np.concatenate(([0], np.cumsum(cb)))
        lt_idx = np.searchsorted(vb, va, side="left")  # #{vb < va}
        le_idx = np.searchsorted(vb, va, side="right")  # #{vb <= va}
        gt_s = str(int((ca * cum_b[lt_idx]).sum()))
        lt_s = str(int((ca * (n_b - cum_b[le_idx])).sum()))
        np_s = str(n_a * n_b)
    mag = (
        "case"
        " when abs(dnum) * 1000 < 147 * n_pairs then 'negligible'"
        " when abs(dnum) * 1000 < 330 * n_pairs then 'small'"
        " when abs(dnum) * 1000 < 474 * n_pairs then 'medium'"
        " else 'large' end"
    )
    row = [(n_a, n_b, gt_s, lt_s, np_s)]
    return (
        spark.createDataFrame(
            row, "n_a long, n_b long, _gt string, _lt string, _np string"
        )
        .select(
            "n_a",
            "n_b",
            F.expr("cast(_gt as decimal(38,0))").alias("n_gt_d"),
            F.expr("cast(_lt as decimal(38,0))").alias("n_lt_d"),
            F.expr("cast(_np as decimal(38,0))").alias("n_pairs"),
        )
        .withColumn("dnum", F.col("n_gt_d") - F.col("n_lt_d"))
        .select(
            "n_a",
            "n_b",
            F.expr("cast(n_gt_d as bigint)").alias("n_gt"),
            F.expr("cast(n_lt_d as bigint)").alias("n_lt"),
            F.expr(
                "case when n_a = 0 or n_b = 0 then null"
                " else round(cast(dnum as double)"
                " / cast(n_pairs as double), 6) end"
            ).alias("delta"),
            F.expr(
                f"case when n_a = 0 or n_b = 0 then null else {mag} end"
            ).alias("magnitude"),
        )
    )


def simpson_sign_check(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    stratum: str = "stratum",
) -> DataFrame:
    """Simpson's-paradox audit: does the SIGN of the x-y association
    within each stratum contradict the pooled sign? The classic
    curation trap this catches: "longer documents score higher" in the
    pooled corpus while every language individually shows the
    opposite — a length filter tuned on the pooled trend then cuts
    against every stratum. Association is measured by the covariance
    numerator n*Sxy - Sx*Sy, whose SIGN equals the correlation's, so
    the whole audit is float-free: integer moments on DECIMAL(38,0)
    (headroom for n*Sxy at corpus scale), one three-way CASE per row,
    and a strict sign-product flag.

    One partial-agg groupBy(stratum) + a broadcast pooled row; x and y
    must be integer-valued columns (put rounded scores on their 1e6
    lattice first — the calibration_bins convention).

    Output: (stratum, n, cov_sign, pooled_sign, is_reversed) with
    is_reversed true only on a strict sign flip (zero covariances
    never flag).
    """
    base = df.select(
        F.col(stratum).alias("s"),
        F.col(x).cast("decimal(38,0)").alias("xv"),
        F.col(y).cast("decimal(38,0)").alias("yv"),
    )

    def moments(g):
        return g.agg(
            F.count("*").cast("decimal(38,0)").alias("n"),
            F.sum("xv").alias("sx"),
            F.sum("yv").alias("sy"),
            F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
        )

    sign = (
        "case when n * sxy - sx * sy > 0 then 1"
        " when n * sxy - sx * sy < 0 then -1 else 0 end"
    )
    per = moments(base.groupBy("s")).select(
        "s",
        F.col("n").cast("long").alias("n"),
        F.expr(sign).alias("cov_sign"),
    )
    pooled = moments(base.groupBy()).select(
        F.expr(sign).alias("pooled_sign")
    )
    return per.crossJoin(F.broadcast(pooled)).select(
        F.col("s").alias(stratum),
        "n",
        "cov_sign",
        "pooled_sign",
        (F.col("cov_sign") * F.col("pooled_sign") == -1).alias(
            "is_reversed"
        ),
    )
