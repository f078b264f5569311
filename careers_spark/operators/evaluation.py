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
