"""Declarative data-quality audit — the Deequ/dbt-test family: a set of
named constraints (uniqueness, non-null, referential integrity, value
ranges) evaluated in one pass each, emitted as one row per constraint
with checked/violation counts and a pass flag.

Why first-class: a 100 TB ingest without a constraint gate ships silent
corruption downstream (duplicate keys double-count in every join;
dangling foreign keys drop rows in inner joins); running the audit as
part of the pipeline makes data contracts testable exactly like code.

Physical shape per constraint family:
- non-null / range: one scan, two conditional counts — map-side only.
- uniqueness: one partial-agg groupBy(key) counting rows and distinct
  keys via the algebraic (count(*), count(key)) pair — violations =
  rows - distinct keys, no self-join.
- referential: LEFT ANTI join child->parent on the key (broadcast when
  the parent is a dimension; Spark picks that automatically under AQE
  for the small side).

All counts are integers, so the audit is oracle-checkable hash-exactly.
Output: (check_name, n_checked, n_violations, ok).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _row(spark: SparkSession, name: str, checked, violations) -> DataFrame:
    """One (check_name, n_checked, n_violations, ok) row from two
    already-aggregated 1-row frames (kept lazy: crossJoin of scalars)."""
    return (
        checked.crossJoin(violations)
        .select(
            F.lit(name).alias("check_name"),
            F.col("n_checked").cast("long").alias("n_checked"),
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).alias("ok"),
        )
    )


def not_null(spark, df: DataFrame, col: str, name: str) -> DataFrame:
    agg = df.agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_violations"),
    )
    return agg.select(
        F.lit(name).alias("check_name"),
        F.col("n_checked").cast("long").alias("n_checked"),
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("ok"),
    )


def unique_key(spark, df: DataFrame, col: str, name: str) -> DataFrame:
    # violations = rows - distinct keys (null keys are their own
    # violation class, counted by a not_null check, not here)
    agg = df.filter(F.col(col).isNotNull()).agg(
        F.count("*").alias("_n"), F.countDistinct(col).alias("_d")
    )
    return agg.select(
        F.lit(name).alias("check_name"),
        F.col("_n").cast("long").alias("n_checked"),
        (F.col("_n") - F.col("_d")).cast("long").alias("n_violations"),
        ((F.col("_n") - F.col("_d")) == 0).alias("ok"),
    )


def references(
    spark, child: DataFrame, ckey: str, parent: DataFrame, pkey: str, name: str
) -> DataFrame:
    n = child.agg(F.count("*").alias("n_checked"))
    dangling = (
        child.select(ckey)
        .filter(F.col(ckey).isNotNull())
        .join(parent.select(F.col(pkey).alias(ckey)), on=ckey, how="left_anti")
        .agg(F.count("*").alias("n_violations"))
    )
    return _row(spark, name, n, dangling)


def in_range(
    spark, df: DataFrame, predicate: str, name: str
) -> DataFrame:
    """predicate is the PASSING condition (SQL expression)."""
    agg = df.agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when(~F.expr(predicate), 1).otherwise(0)).alias("n_violations"),
    )
    return agg.select(
        F.lit(name).alias("check_name"),
        F.col("n_checked").cast("long").alias("n_checked"),
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("ok"),
    )


def constraint_audit(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """The driver audit suite over the warehouse tables: key uniqueness,
    non-null keys, referential integrity along the star schema, and
    domain ranges. Each check is one scan or one anti-join; the union
    is a single result table of integer counts."""
    c, o, li, d, ev = (
        tables["customer"],
        tables["orders"],
        tables["lineitem"],
        tables["documents"],
        tables["events"],
    )
    checks = [
        unique_key(spark, c, "c_custkey", "customer.c_custkey unique"),
        unique_key(spark, o, "o_orderkey", "orders.o_orderkey unique"),
        unique_key(spark, d, "doc_id", "documents.doc_id unique"),
        not_null(spark, o, "o_custkey", "orders.o_custkey not_null"),
        not_null(spark, ev, "ts", "events.ts not_null"),
        references(spark, o, "o_custkey", c, "c_custkey",
                   "orders.o_custkey -> customer"),
        references(spark, li, "l_orderkey", o, "o_orderkey",
                   "lineitem.l_orderkey -> orders"),
        in_range(spark, li, "l_quantity > 0", "lineitem.l_quantity positive"),
        in_range(spark, d, "n_chars >= 0", "documents.n_chars non_negative"),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out


# Benford expected first-digit masses log10(1 + 1/d), precomputed on
# the 1e-9 integer lattice (the ndcg discount recipe) so NO engine
# ever evaluates a log: expected counts become exact integer products.
_BENFORD_P9 = {
    d: round(__import__("math").log10(1.0 + 1.0 / d) * 1e9) for d in range(1, 10)
}


def benford_audit(
    spark: SparkSession, df: DataFrame, amount: str = "amount"
) -> DataFrame:
    """Benford's-law first-digit audit of a positive INTEGER amount
    column — the classic fraud / synthetic-data screen (Nigrini): the
    observed first-significant-digit distribution against the Benford
    masses log10(1 + 1/d), with a per-digit chi-squared contribution.

    Exactness: the digit is string-derived (first char of the integer's
    decimal form — no float log10 anywhere); per-digit counts are exact
    integers; expected masses are 1e-9-lattice integer literals, so the
    chi-squared numerator diff_fp = n_obs * 1e9 - n * p9 is an exact
    BIGINT (in range while n < ~9e8 rows; beyond that, widen the
    lattice — stated, not silently promoted) and each chi2 term is ONE
    shared-text double expression over exact integers. Digits that
    never occur still report rows (the digit dimension is literal), so
    a catastrophically non-Benford corpus can't hide by absence.

    One partial-agg groupBy on a 9-value key + a broadcast total — no
    window, no sort.

    Output: (digit, n_obs, obs_share, exp_share, chi2_term).
    """
    pos = df.select(F.col(amount).cast("long").alias("v")).filter(
        F.col("v") > 0
    )
    obs = pos.groupBy(
        F.substring(F.col("v").cast("string"), 1, 1).cast("int").alias("digit")
    ).agg(F.count("*").alias("n_obs"))
    tot = pos.agg(F.count("*").alias("n"))
    digits = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(
            F.array(*[F.lit(_BENFORD_P9[d]) for d in range(1, 10)]),
            F.col("id").cast("int"),
        ).alias("p9"),
    )
    full = (
        digits.join(obs, "digit", "left_outer")
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0).cast("long")).alias("n_obs"),
            "p9",
        )
        .crossJoin(F.broadcast(tot))
    )
    diff_fp = "(n_obs * 1000000000 - n * p9)"
    return full.select(
        "digit",
        "n_obs",
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.expr("n_obs * 1e0 / n"), 6))
        .alias("obs_share"),
        F.round(F.expr("p9 / 1000000000e0"), 6).alias("exp_share"),
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.expr(
                    f"{diff_fp} * 1e0 * {diff_fp}"
                    " / (1000000000e0 * n * p9)"
                ),
                6,
            )
        )
        .alias("chi2_term"),
    )


def fairness_audit(
    df: DataFrame,
    group: str,
    label: str = "label",
    pred: str = "pred",
) -> DataFrame:
    """Group-fairness audit of a binary classifier over a protected /
    stratification attribute — the responsible-AI release gate beside
    k_anonymity: per group, the selection rate (demographic parity),
    TPR (equal opportunity), and FPR (equalized odds' second half),
    plus each group's demographic-parity gap against the OVERALL
    selection rate.

    One partial-agg groupBy collects the per-group confusion counts as
    exact BIGINTs; the overall rate is a broadcast 1-row aggregate
    (the documented combiner shape); every rate is a single shared-
    text division rounded to 6, NULL when its denominator is empty
    (a group with no positives has no TPR — reporting 0 would hide
    the undefined cell).

    Output: (group, n, n_pos, selection_rate, tpr, fpr, dp_gap).
    """
    lb = F.col(label).cast("long")
    pr = F.col(pred).cast("long")
    per = df.groupBy(group).agg(
        F.count("*").alias("n"),
        F.sum(lb).alias("n_pos"),
        F.sum(pr).alias("n_sel"),
        F.sum(lb * pr).alias("tp"),
        F.sum((1 - lb) * pr).alias("fp"),
    )
    tot = df.agg(
        F.count("*").alias("n_all"),
        F.sum(pr).alias("sel_all"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            group,
            "n",
            "n_pos",
            F.expr("round(n_sel * 1e0 / n, 6)").alias("selection_rate"),
            F.when(F.col("n_pos") == 0, F.lit(None).cast("double"))
            .otherwise(F.expr("round(tp * 1e0 / n_pos, 6)"))
            .alias("tpr"),
            F.when(F.col("n") - F.col("n_pos") == 0, F.lit(None).cast("double"))
            .otherwise(F.expr("round(fp * 1e0 / (n - n_pos), 6)"))
            .alias("fpr"),
            F.expr(
                "round(n_sel * 1e0 / n - sel_all * 1e0 / n_all, 6)"
            ).alias("dp_gap"),
        )
    )
