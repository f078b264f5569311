"""Deterministic cardinality sketches.

``approx_count_distinct`` (Spark's HLL++) and DuckDB's ``approx_distinct``
are different sketches with different estimates, so an HLL query can
never be oracle-checked hash-exactly. This module implements the
k-independent-minimums cardinality sketch (the Flajolet-Martin /
"MinCount" family; Giroire 2009): for k independent uniform hash
functions, the minimum of n uniform(0,1) draws has expectation
1/(n+1), and the sum of k independent minima is Gamma(k, 1/(n+1)),
whose MLE gives

    n_est = k / sum_j(min_j) - 1        (stderr ~ n / sqrt(k))

Why this sketch and not KMV (k-smallest values of ONE hash): KMV needs
the k smallest elements per group — a per-group top-k, i.e. a sort or
heap. k independent minima are k plain ``min`` AGGREGATES: fully
algebraic, map-side combinable, one partial-agg shuffle on the group
key, zero sorts — the same physical shape as a count(*). At 10^12 rows
the sketch costs exactly one groupBy pass regardless of k.

Determinism/oracle-exactness: the hash family is the md5-derived affine
family shared with MinHash (dedup.py:26-28) — integer min is exact, and
the estimator folds the k minima in FIXED index order (an explicit
m_0/P + m_1/P + ... chain, not an aggregate), so both engines evaluate
the identical IEEE-double expression and the result hash-matches with
a final round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.dedup import (
    MINHASH_A0,
    MINHASH_A_STEP,
    MINHASH_B0,
    MINHASH_B_STEP,
    MINHASH_P,
    _hash64_expr,
)


def kmin_terms(key_sql: str, k: int) -> list[str]:
    """The k per-group minimum expressions (SQL, engine-portable)."""
    h = _hash64_expr(key_sql)
    out = []
    for j in range(k):
        a = MINHASH_A0 + j * MINHASH_A_STEP
        b = MINHASH_B0 + j * MINHASH_B_STEP
        out.append(f"min(({h} * {a} + {b}) % {MINHASH_P})")
    return out


def kmin_estimate_sql(k: int) -> str:
    """n_est from columns m0..m{k-1}, folded in fixed index order.

    Literals carry the ``e0`` exponent suffix: Spark parses a bare
    ``123.0`` as DECIMAL and would run the whole fold in decimal
    arithmetic (different rounding, Decimal output); ``123e0`` is a
    DOUBLE literal in both Spark and DuckDB.
    """
    s = " + ".join(f"(m{j} / {MINHASH_P}e0)" for j in range(k))
    return f"round({k}e0 / ({s}) - 1e0, 4)"


def distinct_sketch(
    df: DataFrame,
    group: str,
    key_sql: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate vs exact, in ONE aggregation.

    Output: (<group>, n_exact, n_est, rel_err) — ``n_exact`` via exact
    count(distinct) for calibration (itself a two-phase algebraic agg),
    ``n_est`` the k-minimums estimate, ``rel_err`` their relative gap.
    At sketch-only scale drop the exact column; the sketch alone is a
    single partial-agg pass.
    """
    # hash once per row; the k affine mixes ride the one md5 (the oracle
    # recomputes it inline — semantically identical, DuckDB CSE's it)
    aggs = [
        F.expr(
            f"min((_kmh * {MINHASH_A0 + j * MINHASH_A_STEP}"
            f" + {MINHASH_B0 + j * MINHASH_B_STEP}) % {MINHASH_P})"
        ).alias(f"m{j}")
        for j in range(k)
    ]
    aggs.append(F.expr(f"count(distinct {key_sql})").alias("n_exact"))
    return (
        df.withColumn("_kmh", F.expr(_hash64_expr(key_sql)))
        .groupBy(group)
        .agg(*aggs)
        .withColumn("n_est", F.expr(kmin_estimate_sql(k)))
        .withColumn(
            "rel_err",
            F.expr("round(abs(n_est - n_exact) / n_exact, 4)"),
        )
        .select(group, "n_exact", "n_est", "rel_err")
    )
