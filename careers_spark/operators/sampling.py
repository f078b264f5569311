"""Deterministic sampling for training-data pipelines.

Random sampling (df.sample) is neither reproducible across runs nor
oracle-checkable; these operators decide keep/drop from an md5-derived
bucket of the row's key, so the SAME rows are kept on every run, on
every engine, at every parallelism — and the sample composition is
seedable (change `salt`) without touching the data. This is the
standard language/quality rebalancing step of an LLM data pipeline
(e.g. downsample boilerplate-heavy English, keep all low-resource
languages).

Pure Catalyst: the bucket is a projection, the keep decision a filter —
both push down to the scan side of any downstream join, and nothing
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.dedup import _hash64_expr


def _check_salt(salt: str) -> str:
    """Salts are interpolated into SQL string literals in BOTH engines,
    whose escape rules differ (Spark honors backslash escapes, DuckDB
    does not) — restrict to characters that are literal in both."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9_.-]*", salt):
        raise ValueError(f"salt may contain only [A-Za-z0-9_.-] (got {salt!r})")
    return salt


def bucket_expr(key: str, salt: str) -> str:
    """md5-derived bucket in [0, 100) — engine-identical SQL both sides."""
    keyed = f"concat(cast({key} as string), '{_check_salt(salt)}')"
    return f"{_hash64_expr(keyed)} % 100"


def stratified_hash_sample(
    df: DataFrame,
    key: str = "doc_id",
    strata: str = "lang",
    rates: dict[str, int] | None = None,
    default_pct: int = 10,
    salt: str = "s0",
) -> DataFrame:
    """Keep a row iff bucket(key, salt) < its stratum's keep-percentage.

    `rates` maps stratum value -> integer percentage (0-100); strata not
    listed fall back to `default_pct`. Expected kept fraction per
    stratum is pct/100 with deterministic membership.

    Output: (doc_id, <strata>, bucket) for kept rows.
    """
    rates = rates or {}
    cases = " ".join(
        f"when {strata} = '{v}' then {int(p)}" for v, p in sorted(rates.items())
    )
    pct = f"case {cases} else {int(default_pct)} end" if cases else str(int(default_pct))
    return (
        df.withColumn("bucket", F.expr(bucket_expr(key, salt)))
        .filter(F.expr(f"bucket < ({pct})"))
        .select(key, strata, "bucket")
    )


def temperature_weights(
    df: DataFrame,
    strata: str = "lang",
    alpha_sqrt: bool = True,
) -> DataFrame:
    """Temperature-based stratum sampling weights — the multilingual
    rebalancing step of mT5/XLM-R-style pretraining: sample stratum l
    with probability q_l ∝ p_l^alpha where p_l is its natural share,
    flattening the head and boosting the tail.

    alpha is fixed at 0.5 (T = 2), computed as sqrt(p): IEEE requires
    sqrt to be correctly rounded, so BOTH engines produce the identical
    double — pow/exp/ln chains would not carry that guarantee for
    arbitrary alpha. The normalizer is an integer sum of fixed-point
    quantized weights (round(sqrt(p)*1e12) as BIGINT — the
    unigram_logloss recipe), so addition order can't perturb it.

    Physical shape: ONE algebraic groupBy over the corpus + a broadcast
    1-row total + a broadcast normalizer — the per-stratum table is
    dimension-sized at any corpus scale.

    Output: (<strata>, n_docs, share, weight, boost) where share = p_l,
    weight = q_l (sums to ~1), boost = q_l/p_l (the up/down-sampling
    factor a sampler applies per stratum).
    """
    if not alpha_sqrt:
        raise NotImplementedError("only alpha = 0.5 (sqrt) is exactness-safe")
    per = df.groupBy(strata).agg(F.count("*").alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    wfp = per.crossJoin(F.broadcast(tot)).withColumn(
        "w_fp",
        F.expr(
            "cast(round(sqrt(n_docs / cast(n_total as double)) * 1000000000000e0, 0)"
            " as bigint)"
        ),
    )
    z = wfp.agg(F.sum("w_fp").alias("z"))
    return wfp.crossJoin(F.broadcast(z)).select(
        strata,
        "n_docs",
        F.expr("round(n_docs / cast(n_total as double), 6)").alias("share"),
        F.expr("round(cast(w_fp as double) / z, 6)").alias("weight"),
        F.expr(
            "round(cast(w_fp as double) / z * n_total / n_docs, 6)"
        ).alias("boost"),
    )


def hash_topn_sample(
    df: DataFrame,
    n: int,
    key: str = "doc_id",
    strata: str = "lang",
    salt: str = "s0",
) -> DataFrame:
    """EXACTLY-n-per-stratum deterministic sample: rows rank by their
    md5 hash (then key) within the stratum and the first n win — the
    fixed-budget counterpart of the rate-based stratified_hash_sample
    (eval-set construction wants "500 docs per language", not "0.1%"):
    hash-ordering makes the pick uniform-ish yet reproducible across
    runs/engines/parallelism, and re-seedable by salt.

    One window per stratum (hash shuffle on strata + partition-local
    sort). Strata must individually fit a partition's sort — true for
    per-language corpus work; at extreme stratum sizes pre-filter with
    the rate-based sampler first (hybrid: rate-sample to ~10n, then
    exact-n — the standard two-phase trick).

    Output: (<key>, <strata>, rk) for kept rows, rk in 1..n.
    """
    from pyspark.sql import Window

    h = _hash64_expr(f"concat(cast({key} as string), '{_check_salt(salt)}')")
    w = Window.partitionBy(strata).orderBy(F.expr(h), F.col(key))
    return (
        df.select(key, strata)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(n))
    )


def dataset_split(
    df: DataFrame,
    key: str = "doc_id",
    strata: str = "lang",
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test assignment by md5 bucket — the
    split must be a pure function of the example's identity (never of
    row order or run) so that re-runs, engine ports, and incremental
    ingests all agree on membership and no example migrates between
    splits across snapshots (the classic leakage bug).

    Pure projection — zero shuffles; the bucket predicate pushes into
    any downstream scan.

    Output: (<key>, <strata>, bucket, split) with split in
    {train, val, test} at train_pct / val_pct / remainder.
    """
    t, v = int(train_pct), int(val_pct)
    return df.select(
        key,
        strata,
        F.expr(bucket_expr(key, salt)).alias("bucket"),
    ).withColumn(
        "split",
        F.expr(
            f"case when bucket < {t} then 'train'"
            f" when bucket < {t + v} then 'val' else 'test' end"
        ),
    )
