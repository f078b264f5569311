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


def bucket_expr(key: str, salt: str) -> str:
    """md5-derived bucket in [0, 100) — engine-identical SQL both sides."""
    keyed = f"concat(cast({key} as string), '{salt}')"
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
