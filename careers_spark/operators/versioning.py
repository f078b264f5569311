"""Corpus snapshot diff — the dataset-versioning primitive: given two
versions of a keyed corpus, classify every key as added / removed /
changed / unchanged by content fingerprint. This is what a recrawl
ingest runs to decide which documents need re-processing (and what a
Delta/Iceberg time-travel diff computes from its file-level metadata —
here stated content-level, format-independent).

Physical shape: ONE full outer join on the key (both sides reduced to
(key, fingerprint) first — the diff never carries payloads), then a
four-way CASE. At 100 TB the projection-before-join is the point: the
shuffle moves 2 x (key + 16-byte fingerprint), not documents.

Fingerprints are md5 of the content column — identical in any engine,
so the whole diff is oracle-checkable hash-exactly.

Output: (key, status, old_fp, new_fp); fingerprints NULL on the absent
side. Downstream: `WHERE status IN ('added','changed')` is the
re-process set; counts by status are the ingest report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, content: str
) -> DataFrame:
    o = old.select(F.col(key).alias(key), F.md5(F.col(content)).alias("old_fp"))
    n = new.select(F.col(key).alias(key), F.md5(F.col(content)).alias("new_fp"))
    return (
        o.join(n, on=key, how="full_outer")
        .select(
            key,
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
            "old_fp",
            "new_fp",
        )
    )
