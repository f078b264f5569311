"""Thin table catalog: Iceberg when a runtime is on the classpath,
partitioned parquet otherwise.

BASELINE.json's input_hint names Iceberg-backed transcript tables; this
sandbox's PySpark 4.1.2 bundles no Iceberg runtime jar, so the catalog
probes for one and degrades to parquet with identical call sites — the
pipeline code never branches on the backend.

Iceberg partitioning for the real deployment (documented intent,
exercised when a jar is present):
  - transcripts: bucket(256, conv_id) + days(ts)  — conversation-local
    scans with time pruning
  - triples/edges: pred (identity)                — predicate pruning
  - nodes: bucket(64, node_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    """read/write tables by name against a base location."""

    def __init__(self, spark: SparkSession, base: str, catalog_name: str = "kg"):
        self.spark = spark
        self.base = base.rstrip("/")
        self.catalog_name = catalog_name
        self.use_iceberg = iceberg_available(spark)

    def _path(self, table: str) -> str:
        return f"{self.base}/{table}"

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.catalog_name}.db.{table}")
        return self.spark.read.parquet(self._path(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        if self.use_iceberg:
            w = df.writeTo(f"{self.catalog_name}.db.{table}")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace() if mode == "overwrite" else w.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str,
        n_buckets: int = 64,
        sort_col: str | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Bucketed table write: later equi-joins/aggregations on
        `bucket_col` between co-bucketed tables need NO shuffle (the
        Iceberg path achieves the same with bucket(n, col) partition
        transforms). Registered in the session catalog as `table`."""
        if self.use_iceberg:
            from pyspark.sql import functions as F

            (
                df.writeTo(f"{self.catalog_name}.db.{table}")
                .partitionedBy(F.bucket(n_buckets, F.col(bucket_col)))
                .createOrReplace()
            )
            return
        w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
        if sort_col:
            w = w.sortBy(sort_col)
        w.option("path", self._path(table)).saveAsTable(table)
