"""Graph materialization: triples -> nodes/edges tables.

The reference's terminal outputs are XML/HTML reports and sbinary
TopicVector blobs (AmbiguityForest.scala:1093-1441,
TopicVector.scala:11-116); our terminal output is the knowledge graph
itself: partitioned `nodes` and `edges` tables plus per-partition
lineage (see plans.pipeline for the write/lineage/resume protocol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_nodes(links: DataFrame, mapping: DataFrame) -> DataFrame:
    """Canonical entity nodes with mention statistics."""
    from careers_spark.operators.canonicalize import apply_canonical

    l2 = apply_canonical(links, mapping, "topic")
    return (
        l2.groupBy(F.col("topic").alias("node_id"))
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .withColumn("name", F.col("node_id"))
        .select("node_id", "name", "n_mentions", "n_convs")
    )


def build_edges(triples: DataFrame) -> DataFrame:
    """Aggregate triple observations into weighted edges.

    Hub subjects/objects (e.g. a metropolis every org is located_in) make
    this groupBy skewed; count is algebraic so map-side partial
    aggregation absorbs it, and AQE coalesces the post-shuffle output.
    """
    return triples.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("n_obs"), F.min("conv_id").alias("first_conv")
    ).selectExpr("subj as src", "pred", "obj as dst", "n_obs", "first_conv")
