"""Community detection over the entity graph — label propagation.

The reference shells out to an external C++ Louvain implementation for
community grouping (reference: disambiguator/CommunityLouvain.scala:33-148,
golden-tested on a two-clique graph at testDisambiguator.scala:244-274);
communities only enrich the output with group ids — they never gate
triple P/R. The Spark-native re-expression is synchronous label
propagation as iterative DataFrame joins:

    label(v) <- argmax over neighbor labels by (weighted count, min label)

Deterministic: ties break lexicographically, iterations are synchronous
(all nodes update from the previous round's labels), and the iteration
count is capped — so the result is reproducible at any parallelism.
Same skew posture as connected components: the per-node aggregate is
algebraic (map-side partial agg), AQE covers the join on hub nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_iter: int = 10,
) -> DataFrame:
    """edges -> (node, community). Undirected; optional edge weight."""
    w = F.col(weight) if weight else F.lit(1.0)
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v"), w.alias("w")))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .dropDuplicates()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # self-vote at the node's max incident weight breaks the 2-cycle
    # oscillation of synchronous LPA (a<->b label swapping) while still
    # letting a clique majority overturn it; ties resolve to min label
    self_w = bidir.groupBy(F.col("u").alias("node")).agg(
        F.max("w").alias("w")
    )
    for _ in range(max_iter):
        votes = (
            bidir.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label", "w")
            .unionByName(self_w.join(labels, "node").select("node", "label", "w"))
            .groupBy("node", "label")
            .agg(F.sum("w").alias("votes"))
        )
        pick = Window.partitionBy("node").orderBy(
            F.desc("votes"), F.asc("label")
        )
        new_labels = (
            votes.withColumn("rk", F.row_number().over(pick))
            .filter(F.col("rk") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.withColumnRenamed("label", "community")


def node_groups(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Enrich the nodes table with a community group_id (the reference's
    TopicVector groupId enrichment, TopicVector.scala:86-108)."""
    comm = label_propagation(edges, src="src", dst="dst", weight="n_obs")
    return (
        nodes.join(comm.withColumnRenamed("node", "node_id"), "node_id", "left")
        .withColumn("group_id", F.coalesce(F.col("community"), F.col("node_id")))
        .drop("community")
    )
