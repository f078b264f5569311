"""Canonicalization: iterative connected components over equivalence edges.

Replaces the reference's driver-side DisjointSet union-find
(reference: libraries/utility/utility.scala:841-884, tested at
simpleUnitTests.scala:124-188) with a distributed min-label propagation
that converges in O(graph diameter) DataFrame iterations:

    label(v) <- min(label(v), min over neighbors u of label(u))

Skew-awareness: the per-node min is an *algebraic* aggregate, so Catalyst
performs map-side partial aggregation — the distributed equivalent of
salting a hot key for MIN — and AQE skew-join splitting covers the
edges⋈labels probe on hub entities. An explicit salt stage
(`_salted_min`) is used for the message aggregation anyway so the
two-phase reduce is visible in the plan and survives engines/configs
without partial-agg guarantees. Each iteration is localCheckpoint'ed to
cut lineage (this is also the resume boundary for the pipeline runner).

Equivalence edges come from resolved redirects + same_as records; the
component representative (canonical id) is the lexicographic min topic,
matching synth.KB.canonical_map's ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_SALT = 16


def _salted_min(msgs: DataFrame) -> DataFrame:
    """Two-phase min: groupBy(node, salt) then groupBy(node) — explicit
    hub-key salting for the message reduce.

    r6: the node's OWN previous label rides along as a second salted
    min (`is_self` marks the union branch carrying it; it is present
    exactly once per node, so min(when(is_self, label)) recovers it
    verbatim). That lets the caller decide convergence from the new
    frame alone — the old per-round labels-new x labels-old equi-join
    existed only to compute `changed` and was one full shuffle per
    round (guide §2.4: remove shuffles outright)."""
    return (
        msgs.withColumn("salt", F.pmod(F.xxhash64("label"), F.lit(CC_SALT)))
        .groupBy("node", "salt")
        .agg(
            F.min("label").alias("label"),
            F.min(F.when(F.col("is_self"), F.col("label"))).alias("prev"),
        )
        .groupBy("node")
        .agg(
            F.min("label").alias("label"),
            F.min("prev").alias("prev"),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges -> (node, component) with component = min node id reachable.

    Deterministic: the labels are data-derived (min string id), so the
    result is identical at any parallelism.
    """
    bidir = (
        edges.selectExpr(f"{src} as u", f"{dst} as v")
        .union(edges.selectExpr(f"{dst} as u", f"{src} as v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .dropDuplicates()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = (
            bidir.join(labels.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"), "label", F.lit(False).alias("is_self")
            )
            .union(labels.select("node", "label", F.lit(True).alias("is_self")))
        )
        # NOTE (r6): the per-round label function is deliberately
        # UNCHANGED (min over the 1-hop neighborhood) — capped runs
        # (max_iter before convergence) must reproduce the identical
        # round-k labels. Pointer jumping was evaluated and rejected
        # for exactly that reason.
        stamped = _salted_min(msgs).localCheckpoint(eager=True)
        new_labels = stamped.select("node", "label")
        # convergence from the materialized frame alone: labels are
        # pointwise non-increasing, so "any row with label != prev"
        # is exactly the old labels-new x labels-old join's count —
        # minus that join's per-round shuffle
        changed = stamped.filter(F.col("label") != F.col("prev")).count()
        labels = new_labels
        if changed == 0:
            break
    return labels.withColumnRenamed("label", "component")


def canonical_mapping(
    resolved_redirects: DataFrame, same_as: DataFrame
) -> DataFrame:
    """(topic, canonical) from redirect + same_as equivalences.

    Redirect edges are already fixpoint-resolved (dictionary stage), so
    the CC here mostly collapses same_as clusters — but running CC over
    the union also heals any redirect/same_as interactions.
    """
    edges = resolved_redirects.selectExpr(
        "from_topic as src", "to_topic as dst"
    ).union(same_as.selectExpr("a as src", "b as dst"))
    cc = connected_components(edges)
    return cc.selectExpr("node as topic", "component as canonical")


def apply_canonical(df: DataFrame, mapping: DataFrame, col: str) -> DataFrame:
    """Rewrite an entity column through the canonical map (broadcast dim)."""
    m = mapping.withColumnRenamed("topic", "__t").withColumnRenamed(
        "canonical", "__c"
    )
    return (
        df.join(F.broadcast(m), df[col] == F.col("__t"), "left")
        .withColumn(col, F.coalesce(F.col("__c"), F.col(col)))
        .drop("__t", "__c")
    )
