"""Category hierarchy: closure, multi-source shortest paths, and the
covering tree over the category parent DAG.

Re-expresses disambiguator/CategoryHierarchy.scala:
  - `toTop` (reference :81-163): walk every category-parent edge
    reachable from a seed topic set, skipping a banned hub-category set
    (the reference hand-lists 29 overbroad categories at :88-118 and a
    `overbroadCategoryCount=20` in-degree guard at :17) -> here an
    iterative frontier join (`category_closure`) with an anti-join ban
    and an optional in-degree cap, both of which are exactly the
    hub-skew controls a 100 TB category graph needs;
  - `dijkstraVisit` (reference :243-293): multi-source Dijkstra. A
    driver-side priority queue does not distribute; the Spark-native
    equivalent is iterative edge relaxation to a fixpoint (Bellman-Ford
    over DataFrames) — same converged distances, hop-capped, with a
    localCheckpoint per round to keep lineage bounded
    (`shortest_path_distances`);
  - the shortest-path tree the reference materializes through
    `Node.prev` (:281-286): for every reached node, the argmin incoming
    edge (dist(child) + w, child) — emitted as flat (node, via, weight,
    dist) rows (`shortest_path_tree`).

All iterations are synchronous and deterministically tie-broken, so a
converged result is a fixpoint: running K >= diameter rounds equals the
early-stopped loop (the property the DuckDB oracle's fixed unrolling
relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prep_edges(
    edges: DataFrame,
    banned: DataFrame | None,
    max_parent_indegree: int | None,
) -> DataFrame:
    e = edges.select(
        F.col("child"), F.col("parent"), F.col("weight").cast("double")
    ).filter(F.col("child") != F.col("parent"))
    if banned is not None:
        b = banned.select(F.col(banned.columns[0]).alias("parent"))
        e = e.join(F.broadcast(b), "parent", "left_anti")
    if max_parent_indegree is not None:
        # the reference's overbroadCategoryCount guard (:17): drop hub
        # parents whose in-degree exceeds the cap — the skew control
        deg = (
            e.groupBy("parent")
            .agg(F.countDistinct("child").alias("indeg"))
            .filter(F.col("indeg") > max_parent_indegree)
            .select("parent")
        )
        e = e.join(F.broadcast(deg), "parent", "left_anti")
    return e


def category_closure(
    edges: DataFrame,
    seeds: DataFrame,
    banned: DataFrame | None = None,
    max_parent_indegree: int | None = None,
    max_hops: int = 16,
) -> DataFrame:
    """Every edge reachable upward from the seed set (reference toTop,
    CategoryHierarchy.scala:81-163). edges: (child, parent, weight);
    seeds: one column of node ids. Returns the reachable edge list."""
    e = _prep_edges(edges, banned, max_parent_indegree)
    frontier = seeds.select(F.col(seeds.columns[0]).alias("child")).dropDuplicates()
    seen = frontier
    out = None
    for _ in range(max_hops):
        step = e.join(frontier, "child")
        out = step if out is None else out.unionByName(step)
        nxt = (
            step.select(F.col("parent").alias("child"))
            .dropDuplicates()
            .join(seen, "child", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (out if out is not None else e.limit(0)).dropDuplicates(
        ["child", "parent"]
    )


def shortest_path_distances(
    edges: DataFrame,
    seeds: DataFrame,
    banned: DataFrame | None = None,
    max_parent_indegree: int | None = None,
    max_iters: int = 16,
) -> DataFrame:
    """Min path weight from ANY seed, walking child->parent edges — the
    distributable form of the reference's multi-source dijkstraVisit
    (CategoryHierarchy.scala:243-293): synchronous relaxation rounds to
    a fixpoint. Returns (node, dist)."""
    e = _prep_edges(edges, banned, max_parent_indegree)
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .dropDuplicates()
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        relaxed = (
            e.join(dist.withColumnRenamed("node", "child"), "child")
            .select(
                F.col("parent").alias("node"),
                (F.col("dist") + F.col("weight")).alias("dist"),
            )
            .unionByName(dist)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        changed = (
            relaxed.alias("n")
            .join(dist.alias("o"), "node", "left")
            .filter(
                F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist"))
            )
            .isEmpty()
        )
        converged = changed and relaxed.count() == dist.count()
        dist = relaxed
        if converged:
            break
    return dist


def shortest_path_tree(
    edges: DataFrame,
    dist: DataFrame,
    banned: DataFrame | None = None,
    max_parent_indegree: int | None = None,
) -> DataFrame:
    """The reference's Node.prev structure (CategoryHierarchy.scala:281-286):
    for every non-seed reached node, the argmin incoming edge by
    (dist(child) + weight), ties to the smallest child id. Returns
    (node, via, weight, dist)."""
    from pyspark.sql import Window

    e = _prep_edges(edges, banned, max_parent_indegree)
    cand = (
        e.join(
            dist.selectExpr("node as child", "dist as child_dist"), "child"
        )
        .join(dist.selectExpr("node as __p", "dist as node_dist"),
              F.col("parent") == F.col("__p"))
        .filter(F.col("child_dist") + F.col("weight") <= F.col("node_dist") + 1e-12)
        .select(
            F.col("parent").alias("node"),
            F.col("child").alias("via"),
            "weight",
            F.col("node_dist").alias("dist"),
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.asc("weight"), F.asc("via")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
