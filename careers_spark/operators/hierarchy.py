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

from careers_spark.operators.canonicalize import connected_components


def strongly_connected_components(
    edges: DataFrame,
    src: str = "child",
    dst: str = "parent",
    max_trim: int = 25,
    max_doublings: int = 6,
) -> DataFrame:
    """(node, scc) labels for a directed graph; scc = lexicographic min
    member id, nodes on no cycle are their own singleton component.

    Re-expresses the reference's Tarjan SCC (utility/Graph.scala:21-123,
    golden corpus testCategorisation.scala:11-55), which category
    condensation consumes before distance computation. Tarjan is a
    driver-side recursive DFS — inherently serial — so the Spark-native
    shape is:

      1. TRIM: iteratively drop nodes with no in-edge or no out-edge in
         the remaining subgraph (such nodes cannot lie on a cycle). On
         category parent-hierarchies this collapses the graph to the
         tiny cycle core, which is what makes step 2 affordable: the
         quadratic reachability work never touches the acyclic bulk.
      2. Reachability pairs on the core by path doubling
         (R <- R ∪ R∘R, log2 rounds to cover the core's diameter).
      3. Mutual pairs (a reaches b AND b reaches a) as undirected edges.
      4. connected_components over the mutual edges = the SCCs (min
         label is the same representative rule as canonicalization).
    """
    e = (
        edges.selectExpr(f"{src} as u", f"{dst} as v")
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .dropDuplicates()
    )

    n_edges = e.count()
    for _ in range(max_trim):
        if n_edges == 0:
            break
        keep = (
            e.select("u")
            .dropDuplicates()
            .join(e.select(F.col("v").alias("u")).dropDuplicates(), "u", "left_semi")
        )
        ne = (
            e.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_new = ne.count()
        e = ne
        if n_new == n_edges:
            break
        n_edges = n_new

    if n_edges == 0:
        return nodes.withColumn("scc", F.col("node"))

    # path doubling over the cycle core only
    reach = e.selectExpr("u as a", "v as b")
    n_pairs = n_edges
    converged = False
    for _ in range(max_doublings):
        stepped = (
            reach.alias("x")
            .join(reach.alias("y"), F.col("x.b") == F.col("y.a"))
            .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        )
        grown = (
            reach.unionByName(stepped).dropDuplicates().localCheckpoint(eager=True)
        )
        n_grown = grown.count()
        reach = grown
        if n_grown == n_pairs:
            converged = True
            break
        n_pairs = n_grown
    if not converged:
        # ADVICE r3: a cycle core with diameter > 2^max_doublings would
        # exit before fixpoint and silently SPLIT its SCC (diverging
        # from the reference's exact Tarjan, utility/Graph.scala:21-123).
        # Doubling means 2^12 = 4096-hop reachability per extra unit, so
        # hitting this is a config error, not a data regime — refuse.
        raise RuntimeError(
            f"strongly_connected_components: path doubling did not reach "
            f"fixpoint within max_doublings={max_doublings} (pair count "
            f"still growing: {n_pairs} -> {n_grown}); the cycle core has "
            f"diameter > 2^{max_doublings}. Raise max_doublings."
        )

    mutual = reach.join(
        reach.selectExpr("b as a", "a as b"), ["a", "b"], "left_semi"
    ).filter(F.col("a") != F.col("b"))
    cc = connected_components(mutual, src="a", dst="b")
    return nodes.join(cc, "node", "left").select(
        "node", F.coalesce("component", "node").alias("scc")
    )


def condense_cycles(
    edges: DataFrame, src: str = "child", dst: str = "parent"
) -> tuple[DataFrame, DataFrame]:
    """Collapse every SCC of (src, dst, weight) edges to its min-id
    representative (the reference's cycle condensation before distance
    computation). Returns (condensed_edges, scc_map): condensed edges
    keep the MIN weight over collapsed parallel edges (shortest-path
    semantics) and drop intra-component self-loops; scc_map is
    (node, scc) for mapping seeds/results. On a DAG this is the
    identity (modulo duplicate-edge min-weight dedup)."""
    scc = strongly_connected_components(edges, src=src, dst=dst)
    sm = F.broadcast(scc)
    out = (
        edges.join(sm.withColumnRenamed("node", src), src)
        .withColumnRenamed("scc", "__src_scc")
        .join(sm.withColumnRenamed("node", dst), dst)
        .withColumnRenamed("scc", "__dst_scc")
        .filter(F.col("__src_scc") != F.col("__dst_scc"))
        .groupBy(
            F.col("__src_scc").alias(src), F.col("__dst_scc").alias(dst)
        )
        .agg(F.min("weight").alias("weight"))
    )
    return out, scc


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
    collapse_cycles: bool = False,
) -> DataFrame:
    """Min path weight from ANY seed, walking child->parent edges — the
    distributable form of the reference's multi-source dijkstraVisit
    (CategoryHierarchy.scala:243-293): synchronous relaxation rounds to
    a fixpoint. Returns (node, dist).

    collapse_cycles=True first condenses every SCC to its min-id
    representative (the reference's Tarjan condensation,
    utility/Graph.scala:21-123) so a tight weighted cycle cannot eat
    relaxation rounds; every member of a collapsed cycle reports the
    component's distance. The in-degree guard applies to the raw edges
    (pre-condensation), matching the reference's per-category count.
    On a DAG this is the identity."""
    e = _prep_edges(edges, banned, max_parent_indegree)
    scc = None
    seed_nodes = seeds.select(F.col(seeds.columns[0]).alias("node")).dropDuplicates()
    if collapse_cycles:
        e, scc = condense_cycles(e)
        seed_nodes = (
            seed_nodes.join(F.broadcast(scc), "node", "left")
            .select(F.coalesce("scc", "node").alias("node"))
            .dropDuplicates()
        )
    dist = (
        seed_nodes
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
    if scc is not None:
        # expand component distances back to every member node; a seed
        # absent from the edge set keeps its own id (null scc match)
        dist = (
            dist.withColumnRenamed("node", "__c")
            .join(
                F.broadcast(scc.withColumnRenamed("scc", "__c")), "__c", "left"
            )
            .select(F.coalesce("node", "__c").alias("node"), "dist")
        )
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
