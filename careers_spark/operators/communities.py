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
        # r6 (guide §2.4): the self-vote row is the ONLY is_self row
        # per node and always carries the node's old label, so the
        # picked row's was_self flag says "label unchanged" — the old
        # per-round labels-new x labels-old join existed only to count
        # `changed` and was one full shuffle per round.
        votes = (
            bidir.join(labels.withColumnRenamed("node", "v"), "v")
            .select(
                F.col("u").alias("node"), "label", "w",
                F.lit(False).alias("is_self"),
            )
            .unionByName(
                self_w.join(labels, "node").select(
                    "node", "label", "w", F.lit(True).alias("is_self")
                )
            )
            .groupBy("node", "label")
            .agg(F.sum("w").alias("votes"), F.max("is_self").alias("was_self"))
        )
        pick = Window.partitionBy("node").orderBy(
            F.desc("votes"), F.asc("label")
        )
        stamped = (
            votes.withColumn("rk", F.row_number().over(pick))
            .filter(F.col("rk") == 1)
            .select("node", "label", "was_self")
            .localCheckpoint(eager=True)
        )
        changed = stamped.filter(~F.col("was_self")).count()
        labels = stamped.select("node", "label")
        if changed == 0:
            break
    return labels.withColumnRenamed("label", "community")


def _bidir(
    edges: DataFrame, src: str, dst: str, weight: str | None, loops: bool = False
) -> DataFrame:
    """Bidirectional edge view. With loops=True a self-loop of input
    weight l survives as one (u, u, 2l) row — the union emits it in
    both 'directions' and the aggregate doubles it, which is exactly
    the Blondel degree convention (a self-loop contributes 2l to k_i
    and to m2; community.cpp stores contracted intra-community mass the
    same way). Default drops loops (the pre-round-4 behavior every SQL
    oracle mirrors)."""
    w = F.col(weight) if weight else F.lit(1.0)
    out = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("w")
    ).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"), w.alias("w"))
    )
    if not loops:
        out = out.filter(F.col("u") != F.col("v"))
    return out.groupBy("u", "v").agg(F.sum("w").alias("w"))


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    loops: bool = False,
) -> DataFrame:
    """Per-community Newman modularity contributions for a labeling —
    the objective the reference's shelled-out C++ Louvain maximizes
    (CommunityLouvain.scala:33-148 drives the Blondel et al. binary).

        Q = sum_c [ in_c / m2  -  (tot_c / m2)^2 ]

    over the bidirectional edge view (m2 == 2m): in_c = weight of
    intra-community directed pairs, tot_c = summed weighted degree.
    Returns (community, in_w, tot_w, q_contrib); sum(q_contrib) is Q.
    All algebraic aggregates — map-side combinable, one scalar collect
    for m2. loops=True includes self-loop mass (2l to in_c, k_i, m2 —
    the contracted-graph convention), making Q invariant across
    louvain() contraction levels; default drops loops (the behavior the
    community_modularity SQL oracle mirrors)."""
    bidir = _bidir(edges, src, dst, weight, loops=loops).localCheckpoint(eager=True)
    m2 = bidir.agg(F.sum("w")).collect()[0][0]
    memb = labels.select("node", "community")
    deg = bidir.groupBy(F.col("u").alias("node")).agg(F.sum("w").alias("k"))
    tot = (
        deg.join(memb, "node")
        .groupBy("community")
        .agg(F.sum("k").alias("tot_w"))
    )
    inw = (
        bidir.join(memb.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("community", "cu")
        .join(memb.withColumnRenamed("node", "v"), "v")
        .filter(F.col("cu") == F.col("community"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.sum("w").alias("in_w"))
    )
    return (
        tot.join(inw, "community", "left")
        .na.fill({"in_w": 0.0})
        .select(
            "community",
            F.round(F.col("in_w").cast("double"), 6).alias("in_w"),
            F.round(F.col("tot_w").cast("double"), 6).alias("tot_w"),
            F.round(
                F.col("in_w") / F.lit(float(m2))
                - F.pow(F.col("tot_w") / F.lit(float(m2)), 2),
                6,
            ).alias("q_contrib"),
        )
    )


def louvain_refine(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    rounds: int = 4,
    loops: bool = False,
) -> DataFrame:
    """Louvain phase-1 local moves, synchronous distributed variant —
    the modularity-ascent step of the reference's C++ Louvain
    (CommunityLouvain.scala; Blondel et al. 2008 eq. 2). Each round,
    every eligible node evaluates joining each NEIGHBOR community c:

        gain(i, c) = k_{i,c} - k_i * tot_{c \\ i} / m2

    (proportional to the standard delta-Q; m2 == 2m) and moves to the
    argmax if it strictly beats staying, ties to the smaller community
    id. Synchronous parallel moves can oscillate (two nodes swapping
    communities), so rounds alternate the APPLY direction: even rounds
    admit only moves into a smaller community id, odd rounds only into
    a larger — in-round swaps are structurally impossible (they need
    both directions), blocked moves re-qualify next round against the
    updated state, and the schedule is deterministic at any
    parallelism. Modularity is non-decreasing in practice but NOT
    guaranteed per round (parallel moves into one community interact);
    gate with modularity() when it matters. Returns (node, community).

    loops=True carries self-loop mass (the contracted graph's
    intra-community weight, louvain() phase 2): a self-loop contributes
    to k_i, tot_c, and m2 (the Blondel eq. 2 gain's tot_{c\\i} term —
    the round-3 gap vs the reference's community.cpp), but never to
    k_{i,c} (community.cpp Community::neigh_comm skips neigh==node:
    a node's internal mass moves WITH it, cancelling in the gain
    comparison)."""
    bidir = _bidir(edges, src, dst, weight, loops=loops).localCheckpoint(eager=True)
    m2 = float(bidir.agg(F.sum("w")).collect()[0][0])
    deg = bidir.groupBy(F.col("u").alias("node")).agg(F.sum("w").alias("k"))
    nonloop = bidir.filter(F.col("u") != F.col("v")) if loops else bidir
    memb = labels.select("node", "community").localCheckpoint(eager=True)

    quiet = 0
    for r in range(rounds):
        tot = (
            deg.join(memb, "node")
            .groupBy("community")
            .agg(F.sum("k").alias("tot_w"))
        )
        # k_{i,c}: node's edge weight into each neighbor community
        # (self-loops excluded — they are not edges to a community)
        kic = (
            nonloop.join(memb.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), F.col("community").alias("c"))
            .agg(F.sum("w").alias("kic"))
        )
        # candidate set: neighbor communities plus the node's own
        cand = (
            kic.unionByName(
                memb.select(
                    "node",
                    F.col("community").alias("c"),
                    F.lit(0.0).alias("kic"),
                )
            )
            .groupBy("node", "c")
            .agg(F.max("kic").alias("kic"))
        )
        own = memb.withColumnRenamed("community", "own_c")
        scored = (
            cand.join(deg, "node")
            .join(tot.withColumnRenamed("community", "c"), "c")
            .join(own, "node")
            .withColumn(
                "tot_less_i",
                F.col("tot_w")
                - F.when(F.col("c") == F.col("own_c"), F.col("k")).otherwise(0.0),
            )
            .withColumn(
                "gain",
                F.col("kic") - F.col("k") * F.col("tot_less_i") / F.lit(m2),
            )
        )
        pick = Window.partitionBy("node").orderBy(
            F.desc("gain"),
            # staying wins exact gain ties; otherwise smaller community
            F.when(F.col("c") == F.col("own_c"), 0).otherwise(1),
            F.asc("c"),
        )
        best = (
            scored.withColumn("rk", F.row_number().over(pick))
            .filter(F.col("rk") == 1)
            .select("node", F.col("c").alias("new_c"), "own_c")
        )
        # direction-alternated application: even rounds apply only moves
        # into a SMALLER community id, odd rounds only into a larger.
        # Within a round every applied move is strictly id-monotone, so
        # two nodes can never trade communities (a swap needs one
        # decreasing and one increasing move) — hash-parity splits
        # cannot guarantee that (observed: contracted super-nodes with
        # correlated hashes swapping forever). A move blocked by this
        # round's direction is eligible next round against the updated
        # state. Deterministic at any parallelism.
        dir_ok = (
            (F.col("new_c") < F.col("own_c"))
            if r % 2 == 0
            else (F.col("new_c") > F.col("own_c"))
        )
        # r6 (guide §2.4): own_c IS the previous membership, so the
        # moved flag rides the same frame — the old new x old equi-join
        # existed only to count `changed` (one shuffle per round)
        stamped = (
            best.withColumn(
                "community",
                F.when(dir_ok, F.col("new_c")).otherwise(F.col("own_c")),
            )
            .select(
                "node",
                "community",
                (F.col("community") != F.col("own_c")).alias("_moved"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stamped.filter("_moved").count()
        memb = stamped.select("node", "community")
        # a parity round touches only half the nodes: converged means
        # BOTH parities went quiet back-to-back
        quiet = quiet + 1 if changed == 0 else 0
        if quiet >= 2:
            break
    return memb


def louvain(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    levels: int = 2,
    rounds: int = 6,
) -> DataFrame:
    """The full Louvain loop (Blondel et al. 2008; the algorithm behind
    the reference's shelled-out C++ binary, CommunityLouvain.scala):
    phase 1 = local modularity-ascent moves from singleton communities
    (louvain_refine), phase 2 = CONTRACT each community to a super-node
    — inter-community weights sum through the labeling and
    intra-community mass is CARRIED as super-node self-loops (the
    community.cpp partition2graph_binary convention; dropping it, as
    rounds 2-3 did, loses the tot_{c\\i} self-loop term of the Blondel
    gain and over-merges at level 2+) — then repeat on the contracted
    graph with loop-aware refinement. Labels compose back down (LEFT
    join: a community with no inter-community edges still keeps its
    nodes), so the return is (node, community) at the final level.
    `levels` bounds the contraction depth; the loop stops early once a
    refinement pass merges nothing."""
    cur = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     (F.col(weight) if weight else F.lit(1.0)).alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        cur.select(F.col("src").alias("node"))
        .union(cur.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    mapping = nodes.withColumn("community", F.col("node")).localCheckpoint(
        eager=True
    )
    for _lvl in range(levels):
        seed = (
            cur.select(F.col("src").alias("node"))
            .union(cur.select(F.col("dst").alias("node")))
            .dropDuplicates()
            .withColumn("community", F.col("node"))
            .localCheckpoint(eager=True)
        )
        refined = louvain_refine(
            cur, seed, src="src", dst="dst", weight="w", rounds=rounds,
            loops=True,
        )
        # compose: node -> current community (== this level's node id)
        # -> refined community. LEFT join: a community absent from this
        # level's graph (possible only if it lost every edge) keeps its
        # current label instead of silently dropping its nodes.
        lvl_map = refined.select(
            F.col("node").alias("community"), F.col("community").alias("new_c")
        )
        mapping = (
            mapping.join(lvl_map, "community", "left")
            .select(
                "node",
                F.coalesce(F.col("new_c"), F.col("community")).alias("community"),
            )
            .localCheckpoint(eager=True)
        )
        n_nodes = seed.count()
        n_comms = refined.select("community").dropDuplicates().count()
        if n_comms == n_nodes:
            break  # no merges this level: contraction is a relabeling
        # contract: communities become super-nodes; inter-community
        # weights sum, intra-community mass survives as (c, c)
        # self-loop rows so level-2+ refinement sees the full degree
        rm = refined.withColumnRenamed("community", "c")
        cur = (
            cur.join(rm.withColumnRenamed("node", "src"), "src")
            .withColumnRenamed("c", "src_c")
            .join(rm.withColumnRenamed("node", "dst"), "dst")
            .withColumnRenamed("c", "dst_c")
            .groupBy(F.col("src_c").alias("src"), F.col("dst_c").alias("dst"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    return mapping


def node_groups(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Enrich the nodes table with a community group_id (the reference's
    TopicVector groupId enrichment, TopicVector.scala:86-108)."""
    comm = label_propagation(edges, src="src", dst="dst", weight="n_obs")
    return (
        nodes.join(comm.withColumnRenamed("node", "node_id"), "node_id", "left")
        .withColumn("group_id", F.coalesce(F.col("community"), F.col("node_id")))
        .drop("community")
    )


def conductance(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Per-community conductance — the cut-quality complement of
    modularity (Leskovec et al.'s NCP standard):

        phi(C) = cut(C) / min(vol(C), vol(V \\ C))

    with cut(C) the weight of edges leaving C and vol the summed
    weighted degree. Low phi = a real community (few escaping edges
    relative to its mass); modularity can be gamed by resolution
    effects, conductance cannot — reporting both is the standard
    community-quality audit.

    All masses are sums of integer-valued weights over the
    bidirectional view (exact in any order — the modularity argument);
    conductance is one rounded division, NULL when the community is
    the whole volume (denominator 0). Shapes: the same two
    membership joins + algebraic sums as `modularity`, one scalar m2.

    Output: (community, vol_w, cut_w, conductance).
    """
    bidir = _bidir(edges, src, dst, weight).localCheckpoint(eager=True)
    m2 = bidir.agg(F.sum("w")).collect()[0][0]
    memb = labels.select("node", "community")
    deg = bidir.groupBy(F.col("u").alias("node")).agg(F.sum("w").alias("k"))
    vol = (
        deg.join(memb, "node")
        .groupBy("community")
        .agg(F.sum("k").alias("vol_w"))
    )
    cut = (
        bidir.join(memb.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("community", "cu")
        .join(memb.withColumnRenamed("node", "v"), "v")
        .filter(F.col("cu") != F.col("community"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.sum("w").alias("cut_w"))
    )
    # explicit coalesce, not na.fill: a float fill value silently skips
    # integer columns, so a zero-cut community with long weights would
    # emit NULL instead of 0. F.lit(float(m2)) is a true double literal
    # (bare SQL-text 38.0 parses as DECIMAL — the distinct_sketch trap).
    cut_d = F.coalesce(F.col("cut_w").cast("double"), F.lit(0.0))
    den = F.least(F.col("vol_w"), F.lit(float(m2)) - F.col("vol_w"))
    return (
        vol.join(cut, "community", "left")
        .select(
            "community",
            F.round(F.col("vol_w").cast("double"), 6).alias("vol_w"),
            F.round(cut_d, 6).alias("cut_w"),
            F.when(den == 0, F.lit(None).cast("double"))
            .otherwise(F.round(cut_d / den, 6))
            .alias("conductance"),
        )
    )


def clustering_agreement(
    labels_a: DataFrame,
    labels_b: DataFrame,
    node: str = "node",
    label: str = "community",
) -> DataFrame:
    """Adjusted Rand Index between two labelings of the same node set
    (Hubert & Arabie '85) — the standard chance-corrected agreement
    score for comparing community methods (LPA vs Louvain here) or a
    labeling against ground truth. Pair-counting on the contingency
    table: with S = sum_ij C(n_ij,2), A = sum_i C(a_i,2), B =
    sum_j C(b_j,2), C2 = C(n,2),

        ARI = (C2*S - A*B) / (C2*(A+B)/2 - A*B)

    cross-multiplied by 2 so every term is integral: (2*C2*S - 2*A*B)
    / (C2*(A+B) - 2*A*B). Products of ~n^2 sums are carried as
    DECIMAL(38,0) (the embedding_gramian recipe — exact to ~3e9
    nodes), the final ratio ONE rounded division. Perfect agreement
    (up to label renaming) = 1; the identical-split degenerate
    denominator-0 case also reports 1 (the sklearn convention).

    Physical shape: one inner join on node, three algebraic groupBys
    to the contingency/marginal tables (cluster-count-sized), 1-row
    output. Nodes present in only one labeling are dropped by the
    join (stated).

    Output: (n, sum_ij, sum_a, sum_b, ari).
    """
    a = labels_a.select(
        F.col(node).alias("nd"), F.col(label).alias("la")
    )
    b = labels_b.select(
        F.col(node).alias("nd"), F.col(label).alias("lb")
    )
    j = a.join(b, "nd")
    cont = j.groupBy("la", "lb").agg(F.count("*").alias("c"))
    s_ij = cont.agg(
        F.sum(F.expr("c * (c - 1) div 2")).alias("sum_ij")
    )
    s_a = (
        cont.groupBy("la")
        .agg(F.sum("c").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("sum_a"))
    )
    s_b = (
        cont.groupBy("lb")
        .agg(F.sum("c").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("sum_b"))
    )
    n = j.agg(F.count("*").alias("n"))
    dec = "cast({} as decimal(38,0))"
    c2 = dec.format("n * (n - 1) div 2")
    num = f"2 * {c2} * {dec.format('sum_ij')} - 2 * {dec.format('sum_a')} * {dec.format('sum_b')}"
    den = f"{c2} * ({dec.format('sum_a')} + {dec.format('sum_b')}) - 2 * {dec.format('sum_a')} * {dec.format('sum_b')}"
    return (
        n.crossJoin(F.broadcast(s_ij))
        .crossJoin(F.broadcast(s_a))
        .crossJoin(F.broadcast(s_b))
        .select(
            "n",
            "sum_ij",
            "sum_a",
            "sum_b",
            F.when(
                F.expr(den) == 0, F.lit(1.0)
            ).otherwise(
                F.round(
                    F.expr(f"({num}) / cast(({den}) as double)"), 6
                )
            ).alias("ari"),
        )
    )
