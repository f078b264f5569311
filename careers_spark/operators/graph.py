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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    damping: float = 0.85,
    precision: int = 10,
    weight: str | None = None,
    personalize=None,
    checkpoint_iterates: bool = False,
) -> DataFrame:
    """PageRank entity salience over the KG edge table — the standard
    "which entities matter" score for a freshly constructed graph
    (the reference ranks topics by aggregated link weight instead,
    AmbiguityForest.scala:1093-1441; PageRank is the
    graph-native generalization of that salience ordering).

    Fixed-iteration synchronous power method with dangling-mass
    redistribution:

        pr_{t+1}(v) = (1-d)/N + d * (sum_{u->v} pr_t(u)/outdeg(u)
                                     + dangling_t / N)

    Every iteration is one join + one partial-agg-friendly groupBy(dst)
    plus a single-row dangling aggregate (broadcast, not collected to a
    python scalar — the loop stays on the cluster; only the final frame
    returns). No window, no global sort. At 10^12 edges the join
    shuffles on dst — hub skew is AQE-split, and the contribution sum is
    algebraic so map-side combine absorbs most of it.

    Determinism across engines/partitionings: pr is rounded to
    `precision` decimals at every iteration boundary, so the IEEE
    addition-order noise (~1e-16 per sum) never accumulates into a
    visible digit and the unrolled-SQL oracle reproduces the values
    hash-exactly (same recipe as the Louvain oracle's integer-weight
    argument, adapted for genuinely fractional values).

    With `weight` set, edge mass is distributed proportionally to edge
    weight (contribution pr * w / outw, outw = summed outgoing weight) —
    the natural form for KG edges carrying observation counts. Integer-
    valued weights keep the per-edge ratios engine-identical; the
    per-iteration rounding covers the sums as in the unweighted case.
    The unweighted path is bit-identical to weight=None's original form
    (w == 1.0 multiplies out exactly).

    With `personalize` set to a node id, the teleport AND dangling mass
    both return to that node instead of spreading uniformly —
    personalized PageRank (Haveliwala 2002), the "salience relative to
    this anchor entity" ranking used for entity-centric
    recommendations. The global path is untouched (personalize=None
    keeps the uniform terms verbatim).

    Output: (node, pr) — pr rounded to `precision` decimals.
    """
    if weight is None:
        e = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).distinct().withColumn("w", F.lit(1.0))
    else:
        e = (
            edges.select(
                F.col(src).alias("u"),
                F.col(dst).alias("v"),
                F.col(weight).cast("double").alias("w"),
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
        )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy(F.col("u").alias("node")).agg(
        F.sum("w").alias("outdeg")
    )
    base = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce("outdeg", F.lit(0.0)).alias("outdeg")
    ).localCheckpoint(eager=True)
    n_nodes = F.lit(base.count())

    if personalize is None:
        init = (F.lit(1.0) / n_nodes).alias("pr")
        teleport = (1.0 - damping) / n_nodes

        def dang_share(dang_col):
            return dang_col / n_nodes

    else:
        is_src = F.when(F.col("node") == F.lit(personalize), 1.0).otherwise(0.0)
        init = is_src.alias("pr")
        teleport = F.lit(1.0 - damping) * is_src

        def dang_share(dang_col):
            return dang_col * is_src

    # r6: checkpoint_iterates trades per-iteration jobs against lazy
    # prefix re-execution (each dangling broadcast re-runs its prefix,
    # bounded at ~3.5x one pass for 6 iterations). A/B at sf0.1: the
    # small entity graphs prefer lazy (1.7s vs 2.2s), textrank's word
    # co-occurrence graph prefers checkpointing (7.2s -> 3.7s) — so it
    # is the CALLER's choice; values are bit-identical either way (the
    # per-iteration round() already pins every iterate).
    def _cp(df):
        return df.localCheckpoint(eager=True) if checkpoint_iterates else df

    pr = _cp(base.select("node", "outdeg", init))
    for _ in range(iterations):
        dangling = pr.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg") == 0, F.col("pr"))), F.lit(0.0)
            ).alias("dang")
        )
        contrib = (
            e.join(pr.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("outdeg")).alias("inflow"))
        )
        pr = _cp(
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "outdeg",
                F.round(
                    teleport
                    + damping
                    * (F.coalesce("inflow", F.lit(0.0)) + dang_share(F.col("dang"))),
                    precision,
                ).alias("pr"),
            )
        )
    return pr.select("node", "pr")


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    undirected simple graph of `edges`.

    Canonical-ordering enumeration: every triangle {a<b<c} is produced
    exactly once by joining its two wedge edges (a,b),(b,c) with the
    closing edge (a,c). Two equi-joins, no all-pairs step; the classic
    MapReduce formulation (Suri & Vassilvitskii, WWW'11) — at scale the
    wedge join is the expensive shuffle and is dominated by high-degree
    hubs, which AQE skew-splits; count aggregates are algebraic.

    coeff = 2*T / (deg*(deg-1)) for deg >= 2 else 0, rounded to 6.

    Output: (node, degree, triangles, coeff) — one row per node.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    e1 = und.selectExpr("a as x", "b as y")
    e2 = und.selectExpr("a as y", "b as z")
    e3 = und.selectExpr("a as x", "b as z")
    tris = e1.join(e2, "y").join(e3, ["x", "z"])  # x < y < z by construction
    per_node = (
        tris.selectExpr("x as node")
        .union(tris.selectExpr("y as node"))
        .union(tris.selectExpr("z as node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(0.0),
                6,
            ).alias("coeff"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly remove
    nodes with degree < k (in the surviving subgraph) until fixpoint.
    The k-core is the standard "dense backbone" extraction for a
    freshly built KG — nodes outside it are leaves/tendrils that
    coherence scoring and community detection both treat as noise.

    Each round is one degree aggregation (algebraic, map-side
    combinable) + one semi-join filter of the edge set; the graph only
    shrinks, so per-round cost is monotone non-increasing. Rounds are
    localCheckpoint'ed (lineage would otherwise double per round) and
    the loop early-stops on a driver-side count fixpoint — a converged
    peel is invariant under further rounds, which is what lets the SQL
    oracle unroll it to fixed depth.

    Output: (node, degree) — nodes in the k-core with their core degree.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = -1
    for _ in range(max_iter):
        deg = (
            und.select(F.col("a").alias("node"))
            .union(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )
        alive = deg.filter(F.col("degree") >= k).localCheckpoint(eager=True)
        n = alive.count()
        if n == n_prev:
            break
        n_prev = n
        und = (
            und.join(alive.select(F.col("node").alias("a")), "a", "left_semi")
            .join(alive.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    else:
        # silent under-peeling would return a superset of the k-core;
        # raise instead (same convention as hierarchy.py's SCC loop)
        raise RuntimeError(
            f"kcore did not reach a fixpoint in {max_iter} rounds"
        )
    return alive


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    precision: int = 10,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the directed edge
    set — the bipartite complement of PageRank's salience: authorities
    are entities many strong hubs point AT, hubs are entities pointing
    at many strong authorities. On a KG whose directed edges run
    subject -> object, authorities surface the heavily-referenced
    objects and hubs the prolific subjects.

    Synchronous power iteration with L1 (sum) normalization — the norm
    choice only rescales, never reorders, and avoiding sqrt keeps every
    step a join + algebraic sum + one division:

        a_{t+1}(v) = sum_{u->v} h_t(u)     / S_a
        h_{t+1}(u) = sum_{u->v} a_{t+1}(v) / S_h

    Physical shape per iteration: two edge joins, two partial-agg
    groupBys, two single-row normalizer aggregates kept as broadcast
    crossJoins (never collected — the loop stays on the cluster). Same
    scale posture as pagerank() above: shuffles on the edge endpoint,
    hub skew AQE-split, algebraic sums map-side combined.

    Engine lockstep for the unrolled-SQL oracle: both scores are rounded
    to `precision` decimals every iteration (pre-round IEEE noise
    ~1e-16 relative sits 6 orders below the rounded digit — the
    pagerank() argument verbatim; the normalizing division divides two
    near-identical doubles, leaving relative noise unchanged).

    Output: (node, hub, auth), both rounded to `precision`.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = F.lit(nodes.count())
    hub = nodes.select("node", (F.lit(1.0) / n_nodes).alias("hub"))
    auth = nodes.select("node", (F.lit(1.0) / n_nodes).alias("auth"))
    for _ in range(iterations):
        a_raw = (
            e.join(hub.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("hub").alias("raw"))
        )
        a_full = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        s_a = a_full.agg(F.sum("raw").alias("s"))
        # truncate lineage each iteration: HITS stacks 2 joins + 2 aggs
        # + 2 crossJoins per step and the final hub⋈auth join doubles
        # the chain — the un-checkpointed 6-deep plan OOMs the driver in
        # plan/codegen string building (the kcore convention).
        # r6 (guide §2.4): checkpoint auth BEFORE the hub half-step
        # consumes it — checkpointing both frames at the END made the
        # hub job recompute the whole auth subtree (its join + agg +
        # normalizer) a second time every iteration.
        auth = (
            a_full.crossJoin(F.broadcast(s_a))
            .select(
                "node",
                F.round(F.col("raw") / F.col("s"), precision).alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e.join(auth.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("auth").alias("raw"))
        )
        h_full = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        s_h = h_full.agg(F.sum("raw").alias("s"))
        hub = (
            h_full.crossJoin(F.broadcast(s_h))
            .select(
                "node",
                F.round(F.col("raw") / F.col("s"), precision).alias("hub"),
            )
            .localCheckpoint(eager=True)
        )
    return hub.join(auth, "node").select("node", "hub", "auth")


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
) -> DataFrame:
    """Common-neighbor link prediction over the undirected simple graph:
    for every NON-adjacent pair (a < b) sharing >= `min_common`
    neighbors, the three classic scores (Liben-Nowell & Kleinberg 2003)
    — common-neighbor count, neighborhood Jaccard, and Adamic-Adar
    sum_{z in N(a) ∩ N(b)} 1/ln(deg(z)). On a freshly built KG these
    rank the missing edges worth surfacing (entities that co-occur with
    the same things but were never observed together).

    Physical shape: candidate pairs come ONLY from the wedge join
    (adjacency self-joined on the shared center z, a < b) — never
    all-pairs — then existing edges are removed with a left-anti join.
    Same shuffle shape as triangle_stats; hub-center skew is AQE-split
    and every aggregate is algebraic (count / integer sum).

    Engine exactness: cn, degrees are integers; jaccard is ONE division
    of integers rounded to 6; Adamic-Adar per-center contributions are
    fixed-point quantized (round(1e9/ln(deg_z)) as BIGINT — wedge
    centers have deg >= 2 so ln > 0) and integer-summed, the
    unigram_logloss recipe, so addition order can't leak IEEE noise.

    Output: (src, dst, common, jaccard, adamic_adar) with src < dst.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und.selectExpr("a as node", "b as nbr").union(
        und.selectExpr("b as node", "a as nbr")
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("degree"))
    # per-center fixed-point Adamic-Adar contribution, shared by every
    # wedge through z; a wedge center always has deg >= 2, and deg-1
    # nodes must be dropped BEFORE the expression (ln(1) = 0 divides by
    # zero under ANSI mode even though those rows never join)
    center = deg.filter(F.col("degree") >= 2).select(
        F.col("node").alias("z"),
        F.expr(
            "cast(round(1000000000e0 / ln(cast(degree as double)), 0) as bigint)"
        ).alias("aa_fp"),
    )
    w1 = adj.selectExpr("node as z", "nbr as pa")
    w2 = adj.selectExpr("node as z2", "nbr as pb")
    wedges = w1.join(w2, (w1.z == w2.z2) & (F.col("pa") < F.col("pb"))).select(
        "pa", "pb", "z"
    )
    cand = wedges.join(
        und.selectExpr("a as pa", "b as pb"), ["pa", "pb"], "left_anti"
    )
    scored = (
        cand.join(center, "z")
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("common"), F.sum("aa_fp").alias("aa_sum"))
        .filter(F.col("common") >= min_common)
    )
    da = deg.selectExpr("node as pa", "degree as deg_a")
    db = deg.selectExpr("node as pb", "degree as deg_b")
    return (
        scored.join(da, "pa")
        .join(db, "pb")
        .select(
            F.col("pa").alias("src"),
            F.col("pb").alias("dst"),
            F.col("common"),
            F.expr(
                "round(cast(common as double) / (deg_a + deg_b - common), 6)"
            ).alias("jaccard"),
            F.expr("round(aa_sum / 1000000000e0, 6)").alias("adamic_adar"),
        )
    )


def sssp(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Single-source shortest paths by synchronous Bellman-Ford over the
    undirected (bidirectional) edge set — "how far is every entity from
    this hub" distances, the remaining primitive of the graph-analytics
    family (CC, LPA, Louvain, modularity, PageRank, HITS, triangles,
    k-core all ship already).

    ``weight`` is an integer SQL expression over the edge columns
    (None -> 1 per edge, i.e. BFS hop count). Integer path lengths sum
    exactly in any order, so the result is engine- and
    partitioning-independent, and the loop is a SYNCHRONOUS fixpoint
    iteration: round t+1's frontier relaxation

        dist'(v) = min(dist(v), min_{(u,v) in E} dist(u) + w(u,v))

    is joins + an algebraic min — once a round changes nothing, every
    further round is a verbatim no-op, which is what lets the DuckDB
    oracle unroll the loop to a fixed depth >= the convergence round
    (the Louvain/LPA oracle recipe).

    Per round: one equi-join of the current distances against the edge
    list (shuffle on node id; hub skew AQE-split) + one
    partial-agg-friendly min. Rounds are localCheckpoint'ed (lineage
    doubles per round otherwise) and the loop early-stops on a
    (node-count, total-distance) fixpoint — the node set only grows and
    each distance only shrinks, so that pair is invariant iff the round
    changed nothing. Raises on budget exhaustion instead of returning
    half-relaxed distances (kcore/hierarchy convention). Bellman-Ford
    needs at most |V|-1 rounds, so max_iter bounds the reachable
    diameter this operator accepts.

    Unreachable nodes are absent from the output (infinite distance).

    Output: (node, dist) — BIGINT exact shortest distance.
    """
    w = F.expr(weight) if weight else F.lit(1)
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w.cast("long").alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v"), w.cast("long").alias("w")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], ["node", "dist"]).select(
        F.col("node").cast(bidir.schema["u"].dataType), F.col("dist").cast("long")
    )
    prev = (-1, -1)
    for _ in range(max_iter):
        cand = dist.join(bidir, dist.node == bidir.u).select(
            F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.union(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        row = dist.agg(
            F.count("*").alias("n"), F.sum("dist").alias("t")
        ).collect()[0]
        cur = (row.n, row.t)
        if cur == prev:
            return dist
        prev = cur
    raise RuntimeError(f"sssp did not reach a fixpoint in {max_iter} rounds")


def negative_samples(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    m: int = 2,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic filtered negative sampling for KG-embedding
    training (the tail-corruption scheme of TransE, Bordes et al.
    2013): for every positive edge, propose ``m`` corrupted tails drawn
    by an md5 hash of (src, dst, j, salt) over the entity dimension,
    then drop proposals that hit the edge's own endpoints or collide
    with an EXISTING edge in either orientation (filtered sampling —
    output has at most m rows per edge).

    Determinism: the draw is the shared md5-affine family
    (`dedup._hash64_expr`), so negatives are reproducible across runs,
    engines, and parallelism, and re-seedable by salt.

    Physical shape at scale: the entity index is a row_number over the
    ENTITY dimension (bounded, far smaller than the edge set — the
    vec-id-assignment precedent); proposals are an equi-join of the
    m-exploded edges against that dim on the hashed index; the
    existing-edge filter is one anti-join on the canonical (lo, hi)
    pair. No inequality joins, no per-row Python.

    Output: (src, dst, j, neg_dst).
    """
    from pyspark.sql import Window

    from careers_spark.operators.dedup import _hash64_expr

    nodes = (
        edges.select(F.col(src).alias("e"))
        .union(edges.select(F.col(dst).alias("e")))
        .distinct()
    )
    dim = nodes.withColumn(
        "idx", F.row_number().over(Window.orderBy("e")) - 1
    )
    n = dim.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], f"{src} string, {dst} string, j int, neg_dst string"
        )
    keyed = (
        f"concat(cast({src} as string), '|', cast({dst} as string), "
        f"'|', cast(j as string), '|', '{salt}')"
    )
    cand = (
        edges.select(src, dst)
        .withColumn("j", F.explode(F.expr(f"sequence(0, {int(m) - 1})")))
        .withColumn("j", F.col("j").cast("int"))
        .withColumn("idx", F.expr(f"{_hash64_expr(keyed)} % {n}"))
        .join(F.broadcast(dim.withColumnRenamed("e", "neg_dst")), "idx")
        .drop("idx")
        .filter(
            (F.col("neg_dst") != F.col(src)) & (F.col("neg_dst") != F.col(dst))
        )
    )
    existing = edges.select(
        F.least(src, dst).alias("_lo"), F.greatest(src, dst).alias("_hi")
    )
    return (
        cand.withColumn("_lo", F.least(src, "neg_dst"))
        .withColumn("_hi", F.greatest(src, "neg_dst"))
        .join(existing, ["_lo", "_hi"], "left_anti")
        .select(src, dst, "j", "neg_dst")
    )


def assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the undirected
    graph — one number answering "do hubs link to hubs?", the standard
    summary beside degree distribution and clustering coefficient.

    With per-edge endpoint degrees (j, k) and M edges, the integer
    sums S1 = sum(j*k), S2 = sum(j+k), S3 = sum(j^2+k^2) give

        r = (4*M*S1 - S2^2) / (2*M*S3 - S2^2)

    Every S-term is an exact BIGINT (the trend_slopes recipe); the
    final combination is evaluated in DOUBLE with the identical
    expression text in both engines (S2^2 in BIGINT could overflow at
    billion-edge scale — the double combination is deterministic and
    engine-identical on the exact inputs), rounded to 9. A degenerate
    graph (all degrees equal: denominator 0) reports NULL.

    Physical shape: one degree groupBy over the bidirectional edge
    list, two broadcast-sized joins onto the edges, one global
    aggregate row. Output: (n_edges, s_jk, s_j_plus_k, s_sq,
    assortativity).
    """
    deg = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        edges.select(src, dst)
        .join(
            deg.select(F.col("node").alias(src), F.col("deg").alias("dj")),
            src,
        )
        .join(
            deg.select(F.col("node").alias(dst), F.col("deg").alias("dk")),
            dst,
        )
    )
    sums = e.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.expr("dj * dk")).alias("s_jk"),
        F.sum(F.expr("dj + dk")).alias("s_j_plus_k"),
        F.sum(F.expr("dj * dj + dk * dk")).alias("s_sq"),
    )
    num = (
        "4e0 * cast(n_edges as double) * cast(s_jk as double)"
        " - cast(s_j_plus_k as double) * cast(s_j_plus_k as double)"
    )
    den = (
        "2e0 * cast(n_edges as double) * cast(s_sq as double)"
        " - cast(s_j_plus_k as double) * cast(s_j_plus_k as double)"
    )
    return sums.select(
        "n_edges",
        "s_jk",
        "s_j_plus_k",
        "s_sq",
        F.expr(
            f"case when ({den}) = 0e0 then null "
            f"else round(({num}) / ({den}), 9) end"
        ).alias("assortativity"),
    )


def _all_pairs_dist(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    caller: str,
) -> DataFrame:
    """Shared multi-source BFS distance table (s, n, d) — the growing
    first-discovery frontier loop used by closeness_centrality and
    eccentricity; see closeness_centrality's docstring for the
    fixpoint / cost argument. Raises on budget exhaustion."""
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = bidir.select(F.col("u").alias("node")).distinct()
    dist = nodes.select(
        F.col("node").alias("s"),
        F.col("node").alias("n"),
        F.lit(0).cast("long").alias("d"),
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(bidir, frontier.n == bidir.u)
            .select("s", F.col("v").alias("n"), (F.col("d") + 1).alias("d"))
            .groupBy("s", "n")
            .agg(F.min("d").alias("d"))
        )
        new = cand.join(dist.select("s", "n"), ["s", "n"], "left_anti")
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            break
        dist = dist.union(new).localCheckpoint(eager=True)
        frontier = new
    else:
        raise RuntimeError(
            f"{caller}: no fixpoint within max_iter={max_iter} "
            "rounds (graph diameter exceeds the budget); refusing to "
            "return truncated distances"
        )
    return dist


def closeness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Closeness + harmonic centrality by multi-source BFS — the
    distance-based member of the centrality family (degree, PageRank,
    HITS, PPR, assortativity ship already): which entities sit at the
    center of the graph, not merely at high degree.

    The frontier iteration carries (source, node, hops) triples; a node
    pair enters the table at its FIRST discovery round, which in
    unweighted BFS is its exact shortest distance, so the table only
    ever GROWS — a row-count fixpoint is a convergence proof, and the
    DuckDB oracle's fixed-depth min-union unroll is equivalent (extra
    rounds are verbatim no-ops). Raises on budget exhaustion rather
    than returning truncated distances (kcore/hierarchy convention).

    Everything is integer until two final single divisions: harmonic
    contributions are fixed-point BIGINTs (1e9 div d — exact integer
    division, order-free summation; the RAKE/bigram_lm recipe), and
    closeness = (n_reach - 1) / sum_d is one rounded double per node.

    State is O(sum of reachable pairs) — quadratic on one giant
    component. That is the honest cost of exact all-sources distances
    (Brandes-style sampling is the approximation path); the intended
    input is a THRESHOLDED entity graph (min_obs floor), whose node
    count is vocabulary-bounded, orders below the corpus row count.

    Output: (node, n_reach, sum_d, harmonic, closeness); n_reach
    counts the node itself, isolated-in-graph nodes report NULL
    closeness (sum_d = 0).
    """
    dist = _all_pairs_dist(edges, src, dst, max_iter, "closeness_centrality")
    per = dist.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("n_reach"),
        F.sum("d").alias("sum_d"),
        F.sum(F.expr("case when d > 0 then 1000000000 div d else 0 end")).alias(
            "_hfp"
        ),
    )
    return per.select(
        "node",
        "n_reach",
        "sum_d",
        F.expr("round(cast(_hfp as double) / 1000000000e0, 6)").alias(
            "harmonic"
        ),
        F.expr(
            "case when sum_d = 0 then null else "
            "round(cast(n_reach - 1 as double) / cast(sum_d as double), 9) end"
        ).alias("closeness"),
    )


def eccentricity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Per-node eccentricity over the same exact multi-source BFS as
    closeness_centrality (shared _all_pairs_dist loop): the distance
    to a node's FARTHEST reachable peer — max over the first-discovery
    table, so it is a pure integer aggregate with the identical
    fixpoint/budget guarantees. min(ecc) over the output is the graph
    radius, max(ecc) its diameter; nodes at ecc == radius form the
    center, ecc == diameter the periphery. On disconnected graphs the
    n_reach column distinguishes components, so per-component radii
    remain readable.

    Output: (node, n_reach, eccentricity) — integer hops; an isolated
    node (n_reach = 1) has eccentricity 0.
    """
    dist = _all_pairs_dist(edges, src, dst, max_iter, "eccentricity")
    return dist.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("n_reach"),
        F.max("d").alias("eccentricity"),
    )


def deepwalk_corpus(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_walks: int = 2,
    walk_len: int = 6,
    salt: str = "walk",
) -> DataFrame:
    """DeepWalk random-walk corpus generation (Perozzi et al. 2014;
    node2vec at p=q=1) — the sentence-corpus prep step of every
    skip-gram graph-embedding pipeline: fixed-length uniform random
    walks from every node, emitted as flat (start, j, step, node) rows
    ready to window into skip-gram pairs.

    The walk is DERANDOMIZED the way every sampler in this repo is
    (negative_samples, stratified_hash_sample): step t of walk (start,
    j) picks neighbor index  md5(start|j|t|salt) mod deg(cur)  over a
    per-node neighbor ordering pinned by a row_number window
    (partition by node, order by neighbor) — reproducible across runs,
    engines, and parallelism, re-seedable by salt, and oracle-able as
    a fixed unroll. The step index in the key means revisiting a node
    later in the same walk draws a fresh index, as a real sampler
    would.

    Physical shape: the adjacency index is built once (one partitioned
    window over the edge list — per-node partitions, never global);
    each step is two equi-joins (degree lookup + indexed-neighbor
    lookup) over a state table of n_nodes x n_walks rows, constant in
    walk length. No inequality joins, no Python, no driver loop state
    beyond the fixed step count.

    Output: (start, j, step, node) — step 0 is the start node itself;
    isolated nodes (absent from the edge list) produce no walks.
    """
    from pyspark.sql import Window

    from careers_spark.operators.dedup import _hash64_expr

    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    adj = bidir.withColumn(
        "nbr_idx",
        F.row_number().over(Window.partitionBy("u").orderBy("v")) - 1,
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))
    state = (
        deg.select(F.col("u").alias("start"))
        .withColumn("j", F.explode(F.expr(f"sequence(0, {int(n_walks) - 1})")))
        .withColumn("j", F.col("j").cast("int"))
        .withColumn("cur", F.col("start"))
    )
    steps = [
        state.select(
            "start", "j", F.lit(0).alias("step"), F.col("cur").alias("node")
        )
    ]
    for t in range(1, int(walk_len) + 1):
        keyed = (
            "concat(cast(start as string), '|', cast(j as string), '|', "
            f"'{t}', '|', '{salt}')"
        )
        state = (
            state.join(deg, state.cur == deg.u)
            .withColumn("pick", F.expr(f"{_hash64_expr(keyed)} % deg"))
            .join(
                adj.select(
                    F.col("u").alias("_au"),
                    F.col("v").alias("_av"),
                    "nbr_idx",
                ),
                (F.col("cur") == F.col("_au"))
                & (F.col("pick") == F.col("nbr_idx")),
            )
            .select("start", "j", F.col("_av").alias("cur"))
        )
        steps.append(
            state.select(
                "start",
                "j",
                F.lit(t).alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.union(s)
    return out


def skipgram_pairs(
    walks: DataFrame, window: int = 2
) -> DataFrame:
    """Skip-gram (center, context) pair counts from a walk corpus —
    the step that turns `deepwalk_corpus` output into word2vec/SGNS
    training data (DeepWalk sec. 4.2; identical to text skip-grams
    with walks as sentences).

    The +-window co-occurrence is NOT an inequality join: each walk
    row explodes its non-zero offsets in [-window, window] and the
    context is fetched by an EQUI-join on (start, j, step + offset) —
    walk-boundary offsets simply find no partner (inner join), which
    is exactly the truncated-window semantics word2vec uses at
    sentence edges. One join + one count groupBy; everything integer.

    Input: (start, j, step, node) as produced by deepwalk_corpus.
    Output: (center, context, n_pairs) — directed (the pair (a, b)
    from a's perspective and (b, a) from b's are separate rows, as in
    word2vec); n_pairs sums over all walks and offsets.
    """
    offs = [o for o in range(-int(window), int(window) + 1) if o != 0]
    left = walks.select(
        "start",
        "j",
        "step",
        F.col("node").alias("center"),
        F.explode(F.array(*[F.lit(o) for o in offs])).alias("off"),
    ).withColumn("t_step", F.col("step") + F.col("off"))
    right = walks.select(
        "start", "j", F.col("step").alias("t_step"), F.col("node").alias("context")
    )
    return (
        left.join(right, ["start", "j", "t_step"])
        .groupBy("center", "context")
        .agg(F.count("*").alias("n_pairs"))
    )


def betweenness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 10,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Betweenness centrality by a distributed Brandes (2001) — the
    broker/bottleneck score completing the centrality family: which
    entities the shortest paths flow THROUGH (PageRank/closeness say
    who is important/central; betweenness says who is irreplaceable).

    Forward pass: the multi-source BFS of `closeness_centrality`
    extended with shortest-path COUNTS — sigma(s, v) is the integer
    sum of predecessor sigmas at discovery level, exact in any order.

    Backward pass: Brandes' dependency accumulation
    delta(v) += sigma_v / sigma_w * (1 + delta(w)) runs level-by-level
    inward, in FIXED-POINT: delta is a BIGINT scaled by ``scale`` and
    each contribution is  sigma_v * (scale + delta_fp(w)) div sigma_w
    — integer division, so every sum is order-free and both engines
    truncate identically; the result matches float Brandes to ~1/scale
    per level (goldens pin exact small-graph values, the lockstep test
    pins the fixed-point arithmetic itself). A level is one equi-join
    between adjacent BFS levels + one algebraic sum — never a global
    sort.

    Overflow guard: a contribution is bounded by
    max_sigma * scale * (1 + max_delta/scale) <= max_sigma * scale *
    n_nodes; the operator RAISES if max_sigma * n_nodes could overflow
    int64 against ``scale`` rather than wrapping silently.

    Like closeness, state is O(reachable pairs) — intended for
    thresholded, vocabulary-bounded entity graphs; sampling sources is
    the documented approximation path at larger node counts.

    Output: (node, bc_fp, betweenness) — bc_fp the exact BIGINT
    fixed-point sum over sources, betweenness = bc_fp / (2 * scale)
    rounded to 6 (undirected halving).
    """
    from pyspark.sql import Window as _W  # noqa: F401  (parity with siblings)

    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = bidir.select(F.col("u").alias("node")).distinct()
    dist = nodes.select(
        F.col("node").alias("s"),
        F.col("node").alias("n"),
        F.lit(0).cast("long").alias("d"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = dist
    max_lev = 0
    for t in range(1, max_depth + 1):
        cand = (
            frontier.join(bidir, frontier.n == bidir.u)
            .select("s", F.col("v").alias("n"), "sigma")
        )
        nxt = (
            cand.join(dist.select("s", "n"), ["s", "n"], "left_anti")
            .groupBy("s", "n")
            .agg(F.sum("sigma").alias("sigma"))
            .select("s", "n", F.lit(t).cast("long").alias("d"), "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
        max_lev = t
    else:
        raise RuntimeError(
            f"betweenness_centrality: BFS did not converge within "
            f"max_depth={max_depth}; refusing truncated dependencies"
        )
    stats = dist.agg(
        F.max("sigma").alias("ms"), F.countDistinct("n").alias("nn")
    ).collect()[0]
    if stats.ms * stats.nn > (2**62) // scale:
        raise RuntimeError(
            "betweenness_centrality: sigma * n_nodes would overflow the "
            f"fixed-point range at scale={scale}; reduce scale or sample "
            "sources"
        )
    # backward: delta finalized level-by-level inward; levels join only
    # with the level above, so each (s, n) delta is written exactly once
    delta = (
        dist.filter(F.col("d") == max_lev)
        .select("s", "n", "d", "sigma", F.lit(0).cast("long").alias("dfp"))
        .localCheckpoint(eager=True)
    )
    for lev in range(max_lev, 0, -1):
        upper = delta.filter(F.col("d") == lev).select(
            F.col("s").alias("_s"),
            F.col("n").alias("_w"),
            F.col("sigma").alias("_sw"),
            F.col("dfp").alias("_dw"),
        )
        prev = dist.filter(F.col("d") == lev - 1)
        contrib = (
            prev.join(bidir, prev.n == bidir.u)
            .join(
                upper,
                (F.col("s") == F.col("_s")) & (F.col("v") == F.col("_w")),
            )
            .select(
                "s",
                "n",
                F.expr(f"sigma * ({scale} + _dw) div _sw").alias("c"),
            )
            .groupBy("s", "n")
            .agg(F.sum("c").alias("dfp"))
        )
        newrows = (
            prev.join(contrib, ["s", "n"], "left")
            .select(
                "s", "n", "d", "sigma",
                F.coalesce("dfp", F.lit(0)).cast("long").alias("dfp"),
            )
        )
        delta = delta.union(newrows).localCheckpoint(eager=True)
    per = (
        delta.filter(F.col("s") != F.col("n"))
        .groupBy(F.col("n").alias("node"))
        .agg(F.sum("dfp").alias("bc_fp"))
    )
    return nodes.join(per, "node", "left").select(
        "node",
        F.coalesce("bc_fp", F.lit(0)).cast("long").alias("bc_fp"),
        F.expr(
            f"round(cast(coalesce(bc_fp, 0) as double) / (2e0 * {scale}e0), 6)"
        ).alias("betweenness"),
    )


def ktruss(
    edges: DataFrame,
    k: int = 4,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """k-truss decomposition — the edge-level analogue of k-core
    (Cohen 2008): the maximal subgraph in which every EDGE closes at
    least k-2 triangles. Stricter than k-core (every k-truss edge sits
    in a (k-1)-core) and the standard cohesive-community backbone for
    KG cleanup: an edge that never triangulates is un-corroborated.

    Peeling loop: per-edge support = common-neighbor count (two
    equi-joins against the bidirectional adjacency — the
    triangle_stats shuffle shape, AQE-split on hubs), drop edges with
    support < k-2, repeat. Support only shrinks as edges leave, so an
    unchanged edge COUNT is a fixpoint proof (removal-only
    monotonicity — the kcore argument), and the DuckDB oracle's
    fixed-depth unroll is equivalent: rounds past convergence
    recompute identical supports and delete nothing. RAISES on budget
    exhaustion rather than returning an under-peeled superset.

    Output: (src, dst, support) — the surviving canonical a<b edges
    with their final support (>= k-2); empty when no k-truss exists.
    """
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_n = -1
    for _ in range(max_iter):
        n = cur.count()
        if n == prev_n:
            break
        prev_n = n
        bidir = cur.selectExpr("a as u", "b as v").union(
            cur.selectExpr("b as u", "a as v")
        )
        sup = (
            cur.join(bidir.selectExpr("u as a", "v as c"), "a")
            .join(bidir.selectExpr("u as b", "v as c"), ["b", "c"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("support"))
        )
        cur = (
            cur.join(sup, ["a", "b"], "left")
            .select(
                "a", "b", F.coalesce("support", F.lit(0)).alias("support")
            )
            .filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"ktruss: peeling did not reach a fixpoint within "
            f"max_iter={max_iter} rounds"
        )
    bidir = cur.selectExpr("a as u", "b as v").union(
        cur.selectExpr("b as u", "a as v")
    )
    final = (
        cur.join(bidir.selectExpr("u as a", "v as c"), "a")
        .join(bidir.selectExpr("u as b", "v as c"), ["b", "c"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
    )
    return cur.join(final, ["a", "b"], "left").select(
        F.col("a").alias(src),
        F.col("b").alias(dst),
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )


# ---------------------------------------------------------------------------
def simrank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    c: float = 0.8,
    precision: int = 10,
) -> DataFrame:
    """SimRank structural similarity (Jeh & Widom, KDD'02) over the
    undirected entity graph — "two entities are similar when their
    neighborhoods are similar", the recursive complement of the local
    link-prediction scores (common-neighbors / Jaccard / Adamic-Adar in
    link_prediction), which only see ONE hop.

        s(a,a) = 1
        s(a,b) = c / (|N(a)||N(b)|) * sum_{i in N(a), j in N(b)} s(i,j)

    Synchronous fixed-iteration evaluation. Engine lockstep follows the
    pagerank recipe: every s is rounded to `precision` dp per
    iteration, the per-pair sum aggregates rounded doubles (pre-round
    IEEE addition-order noise ~1e-16, six orders below the rounded
    digit), |N(a)||N(b)| is an exact integer product, and c rides a
    double literal — so the oracle's unconditional unroll reproduces
    the values exactly. A fixed iteration count needs no early-stop
    soundness argument at all.

    State is O(n^2) candidate pairs with a sum over deg(a)*deg(b)
    neighbor combinations per pair per iteration — the honest exact
    cost of SimRank (like closeness_centrality's all-pairs BFS),
    intended for thresholded vocabulary-bounded entity graphs; the
    literature's scale paths (random-surfer Monte Carlo, low-rank
    factorization) are approximations and deliberately not what this
    exact operator is.

    Physical shape per iteration: one (pairs x neighbors x neighbors)
    equi-join chain, one partial-agg groupBy(a, b) sum, one broadcast-
    friendly join back onto the static pair/degree table; the static
    quad table and per-round result are localCheckpointed (the hits
    convention) so the plan never deepens with iterations.

    Output: (src, dst, simrank) for src < dst pairs with simrank > 0
    after the final iteration.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nbr = (
        e.selectExpr("s as node", "d as nbr")
        .union(e.selectExpr("d as node", "s as nbr"))
        .distinct()
    )
    deg = nbr.groupBy("node").agg(F.count("*").alias("deg"))
    a = deg.selectExpr("node as a", "deg as deg_a")
    b = deg.selectExpr("node as b", "deg as deg_b")
    pairs = a.join(b, F.col("a") < F.col("b")).localCheckpoint()
    quad = (
        pairs.select("a", "b")
        .join(nbr.selectExpr("node as a", "nbr as i"), "a")
        .join(nbr.selectExpr("node as b", "nbr as j"), "b")
        .select(
            "a",
            "b",
            F.least("i", "j").alias("lo"),
            F.greatest("i", "j").alias("hi"),
        )
        .localCheckpoint()
    )
    # empty seed with key columns typed like the nodes (s0 has no
    # non-identity mass; the identity diagonal is the CASE in contrib)
    sim = quad.select("lo", "hi").limit(0).withColumn("s", F.lit(0.0))
    for _ in range(int(iterations)):
        contrib = (
            quad.join(sim, ["lo", "hi"], "left")
            .withColumn(
                "v",
                F.when(F.col("lo") == F.col("hi"), F.lit(1.0)).otherwise(
                    F.coalesce(F.col("s"), F.lit(0.0))
                ),
            )
            .groupBy("a", "b")
            .agg(F.sum("v").alias("sv"))
        )
        sim = (
            pairs.join(contrib, ["a", "b"], "left")
            .select(
                F.col("a").alias("lo"),
                F.col("b").alias("hi"),
                F.round(
                    F.lit(float(c))
                    * F.coalesce(F.col("sv"), F.lit(0.0))
                    / (F.col("deg_a") * F.col("deg_b")),
                    int(precision),
                ).alias("s"),
            )
            .filter(F.col("s") > 0)
            .localCheckpoint()
        )
    return sim.select(
        F.col("lo").alias(src), F.col("hi").alias(dst), F.col("s").alias("simrank")
    )


def boruvka_msf(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    maximize: bool = False,
    max_rounds: int = 6,
) -> DataFrame:
    """Minimum (or maximum) spanning forest by Boruvka's algorithm —
    THE parallel MST: every component picks its lightest incident
    crossing edge simultaneously, selected edges contract components,
    components at least halve per round, so `max_rounds` = 6 covers
    2^6 = 64-fold contraction and the loop usually exits earlier via
    the no-crossing-edges fixpoint (Kruskal/Prim are inherently
    sequential — a sorted scan / a frontier heap — which is why every
    distributed MST is Boruvka-shaped). On a KG the MAX variant is
    the strongest-tie backbone: the single-linkage skeleton that
    keeps every entity connected through its most-corroborated edges.

    Determinism: edges carry INTEGER weights and the per-component
    argmin is min(struct(w, a, b)) under the total order (w, src,
    dst) — equivalent to distinct weights, under which the spanning
    forest is UNIQUE, so Spark, the unrolled oracle, and a Kruskal
    recompute all produce the identical edge set. `maximize=True`
    negates weights internally and reports the originals.

    Shapes: per round, one labels join per endpoint + one algebraic
    min(struct) groupBy on the component key; contraction reuses
    connected_components (salted min-label) on the SELECTED edge set
    only — a pseudo-forest at most one edge per component, at least
    halving per round. Raises on round exhaustion with crossing edges
    left (the hierarchy.py budget convention) rather than returning a
    partial forest.

    Output: (a, b, w, round) — canonical a < b MSF edges and the
    1-based round that added them.
    """
    from careers_spark.operators.canonicalize import connected_components

    canon = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
        F.col(w).cast("long").alias("wgt"),
    ).dropDuplicates(["a", "b"])
    key = (-F.col("wgt")).alias("k") if maximize else F.col("wgt").alias("k")
    canon = canon.select("a", "b", "wgt", key).localCheckpoint(eager=True)

    labels = (
        canon.selectExpr("a as node")
        .union(canon.selectExpr("b as node"))
        .dropDuplicates()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # empty accumulator derived from canon so node-id types are
    # whatever the caller's graph uses (strings here, longs elsewhere)
    msf = canon.select(
        "a", "b", "wgt", F.lit(0).alias("round")
    ).filter("1 = 0")

    for rnd in range(1, int(max_rounds) + 1):
        la = labels.selectExpr("node as a", "label as la")
        lb = labels.selectExpr("node as b", "label as lb")
        crossing = (
            canon.join(la, "a").join(lb, "b")
            .filter(F.col("la") != F.col("lb"))
            .localCheckpoint(eager=True)
        )
        if crossing.limit(1).count() == 0:
            return msf

        s = F.struct(
            F.col("k"), F.col("a"), F.col("b"),
            F.col("wgt"), F.col("la"), F.col("lb"),
        )
        sel = (
            crossing.select(F.col("la").alias("comp"), s.alias("s"))
            .union(crossing.select(F.col("lb").alias("comp"), s.alias("s")))
            .groupBy("comp")
            .agg(F.min("s").alias("s"))
            .select("s.a", "s.b", "s.wgt", "s.la", "s.lb")
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        msf = msf.unionByName(
            sel.select(
                "a", "b", "wgt", F.lit(rnd).alias("round")
            )
        ).localCheckpoint(eager=True)

        comp_cc = connected_components(
            sel.selectExpr("la as src", "lb as dst")
        )
        labels = (
            labels.join(
                comp_cc.selectExpr("node as label", "component"),
                "label",
                "left",
            )
            .select(
                "node",
                F.coalesce(F.col("component"), F.col("label")).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )

    if (
        canon.join(labels.selectExpr("node as a", "label as la"), "a")
        .join(labels.selectExpr("node as b", "label as lb"), "b")
        .filter(F.col("la") != F.col("lb"))
        .limit(1)
        .count()
        > 0
    ):
        raise RuntimeError(
            f"boruvka_msf: {max_rounds} rounds exhausted with crossing "
            "edges remaining (raise max_rounds)"
        )
    return msf


def link_prediction_holdout_auc(
    edges: DataFrame,
    holdout_mod: int = 5,
    salt: str = "lp0",
    score: str = "adamic_adar",
    min_common: int = 1,
) -> DataFrame:
    """Leakage-aware link-prediction evaluation: hold out a
    deterministic md5 slice of the edges, score NON-train-adjacent
    candidate pairs on the TRAIN graph only (link_prediction), label
    candidates by held-out membership, and report the exact
    Mann-Whitney AUC — the standard "does topology predict missing
    edges" benchmark, with the classic leakage bug (scoring on a
    graph that contains the test edges) made impossible by
    construction: test edges never reach the scorer.

    The split is the dataset_split rule applied to EDGES (membership
    a pure function of the canonical pair identity), candidates come
    from the train wedge join, negatives are the non-edge candidate
    pairs. Every piece reuses an existing exact operator, so the AUC
    is one rounded division over exact integers (auc_score).

    Output: one row (n_train_edges, n_test_edges, npos, nneg, auc) —
    npos <= n_test_edges because a held-out edge whose endpoints
    share no train neighbor never becomes a candidate (that recall
    loss is part of what the number measures).
    """
    canon = edges.select(
        F.least(F.col("src"), F.col("dst")).alias("a"),
        F.greatest(F.col("src"), F.col("dst")).alias("b"),
    ).dropDuplicates()
    bucket = F.expr(
        "cast(conv(substr(md5(concat(a, '|', b, '|', '"
        + salt
        + "')), 1, 8), 16, 10) as bigint) % "
        + str(int(holdout_mod))
    )
    tagged = canon.withColumn("_test", bucket == 0).localCheckpoint(
        eager=True
    )
    train = tagged.filter(~F.col("_test")).selectExpr(
        "a as src", "b as dst"
    )
    test = tagged.filter(F.col("_test")).select("a", "b")
    n_train = train.count()
    n_test = test.count()

    from careers_spark.operators.evaluation import auc_score

    cand = link_prediction(train, min_common=int(min_common)).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), score
    )
    labeled = cand.join(
        test.withColumn("label", F.lit(1)), ["a", "b"], "left"
    ).select(score, F.coalesce("label", F.lit(0)).alias("label"))
    return auc_score(labeled, score=score).select(
        F.lit(n_train).cast("long").alias("n_train_edges"),
        F.lit(n_test).cast("long").alias("n_test_edges"),
        "npos",
        "nneg",
        "auc",
    )


def ic_influence_spread(
    edges: DataFrame,
    seeds: DataFrame,
    p_mille: int = 300,
    n_samples: int = 8,
    rounds: int = 4,
    salt: str = "ic0",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Independent-cascade influence spread (Kempe-Kleinberg-Tardos
    KDD'03) by the live-edge formulation, derandomized the repo way:
    each directed edge flips ONE md5 coin per sample (live iff
    md5(u|v|sample|salt) % 1000 < p_mille), and a node is activated at
    hop t if it is reachable from a seed in t live hops — so the whole
    cascade is a deterministic multi-source BFS over the sampled
    subgraph, reproducible across engines/parallelism and re-seedable
    by salt. `n_samples` cascades run in ONE frame (sample is just a
    key column — the Poisson-bootstrap vectorization); the standard
    spread estimate is the mean active count across samples, which the
    caller takes downstream (per-sample per-node rows keep the output
    machine-checkable).

    The undirected co-occurrence graph is symmetrized first; each
    DIRECTION draws its own coin (directed-IC semantics on the
    symmetrized graph — stated, not hidden).

    Exactly `rounds` synchronous frontier expansions run — no early
    stop — so the result is the R-HOP influence set and a fixed-depth
    oracle unroll equals it by construction (no fixpoint argument
    needed). Per round: one equi-join of the hop-(t-1) frontier
    against live edges on (sample, node) + an anti-join dedup; state
    is O(active nodes x samples), localCheckpoint'ed.

    Input: edges (src, dst), seeds (node). Output: (sample, node,
    hop) with hop = first activation round (0 for seeds).
    """
    bidir = (
        edges.selectExpr(f"{src} as u", f"{dst} as v")
        .union(edges.selectExpr(f"{dst} as u", f"{src} as v"))
        .dropDuplicates()
    )
    coin = (
        "cast(conv(substr(md5(concat(u, '|', v, '|', "
        f"cast(sample as string), '|', '{salt}')), 1, 8), 16, 10) "
        f"as bigint) % 1000"
    )
    live = (
        bidir.select(
            "u",
            "v",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_samples) - 1))).alias(
                "sample"
            ),
        )
        .filter(F.expr(coin) < int(p_mille))
        .localCheckpoint(eager=True)
    )
    state = (
        seeds.select(F.col("node"))
        .dropDuplicates()
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(int(n_samples) - 1))
            ).alias("sample"),
            "node",
            F.lit(0).cast("int").alias("hop"),
        )
        .localCheckpoint(eager=True)
    )
    for t in range(1, int(rounds) + 1):
        frontier = state.filter(F.col("hop") == t - 1)
        reached = (
            frontier.join(
                live,
                (frontier["sample"] == live["sample"])
                & (frontier["node"] == live["u"]),
            )
            .select(live["sample"], F.col("v").alias("node"))
            .dropDuplicates()
            .withColumn("hop", F.lit(t).cast("int"))
        )
        fresh = reached.join(
            state.select("sample", "node"), ["sample", "node"], "left_anti"
        )
        state = state.union(fresh).localCheckpoint(eager=True)
    return state


def bipartite_butterflies(
    inc: DataFrame,
    u: str = "u",
    v: str = "v",
    min_cooc: int = 2,
) -> DataFrame:
    """Butterfly (2x2 biclique) counting on a bipartite incidence list
    (Wang et al. VLDB'14; Sanei-Mehri et al. KDD'18) — the bipartite
    analogue of triangle counting, the cohesion motif for doc-token /
    user-item graphs where triangles cannot exist. Per v-side pair the
    butterfly count is pure algebra on the co-occurrence count,
    C(cooc, 2); no 4-way join ever runs. The one shuffle is the
    canonical a<b co-occurrence self-join keyed by u (the
    entity-graph shape, AQE splits hub skew); global caterpillars
    (3-paths) need only the two degree tables joined back to the
    edge list: sum (deg_u - 1) * (deg_v - 1) over edges, since every
    3-path has a unique middle edge.

    Output: one row per v-pair with cooc >= min_cooc
    (v_a, v_b, cooc, butterflies, NULL, NULL) plus one '__ALL__'
    summary row carrying the GLOBAL tallies over every pair
    (including sub-threshold ones): total butterflies, total
    caterpillars, and the bipartite clustering coefficient
    cc4 = 4 * butterflies / caterpillars (Lind et al. '05), one
    rounded division. Duplicate incidences are collapsed first.
    """
    e = inc.select(F.col(u).alias("u"), F.col(v).alias("v")).dropDuplicates()
    a = e.selectExpr("u", "v as va")
    b = e.selectExpr("u as u2", "v as vb")
    co = (
        a.join(b, (a["u"] == b["u2"]) & (a["va"] < b["vb"]))
        .groupBy("va", "vb")
        .agg(F.count("*").alias("cooc"))
    )
    bf = co.withColumn(
        "butterflies", F.expr("cooc * (cooc - 1) div 2")
    )
    du = e.groupBy("u").agg(F.count("*").alias("deg_u"))
    dv = e.groupBy("v").agg(F.count("*").alias("deg_v"))
    cater = (
        e.join(du, "u")
        .join(dv, "v")
        .agg(
            F.sum(
                F.expr("(deg_u - 1) * (deg_v - 1)")
            ).alias("caterpillars")
        )
    )
    totals = bf.agg(F.sum("butterflies").alias("bf_total")).crossJoin(
        F.broadcast(cater)
    )
    summary = totals.select(
        F.lit("__ALL__").alias("v_a"),
        F.lit("__ALL__").alias("v_b"),
        F.lit(None).cast("long").alias("cooc"),
        F.col("bf_total").alias("butterflies"),
        "caterpillars",
        F.when(
            F.col("caterpillars") > 0,
            F.round(4 * F.col("bf_total") / F.col("caterpillars"), 6),
        ).alias("cc4"),
    )
    pairs = bf.filter(F.col("cooc") >= int(min_cooc)).select(
        F.col("va").alias("v_a"),
        F.col("vb").alias("v_b"),
        "cooc",
        "butterflies",
        F.lit(None).cast("long").alias("caterpillars"),
        F.lit(None).cast("double").alias("cc4"),
    )
    return pairs.unionByName(summary)


def rich_club(
    edges: DataFrame,
    ks: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rich-club coefficient ladder (Zhou & Mondragon '04): for each
    degree cutoff k, phi(k) = 2 * E_k / (n_k * (n_k - 1)) where n_k
    counts nodes of degree > k and E_k the edges BOTH of whose
    endpoints qualify — do the well-connected entities of the KG also
    interconnect? (The un-normalized coefficient; the random-rewiring
    null model is out of scope and stated so.)

    No per-k scan: an edge qualifies at every k below min(deg_a,
    deg_b), so edges collapse to a value table keyed by that min and a
    node value table keyed by degree (both bounded by the degree
    domain), and every (k, count) answer is a suffix sum over those
    tables — here a broadcast inequality join of the |ks|-row grid
    against each value table, integers throughout, one rounded
    division per k. Input treated as undirected src<dst unique edges;
    self-loops dropped.

    Output: (k, n_k, e_k, phi), phi NULL when n_k < 2.
    """
    e = (
        edges.selectExpr(
            f"least({src}, {dst}) as a", f"greatest({src}, {dst}) as b"
        )
        .filter("a < b")
        .dropDuplicates()
    )
    deg = (
        e.selectExpr("a as node")
        .union(e.selectExpr("b as node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.selectExpr("node as a", "d as d_a")
    db = deg.selectExpr("node as b", "d as d_b")
    em = (
        e.join(da, "a")
        .join(db, "b")
        .selectExpr("least(d_a, d_b) as m")
        .groupBy("m")
        .agg(F.count("*").alias("ec"))
    )
    dv = deg.groupBy("d").agg(F.count("*").alias("nc"))
    grid = e.sparkSession.range(1).select(
        F.explode(
            F.expr(f"array({', '.join(str(int(k)) for k in ks)})")
        ).alias("k")
    )
    nk = (
        F.broadcast(grid)
        .join(dv, F.col("d") > F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("nc"), F.lit(0)).alias("n_k"))
    )
    ek = (
        F.broadcast(grid)
        .join(em, F.col("m") > F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("ec"), F.lit(0)).alias("e_k"))
    )
    return (
        nk.join(ek, "k")
        .select(
            "k",
            "n_k",
            "e_k",
            F.when(
                F.col("n_k") >= 2,
                F.round(
                    2 * F.col("e_k") / (F.col("n_k") * (F.col("n_k") - 1)),
                    6,
                ),
            ).alias("phi"),
        )
    )


def disparity_backbone(
    edges: DataFrame,
    alpha_mille: int = 50,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Serrano-Boguna disparity filter (PNAS'09) — the multiscale
    significance backbone for a weighted KG: an edge survives if its
    weight is statistically surprising against AT LEAST ONE endpoint's
    null model of uniformly split strength, alpha_ij = (1 -
    w/s_i)^(k_i - 1) < alpha. Unlike a global weight cut, this keeps
    locally dominant edges of low-strength nodes, so the periphery is
    not erased — the standard complement of the max-spanning backbone
    (entity_backbone_msf keeps connectivity; this keeps significance).

    Decision in LOG space — no pow() (whose cross-engine bit-identity
    is unpinned): significant from endpoint i iff

        round((k_i - 1) * ln(1 - w/s_i), 6) < round(ln(alpha), 6)

    w/s_i is one IEEE division, ln is the cross-engine lockstep
    already pinned by tfidf/token_pmi, and the round-before-compare
    makes the boundary engine-identical. Degree-1 endpoints have
    exponent 0 -> log-alpha 0 (never significant from that side, the
    paper's convention), which also guards the w == s_i singularity.

    Physical shape: one strength/degree aggregation, two broadcast-
    friendly joins back onto the edge list, pure Catalyst expressions.
    Input treated as undirected src<dst unique weighted edges.

    Output: every edge with (src, dst, w, lalpha_src, lalpha_dst,
    keep) — survivors AND casualties, so the filter itself is
    machine-checkable.
    """
    e = edges.selectExpr(
        f"least({src}, {dst}) as a",
        f"greatest({src}, {dst}) as b",
        f"cast({w} as bigint) as w",
    ).dropDuplicates(["a", "b"])
    st = (
        e.selectExpr("a as node", "w")
        .union(e.selectExpr("b as node", "w"))
        .groupBy("node")
        .agg(F.sum("w").alias("s"), F.count("*").alias("k"))
    )
    lalpha = (
        "case when {k} <= 1 then 0.0 "
        "else round(({k} - 1) * ln(1.0 - w / cast({s} as double)), 6) end"
    )
    thr = f"round(ln({int(alpha_mille)} / 1000.0), 6)"
    return (
        e.join(st.selectExpr("node as a", "s as s_a", "k as k_a"), "a")
        .join(st.selectExpr("node as b", "s as s_b", "k as k_b"), "b")
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            "w",
            F.expr(lalpha.format(k="k_a", s="s_a")).alias("lalpha_src"),
            F.expr(lalpha.format(k="k_b", s="s_b")).alias("lalpha_dst"),
        )
        .withColumn(
            "keep",
            F.expr(f"least(lalpha_src, lalpha_dst) < {thr}"),
        )
    )


def densest_subgraph_rounds(
    edges: DataFrame,
    eps_mille: int = 500,
    max_rounds: int = 24,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Greedy densest-subgraph peeling (Bahmani, Kumar & Vassilvitskii
    VLDB'12; Charikar '00) — the canonical MapReduce graph primitive:
    repeatedly delete every node whose degree is at most 2(1+eps)
    times the current average density rho = |E|/|V|; some iterate is a
    2(1+eps)-approximate densest subgraph, found in O(log n / eps)
    rounds. On a KG this surfaces the hottest entity cluster (the
    core the uniform-threshold k-core can overshoot past).

    The PEEL DECISION is exact integer arithmetic — node survives iff

        deg * n_s * 1000 > 2 * (1000 + eps_mille) * e_s

    (cross-multiplied, no rho double anywhere), so rounds are
    engine-identical by construction. Node set = endpoints of
    remaining edges (an isolated node has deg 0 <= threshold and
    would leave next round regardless — stated). Per round: one
    algebraic degree aggregation + two semi-joins + a localCheckpoint
    (the kcore/louvain driver-iteration cost shape); the graph only
    shrinks. RAISES past max_rounds instead of returning a
    non-terminated iterate (the oracle unrolls exactly max_rounds).

    Output: one row per non-empty round (round, n_nodes, n_edges,
    density, is_best) — density one rounded division, the winning
    iterate flagged via max(struct(density, -round)), so the whole
    trajectory is machine-checkable, not just the argmax.
    """
    e = (
        edges.selectExpr(
            f"least({src}, {dst}) as a", f"greatest({src}, {dst}) as b"
        )
        .filter("a < b")
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    stats = []
    thr = 2 * (1000 + int(eps_mille))
    for r in range(int(max_rounds) + 1):
        deg = (
            e.selectExpr("a as node")
            .union(e.selectExpr("b as node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        n_s = deg.count()
        if n_s == 0:
            break
        e_s = e.count()
        stats.append((r, n_s, e_s))
        if r == int(max_rounds):
            raise RuntimeError(
                f"densest_subgraph_rounds: not empty after {max_rounds} "
                "rounds; raise max_rounds (the oracle unroll bound)"
            )
        keep = deg.filter(
            F.expr(
                f"deg * cast({n_s} as bigint) * 1000"
                f" > cast({thr} as bigint) * {e_s}"
            )
        ).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    df = spark.createDataFrame(
        stats, "round int, n_nodes long, n_edges long"
    )
    best = df.agg(
        F.max(
            F.struct(
                F.round(F.expr("n_edges / cast(n_nodes as double)"), 9).alias(
                    "d"
                ),
                (-F.col("round")).alias("nr"),
            )
        ).alias("b")
    )
    return df.crossJoin(F.broadcast(best)).select(
        "round",
        "n_nodes",
        "n_edges",
        F.round(F.expr("n_edges / cast(n_nodes as double)"), 6).alias(
            "density"
        ),
        (
            (
                F.round(F.expr("n_edges / cast(n_nodes as double)"), 9)
                == F.col("b.d")
            )
            & (F.col("round") == -F.col("b.nr"))
        ).alias("is_best"),
    )


def sweep_cut(
    edges: DataFrame,
    scores: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    score: str = "pr",
) -> DataFrame:
    """Sweep cut (Andersen-Chung-Lang FOCS'06): order nodes by
    score/degree (the PPR sweep ordering) and evaluate the conductance
    of EVERY prefix; the best prefix is the local cluster around the
    PPR anchor — the standard spectral-free local-partitioning step,
    and the reason personalized PageRank is run at all.

    Exact prefix algebra, no per-prefix recomputation: with nodes
    ranked (one node-table-sized window, the auc_score convention —
    ordering key score/deg is ONE IEEE division, ties by node),
    vol(r) = cumsum(deg) and cut(r) = vol(r) - 2 * cumsum(e_in) where
    e_in(v) = |neighbors of v ranked earlier| — one equi-join of the
    bidirectional edge list against the rank table on BOTH endpoints
    + a groupBy, so the whole sweep costs one join pass. Everything
    is BIGINT until the one conductance division phi = cut /
    min(vol, 2m - vol); the best prefix (min phi, tie: smaller rank,
    full-graph prefix excluded — its phi is 0/0) is flagged via the
    algebraic min(struct). Unweighted; nodes missing a score sort
    last deterministically (score NULL -> -inf via coalesce).

    Output: (rank, node, deg, vol, cut, phi, is_best).
    """
    from pyspark.sql import Window

    # three consumers (degrees, e_in, m2 count) — materialize the
    # symmetrized edge list once instead of re-executing the upstream
    # graph build per action
    e = (
        edges.selectExpr(
            f"least({src}, {dst}) as a", f"greatest({src}, {dst}) as b"
        )
        .filter("a < b")
        .dropDuplicates()
    )
    bidir = (
        e.selectExpr("a as u", "b as v")
        .union(e.selectExpr("b as u", "a as v"))
        .localCheckpoint(eager=True)
    )
    deg = bidir.groupBy("u").agg(F.count("*").alias("deg"))
    sc = scores.selectExpr(f"{node} as u", f"{score} as s")
    ranked = (
        deg.join(sc, "u", "left")
        .select(
            "u",
            "deg",
            F.expr("coalesce(s / cast(deg as double), -1e308)").alias(
                "key"
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("key"), "u")),
        )
        # ranked is consumed three times (both e_in sides + the prefix
        # scan) and embeds the caller's score plan — typically a lazy
        # 6-iteration PPR; materialize once (measured at sf0.1:
        # 17.6 s -> 1.6 s for the sweep)
        .localCheckpoint(eager=True)
    )
    ra = ranked.selectExpr("u", "rank as rank_u")
    rb = ranked.selectExpr("u as v", "rank as rank_v")
    e_in = (
        bidir.join(ra, "u")
        .join(rb, "v")
        .filter("rank_v < rank_u")
        .groupBy("u")
        .agg(F.count("*").alias("e_in"))
    )
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    m2 = bidir.count()
    pre = (
        ranked.join(e_in, "u", "left")
        .select(
            "rank",
            F.col("u").alias("node"),
            "deg",
            F.coalesce("e_in", F.lit(0)).alias("e_in"),
        )
        .select(
            "rank",
            "node",
            "deg",
            F.sum("deg").over(w).alias("vol"),
            (
                F.sum("deg").over(w) - 2 * F.sum("e_in").over(w)
            ).alias("cut"),
        )
        .withColumn(
            "phi",
            F.when(
                F.least(F.col("vol"), F.lit(m2) - F.col("vol")) > 0,
                F.round(
                    F.col("cut")
                    / F.least(
                        F.col("vol").cast("double"),
                        (F.lit(m2) - F.col("vol")).cast("double"),
                    ),
                    6,
                ),
            ),
        )
    )
    best = pre.filter(F.col("phi").isNotNull()).agg(
        F.min(F.struct(F.col("phi"), F.col("rank"))).alias("b")
    )
    return pre.crossJoin(F.broadcast(best)).select(
        "rank",
        "node",
        "deg",
        "vol",
        "cut",
        "phi",
        (
            F.col("phi").isNotNull()
            & (F.col("phi") == F.col("b.phi"))
            & (F.col("rank") == F.col("b.rank"))
        ).alias("is_best"),
    )


def attack_robustness(
    edges: DataFrame,
    ks: tuple[int, ...] = (0, 1, 2, 4),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Targeted-attack robustness curve (Albert, Jeong & Barabasi
    2000): remove the top-k highest-degree hubs and measure what is
    left — the resilience audit of the entity graph (a KG whose giant
    component shatters after two hub removals is a KG held together by
    generic entities).

    Hubs rank by (degree desc, node asc) over the node DIMENSION (the
    single-partition window is vocabulary-bounded — the closeness
    argument; never corpus-sized). For each k the kept edge set is two
    broadcast anti-joins, and the surviving structure is measured by
    the existing deterministic connected_components (min-label
    propagation, O(diameter) rounds). Nodes are counted while they
    still carry an edge; a node isolated BY the removal leaves the
    graph (documented semantics — the curve measures surviving
    connectivity, not inventory).

    Output: (k, n_nodes, n_edges, largest_cc) — one row per k;
    integers only, so the oracle is exact with zero tolerance.
    """
    from careers_spark.operators.canonicalize import connected_components
    from pyspark.sql import Window

    bidir = (
        edges.selectExpr(f"{src} as u", f"{dst} as v")
        .union(edges.selectExpr(f"{dst} as u", f"{src} as v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    deg = bidir.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("deg")
    )
    ranked = deg.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("deg"), F.asc("node"))),
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    out = None
    for k in ks:
        hubs = ranked.filter(F.col("rk") <= int(k)).select(
            F.col("node").alias("h")
        )
        kept = (
            edges.selectExpr(f"{src} as src", f"{dst} as dst")
            .join(
                F.broadcast(hubs), F.col("src") == F.col("h"), "left_anti"
            )
            .join(
                F.broadcast(hubs), F.col("dst") == F.col("h"), "left_anti"
            )
        )
        cc = connected_components(kept)
        row = (
            cc.groupBy("component")
            .agg(F.count("*").alias("sz"))
            .agg(
                F.coalesce(F.sum("sz"), F.lit(0).cast("long")).alias(
                    "n_nodes"
                ),
                F.coalesce(F.max("sz"), F.lit(0).cast("long")).alias(
                    "largest_cc"
                ),
            )
            .crossJoin(kept.agg(F.count("*").alias("n_edges")))
            .select(
                F.lit(int(k)).cast("int").alias("k"),
                "n_nodes",
                "n_edges",
                "largest_cc",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    beta_inv: int = 8,
) -> DataFrame:
    """Katz centrality (Katz 1953), truncated attenuated-path series —
    the walk-counting salience beside pagerank (mass-conserving random
    walk) and HITS (mutual reinforcement): a node is central if many
    short walks END at it, each walk of length k worth beta^k.

        katz(v) = sum_{k=1..K} beta^k * #walks of length k into v

    EXACT INTEGER recurrence: with beta = 1/beta_inv and
    m_t = beta_inv^t * c_t (c_t the partial Katz sum after t terms),

        m_0(v) = 0
        m_{t+1}(v) = sum_{u->v} ( beta_inv^t + m_t(u) )

    keeps every iterate a BIGINT — walk counts are integers and the
    dyadic attenuation is deferred to ONE final division
    katz = m_K / beta_inv^K (a single correctly-rounded IEEE divide of
    identical integers in both engines, hence engine-identical even
    when m_K exceeds 2^53). No per-iteration float rounding is needed
    at all — stronger than the pagerank 10-dp lockstep. The BIGINT
    certificate m_fp rides in the output. ANSI mode makes a BIGINT
    overflow LOUD in both engines (Spark raises, DuckDB raises); at
    beta_inv=8, K=6 that needs ~2^44 attenuated walks into one node.

    Convergence note: the classical fixed point requires
    beta < 1/lambda_max; the truncated series is total regardless —
    this operator IS the K-term truncation, matching its oracle unroll
    by construction (the betweenness fixed-depth convention).

    Scale shape: each iteration is one equi-join on the edge source +
    one algebraic groupBy(dst) (map-side combinable), exactly the
    pagerank shuffle profile; hub skew is AQE-split. No window, no
    sort, no driver-side data.

    Output: (node, katz, m_fp) — katz = m_fp / beta_inv^K rounded to
    10 dp, m_fp the exact BIGINT numerator.
    """
    if beta_inv < 2:
        raise ValueError("beta_inv must be >= 2 (beta < 1)")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = nodes.withColumn("m", F.lit(0).cast("long"))
    for t in range(int(iterations)):
        pw = int(beta_inv) ** t
        contrib = (
            e.join(m.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("m") + F.lit(pw)).alias("m"))
        )
        m = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.coalesce("m", F.lit(0).cast("long")).alias("m"),
            )
            .localCheckpoint(eager=True)
        )
    denom = float(int(beta_inv) ** int(iterations))
    return m.select(
        "node",
        F.round(F.col("m") / F.lit(denom), 10).alias("katz"),
        F.col("m").alias("m_fp"),
    )


def node2vec_walks(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_walks: int = 2,
    walk_len: int = 4,
    w_ret: int = 1,
    w_bfs1: int = 4,
    w_far: int = 2,
    salt: str = "n2v",
) -> DataFrame:
    """node2vec biased second-order random walks (Grover & Leskovec,
    KDD 2016) — the p/q generalization of deepwalk_corpus: from
    previous node s and current node c, neighbor x draws unnormalized
    weight 1/p if x==s (return), 1 if x is also a neighbor of s
    (BFS-like), 1/q otherwise (DFS-like). Expressed here as EXACT
    INTEGER weights (w_ret, w_bfs1, w_far) = (1/p, 1, 1/q) scaled by
    any common denominator — the defaults (1, 4, 2) are p=4, q=2, the
    paper's "explore outward, rarely backtrack" regime.

    DERANDOMIZED like every sampler in this repo: step t of walk
    (start, j) draws r = md5(start|j|t|salt) mod W (W = the state
    row's total candidate weight, an exact BIGINT) and picks the
    neighbor whose cumulative-weight interval [cum-w, cum) contains r,
    cumulated over the (v-ordered) candidate list. Reproducible across
    runs/engines/parallelism, re-seedable by salt, oracle-able as a
    fixed unroll. The first transition initializes prev = start, and
    since every candidate is then a neighbor of prev, all weights are
    w_bfs1 — the uniform first step of the paper, with no special
    case.

    Physical shape per step: one adjacency equi-join (state x deg(cur)
    candidate fan-out — the inherent node2vec cost), one LEFT
    equi-join against the edge set for the "neighbor of prev" flag,
    and one per-walk window (partitions of size deg(cur), NEVER
    corpus-wide) for the cumulative. No inequality joins, no Python,
    no driver-side state beyond the fixed step count.

    Output: (start, j, step, node) — the deepwalk_corpus schema, ready
    for the same skip-gram windowing; isolated nodes produce no walks.
    """
    from pyspark.sql import Window

    from careers_spark.operators.dedup import _hash64_expr

    for name, w in (("w_ret", w_ret), ("w_bfs1", w_bfs1), ("w_far", w_far)):
        if int(w) < 1:
            raise ValueError(f"{name} must be a positive integer")
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    state = (
        bidir.select(F.col("u").alias("start"))
        .distinct()
        .withColumn(
            "j", F.explode(F.expr(f"sequence(0, {int(n_walks) - 1})"))
        )
        .withColumn("j", F.col("j").cast("int"))
        .withColumn("prev", F.col("start"))
        .withColumn("cur", F.col("start"))
    )
    steps = [
        state.select(
            "start", "j", F.lit(0).alias("step"), F.col("cur").alias("node")
        )
    ]
    prev_edge = bidir.select(
        F.col("u").alias("_pu"), F.col("v").alias("_pv"), F.lit(1).alias("_is1")
    )
    for t in range(1, int(walk_len) + 1):
        keyed = (
            "concat(cast(start as string), '|', cast(j as string), '|', "
            f"'{t}', '|', '{salt}')"
        )
        cand = (
            state.join(
                bidir.select(F.col("u").alias("_cu"), F.col("v").alias("_cv")),
                F.col("cur") == F.col("_cu"),
            )
            .join(
                prev_edge,
                (F.col("prev") == F.col("_pu"))
                & (F.col("_cv") == F.col("_pv")),
                "left",
            )
            .withColumn(
                "w",
                F.when(F.col("_cv") == F.col("prev"), F.lit(int(w_ret)))
                .when(F.col("_is1").isNotNull(), F.lit(int(w_bfs1)))
                .otherwise(F.lit(int(w_far)))
                .cast("long"),
            )
        )
        wk = Window.partitionBy("start", "j")
        cum = cand.select(
            "start",
            "j",
            "cur",
            "_cv",
            "w",
            F.sum("w")
            .over(wk.orderBy("_cv").rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
            F.sum("w").over(wk).alias("tot"),
        ).withColumn("r", F.expr(f"{_hash64_expr(keyed)} % tot"))
        state = cum.filter(
            (F.col("r") >= F.col("cum") - F.col("w"))
            & (F.col("r") < F.col("cum"))
        ).select(
            "start", "j", F.col("cur").alias("prev"), F.col("_cv").alias("cur")
        )
        steps.append(
            state.select(
                "start",
                "j",
                F.lit(t).alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    return out


def wl_refinement(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """1-dimensional Weisfeiler-Lehman color refinement (Weisfeiler &
    Lehman 1968; the WL-kernel base of Shervashidze et al. 2011) over
    the undirected simple graph — the structural-equivalence
    fingerprint of a freshly built KG: nodes ending in the same color
    class are indistinguishable by any rounds-hop neighborhood
    statistic, so the class histogram is a cheap graph signature for
    diffing KG builds, and class singletons are structurally unique
    entities.

    Colors start uniform and refine by hashing each node's own color
    with the SORTED multiset of neighbor colors:

        c_{t+1}(v) = md5(c_t(v) || '|' || sorted_join(c_t(u): u ~ v))

    Determinism/oracle-exactness: md5 of identical strings is engine-
    identical, the neighbor join is sorted before concatenation, and
    the round count is fixed — the DuckDB unroll reproduces every
    color hash-exactly (no floats anywhere). Each round is one join +
    one partial-agg-friendly groupBy(node) with a per-node sort
    bounded by degree; localCheckpoint per round (the HITS
    convention).

    Output: (wl_class, n_nodes, example_node) — the refined color
    classes with their deterministic min-node example.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    bidir = (
        und.selectExpr("a as u", "b as v")
        .union(und.selectExpr("b as u", "a as v"))
        .localCheckpoint(eager=True)
    )
    nodes = bidir.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("wl", F.lit("0")).localCheckpoint(
        eager=True
    )
    for _ in range(int(rounds)):
        nb = (
            bidir.join(
                labels.select(
                    F.col("node").alias("v"), F.col("wl").alias("nb_wl")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list("nb_wl")), ","
                ).alias("nbs")
            )
        )
        labels = (
            labels.join(nb, "node", "left")
            .select(
                "node",
                F.md5(
                    F.concat_ws(
                        "|", F.col("wl"), F.coalesce("nbs", F.lit(""))
                    )
                ).alias("wl"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.col("wl").alias("wl_class"))
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.min("node").alias("example_node"),
        )
    )


def degree_tail_alpha(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dmin: int = 2,
) -> DataFrame:
    """Power-law exponent of the degree tail by the continuous MLE
    with the standard half-integer correction (Clauset, Shalizi &
    Newman 2009, eq. 3.7):

        alpha = 1 + n / sum_{d_i >= dmin} ln(d_i / (dmin - 1/2))

    — the scale-free diagnostic for a fresh KG: alpha near 2-3 with a
    fat tail says hub entities will dominate joins (salt them);
    a steep alpha says degree-based pruning is safe.

    Exactness: degrees are exact integers; each ln term is rounded to
    6 decimals BEFORE summation (the pinned ln-lockstep recipe), so
    the across-node sum carries only addition-order noise under the
    final round(,6). Tail emptiness surfaces NULL alpha.

    One distinct-edge pass + one degree groupBy + a 1-row close.

    Output: one row — (n_nodes, n_tail, dmin, sum_ln, alpha).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    half = float(dmin) - 0.5
    return (
        deg.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.when(F.col("d") >= int(dmin), 1).otherwise(0))
            .cast("long")
            .alias("n_tail"),
            F.sum(
                F.when(
                    F.col("d") >= int(dmin),
                    F.expr(f"round(ln(d * 1e0 / {half}e0), 6)"),
                ).otherwise(F.lit(0.0))
            ).alias("sum_ln_raw"),
        )
        .select(
            "n_nodes",
            "n_tail",
            F.lit(int(dmin)).alias("dmin"),
            F.expr("round(coalesce(sum_ln_raw, 0e0), 6)").alias(
                "sum_ln"
            ),
            F.expr(
                "case when n_tail = 0 or coalesce(sum_ln_raw, 0e0)"
                " = 0e0 then null else"
                " round(1e0 + n_tail / coalesce(sum_ln_raw, 0e0), 6)"
                " end"
            ).alias("alpha"),
        )
    )
