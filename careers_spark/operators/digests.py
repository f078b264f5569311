"""Document digests + pairwise matching — the TopicVector/WebCVProcess
capabilities re-expressed (reference: disambiguator/TopicVector.scala:11-116,
AmbiguityForest.scala:1157-1212 getDocumentDigest, and the CV-vs-position
matching loop applications/WebCVProcess.scala:284-297).

A digest is the per-conversation topic-weight vector: resolved-link
scores summed per topic, pruned to the top-K topics
(topicVectorMaxSize=100 at AmbiguityForest.scala:1178). Pairwise
similarity is cosine over the exploded vectors — a self-join on
topic_id, which Catalyst executes as a shuffle hash join on the
dimension-sized topic key; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPIC_VECTOR_MAX_SIZE = 100  # reference: AmbiguityForest.scala:1178
DIGEST_GROUP_STRICTNESS = 0.7  # reference: AmbiguityForest.scala:1195
MIN_CLUSTER_COHERENCE = 1e-9  # reference: AmbiguityForest.scala:103


def document_digest_groups(
    pair_weights: DataFrame,
    strictness: float = DIGEST_GROUP_STRICTNESS,
    min_coherence: float = MIN_CLUSTER_COHERENCE,
    n_buckets: int | None = None,
) -> DataFrame:
    """Per-conversation agglomerative grouping of the document's own
    topics at strictness 0.7 — the clustering getDocumentDigest runs
    over its topic vector (reference: AmbiguityForest.scala:1157-1212
    via AgglomClustering.run :300-530):

      - link weights accumulate per unordered topic pair (:1184-1190);
      - pair edges are processed in weight-DESCENDING order; two
        clusters merge iff >= `strictness` of their cross-pairs are
        linked (:377-421, with the document binding compatibleForLink
        == always-true at :1195) — the quasi-clique criterion, NOT
        single linkage;
      - clusters whose mean ordered-pair weight is <= minClusterCoherence
        (1e-9, :103) dissolve (:454-472); singletons never form groups;
      - surviving clusters' members share a group id. The reference's
        numeric gid is scala-HashSet-iteration-order dependent
        (:444-452), so any deterministic relabel is equally faithful:
        here the cluster's lexicographic min member names the group.
        Weight ties in the edge order are broken by (topic_a, topic_b)
        ascending (the reference's sortWith leaves ties unspecified).

    pair_weights: (conv_id, topic_a, topic_b, weight) with topic_a <
    topic_b, one row per pair. Returns (conv_id, topic, group_id) for
    every topic in a surviving cluster; unclustered topics are absent
    (ranked_and_grouped defaults them to singleton groups).

    Scale: runs as a bucketed applyInPandas keyed by conv_id — each
    conversation has <= top-K (100) topics so the quadratic
    agglomeration is bounded, and conversations are independent.
    """
    import pandas as pd

    spark = pair_weights.sparkSession
    if n_buckets is None:
        n_buckets = 8 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def group_conv(edges: list[tuple[str, str, float]]) -> list[tuple[str, str]]:
        weights = {(a, b): w for a, b, w in edges}
        parent: dict[str, str] = {}
        members: dict[str, list[str]] = {}

        def find(x: str) -> str:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b, _ in edges:
            for t in (a, b):
                if t not in parent:
                    parent[t] = t
                    members[t] = [t]

        for a, b, _w in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            ma, mb = members[ra], members[rb]
            linked = sum(
                1
                for m1 in ma
                for m2 in mb
                if ((m1, m2) if m1 < m2 else (m2, m1)) in weights
            )
            if linked / (len(ma) * len(mb)) >= strictness:
                parent[rb] = ra
                ma.extend(mb)
                del members[rb]

        out: list[tuple[str, str]] = []
        for ms in members.values():
            n = len(ms)
            if n < 2:
                continue
            s = sum(
                weights.get((m1, m2) if m1 < m2 else (m2, m1), 0.0)
                for i, m1 in enumerate(ms)
                for m2 in ms[i + 1:]
            )
            # reference sums ORDERED pairs / n(n-1) == unordered mean
            if (2.0 * s) / (n * (n - 1)) > min_coherence:
                gid = min(ms)
                out.extend((t, gid) for t in sorted(ms))
        return out

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple[str, str, str]] = []
        for cid, grp in pdf.groupby("conv_id", sort=False):
            edges = list(
                zip(grp["topic_a"], grp["topic_b"], grp["weight"].astype(float))
            )
            rows.extend((cid, t, g) for t, g in group_conv(edges))
        return pd.DataFrame(rows, columns=["conv_id", "topic", "group_id"])

    return (
        pair_weights.select("conv_id", "topic_a", "topic_b", "weight")
        .withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)))
        .groupby("bucket")
        .applyInPandas(fn, schema="conv_id string, topic string, group_id string")
    )


def document_digests(links: DataFrame, k: int = TOPIC_VECTOR_MAX_SIZE) -> DataFrame:
    """(conv_id, topic, weight) topic vectors, top-K per conversation,
    L2-normalized so downstream cosine is a plain dot product
    (TopicVector.scala:66-84 normalizes with sqrt magnitudes)."""
    w = Window.partitionBy("conv_id").orderBy(F.desc("weight"), F.asc("topic"))
    tv = (
        links.groupBy("conv_id", "topic")
        .agg(F.sum("score").alias("weight"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
    norm = tv.groupBy("conv_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm")
    )
    return tv.join(norm, "conv_id").select(
        "conv_id", "topic", (F.col("weight") / F.col("norm")).alias("weight")
    )


def digest_similarity(
    digests_a: DataFrame,
    digests_b: DataFrame | None = None,
    min_similarity: float = 0.1,
) -> DataFrame:
    """Pairwise cosine between conversations sharing at least one topic
    (the join IS the blocking — disjoint vectors never materialize a
    pair). min_similarity=0.1 mirrors the match threshold at
    WebCVProcess.scala:191-211."""
    b = digests_b if digests_b is not None else digests_a
    a = digests_a.selectExpr("conv_id as conv_a", "topic", "weight as wa")
    bb = b.selectExpr("conv_id as conv_b", "topic", "weight as wb")
    cond = F.col("conv_a") < F.col("conv_b") if digests_b is None else F.col(
        "conv_a"
    ) != F.col("conv_b")
    return (
        a.join(bb, "topic")
        .filter(cond)
        .groupBy("conv_a", "conv_b")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 6).alias("similarity"))
        .filter(F.col("similarity") >= min_similarity)
    )


def ranked_and_grouped(digests: DataFrame, groups: DataFrame) -> DataFrame:
    """TopicVector.rankedAndGrouped (reference: TopicVector.scala:86-108):
    rank a conversation's topics by weight desc (0-based, like the
    reference's zipWithIndex), attach each topic's group id, average the
    ranks per group, and order groups by ascending average rank.

    groups: either a (topic, group_id) dimension table (broadcast
    join) or a PER-DOCUMENT (conv_id, topic, group_id) table — e.g.
    document_digest_groups' output, which is the reference's own
    source of groupId (clustering the document's topics at strictness
    0.7 inside getDocumentDigest, AmbiguityForest.scala:1157-1212).
    Topics without a group form singleton groups keyed by their own
    name (the reference's groupId=-1 presentation).

    Output is flat (one row per ranked topic) so it stays
    window/groupBy-only and engine-comparable:
    (conv_id, group_id, group_order, avg_rank, topic, rank, weight).
    """
    w = Window.partitionBy("conv_id").orderBy(F.desc("weight"), F.asc("topic"))
    ranked = digests.withColumn("rank", F.row_number().over(w) - 1)
    if "conv_id" in groups.columns:
        g = ranked.join(
            groups.select("conv_id", "topic", "group_id"),
            ["conv_id", "topic"],
            "left",
        )
    else:
        g = ranked.join(
            F.broadcast(groups.select("topic", "group_id")), "topic", "left"
        )
    g = g.withColumn("group_id", F.coalesce(F.col("group_id"), F.col("topic")))
    avg_w = Window.partitionBy("conv_id", "group_id")
    order_w = Window.partitionBy("conv_id").orderBy("avg_rank", "group_id")
    return (
        g.withColumn("avg_rank", F.avg("rank").over(avg_w))
        .withColumn("group_order", F.dense_rank().over(order_w))
        .select(
            "conv_id", "group_id", "group_order",
            F.round("avg_rank", 6).alias("avg_rank"),
            "topic", "rank", "weight",
        )
    )


def incremental_pairs(
    left: DataFrame,
    right: DataFrame,
    left_cursor: int,
    right_cursor: int,
    id_left: str = "id_a",
    id_right: str = "id_b",
) -> DataFrame:
    """J7 — the incremental candidate-pair predicate of the reference's
    polling matcher (WebCVProcess.scala:286-291): new-left x all-right
    UNION old-left x new-right, so each poll scores only pairs touching
    fresh rows. Cursors are the previously processed max ids
    (WebCVProcess.scala:215-219)."""
    new_l = left.filter(F.col(id_left) > left_cursor)
    old_l = left.filter(F.col(id_left) <= left_cursor)
    new_r = right.filter(F.col(id_right) > right_cursor)
    return new_l.crossJoin(right).unionByName(old_l.crossJoin(new_r))


def incremental_digest_pairs(
    left_digests: DataFrame,
    right_digests: DataFrame,
    left_cursor: int,
    right_cursor: int,
    id_left: str = "id_a",
    id_right: str = "id_b",
    min_similarity: float = 0.1,
) -> DataFrame:
    """The scale path for unbounded polls: the same new x all / old x new
    incremental predicate as incremental_pairs (WebCVProcess.scala:
    286-291), but BLOCKED on shared digest topics — a pair only
    materializes through the topic equi-join (with its cosine computed
    in the same aggregation), never a crossJoin. At high poll volumes
    the crossJoin variant grows as new x all; this one grows with
    topic-co-occurrence, the same blocking digest_similarity relies on.

    left_digests/right_digests: (id, topic, weight) exploded digest
    vectors (weights pre-normalized, e.g. document_digests output with
    the conversation id renamed to id_a/id_b).
    Returns (id_a, id_b, similarity) for fresh pairs only.
    """
    l_new = left_digests.filter(F.col(id_left) > left_cursor)
    l_old = left_digests.filter(F.col(id_left) <= left_cursor)
    r_new = right_digests.filter(F.col(id_right) > right_cursor)

    def _sims(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.selectExpr(f"{id_left}", "topic", "weight as wa")
            .join(b.selectExpr(f"{id_right}", "topic", "weight as wb"), "topic")
            .groupBy(id_left, id_right)
            .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 6).alias("similarity"))
            .filter(F.col("similarity") >= min_similarity)
        )

    return _sims(l_new, right_digests).unionByName(_sims(l_old, r_new))
