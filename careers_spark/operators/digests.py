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

    groups: (topic, group_id) dimension table — the reference assigns
    groupId by clustering the document's topics at strictness 0.7 inside
    getDocumentDigest (AmbiguityForest.scala:1157-1212); any
    deterministic topic->group mapping plugs in here (communities,
    strongest-context, or a taxonomy column). Topics without a group
    form singleton groups keyed by their own name.

    Output is flat (one row per ranked topic) so it stays
    window/groupBy-only and engine-comparable:
    (conv_id, group_id, group_order, avg_rank, topic, rank, weight).
    """
    w = Window.partitionBy("conv_id").orderBy(F.desc("weight"), F.asc("topic"))
    ranked = digests.withColumn("rank", F.row_number().over(w) - 1)
    g = (
        ranked.join(F.broadcast(groups.select("topic", "group_id")), "topic", "left")
        .withColumn("group_id", F.coalesce(F.col("group_id"), F.col("topic")))
    )
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
