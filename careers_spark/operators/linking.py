"""Candidate entity linking: mentions x broadcast dictionary.

The reference probes in-RAM binary arrays per phrase hit
(Disambiguator.scala:309-388 — getPhraseTopics / getPhraseCount /
linkWeight lowerBound probes). Spark-first, those probes are broadcast
hash joins that Catalyst keeps entirely JVM-side:

    mentions ⋈ broadcast(surface_forms+priors)      (J1/J6/J8)
    candidates ⋈ broadcast(topic context vectors)    (J2)

The anchor prior (count/phrase_count, Disambiguator.scala:433-438) is
precomputed in operators.dictionary.surface_priors; candidates with
relative weight below MIN_TOPIC_REL_WEIGHT are dropped
(AmbiguityForest.scala:94-95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_TOPIC_REL_WEIGHT = 1e-5  # reference: AmbiguityForest.scala:94-95


def attach_candidates(mentions: DataFrame, surface_forms: DataFrame) -> DataFrame:
    """mentions -> candidate rows with anchor prior (one row per
    (mention, candidate topic))."""
    dim = surface_forms.select("surface", "topic", "prior")
    return mentions.join(F.broadcast(dim), "surface").filter(
        F.col("prior") >= MIN_TOPIC_REL_WEIGHT
    )


def attach_context_vectors(candidates: DataFrame, context_vectors: DataFrame) -> DataFrame:
    """Attach the per-topic top-K context vector (broadcast dim join);
    topics with no known contexts get empty arrays."""
    out = candidates.join(F.broadcast(context_vectors), "topic", "left")
    return out.withColumn(
        "ctx_ids", F.coalesce(F.col("ctx_ids"), F.array().cast("array<string>"))
    ).withColumn(
        "ctx_ws", F.coalesce(F.col("ctx_ws"), F.array().cast("array<double>"))
    )
