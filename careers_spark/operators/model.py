"""KGModel: the broadcastable dictionary model artifact.

The reference materializes its dictionary as binary model files built
once and memory-mapped by every consumer (phraseMap.bin etc., built in
testDisambiguator.scala:70-165, loaded at Disambiguator.scala:219-227).
The Spark analogue: the Aho-Corasick automaton + the per-topic context
map, built once from the dictionary tables, pickled next to the
dictionary checkpoint, and broadcast by the corpus phase — so repeated
processing runs (and both cluster sizes of the scaling bench) skip the
collect+build entirely.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass

from pyspark.sql import DataFrame

from careers_spark.operators.mentions import TokenAhoCorasick, build_automaton


@dataclass
class KGModel:
    automaton: TokenAhoCorasick
    ctx_map: dict[str, dict[str, float]]

    # heap guard: the model is a driver-collected broadcast dim, the same
    # memory contract as the reference's ~300 MB phrase map loaded per
    # task (WordInTopicCount.scala:19-25). Topics x top-30 contexts at
    # ~100B/entry -> ~30 GB at the cap; anything larger is a schema bug,
    # not a bigger dictionary.
    MAX_CONTEXT_TOPICS = 10_000_000

    @classmethod
    def build(
        cls, surface_forms: DataFrame, context_vectors: DataFrame
    ) -> "KGModel":
        dim = context_vectors.select("topic", "ctx_ids", "ctx_ws")
        n = dim.count()  # fail fast BEFORE the collect
        if n > cls.MAX_CONTEXT_TOPICS:
            raise MemoryError(
                f"context-vector dimension too large to broadcast: {n} topics "
                f"(cap {cls.MAX_CONTEXT_TOPICS}); check the dictionary filters"
            )
        ctx_map = {
            r.topic: dict(zip(list(r.ctx_ids), list(r.ctx_ws)))
            for r in dim.collect()
        }
        return cls(automaton=build_automaton(surface_forms), ctx_map=ctx_map)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self, f, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def load(cls, path: str) -> "KGModel":
        with open(path, "rb") as f:
            return pickle.load(f)

    @classmethod
    def build_or_load(
        cls,
        surface_forms: DataFrame,
        context_vectors: DataFrame,
        cache_path: str | None,
    ) -> "KGModel":
        if cache_path and os.path.exists(cache_path):
            return cls.load(cache_path)
        m = cls.build(surface_forms, context_vectors)
        if cache_path:
            m.save(cache_path)
        return m
