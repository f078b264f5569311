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

from careers_spark.operators.mentions import TokenAhoCorasick


@dataclass
class KGModel:
    automaton: TokenAhoCorasick
    ctx_map: dict[str, dict[str, float]]
    # sorted dictionary universes: the resolver's coded mode assigns
    # global lexicographic int ids from these, so only ints cross the
    # cogroup shuffle / Arrow boundary (names join back JVM-side)
    surface_names: list[str] = None
    topic_names: list[str] = None

    # interned context vectors (careers_spark.operators.coherence
    # .InternedContexts), built once at model-build time and pickled —
    # re-interning 100k+ topic vectors on the driver cost seconds at
    # the start of EVERY corpus run (a fixed cost at every scaling
    # level); None on models built before v3
    interned: object = None

    # bump when the pickled layout changes: build_or_load rebuilds stale
    # cache files instead of loading a model missing newer fields
    VERSION = 3
    version: int = VERSION

    # heap guard: the model is a driver-collected broadcast dim, the same
    # memory contract as the reference's ~300 MB phrase map loaded per
    # task (WordInTopicCount.scala:19-25). The default driver heap is 6g
    # (careers_spark.session): topics x top-30 contexts at ~100B/entry
    # puts the comfortable ceiling near 20M entries -> ~2 GB; anything
    # larger is a schema bug, not a bigger dictionary.
    MAX_CONTEXT_TOPICS = 600_000

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
        sf_dim = surface_forms.select("surface", "topic").distinct()
        n_sf = sf_dim.count()  # fail fast BEFORE the collect (heap guard)
        if n_sf > 50_000_000:
            raise MemoryError(f"dictionary too large to broadcast: {n_sf} pairs")
        pairs = sf_dim.collect()
        surface_names = sorted({r.surface for r in pairs})
        topic_names = sorted({r.topic for r in pairs})
        ac = TokenAhoCorasick()
        for s in surface_names:
            ac.add(s)
        from careers_spark.operators.coherence import InternedContexts

        return cls(
            automaton=ac.build(),
            ctx_map=ctx_map,
            surface_names=surface_names,
            topic_names=topic_names,
            interned=InternedContexts(ctx_map),
        )

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
            m = cls.load(cache_path)
            if getattr(m, "version", 1) == cls.VERSION:
                return m
        m = cls.build(surface_forms, context_vectors)
        if cache_path:
            m.save(cache_path)
        return m
