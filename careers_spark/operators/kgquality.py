"""Knowledge-graph quality profiling over (subj, pred, obj) triples.

The post-construction QA layer a KG pipeline runs before publishing:
what is each predicate's observed cardinality (the schema the data
actually exhibits, vs the one the ontology claims), and where are the
contradiction candidates — keys that violate a declared functional /
inverse-functional constraint (one person works at one org; one org
sits in one city). These are the checks OpenIE-style extractors
(which this engine's mention->link->resolve pipeline is) bolt on
before triples reach a downstream consumer.

Reference anchors: the reference's pipeline emits raw topic-link
triples and leaves consistency to the serving layer
(AmbiguityForest.scala's resolved links carry no schema); these
operators add the standard published QA pass (SHACL-style cardinality
shapes, Paulheim's KG-refinement survey) Spark-first.

Everything is exact-integer aggregation: fan-outs are countDistinct
per key, classes are integer predicates, violation lists are sorted
pipe-joined strings — hash-exact oracles with no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_cardinality(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Observed cardinality profile per predicate: the maximum
    subject->object and object->subject fan-outs over DISTINCT
    triples, classified into the four relational shapes

        1-1 (functional + inverse functional), 1-N (one subject, many
        objects), N-1, M-N

    — the "what schema does the data actually follow" table that
    gates constraint declarations (a predicate profiled M-N cannot be
    declared functional) and join planning (an N-1 predicate's
    object side is the broadcast candidate).

    Physical shape: one distinct, two (pred, key) countDistinct
    rollups, one per-pred max — all partial-agg friendly, output one
    row per predicate (dimension-sized).

    Output: (pred, n_triples, n_subj, n_obj, max_out, max_in,
    cardinality_class).
    """
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    base = t.groupBy("p").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("s").alias("n_subj"),
        F.countDistinct("o").alias("n_obj"),
    )
    out_fan = (
        t.groupBy("p", "s")
        .agg(F.countDistinct("o").alias("no"))
        .groupBy("p")
        .agg(F.max("no").alias("max_out"))
    )
    in_fan = (
        t.groupBy("p", "o")
        .agg(F.countDistinct("s").alias("ns"))
        .groupBy("p")
        .agg(F.max("ns").alias("max_in"))
    )
    return (
        base.join(out_fan, "p")
        .join(in_fan, "p")
        .select(
            F.col("p").alias("pred"),
            "n_triples",
            "n_subj",
            "n_obj",
            "max_out",
            "max_in",
            F.expr(
                "case when max_out = 1 and max_in = 1 then '1-1'"
                " when max_in = 1 then '1-N'"
                " when max_out = 1 then 'N-1'"
                " else 'M-N' end"
            ).alias("cardinality_class"),
        )
    )


def contradiction_candidates(
    triples: DataFrame,
    functional: list[str] | None = None,
    inverse_functional: list[str] | None = None,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Constraint-violation surface: for each DECLARED functional
    predicate, the subjects observed with >= 2 distinct objects (a
    person working at two orgs — either a real-world change the KG
    lacks temporal scope for, or an extraction error); for each
    declared inverse-functional predicate, the objects with >= 2
    distinct subjects. This is the triage list a KG curation queue
    consumes — each row is one key to adjudicate, with its full value
    set attached.

    Values are emitted as a '|'-joined SORTED string (deterministic,
    hash-exact across engines — the array-free convention). One
    filtered groupBy per direction over distinct triples; predicates
    not named in either list are untouched.

    Output: (pred, direction, key, n_values, conflict_values) with
    direction in {'functional', 'inverse_functional'}.
    """
    functional = functional or []
    inverse_functional = inverse_functional or []
    if not functional and not inverse_functional:
        raise ValueError("declare at least one constrained predicate")
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    parts = []
    if functional:
        parts.append(
            t.filter(F.col("p").isin(list(functional)))
            .groupBy("p", "s")
            .agg(
                F.countDistinct("o").alias("n_values"),
                F.expr(
                    "array_join(array_sort(collect_set(o)), '|')"
                ).alias("conflict_values"),
            )
            .filter(F.col("n_values") >= 2)
            .select(
                F.col("p").alias("pred"),
                F.lit("functional").alias("direction"),
                F.col("s").alias("key"),
                "n_values",
                "conflict_values",
            )
        )
    if inverse_functional:
        parts.append(
            t.filter(F.col("p").isin(list(inverse_functional)))
            .groupBy("p", "o")
            .agg(
                F.countDistinct("s").alias("n_values"),
                F.expr(
                    "array_join(array_sort(collect_set(s)), '|')"
                ).alias("conflict_values"),
            )
            .filter(F.col("n_values") >= 2)
            .select(
                F.col("p").alias("pred"),
                F.lit("inverse_functional").alias("direction"),
                F.col("o").alias("key"),
                "n_values",
                "conflict_values",
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out
