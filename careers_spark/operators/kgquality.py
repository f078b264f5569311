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


def type_signatures(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Schema induction by predicate-role signatures: every node is
    typed by the SORTED set of (predicate, position) roles it plays —
     'subj:works_at|obj:located_in' — and nodes sharing a signature
    form an induced class. This is the untyped-KG answer to "what
    entity types exist here" (domain/range induction, the first step
    of every KG-refinement survey's type-prediction chapter): an
    extraction pipeline that emits raw strings gets a type system for
    free, and signature SINGLETONS are excellent error candidates (a
    node playing a role no other node plays is usually a bad link).

    Exactness: signatures are sorted '|'-joined strings over the
    distinct role set (the array-free convention); counts are
    integers. One distinct role projection + one per-node sort-join +
    one signature rollup.

    Output: (signature, n_nodes, n_roles, example_node) — example is
    the MIN node id (deterministic), n_roles the signature's role
    count.
    """
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    )
    roles = (
        t.select(
            F.col("s").alias("node"),
            F.concat(F.lit("subj:"), F.col("p")).alias("role"),
        )
        .union(
            t.select(
                F.col("o").alias("node"),
                F.concat(F.lit("obj:"), F.col("p")).alias("role"),
            )
        )
        .distinct()
    )
    sigs = roles.groupBy("node").agg(
        F.expr("array_join(array_sort(collect_set(role)), '|')").alias(
            "signature"
        ),
        F.countDistinct("role").alias("n_roles"),
    )
    return sigs.groupBy("signature").agg(
        F.count("*").alias("n_nodes"),
        F.first("n_roles").alias("n_roles"),
        F.min("node").alias("example_node"),
    )


def path_rule_confidence(
    triples: DataFrame,
    body1: str,
    body2: str,
    head: str,
    head_obj_expr: str = "z",
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """AMIE-style confidence of the 2-hop horn rule

        body1(x, y) AND body2(y, z)  =>  head(x, H(z))

    (Galárraga et al., WWW 2013) — the rule-mining primitive that
    turns a raw triple store into new knowledge plus an error
    detector: high-confidence rules predict missing triples, and
    body instances that VIOLATE a near-certain rule are extraction
    errors. ``head_obj_expr`` is a SQL expression over column ``z``
    mapping the path endpoint to the expected head object (identity
    'z' for plain composition; e.g. a string rewrite when the head
    object is a derived surface like 'University of <city>').

    Three confidences, all exact integer ratios over the distinct
    body-instance table:

      - support: body instances whose head triple EXISTS;
      - std_confidence: support / n_body (closed-world);
      - pca_confidence: support / (body instances whose x asserts ANY
        head-predicate triple) — AMIE's partial-completeness
        denominator, the published fix for incomplete KGs.

    Physical shape: one equi-join on y for the path, a broadcast-able
    head semi-join on (x, H(z)), an EXISTS semi-join on x for the PCA
    denominator. All counts distinct-exact.

    Output: one row — (rule, n_body, n_support, n_pca_body,
    std_confidence, pca_confidence).
    """
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    b1 = t.filter(F.col("p") == body1).select(
        F.col("s").alias("x"), F.col("o").alias("y")
    )
    b2 = t.filter(F.col("p") == body2).select(
        F.col("s").alias("y"), F.col("o").alias("z")
    )
    body = (
        b1.join(b2, "y")
        .select("x", "z")
        .distinct()
        .withColumn("h_obj", F.expr(head_obj_expr))
    )
    hd = t.filter(F.col("p") == head).select(
        F.col("s").alias("x"), F.col("o").alias("h_obj")
    )
    matched = body.join(hd, ["x", "h_obj"], "left_semi")
    pca = body.join(hd.select("x").distinct(), "x", "left_semi")
    counts = (
        body.agg(F.count("*").alias("n_body"))
        .crossJoin(
            F.broadcast(matched.agg(F.count("*").alias("n_support")))
        )
        .crossJoin(
            F.broadcast(pca.agg(F.count("*").alias("n_pca_body")))
        )
    )
    rule = f"{body1}(x,y) & {body2}(y,z) => {head}(x,H(z))"
    return counts.select(
        F.lit(rule).alias("rule"),
        "n_body",
        "n_support",
        "n_pca_body",
        F.expr(
            "case when n_body = 0 then null"
            " else round(n_support * 1e0 / n_body, 6) end"
        ).alias("std_confidence"),
        F.expr(
            "case when n_pca_body = 0 then null"
            " else round(n_support * 1e0 / n_pca_body, 6) end"
        ).alias("pca_confidence"),
    )


def split_contribution(
    triples: DataFrame,
    mod: int = 5,
    eval_bucket: int = 0,
    conv: str = "conv_id",
) -> DataFrame:
    """Incremental-knowledge diff across the md5 conversation split:
    per predicate, how many triples each side asserts and — the number
    that matters for corpus growth — how many DISTINCT (subj, obj)
    facts the eval-side conversations contribute that the train side
    never asserts (`n_novel_eval`). Run with eval = "the new crawl",
    this is the is-another-batch-worth-ingesting read on a freshly
    built KG (the population-side companion to chao1's undetected
    estimate); run on a train/eval split it quantifies knowledge
    leakage in the other direction: facts the eval set ALSO asserts
    are facts a model could have memorized from training.

    The split predicate is the same pure conv_id function the
    transcript split family keys on (membership never migrates).
    Shapes: two distinct-projections + one left-anti join on the fact
    key + dimension-sized rollups; all counts exact.

    Output: (pred, n_train, n_eval, facts_train, facts_eval,
    n_novel_eval).
    """
    t = triples.withColumn(
        "_is_eval",
        F.expr(
            f"cast(conv(substr(md5({conv}), 1, 8), 16, 10) as bigint)"
            f" % {int(mod)} = {int(eval_bucket)}"
        ),
    )
    counts = t.groupBy("pred").agg(
        F.sum(F.when(~F.col("_is_eval"), 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("_is_eval"), 1).otherwise(0))
        .cast("long")
        .alias("n_eval"),
    )
    facts_t = (
        t.filter(~F.col("_is_eval"))
        .select("pred", "subj", "obj")
        .distinct()
    )
    facts_e = (
        t.filter(F.col("_is_eval"))
        .select("pred", "subj", "obj")
        .distinct()
    )
    ft = facts_t.groupBy("pred").agg(
        F.count("*").cast("long").alias("facts_train")
    )
    fe = facts_e.groupBy("pred").agg(
        F.count("*").cast("long").alias("facts_eval")
    )
    novel = (
        facts_e.join(facts_t, ["pred", "subj", "obj"], "left_anti")
        .groupBy("pred")
        .agg(F.count("*").cast("long").alias("n_novel_eval"))
    )
    z = F.lit(0).cast("long")
    return (
        counts.join(ft, "pred", "left")
        .join(fe, "pred", "left")
        .join(novel, "pred", "left")
        .select(
            "pred",
            "n_train",
            "n_eval",
            F.coalesce("facts_train", z).alias("facts_train"),
            F.coalesce("facts_eval", z).alias("facts_eval"),
            F.coalesce("n_novel_eval", z).alias("n_novel_eval"),
        )
    )
