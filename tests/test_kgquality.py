"""predicate_cardinality + contradiction_candidates — shape goldens."""

import pytest


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


TRIPLES = [
    # one_one: bijective
    ("a1", "one_one", "x1"),
    ("a2", "one_one", "x2"),
    # one_n: a1 fans out, every object unique to its subject
    ("a1", "one_n", "y1"),
    ("a1", "one_n", "y2"),
    ("a2", "one_n", "y3"),
    # n_one: many subjects share an object
    ("a1", "n_one", "z1"),
    ("a2", "n_one", "z1"),
    ("a3", "n_one", "z2"),
    # m_n: both sides fan out
    ("a1", "m_n", "w1"),
    ("a1", "m_n", "w2"),
    ("a2", "m_n", "w1"),
]


def test_cardinality_all_four_classes(spark):
    from careers_spark.operators.kgquality import predicate_cardinality

    out = {
        r["pred"]: r
        for r in predicate_cardinality(_t(spark, TRIPLES)).collect()
    }
    assert out["one_one"]["cardinality_class"] == "1-1"
    assert out["one_n"]["cardinality_class"] == "1-N"
    assert out["n_one"]["cardinality_class"] == "N-1"
    assert out["m_n"]["cardinality_class"] == "M-N"
    assert out["one_n"]["max_out"] == 2 and out["one_n"]["max_in"] == 1
    assert out["n_one"]["n_subj"] == 3 and out["n_one"]["n_obj"] == 2


def test_cardinality_duplicate_triples_collapse(spark):
    """Repeated assertions of the same triple must not inflate
    fan-outs — the profile is over DISTINCT triples."""
    from careers_spark.operators.kgquality import predicate_cardinality

    rows = [("a", "p", "x")] * 5 + [("a", "p", "y")]
    out = predicate_cardinality(_t(spark, rows)).collect()[0]
    assert out["n_triples"] == 2 and out["max_out"] == 2


def test_contradictions_both_directions(spark):
    from careers_spark.operators.kgquality import contradiction_candidates

    out = contradiction_candidates(
        _t(spark, TRIPLES),
        functional=["one_n", "one_one"],
        inverse_functional=["n_one", "one_one"],
    ).collect()
    byk = {(r["pred"], r["direction"], r["key"]): r for r in out}
    # one_n declared functional: a1 has two objects -> violation
    v = byk[("one_n", "functional", "a1")]
    assert v["n_values"] == 2 and v["conflict_values"] == "y1|y2"
    # n_one declared inverse-functional: z1 has two subjects
    w = byk[("n_one", "inverse_functional", "z1")]
    assert w["conflict_values"] == "a1|a2"
    # the genuinely 1-1 predicate stays quiet in both directions
    assert not any(r["pred"] == "one_one" for r in out)


def test_contradictions_validation(spark):
    from careers_spark.operators.kgquality import contradiction_candidates

    with pytest.raises(ValueError):
        contradiction_candidates(_t(spark, TRIPLES))


def test_type_signatures_groups_and_singletons(spark):
    from careers_spark.operators.kgquality import type_signatures

    rows = [
        ("p1", "works_at", "o1"),
        ("p2", "works_at", "o2"),
        ("o1", "located_in", "c1"),
        ("o2", "located_in", "c1"),
        ("weird", "works_at", "c1"),  # subject role only, like p1/p2
    ]
    out = {
        r["signature"]: r
        for r in type_signatures(_t(spark, rows)).collect()
    }
    # p1, p2, weird share the pure-subject signature
    assert out["subj:works_at"]["n_nodes"] == 3
    assert out["subj:works_at"]["example_node"] == "p1"
    # orgs are both object of works_at and subject of located_in
    both = out["obj:works_at|subj:located_in"]
    assert both["n_nodes"] == 2 and both["n_roles"] == 2
    # c1 is object of located_in AND object of works_at (via 'weird')
    assert out["obj:located_in|obj:works_at"]["n_nodes"] == 1


def test_rule_confidence_hand_values(spark):
    """3 body instances; 2 have the head triple; 1 violating x still
    asserts SOME head triple, 1 asserts none:
    std = 2/3, pca = 2/2 (the no-head x drops from the denominator)."""
    from careers_spark.operators.kgquality import path_rule_confidence

    rows = [
        ("a", "w", "o1"), ("o1", "l", "c1"), ("a", "s", "c1"),
        ("b", "w", "o2"), ("o2", "l", "c2"), ("b", "s", "c2"),
        # c's body holds but head missing entirely (not in pca denom)
        ("c", "w", "o3"), ("o3", "l", "c3"),
        # d has body AND a head triple but for the WRONG city
        ("d", "w", "o4"), ("o4", "l", "c4"), ("d", "s", "c9"),
    ]
    out = path_rule_confidence(
        _t(spark, rows), body1="w", body2="l", head="s",
        head_obj_expr="z",
    ).collect()[0]
    assert out["n_body"] == 4
    assert out["n_support"] == 2
    assert out["n_pca_body"] == 3
    assert out["std_confidence"] == 0.5
    assert out["pca_confidence"] == pytest.approx(2 / 3, abs=1e-6)


def test_rule_confidence_head_obj_expr(spark):
    """The derived-head mapping: head object is a rewrite of z."""
    from careers_spark.operators.kgquality import path_rule_confidence

    rows = [
        ("a", "w", "o1"), ("o1", "l", "City1"), ("a", "s", "Uni City1"),
    ]
    out = path_rule_confidence(
        _t(spark, rows), body1="w", body2="l", head="s",
        head_obj_expr="replace(z, 'City', 'Uni City')",
    ).collect()[0]
    assert out["n_support"] == 1 and out["std_confidence"] == 1.0


def test_split_contribution(spark):
    import hashlib

    from careers_spark.operators.kgquality import split_contribution

    def bucket(cid, mod=5):
        return int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % mod

    ev = next(c for c in (f"c{i}" for i in range(60)) if bucket(c) == 0)
    t1 = next(c for c in (f"c{i}" for i in range(60)) if bucket(c) != 0)
    t2 = next(
        c
        for c in (f"c{i}" for i in range(60))
        if bucket(c) != 0 and c != t1
    )
    rows = [
        # shared fact asserted on both sides (twice in train)
        (t1, 0, "a", "works_at", "X"),
        (t2, 0, "a", "works_at", "X"),
        (ev, 0, "a", "works_at", "X"),
        # novel eval-only fact
        (ev, 1, "b", "works_at", "Y"),
        # train-only predicate
        (t1, 1, "c", "located_in", "Z"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, subj string, pred string,"
        " obj string",
    )
    out = {r.pred: r for r in split_contribution(df).collect()}
    w = out["works_at"]
    assert (w.n_train, w.n_eval) == (2, 2)
    assert (w.facts_train, w.facts_eval) == (1, 2)
    assert w.n_novel_eval == 1  # only (b, Y) is new knowledge
    lo = out["located_in"]
    assert (lo.n_eval, lo.facts_eval, lo.n_novel_eval) == (0, 0, 0)
