"""Connected-components goldens (reference: Tarjan 3-SCC graph of
testCategorisation.scala:11-55 reduced to undirected CC, DisjointSet
sequences of simpleUnitTests.scala:124-188, plus a hub-star skew case)."""

import pandas as pd

from careers_spark.operators.canonicalize import (
    apply_canonical,
    canonical_mapping,
    connected_components,
)


def _cc(spark, pairs):
    edges = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    return {r.node: r.component for r in connected_components(edges).collect()}


def test_three_components(spark):
    got = _cc(
        spark,
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
    )
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f"}


def test_long_chain(spark):
    n = 12
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {"n00"}


def test_hub_star(spark):
    """Star graph with a degree-100 hub — the salted two-phase min must
    produce the same result as the ground truth (single component,
    lexicographic min representative)."""
    pairs = [("hub", f"leaf{i:03d}") for i in range(100)]
    got = _cc(spark, pairs)
    assert len(got) == 101
    assert set(got.values()) == {"hub"}  # "hub" < "leaf000"


def test_two_cliques_weak_bridge(spark):
    """Cluster golden analogue of testDisambiguator.scala:244-274 — with
    a bridge the two cliques are ONE component (CC is not community
    detection; the Louvain-style split is out of scope for triples)."""
    c1 = [("a1", "a2"), ("a2", "a3"), ("a1", "a3")]
    c2 = [("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    got = _cc(spark, c1 + c2)
    assert set(got[x] for x in ["a1", "a2", "a3"]) == {"a1"}
    assert set(got[x] for x in ["b1", "b2", "b3"]) == {"b1"}
    got2 = _cc(spark, c1 + c2 + [("a3", "b1")])
    assert set(got2.values()) == {"a1"}


def test_canonical_mapping_and_apply(spark):
    resolved = spark.createDataFrame(
        pd.DataFrame(
            {"from_topic": ["Main:Old"], "to_topic": ["Main:New"]}
        )
    )
    same_as = spark.createDataFrame(
        pd.DataFrame({"a": ["Main:Dup"], "b": ["Main:New"]})
    )
    mapping = canonical_mapping(resolved, same_as)
    m = {r.topic: r.canonical for r in mapping.collect()}
    # component = lexicographic min of {Main:Old, Main:New, Main:Dup}
    assert m["Main:Old"] == m["Main:New"] == m["Main:Dup"] == "Main:Dup"

    df = spark.createDataFrame(
        pd.DataFrame({"subj": ["Main:Old", "Main:Other"]})
    )
    got = sorted(r.subj for r in apply_canonical(df, mapping, "subj").collect())
    assert got == ["Main:Dup", "Main:Other"]


def test_cc_idempotent(spark):
    """Property: applying CC to (node -> component) edges again changes
    nothing (hypothesis-style invariant the reference lacks)."""
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    got = _cc(spark, pairs)
    again = _cc(spark, [(k, v) for k, v in got.items()])
    assert again == got
