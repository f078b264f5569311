"""Label-propagation golden: the two-clique-plus-weak-bridge graph of
the reference's Louvain test (testDisambiguator.scala:244-274) —
communities {1,2,3,4} and {5,6,7,8}."""

import pandas as pd

from careers_spark.operators.communities import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


def test_two_cliques_weak_bridge(spark):
    c1 = [(a, b) for a in "1234" for b in "1234" if a < b]
    c2 = [(a, b) for a in "5678" for b in "5678" if a < b]
    bridge = [("4", "5")]
    got = {
        r.node: r.community
        for r in label_propagation(_edges(spark, c1 + c2 + bridge)).collect()
    }
    assert len({got[n] for n in "1234"}) == 1
    assert len({got[n] for n in "5678"}) == 1
    assert got["1"] != got["8"]


def test_singleton_pair(spark):
    got = {
        r.node: r.community
        for r in label_propagation(_edges(spark, [("a", "b")])).collect()
    }
    assert got["a"] == got["b"]


def test_deterministic(spark):
    pairs = [(a, b) for a in "12345" for b in "12345" if a < b][:7]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, label_propagation(e).collect()))
    b = sorted(map(tuple, label_propagation(e).collect()))
    assert a == b
