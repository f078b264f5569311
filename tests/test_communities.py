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


def test_modularity_two_cliques_golden(spark):
    """Hand-computed Newman modularity on the reference's two-clique
    Louvain test graph (testDisambiguator.scala:244-274). Unweighted:
    13 edges -> m2 = 26. Degrees: clique-only nodes 3, bridge endpoints
    4. Per clique: in_c = 6 intra edges x 2 directions = 12,
    tot_c = 3+3+3+4 = 13, Q_c = 12/26 - (13/26)^2 = 0.211538."""
    from careers_spark.operators.communities import modularity

    c1 = [(a, b) for a in "1234" for b in "1234" if a < b]
    c2 = [(a, b) for a in "5678" for b in "5678" if a < b]
    edges = _edges(spark, c1 + c2 + [("4", "5")])
    labels = spark.createDataFrame(
        pd.DataFrame(
            {"node": list("12345678"), "community": ["A"] * 4 + ["B"] * 4}
        )
    )
    rows = {r.community: r for r in modularity(edges, labels).collect()}
    for c in "AB":
        assert rows[c].in_w == 12.0
        assert rows[c].tot_w == 13.0
        assert abs(rows[c].q_contrib - 0.211538) < 1e-6
    # the clique partition is the Louvain optimum: Q = 0.423077
    assert abs(sum(r.q_contrib for r in rows.values()) - 0.423077) < 1e-5


def test_louvain_refine_corrects_misassignment(spark):
    """Louvain phase-1 moves (modularity ascent) pull a node assigned to
    the wrong clique back home, and modularity strictly increases."""
    from careers_spark.operators.communities import louvain_refine, modularity

    c1 = [(a, b) for a in "1234" for b in "1234" if a < b]
    c2 = [(a, b) for a in "5678" for b in "5678" if a < b]
    edges = _edges(spark, c1 + c2 + [("4", "5")])
    # node 2 misassigned to B
    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "node": list("12345678"),
                "community": ["A", "B", "A", "A", "B", "B", "B", "B"],
            }
        )
    )
    q_before = sum(
        r.q_contrib for r in modularity(edges, bad).collect()
    )
    fixed = {
        r.node: r.community
        for r in louvain_refine(edges, bad, rounds=6).collect()
    }
    assert len({fixed[n] for n in "1234"}) == 1
    assert len({fixed[n] for n in "5678"}) == 1
    assert fixed["1"] != fixed["8"]
    relabeled = spark.createDataFrame(
        pd.DataFrame(
            {"node": list(fixed), "community": [fixed[n] for n in fixed]}
        )
    )
    q_after = sum(
        r.q_contrib for r in modularity(edges, relabeled).collect()
    )
    assert q_after > q_before
    assert abs(q_after - 0.423077) < 1e-5  # reaches the clique optimum


def test_louvain_refine_stable_at_optimum(spark):
    """The optimal clique partition is a fixpoint of the move rule."""
    from careers_spark.operators.communities import louvain_refine

    c1 = [(a, b) for a in "1234" for b in "1234" if a < b]
    c2 = [(a, b) for a in "5678" for b in "5678" if a < b]
    edges = _edges(spark, c1 + c2 + [("4", "5")])
    opt = spark.createDataFrame(
        pd.DataFrame(
            {"node": list("12345678"), "community": ["A"] * 4 + ["B"] * 4}
        )
    )
    got = {
        r.node: r.community
        for r in louvain_refine(edges, opt, rounds=4).collect()
    }
    assert all(got[n] == "A" for n in "1234")
    assert all(got[n] == "B" for n in "5678")


def test_louvain_two_level_clique_of_cliques(spark):
    """Full Louvain loop: phase 1 finds the four 4-cliques from
    singletons; phase 2 contracts them and merges the strongly-bridged
    clique pairs (A-B and C-D, 2 bridges each) while the single A-C
    bridge stays inter-community -> two 8-node communities."""
    from careers_spark.operators.communities import louvain

    def clique(lo):
        ns = [f"n{i:02d}" for i in range(lo, lo + 4)]
        return [(a, b) for a in ns for b in ns if a < b]

    edges = (
        clique(1) + clique(5) + clique(9) + clique(13)
        + [("n04", "n05"), ("n03", "n06")]   # A-B double bridge
        + [("n12", "n13"), ("n11", "n14")]   # C-D double bridge
        + [("n01", "n09")]                   # single A-C bridge
    )
    got = {
        r.node: r.community
        for r in louvain(_edges(spark, edges), levels=2).collect()
    }
    ab = {got[f"n{i:02d}"] for i in range(1, 9)}
    cd = {got[f"n{i:02d}"] for i in range(9, 17)}
    assert len(ab) == 1 and len(cd) == 1 and ab != cd
