"""Category-hierarchy operators (CategoryHierarchy.scala re-expression):
closure walk with banned hubs, multi-source shortest paths, prev-tree."""

import pandas as pd

from careers_spark.operators import hierarchy as H


def _edges(spark):
    rows = [
        ("a", "x", 1.0),
        ("b", "x", 2.0),
        ("x", "y", 1.0),
        ("b", "y", 5.0),
        ("y", "hub", 1.0),   # banned parent
        ("y", "z", 2.0),
        ("q", "z", 1.0),     # q is not reachable from seeds
        ("x", "x", 9.0),     # self-loop must be ignored
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["child", "parent", "weight"])
    )


def _seeds(spark):
    return spark.createDataFrame(pd.DataFrame({"node": ["a", "b"]}))


def _banned(spark):
    return spark.createDataFrame(pd.DataFrame({"node": ["hub"]}))


def test_category_closure(spark):
    got = {
        (r.child, r.parent)
        for r in H.category_closure(
            _edges(spark), _seeds(spark), banned=_banned(spark)
        ).collect()
    }
    # reachable upward from {a,b}, hub banned, q's edge never reached
    assert got == {("a", "x"), ("b", "x"), ("x", "y"), ("b", "y"), ("y", "z")}


def test_shortest_path_distances_and_tree(spark):
    """Hand-computed multi-source distances (dijkstraVisit semantics,
    CategoryHierarchy.scala:243-293) + prev tree (:281-286)."""
    edges, seeds, banned = _edges(spark), _seeds(spark), _banned(spark)
    dist = H.shortest_path_distances(edges, seeds, banned=banned)
    d = {r.node: r.dist for r in dist.collect()}
    # a=0, b=0, x=min(0+1, 0+2)=1, y=min(1+1, 0+5)=2, z=y+2=4
    assert d == {"a": 0.0, "b": 0.0, "x": 1.0, "y": 2.0, "z": 4.0}

    tree = {
        r.node: (r.via, r.weight)
        for r in H.shortest_path_tree(edges, dist, banned=banned).collect()
    }
    # seeds have no prev; each reached node's argmin incoming edge
    assert tree == {"x": ("a", 1.0), "y": ("x", 1.0), "z": ("y", 2.0)}


def test_scc_tarjan_golden(spark):
    """The reference's SCC golden, ported verbatim
    (testCategorisation.scala:11-55 over utility/Graph.scala): six nodes,
    components {d}, {e,f}, {a,b,c}."""
    rows = [
        ("d", "e"), ("e", "f"), ("f", "e"), ("f", "a"), ("d", "a"),
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"), ("c", "b"),
    ]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["child", "parent"]))
    scc = H.strongly_connected_components(edges)
    comps = {}
    for r in scc.collect():
        comps.setdefault(r.scc, set()).add(r.node)
    assert sorted(comps.values(), key=len) == [
        {"d"}, {"e", "f"}, {"a", "b", "c"}
    ]


def test_condense_cycles_dag_identity(spark):
    """On a DAG condensation is the identity (modulo min-weight dedup)."""
    edges = _edges(spark).filter("child != parent")
    out, scc = H.condense_cycles(edges)
    assert {(r.child, r.parent, r.weight) for r in out.collect()} == {
        (r.child, r.parent, r.weight) for r in edges.collect()
    }
    assert all(r.node == r.scc for r in scc.collect())


def test_shortest_paths_through_cycle(spark):
    """A tight weighted cycle between seed and target: condensation
    collapses it, members share the component distance, and the walk
    cannot burn relaxation rounds inside the loop."""
    rows = [
        ("s", "c1", 1.0),
        ("c1", "c2", 0.5), ("c2", "c3", 0.5), ("c3", "c1", 0.5),  # 3-cycle
        ("c2", "t", 2.0),
    ]
    edges = spark.createDataFrame(
        pd.DataFrame(rows, columns=["child", "parent", "weight"])
    )
    seeds = spark.createDataFrame(pd.DataFrame({"node": ["s"]}))
    dist = H.shortest_path_distances(
        edges, seeds, max_iters=8, collapse_cycles=True
    )
    d = {r.node: r.dist for r in dist.collect()}
    # cycle {c1,c2,c3} collapses to one node at dist 1; t = 1 + 2
    assert d == {"s": 0.0, "c1": 1.0, "c2": 1.0, "c3": 1.0, "t": 3.0}


def _tarjan_reference(edges):
    """Local iterative Tarjan (the reference's utility/Graph.scala:21-123
    algorithm) as an independent oracle for the distributed SCC."""
    adj = {}
    nodes = set()
    for u, v in edges:
        nodes.add(u)
        nodes.add(v)
        if u != v:
            adj.setdefault(u, []).append(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                sccs.append(scc)
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])

    for n in sorted(nodes):
        if n not in index:
            strongconnect(n)
    return {frozenset(s) for s in sccs}


def test_scc_random_graphs_vs_tarjan(spark):
    """Distributed SCC (trim + path-doubling + mutual-pairs CC) equals a
    local Tarjan on random digraphs — cycles, chains, self-loops, hubs."""
    import random

    for seed in range(8):
        rng = random.Random(seed)
        n = rng.randint(4, 14)
        m = rng.randint(n, 3 * n)
        edges = [
            (f"n{rng.randrange(n):02d}", f"n{rng.randrange(n):02d}")
            for _ in range(m)
        ]
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["child", "parent"])
        )
        got = {}
        for r in H.strongly_connected_components(df).collect():
            got.setdefault(r.scc, set()).add(r.node)
        got_sets = {frozenset(s) for s in got.values()}
        # contract: self-loop edges are non-edges (dropped up front), so
        # a node with ONLY a self-loop is outside the label universe
        want = _tarjan_reference([e for e in edges if e[0] != e[1]])
        # distributed result covers exactly the nodes touching an edge
        covered = {x for s in want for x in s}
        got_nodes = {x for s in got_sets for x in s}
        assert got_nodes == covered, f"seed {seed}: node cover differs"
        assert got_sets == want, f"seed {seed}: {got_sets} != {want}"
        # representative rule: min member labels the component
        for rep, members in got.items():
            assert rep == min(members)


def test_indegree_hub_guard(spark):
    """overbroadCategoryCount analogue (CategoryHierarchy.scala:17):
    parents above the in-degree cap are dropped before any walk."""
    rows = [(f"c{i}", "hub", 1.0) for i in range(5)] + [("c0", "ok", 1.0)]
    edges = spark.createDataFrame(
        pd.DataFrame(rows, columns=["child", "parent", "weight"])
    )
    seeds = spark.createDataFrame(pd.DataFrame({"node": [f"c{i}" for i in range(5)]}))
    got = {
        (r.child, r.parent)
        for r in H.category_closure(edges, seeds, max_parent_indegree=3).collect()
    }
    assert got == {("c0", "ok")}


def test_scc_raises_on_nonconvergence(spark):
    """ADVICE r3: a cycle core whose diameter exceeds the doubling
    budget must RAISE (refusing beats silently splitting the SCC). An
    8-cycle at max_doublings=1 (reach <= 4 hops after one doubling)
    cannot reach fixpoint; the same graph converges at the default
    budget into one component."""
    import pytest

    rows = [(f"n{i}", f"n{(i + 1) % 8}") for i in range(8)]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["child", "parent"]))
    with pytest.raises(RuntimeError, match="did not reach"):
        H.strongly_connected_components(edges, max_doublings=1)
    scc = H.strongly_connected_components(edges)
    assert len({r.scc for r in scc.collect()}) == 1
