"""Weisfeiler-Lehman color refinement (graph.wl_refinement)."""

import hashlib

from careers_spark.operators.graph import wl_refinement


def _wl(spark, edges, rounds=3):
    df = spark.createDataFrame(edges, "src string, dst string")
    return wl_refinement(df, rounds=rounds).collect()


def _wl_python(edges, rounds=3):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wl = {v: "0" for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            nbs = ",".join(sorted(wl[u] for u in adj[v]))
            new[v] = hashlib.md5(f"{wl[v]}|{nbs}".encode()).hexdigest()
        wl = new
    classes = {}
    for v, c in wl.items():
        classes.setdefault(c, []).append(v)
    return {
        c: (len(vs), min(vs)) for c, vs in classes.items()
    }


def test_wl_path_ends_vs_middle(spark):
    rows = _wl(spark, [("a", "b"), ("b", "c")], rounds=2)
    sizes = sorted(r.n_nodes for r in rows)
    assert sizes == [1, 2]
    mid = [r for r in rows if r.n_nodes == 1]
    assert mid[0].example_node == "b"


def test_wl_regular_graphs_stay_one_class(spark):
    # C4 is 2-regular: refinement can never split it
    c4 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    rows = _wl(spark, c4, rounds=4)
    assert len(rows) == 1 and rows[0].n_nodes == 4


def test_wl_star_two_classes(spark):
    star = [("hub", f"leaf{i}") for i in range(5)]
    rows = _wl(spark, star, rounds=3)
    by_size = {r.n_nodes: r for r in rows}
    assert set(by_size) == {1, 5}
    assert by_size[1].example_node == "hub"


def test_wl_python_lockstep_and_direction_invariance(spark):
    import random

    rng = random.Random(67)
    nodes = [f"n{i}" for i in range(12)]
    edges = set()
    while len(edges) < 20:
        a, b = rng.sample(nodes, 2)
        edges.add((a, b))
    edges = sorted(edges)
    want = _wl_python(edges)
    rows = _wl(spark, edges)
    got = {r.wl_class: (r.n_nodes, r.example_node) for r in rows}
    assert got == want
    rev = [(b, a) for a, b in edges]
    got_rev = {
        r.wl_class: (r.n_nodes, r.example_node)
        for r in _wl(spark, rev)
    }
    assert got_rev == want


def test_degree_tail_alpha_lockstep(spark):
    import math

    from careers_spark.operators.graph import degree_tail_alpha

    # star + path: hub degree 5, leaves 1, path adds degree-2 nodes
    edges = [("h", f"l{i}") for i in range(5)] + [
        ("p1", "p2"), ("p2", "p3"), ("p3", "p4")
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    (r,) = degree_tail_alpha(df, dmin=2).collect()
    degs = {"h": 5, "p2": 2, "p3": 2}
    want_sum = sum(round(math.log(d / 1.5), 6) for d in degs.values())
    assert r.n_tail == 3
    assert abs(r.sum_ln - round(want_sum, 6)) < 2e-6
    assert r.alpha == round(1 + 3 / want_sum, 6)


def test_degree_tail_alpha_empty_tail_null(spark):
    from careers_spark.operators.graph import degree_tail_alpha

    df = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "src string, dst string"
    )
    (r,) = degree_tail_alpha(df, dmin=2).collect()
    assert r.n_tail == 0 and r.alpha is None
