"""SimRank (graph.simrank): path-graph hand values, bipartite-parity
zeros, and a python lockstep of the identical rounded recurrence on a
seeded random graph."""

import random

import pytest

from careers_spark.operators.graph import simrank


def _py_simrank(edges, iterations=5, c=0.8, precision=10):
    """Independent dict unroll of the identical recurrence: s(x,x)=1,
    per-iteration round to `precision`, zeros dropped (they contribute
    0 either way)."""
    nbr = {}
    for u, v in edges:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    nodes = sorted(nbr)
    sim = {}  # (lo, hi) -> s, lo < hi
    for _ in range(iterations):
        nxt = {}
        for ai in range(len(nodes)):
            for bi in range(ai + 1, len(nodes)):
                a, b = nodes[ai], nodes[bi]
                sv = 0.0
                for i in sorted(nbr[a]):
                    for j in sorted(nbr[b]):
                        if i == j:
                            sv += 1.0
                        else:
                            sv += sim.get((min(i, j), max(i, j)), 0.0)
                s = round(c * sv / (len(nbr[a]) * len(nbr[b])), precision)
                if s > 0:
                    nxt[(a, b)] = s
        sim = nxt
    return sim


def test_path_graph_hand_values(spark):
    # a - c - b : N(a)=N(b)={c} so s(a,b)=0.8 exactly every iteration;
    # (a,c)/(b,c) stay 0 by bipartite parity (their neighbor pairs are
    # always cross-side).
    e = spark.createDataFrame([("a", "c"), ("b", "c")], "src string, dst string")
    got = {(r["src"], r["dst"]): r["simrank"] for r in simrank(e).collect()}
    assert got == {("a", "b"): 0.8}


def test_square_symmetry(spark):
    # C4 a-b-c-d-a: opposite corners (a,c) and (b,d) have identical
    # neighborhoods -> equal top scores; adjacent pairs stay 0 (parity).
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
        "src string, dst string",
    )
    got = {(r["src"], r["dst"]): r["simrank"] for r in simrank(e).collect()}
    assert set(got) == {("a", "c"), ("b", "d")}
    assert got[("a", "c")] == got[("b", "d")] > 0


@pytest.mark.parametrize("seed", [7, 23])
def test_python_lockstep_random_graph(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(10))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(25)
            )
            if a != b
        }
    )
    e = spark.createDataFrame(edges, "src int, dst int")
    got = {(r["src"], r["dst"]): r["simrank"] for r in simrank(e).collect()}
    want = _py_simrank(edges)
    assert got == pytest.approx(want, abs=2e-10)
