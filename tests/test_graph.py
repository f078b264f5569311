"""PageRank + triangle-count operators (graph.py).

PageRank is pinned against an independent pure-python unroll of the
identical recurrence (dangling redistribution included), and triangles
against hand-countable shapes (K4, pendant, path).
"""

import pytest
from pyspark.sql import functions as F

from careers_spark.operators.graph import pagerank, triangle_stats


@pytest.fixture(scope="module")
def diamond(spark):
    # 1 -> {2,3}, 2 -> 3, 3 -> 1, 4 -> 3 ; node 2? has out; 4 is a source,
    # and there is NO sink-free guarantee: add 5 as a pure sink (dangling)
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)],
        "src int, dst int",
    )


def _python_pagerank(edges, iterations=6, d=0.85, precision=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {n: 0 for n in nodes}
    for u, _ in edges:
        out[u] += 1
    n = len(nodes)
    pr = {x: 1.0 / n for x in nodes}
    for _ in range(iterations):
        dang = sum(pr[x] for x in nodes if out[x] == 0)
        inflow = {x: 0.0 for x in nodes}
        for u, v in edges:
            inflow[v] += pr[u] / out[u]
        pr = {
            x: round((1.0 - d) / n + d * (inflow[x] + dang / n), precision)
            for x in nodes
        }
    return pr


def test_pagerank_matches_python_unroll(spark, diamond):
    edges = [(r.src, r.dst) for r in diamond.collect()]
    want = _python_pagerank(edges)
    got = {r.node: r.pr for r in pagerank(diamond).collect()}
    assert got == want


def test_pagerank_dangling_mass_conserved(spark, diamond):
    """With dangling redistribution the ranks stay a probability
    distribution (sum == 1 up to rounding residue)."""
    got = pagerank(diamond, iterations=8).collect()
    assert abs(sum(r.pr for r in got) - 1.0) < 1e-8


def test_pagerank_symmetric_cycle_is_uniform(spark):
    """On a directed cycle every node has the same rank at every
    iteration -> exactly 1/N each."""
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    got = {r.node: r.pr for r in pagerank(cyc, iterations=5).collect()}
    assert set(got.values()) == {0.25}


def test_triangles_k4_plus_pendant(spark):
    """K4: every node in 3 triangles, coeff 1.0; a pendant attached to
    node 4 raises its degree to 4 -> coeff 2*3/(4*3) = 0.5."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src int, dst int",
    )
    got = {r.node: (r.degree, r.triangles, r.coeff)
           for r in triangle_stats(e).collect()}
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (3, 3, 1.0)
    assert got[4] == (4, 3, 0.5)
    assert got[5] == (1, 0, 0.0)


def test_triangles_path_has_none(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    got = triangle_stats(e).collect()
    assert all(r.triangles == 0 and r.coeff == 0.0 for r in got)


def test_triangles_direction_and_dup_invariant(spark):
    """Reversed / duplicated directed edges collapse to the same simple
    undirected graph -> identical counts."""
    a = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src int, dst int"
    )
    b = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 1), (1, 2), (1, 3)], "src int, dst int"
    )
    ga = sorted(map(tuple, triangle_stats(a).collect()))
    gb = sorted(map(tuple, triangle_stats(b).collect()))
    assert ga == gb and ga[0][2] == 1


# ---- k-core ---------------------------------------------------------------
def test_kcore_peels_tail_cascade(spark):
    """K4 with a 3-node tail hanging off node 4: at k=2 the tail peels
    one node per round (7->6->5->4, a real cascade), leaving exactly
    the K4 with within-core degree 3."""
    from careers_spark.operators.graph import kcore

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (6, 7)],
        "src int, dst int",
    )
    got = {r.node: r.degree for r in kcore(e, k=2).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_above_max_degree_is_empty(spark):
    from careers_spark.operators.graph import kcore

    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src int, dst int")
    assert kcore(e, k=3).count() == 0


def test_kcore_whole_graph_when_already_core(spark):
    """A clique at k <= n-1 survives intact with original degrees."""
    from careers_spark.operators.graph import kcore

    edges = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    e = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.degree for r in kcore(e, k=4).collect()}
    assert got == {i: 4 for i in range(1, 6)}


def test_kcore_raises_without_fixpoint_budget(spark):
    """max_iter smaller than the cascade depth must raise loudly, never
    return an under-peeled superset."""
    import pytest as _pytest

    from careers_spark.operators.graph import kcore

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (6, 7)],
        "src int, dst int",
    )
    with _pytest.raises(RuntimeError, match="fixpoint"):
        kcore(e, k=2, max_iter=1)


# ---- seeded randomized cross-checks (Spark vs independent python) ---------
def _rand_graph(seed, n=14, density=4):
    """Deterministic pseudo-random edge list (no RNG at test time —
    md5-derived, so failures reproduce byte-identically)."""
    import hashlib

    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
            if int(h[:4], 16) % 10 < density:
                edges.append((i, j))
    return edges


def _python_kcore(edges, k):
    nodes = {u for e in edges for u in e}
    alive = set(nodes)
    while True:
        deg = {x: 0 for x in alive}
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] += 1
                deg[v] += 1
        nxt = {x for x in alive if deg[x] >= k}
        if nxt == alive:
            return {x: deg[x] for x in alive}
        alive = nxt


def _python_triangles(edges):
    nodes = {u for e in edges for u in e}
    adj = {x: set() for x in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = {x: 0 for x in nodes}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            # each triangle is visited once per its 3 edges, and every
            # visit credits all 3 corners -> each node +3 per triangle
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    return {x: t // 3 for x, t in tri.items()}


def test_kcore_matches_python_on_random_graphs(spark):
    from careers_spark.operators.graph import kcore

    for seed in (0, 1, 2):
        edges = _rand_graph(seed)
        df = spark.createDataFrame(edges, "src int, dst int")
        for k in (2, 3):
            want = _python_kcore(edges, k)
            got = {r.node: r.degree for r in kcore(df, k=k).collect()}
            assert got == want, (seed, k)


def test_triangles_match_python_on_random_graphs(spark):
    from careers_spark.operators.graph import triangle_stats

    for seed in (0, 1, 2):
        edges = _rand_graph(seed)
        df = spark.createDataFrame(edges, "src int, dst int")
        want = _python_triangles(edges)
        got = {r.node: r.triangles for r in triangle_stats(df).collect()}
        assert got == want, seed


def test_pagerank_matches_python_on_random_digraphs(spark):
    from careers_spark.operators.graph import pagerank

    for seed in (3, 4):
        # directed: keep the canonical pairs as-is (sources/sinks arise
        # naturally, exercising the dangling term)
        edges = _rand_graph(seed, n=12, density=3)
        df = spark.createDataFrame(edges, "src int, dst int")
        want = _python_pagerank(edges)
        got = {r.node: r.pr for r in pagerank(df).collect()}
        assert got == want, seed


def _python_pagerank_weighted(edges, iterations=6, d=0.85, precision=10):
    """edges: (u, v, w) triples."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    outw = {n: 0.0 for n in nodes}
    for u, _, w in edges:
        outw[u] += w
    n = len(nodes)
    pr = {x: 1.0 / n for x in nodes}
    for _ in range(iterations):
        dang = sum(pr[x] for x in nodes if outw[x] == 0)
        inflow = {x: 0.0 for x in nodes}
        for u, v, w in edges:
            inflow[v] += pr[u] * w / outw[u]
        pr = {
            x: round((1.0 - d) / n + d * (inflow[x] + dang / n), precision)
            for x in nodes
        }
    return pr


def test_weighted_pagerank_matches_python(spark):
    from careers_spark.operators.graph import pagerank

    edges = [(1, 2, 3), (1, 3, 1), (2, 3, 5), (3, 1, 2), (4, 3, 7)]
    df = spark.createDataFrame(edges, "src int, dst int, n_obs int")
    want = _python_pagerank_weighted(edges)
    got = {r.node: r.pr for r in pagerank(df, weight="n_obs").collect()}
    assert got == want


def test_weighted_pagerank_uniform_weights_equals_unweighted(spark):
    """Constant weights cancel (w/outw == 1/outdeg) -> identical ranks."""
    from careers_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src int, dst int").withColumn(
        "n_obs", F.lit(7)
    )
    a = {r.node: r.pr for r in pagerank(df, weight="n_obs").collect()}
    b = {r.node: r.pr for r in pagerank(df).collect()}
    assert a == b


def test_weighted_pagerank_heavy_edge_dominates(spark):
    """Two targets from one source; the heavier edge's target must rank
    strictly higher."""
    from careers_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (2, 1, 1), (3, 1, 1)],
        "src int, dst int, n_obs int",
    )
    got = {r.node: r.pr for r in pagerank(df, weight="n_obs").collect()}
    assert got[2] > got[3]


# ---- single-source shortest paths (Bellman-Ford) --------------------------
def test_sssp_relaxation_beats_direct_edge(spark):
    """The defining Bellman-Ford case: a 2-hop path (1+2=3) undercuts
    the direct weight-10 edge, and the relaxation must propagate it."""
    from careers_spark.operators.graph import sssp

    e = spark.createDataFrame(
        [("s", "b", 10), ("s", "a", 1), ("a", "b", 2), ("b", "c", 1)],
        "src string, dst string, w long",
    )
    got = {r.node: r.dist for r in sssp(e, "s", weight="w").collect()}
    assert got == {"s": 0, "a": 1, "b": 3, "c": 4}


def test_sssp_unreachable_absent_and_undirected(spark):
    from careers_spark.operators.graph import sssp

    e = spark.createDataFrame(
        [("a", "s", 5), ("x", "y", 1)],  # edge INTO s still works (undirected)
        "src string, dst string, w long",
    )
    got = {r.node: r.dist for r in sssp(e, "s", weight="w").collect()}
    assert got == {"s": 0, "a": 5}  # x, y unreachable -> absent


def test_sssp_hops_match_python_bfs_on_random_graphs(spark):
    import random as _r
    from collections import deque

    from careers_spark.operators.graph import sssp

    rng = _r.Random(7)
    for trial in range(3):
        n = 14
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(30)}
        edges = [(a, b) for a, b in edges if a != b]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.dist for r in sssp(e, 0).collect()}
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want, q = {0: 0}, deque([0])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in want:
                    want[v] = want[u] + 1
                    q.append(v)
        assert got == want, trial


def test_sssp_raises_without_fixpoint_budget(spark):
    from careers_spark.operators.graph import sssp

    # a 6-node line needs 5 relaxation rounds + 1 quiet round to prove
    # the fixpoint; max_iter=3 must raise, never return partial dists
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        sssp(e, 0, max_iter=3)


def _python_assortativity(edges):
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(edges)
    s1 = sum(deg[u] * deg[v] for u, v in edges)
    s2 = sum(deg[u] + deg[v] for u, v in edges)
    s3 = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in edges)
    num = 4e0 * float(m) * float(s1) - float(s2) * float(s2)
    den = 2e0 * float(m) * float(s3) - float(s2) * float(s2)
    return None if den == 0e0 else round(num / den, 9)


def test_assortativity_star_is_minus_one(spark):
    from careers_spark.operators.graph import assortativity

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    row = assortativity(e).collect()[0]
    # star: every edge pairs a hub (deg 3) with a leaf (deg 1) -> r = -1
    assert row.n_edges == 3 and row.s_jk == 9
    assert row.s_j_plus_k == 12 and row.s_sq == 30
    assert row.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark):
    from careers_spark.operators.graph import assortativity

    # C4 cycle: every degree 2 -> zero variance -> NULL, never 0/0
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    assert assortativity(e).collect()[0].assortativity is None


def test_assortativity_matches_python_on_random_graphs(spark):
    from careers_spark.operators.graph import assortativity

    import random

    rng = random.Random(7)
    for trial in range(4):
        edges = sorted(
            {
                (a, b)
                for a, b in (
                    sorted(rng.sample(range(12), 2)) for _ in range(25)
                )
            }
        )
        e = spark.createDataFrame(edges, "src long, dst long")
        got = assortativity(e).collect()[0].assortativity
        assert got == _python_assortativity(edges), trial


def _python_closeness(edges):
    from collections import deque

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for s in adj:
        d = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in d:
                    d[y] = d[x] + 1
                    q.append(y)
        sum_d = sum(d.values())
        hfp = sum(1000000000 // v for v in d.values() if v > 0)
        out[s] = (
            len(d),
            sum_d,
            round(hfp / 1e9, 6),
            None if sum_d == 0 else round((len(d) - 1) / sum_d, 9),
        )
    return out


def test_closeness_path_golden(spark):
    from careers_spark.operators.graph import closeness_centrality

    # path 1-2-3: center reaches both at d=1 (closeness 1.0, harmonic
    # 2.0); ends reach at 1+2 (closeness 2/3, harmonic 1.5)
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r.node: (r.n_reach, r.sum_d, r.harmonic, r.closeness)
        for r in closeness_centrality(e).collect()
    }
    assert got[2] == (3, 2, 2.0, 1.0)
    assert got[1] == (3, 3, 1.5, round(2 / 3, 9))
    assert got[3] == got[1]


def test_closeness_disconnected_components(spark):
    from careers_spark.operators.graph import closeness_centrality

    # two disjoint edges: each node reaches only its partner
    e = spark.createDataFrame([(1, 2), (7, 8)], "src long, dst long")
    got = {
        r.node: (r.n_reach, r.sum_d, r.closeness)
        for r in closeness_centrality(e).collect()
    }
    assert all(v == (2, 1, 1.0) for v in got.values()) and len(got) == 4


def test_closeness_matches_python_on_random_graphs(spark):
    from careers_spark.operators.graph import closeness_centrality

    import random

    rng = random.Random(11)
    for trial in range(3):
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(10), 2)))
                for _ in range(14)
            }
        )
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: (r.n_reach, r.sum_d, r.harmonic, r.closeness)
            for r in closeness_centrality(e).collect()
        }
        assert got == _python_closeness(edges), trial


def test_closeness_raises_without_fixpoint_budget(spark):
    from careers_spark.operators.graph import closeness_centrality

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        closeness_centrality(e, max_iter=3)


def _py_deepwalk(edges, n_walks, walk_len, salt):
    import hashlib

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    adj = {u: sorted(vs) for u, vs in adj.items()}
    rows = set()
    for start in adj:
        for j in range(n_walks):
            cur = start
            rows.add((start, j, 0, cur))
            for t in range(1, walk_len + 1):
                key = f"{start}|{j}|{t}|{salt}"
                h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                cur = adj[cur][h % len(adj[cur])]
                rows.add((start, j, t, cur))
    return rows


def test_deepwalk_matches_python_lockstep(spark):
    from careers_spark.operators.graph import deepwalk_corpus

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.start, r.j, r.step, r.node)
        for r in deepwalk_corpus(e, n_walks=2, walk_len=5).collect()
    }
    assert got == _py_deepwalk(edges, 2, 5, "walk")


def test_deepwalk_steps_are_edges_and_shape(spark):
    from careers_spark.operators.graph import deepwalk_corpus

    import random

    rng = random.Random(13)
    edges = sorted(
        {tuple(sorted(rng.sample(range(9), 2))) for _ in range(14)}
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = deepwalk_corpus(e, n_walks=3, walk_len=4).collect()
    und = {frozenset(p) for p in edges}
    nodes = {x for p in edges for x in p}
    # shape: every (reachable) node starts n_walks walks of walk_len+1
    assert len(rows) == len(nodes) * 3 * 5
    # every consecutive step is a real edge
    walks = {}
    for r in rows:
        walks.setdefault((r.start, r.j), {})[r.step] = r.node
    for (start, _), path in walks.items():
        assert path[0] == start
        for t in range(1, 5):
            assert frozenset((path[t - 1], path[t])) in und, (start, path)


def test_deepwalk_salt_reseeds(spark):
    from careers_spark.operators.graph import deepwalk_corpus

    edges = [(i, i + 1) for i in range(8)] + [(0, 8)]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = {
        (r.start, r.j, r.step, r.node)
        for r in deepwalk_corpus(e, salt="a").collect()
    }
    b = {
        (r.start, r.j, r.step, r.node)
        for r in deepwalk_corpus(e, salt="b").collect()
    }
    a2 = {
        (r.start, r.j, r.step, r.node)
        for r in deepwalk_corpus(e, salt="a").collect()
    }
    assert a == a2 and a != b


def test_skipgram_pairs_hand_golden(spark):
    from careers_spark.operators.graph import skipgram_pairs

    # one walk a-b-c-d, window 1: adjacent pairs only, both directions
    rows = [(9, 0, t, n) for t, n in enumerate(["a", "b", "c", "d"])]
    w = spark.createDataFrame(rows, "start long, j int, step int, node string")
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(w, window=1).collect()
    }
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1, ("c", "b"): 1,
        ("c", "d"): 1, ("d", "c"): 1,
    }


def test_skipgram_pairs_window_and_boundaries(spark):
    from careers_spark.operators.graph import skipgram_pairs

    # window 2 over a-b-c: ends see 2 contexts, middle sees 2; a repeat
    # node accumulates counts rather than deduping
    rows = [(1, 0, 0, "a"), (1, 0, 1, "b"), (1, 0, 2, "a")]
    w = spark.createDataFrame(rows, "start long, j int, step int, node string")
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(w, window=2).collect()
    }
    # center a (step0): contexts b, a(step2); center b: a, a; center
    # a (step2): b, a(step0)
    assert got == {("a", "b"): 2, ("a", "a"): 2, ("b", "a"): 2}


def test_skipgram_matches_python_on_walk_corpus(spark):
    from careers_spark.operators.graph import deepwalk_corpus, skipgram_pairs

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 5), (4, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    walks = deepwalk_corpus(e, n_walks=2, walk_len=4)
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(walks, window=2).collect()
    }
    paths = {}
    for r in walks.collect():
        paths.setdefault((r.start, r.j), {})[r.step] = r.node
    want = {}
    for path in paths.values():
        for t, c in path.items():
            for o in (-2, -1, 1, 2):
                if t + o in path:
                    k = (c, path[t + o])
                    want[k] = want.get(k, 0) + 1
    assert got == want


def _py_betweenness(edges, scale=1_000_000_000):
    """Fixed-point Brandes replicating the operator's integer
    arithmetic exactly (BFS sigma, level-inward delta, floor div)."""
    from collections import deque

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    bc = {n: 0 for n in adj}
    for s in adj:
        d = {s: 0}
        sigma = {s: 1}
        q = deque([s])
        order = [s]
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in d:
                    d[y] = d[x] + 1
                    q.append(y)
                    order.append(y)
        for y in order:
            if y == s:
                continue
            sigma[y] = sum(
                sigma[p] for p in adj[y] if d.get(p) == d[y] - 1
            )
        dfp = {n: 0 for n in d}
        for n in sorted(d, key=lambda x: -d[x]):
            dfp[n] = sum(
                sigma[n] * (scale + dfp[w]) // sigma[w]
                for w in adj[n]
                if d.get(w) == d[n] + 1
            )
        for n, v in dfp.items():
            if n != s:
                bc[n] += v
    return {
        n: (v, round(v / (2 * scale), 6)) for n, v in bc.items()
    }


def test_betweenness_path_and_star(spark):
    from careers_spark.operators.graph import betweenness_centrality

    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r.node: r.betweenness for r in betweenness_centrality(path).collect()
    }
    assert got == {1: 0.0, 2: 1.0, 3: 0.0}

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    got = {
        r.node: r.betweenness for r in betweenness_centrality(star).collect()
    }
    assert got == {0: 3.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_betweenness_complete_graph_is_zero(spark):
    from careers_spark.operators.graph import betweenness_centrality

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long",
    )
    got = {
        r.node: r.betweenness for r in betweenness_centrality(k4).collect()
    }
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_betweenness_matches_python_on_random_graphs(spark):
    from careers_spark.operators.graph import betweenness_centrality

    import random

    rng = random.Random(17)
    for trial in range(3):
        edges = sorted(
            {tuple(sorted(rng.sample(range(9), 2))) for _ in range(12)}
        )
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: (r.bc_fp, r.betweenness)
            for r in betweenness_centrality(e).collect()
        }
        assert got == _py_betweenness(edges), trial


def test_betweenness_diamond_split_paths(spark):
    from careers_spark.operators.graph import betweenness_centrality

    # 1-2, 1-3, 2-4, 3-4: two equal shortest paths 1->4 split the
    # dependency — bc(2) = bc(3) = 0.5 each (sigma division exercised)
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    got = {
        r.node: r.betweenness for r in betweenness_centrality(e).collect()
    }
    assert got == {1: 0.5, 2: 0.5, 3: 0.5, 4: 0.5}


def _py_ktruss(edges, k):
    cur = {tuple(sorted(e)) for e in edges}
    while True:
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in cur
        }
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return {e: sup[e] for e in cur}
        cur = nxt


def test_ktruss_k4_peels_to_clique(spark):
    from careers_spark.operators.graph import ktruss

    # K4 plus a pendant triangle: the 4-truss is exactly the K4 (every
    # K4 edge closes 2 triangles; the pendant triangle's edges close 1)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 10), (3, 11), (10, 11)]
    e = spark.createDataFrame(k4 + extra, "src long, dst long")
    got = {(r.src, r.dst): r.support for r in ktruss(e, k=4).collect()}
    assert got == {e: 2 for e in k4}


def test_ktruss_cascade_after_removal(spark):
    from careers_spark.operators.graph import ktruss

    # two triangles sharing edge (1,2): each edge of either triangle
    # closes 1 triangle except the shared one (closes 2). 4-truss needs
    # support >= 2: after the outer edges fall, the shared edge's
    # support collapses too -> empty (the multi-round cascade)
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "src long, dst long"
    )
    assert ktruss(e, k=4).count() == 0
    # while the 3-truss keeps everything (support >= 1)
    got = {(r.src, r.dst) for r in ktruss(e, k=3).collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}


def test_ktruss_matches_python_on_random_graphs(spark):
    from careers_spark.operators.graph import ktruss

    import random

    rng = random.Random(29)
    for trial, k in [(0, 3), (1, 4), (2, 4)]:
        edges = sorted(
            {tuple(sorted(rng.sample(range(10), 2))) for _ in range(24)}
        )
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {(r.src, r.dst): r.support for r in ktruss(e, k=k).collect()}
        assert got == _py_ktruss(edges, k), (trial, k)


def test_ktruss_raises_without_budget(spark):
    from careers_spark.operators.graph import ktruss

    e = spark.createDataFrame(
        [(a, b) for a in range(5) for b in range(a + 1, 5)],
        "src long, dst long",
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        ktruss(e, k=4, max_iter=1)


def _kruskal(edges, maximize=False):
    """Reference MSF under the same (w, a, b) total order."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    sel = []
    order = sorted(
        ((-w if maximize else w), a, b) for a, b, w in edges
    )
    for k, a, b in order:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            sel.append((a, b, -k if maximize else k))
    return sorted(sel)


def test_boruvka_matches_kruskal_hand_graph(spark):
    from careers_spark.operators.graph import boruvka_msf

    rows = [
        ("a", "b", 1), ("b", "c", 2), ("c", "d", 3), ("a", "d", 4),
        ("a", "c", 5), ("x", "y", 7),
    ]
    df = spark.createDataFrame(rows, "src string, dst string, w long")
    got = sorted(
        (r.a, r.b, r.wgt) for r in boruvka_msf(df).collect()
    )
    assert got == _kruskal(rows)
    # forest: n_edges = n_nodes - n_components = 6 - 2
    assert len(got) == 4


def test_boruvka_randomized_vs_kruskal_and_max_variant(spark):
    """Seeded random multigraph-ish input (duplicate pairs dropped to
    the canonical first) — exact equality with the union-find
    recompute under both orientations; weight ties broken by (a, b)."""
    import random

    from careers_spark.operators.graph import boruvka_msf

    rng = random.Random(13)
    nodes = [f"n{i:02d}" for i in range(24)]
    seen = set()
    rows = []
    for _ in range(120):
        a, b = rng.sample(nodes, 2)
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        rows.append((a, b, rng.randrange(1, 8)))  # heavy weight ties
    df = spark.createDataFrame(rows, "src string, dst string, w long")
    got_min = sorted(
        (r.a, r.b, r.wgt) for r in boruvka_msf(df).collect()
    )
    assert got_min == _kruskal(rows)
    got_max = sorted(
        (r.a, r.b, r.wgt)
        for r in boruvka_msf(df, maximize=True).collect()
    )
    assert got_max == _kruskal(rows, maximize=True)
    assert sum(w for *_, w in got_max) > sum(w for *_, w in got_min)


def test_boruvka_round_budget_raises(spark):
    """On the square a-b(1) b-c(5) c-d(2) d-a(6), round 1 merges only
    the two cheap pairs ({a,b} and {c,d}) — finishing needs round 2,
    so max_rounds=1 must raise, never return a partial forest."""
    import pytest

    from careers_spark.operators.graph import boruvka_msf

    rows = [("a", "b", 1), ("b", "c", 5), ("c", "d", 2), ("d", "a", 6)]
    df = spark.createDataFrame(rows, "src string, dst string, w long")
    with pytest.raises(RuntimeError, match="rounds exhausted"):
        boruvka_msf(df, max_rounds=1)
    got = sorted((r.a, r.b, r.wgt) for r in boruvka_msf(df).collect())
    assert got == _kruskal(rows)


def test_linkpred_holdout_auc_planted_structure(spark):
    """Two dense clusters: held-out intra-cluster edges share many
    train neighbors while cross-cluster non-edges share few -> AUC
    well above chance; and no test edge ever reaches the scorer's
    train graph (leakage-impossible by construction)."""
    from careers_spark.operators.graph import (
        link_prediction_holdout_auc,
    )

    rows = []
    for base in ("a", "b"):
        mem = [f"{base}{i}" for i in range(8)]
        for i in range(8):
            for j in range(i + 1, 8):
                rows.append((mem[i], mem[j]))
    rows.append(("a0", "b0"))  # one bridge
    df = spark.createDataFrame(rows, "src string, dst string")
    (r,) = link_prediction_holdout_auc(
        df, holdout_mod=4, salt="t1"
    ).collect()
    assert r.n_train_edges + r.n_test_edges == len(rows)
    assert r.n_test_edges > 0 and r.npos > 0 and r.nneg > 0
    assert r.auc is not None and r.auc > 0.75


def test_linkpred_holdout_split_is_stable(spark):
    """Edge membership is a pure function of pair identity + salt:
    adding edges never migrates existing ones across the split."""
    from careers_spark.operators.graph import (
        link_prediction_holdout_auc,
    )

    base = [(f"n{i}", f"n{j}") for i in range(6) for j in range(i + 1, 6)]
    df1 = spark.createDataFrame(base, "src string, dst string")
    df2 = spark.createDataFrame(
        base + [("n0", "z9"), ("z9", "n5")], "src string, dst string"
    )
    (r1,) = link_prediction_holdout_auc(df1, salt="s").collect()
    (r2,) = link_prediction_holdout_auc(df2, salt="s").collect()
    # the original 15 edges keep their assignments: test count can only
    # grow by the new edges' own draws
    assert r2.n_test_edges >= r1.n_test_edges
    assert (r2.n_train_edges + r2.n_test_edges) - (
        r1.n_train_edges + r1.n_test_edges
    ) == 2


def _ic_reference(edges, seeds, p_mille, n_samples, rounds, salt):
    """Pure-python live-edge IC: md5 coin per (direction, sample),
    then BFS with bounded hops."""
    import hashlib
    from collections import deque

    bidir = set()
    for a, b in edges:
        bidir.add((a, b))
        bidir.add((b, a))
    out = {}
    for s in range(n_samples):
        live = {}
        for u, v in bidir:
            key = f"{u}|{v}|{s}|{salt}".encode()
            h = int(hashlib.md5(key).hexdigest()[:8], 16)
            if h % 1000 < p_mille:
                live.setdefault(u, []).append(v)
        hop = {n: 0 for n in seeds}
        dq = deque(seeds)
        while dq:
            u = dq.popleft()
            if hop[u] >= rounds:
                continue
            for v in live.get(u, []):
                if v not in hop:
                    hop[v] = hop[u] + 1
                    dq.append(v)
        for n, h in hop.items():
            out[(s, n)] = h
    return out


def test_ic_spread_python_lockstep(spark):
    """Seeded random graph: every (sample, node, hop) row equals the
    python md5 + bounded-BFS recompute."""
    from careers_spark.operators.graph import ic_influence_spread
    import random

    rng = random.Random(41)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(60)
        }
    )
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([(nodes[0],), (nodes[5],)], "node string")
    got = {
        (r.sample, r.node): r.hop
        for r in ic_influence_spread(
            e, seeds, p_mille=400, n_samples=4, rounds=3, salt="t1"
        ).collect()
    }
    want = _ic_reference(
        edges, [nodes[0], nodes[5]], 400, 4, 3, "t1"
    )
    assert got == want


def test_ic_spread_p1000_equals_bfs_distance(spark):
    """p = 1000 permille makes every edge live: hop == plain BFS
    distance from the seed set, truncated at the round bound."""
    from careers_spark.operators.graph import ic_influence_spread

    # path a-b-c-d-e-f: seed a, rounds=3 reaches only through d
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    e = spark.createDataFrame(path, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        (r.sample, r.node): r.hop
        for r in ic_influence_spread(
            e, seeds, p_mille=1000, n_samples=2, rounds=3, salt="t2"
        ).collect()
    }
    for s in (0, 1):
        assert got[(s, "a")] == 0
        assert got[(s, "b")] == 1
        assert got[(s, "c")] == 2
        assert got[(s, "d")] == 3
        assert (s, "e") not in got  # beyond the round bound
        assert (s, "f") not in got


def test_ic_spread_salt_reseeds(spark):
    """p = 0 activates nothing beyond the seeds; changing the salt
    changes which edges are live at intermediate p."""
    from careers_spark.operators.graph import ic_influence_spread

    edges = [(f"a{i}", f"b{i}") for i in range(40)]
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame(
        [(f"a{i}",) for i in range(40)], "node string"
    )
    zero = ic_influence_spread(
        e, seeds, p_mille=0, n_samples=1, rounds=2, salt="s0"
    )
    assert zero.filter("hop > 0").count() == 0
    r1 = {
        (r.sample, r.node, r.hop)
        for r in ic_influence_spread(
            e, seeds, p_mille=500, n_samples=1, rounds=1, salt="sA"
        ).collect()
    }
    r2 = {
        (r.sample, r.node, r.hop)
        for r in ic_influence_spread(
            e, seeds, p_mille=500, n_samples=1, rounds=1, salt="sB"
        ).collect()
    }
    assert r1 != r2


def test_butterflies_hand_golden(spark):
    """Three docs sharing {a,b} -> C(3,2)=3 butterflies on pair (a,b);
    caterpillars and cc4 hand-summed over the middle edges."""
    from careers_spark.operators.graph import bipartite_butterflies

    inc = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
         (3, "c"), (4, "c")],
        "u long, v string",
    )
    rows = {(r.v_a, r.v_b): r for r in bipartite_butterflies(inc).collect()}
    assert set(rows) == {("a", "b"), ("__ALL__", "__ALL__")}
    ab = rows[("a", "b")]
    assert (ab.cooc, ab.butterflies) == (3, 3)
    assert ab.caterpillars is None and ab.cc4 is None
    allr = rows[("__ALL__", "__ALL__")]
    assert allr.cooc is None
    assert (allr.butterflies, allr.caterpillars) == (3, 18)
    assert allr.cc4 == round(12 / 18, 6)


def test_butterflies_duplicates_collapse(spark):
    """Repeated incidences must not inflate any count."""
    from careers_spark.operators.graph import bipartite_butterflies

    inc = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "b")],
        "u long, v string",
    )
    rows = {(r.v_a, r.v_b): r for r in bipartite_butterflies(inc).collect()}
    assert rows[("a", "b")].cooc == 2
    assert rows[("a", "b")].butterflies == 1
    assert rows[("__ALL__", "__ALL__")].butterflies == 1


def test_butterflies_lockstep_brute_force(spark):
    """Algebraic counts == literal 4-tuple enumeration on a random
    60x20 bipartite graph."""
    import random
    from itertools import combinations

    from careers_spark.operators.graph import bipartite_butterflies

    rng = random.Random(23)
    inc = sorted(
        {
            (d, f"t{rng.randrange(20)}")
            for d in range(60)
            for _ in range(rng.randrange(1, 6))
        }
    )
    adj = {}
    for d, t in inc:
        adj.setdefault(t, set()).add(d)
    want_b = 0
    want_pairs = {}
    for ta, tb in combinations(sorted(adj), 2):
        co = len(adj[ta] & adj[tb])
        want_pairs[(ta, tb)] = co
        want_b += co * (co - 1) // 2
    degd = {}
    for d, t in inc:
        degd[d] = degd.get(d, 0) + 1
    degt = {t: len(ds) for t, ds in adj.items()}
    want_cater = sum((degd[d] - 1) * (degt[t] - 1) for d, t in inc)

    df = spark.createDataFrame(inc, "u long, v string")
    rows = {
        (r.v_a, r.v_b): r
        for r in bipartite_butterflies(df, min_cooc=1).collect()
    }
    allr = rows.pop(("__ALL__", "__ALL__"))
    assert allr.butterflies == want_b
    assert allr.caterpillars == want_cater
    got_pairs = {k: r.cooc for k, r in rows.items()}
    assert got_pairs == {k: c for k, c in want_pairs.items() if c >= 1}
    for k, r in rows.items():
        assert r.butterflies == r.cooc * (r.cooc - 1) // 2


def test_rich_club_hand_golden(spark):
    """K4 core with two pendants: at k=1 the pendants drop out and the
    core's phi hits 1.0; at k=3 nobody qualifies."""
    from careers_spark.operators.graph import rich_club

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(1, 9), (2, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.k: r for r in rich_club(df, ks=(1, 2, 3)).collect()}
    # degrees: 1->4, 2->4, 3->3, 4->3, 8->1, 9->1
    assert (got[1].n_k, got[1].e_k, got[1].phi) == (4, 6, 1.0)
    assert (got[2].n_k, got[2].e_k, got[2].phi) == (4, 6, 1.0)
    assert (got[3].n_k, got[3].e_k, got[3].phi) == (2, 1, 1.0)


def test_rich_club_lockstep_brute_force(spark):
    """Value-table suffix sums == literal recount on a random graph,
    including duplicate/reversed input edges and a self-loop."""
    import random
    from itertools import combinations

    from careers_spark.operators.graph import rich_club

    rng = random.Random(5)
    edges = {
        tuple(sorted((rng.randrange(30), rng.randrange(30))))
        for _ in range(120)
    }
    edges = {(a, b) for a, b in edges if a != b}
    feed = list(edges) + [(b, a) for a, b in list(edges)[:10]] + [(3, 3)]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    df = spark.createDataFrame(feed, "src long, dst long")
    got = {r.k: r for r in rich_club(df, ks=(0, 1, 2, 5, 99)).collect()}
    for k in (0, 1, 2, 5, 99):
        nodes = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in nodes and b in nodes)
        r = got[k]
        assert (r.n_k, r.e_k) == (len(nodes), ek)
        if len(nodes) >= 2:
            assert r.phi == round(
                2 * ek / (len(nodes) * (len(nodes) - 1)), 6
            )
        else:
            assert r.phi is None


def test_disparity_hand_golden(spark):
    """Hub with one dominant edge among many weak ones: the dominant
    edge is significant from the hub side, the weak ones are not; a
    degree-1 spoke can never vouch for its own edge."""
    import math

    from careers_spark.operators.graph import disparity_backbone

    # hub 0: edges to 1..6, weight 100 to node 1, weight 1 to 2..6
    edges = [(0, 1, 100)] + [(0, j, 1) for j in range(2, 7)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    rows = {(r.src, r.dst): r for r in disparity_backbone(df, 50).collect()}
    s, k = 105, 6
    strong = rows[(0, 1)]
    assert strong.lalpha_src == round((k - 1) * math.log(1 - 100 / s), 6)
    assert strong.lalpha_dst == 0.0  # degree-1 endpoint
    assert strong.keep
    weak = rows[(0, 2)]
    assert weak.lalpha_src == round((k - 1) * math.log(1 - 1 / s), 6)
    assert not weak.keep


def test_disparity_lockstep_and_symmetrization(spark):
    """Python replay on a random weighted graph; reversed duplicate
    inputs collapse before strengths are computed."""
    import math
    import random

    from careers_spark.operators.graph import disparity_backbone

    rng = random.Random(11)
    base = {}
    for _ in range(80):
        a, b = rng.randrange(20), rng.randrange(20)
        if a != b:
            base[tuple(sorted((a, b)))] = rng.randrange(1, 50)
    feed = [(a, b, w) for (a, b), w in base.items()]
    feed += [(b, a, w) for (a, b), w in list(base.items())[:15]]
    st, dg = {}, {}
    for (a, b), w in base.items():
        st[a] = st.get(a, 0) + w
        st[b] = st.get(b, 0) + w
        dg[a] = dg.get(a, 0) + 1
        dg[b] = dg.get(b, 0) + 1

    def la(n, w):
        if dg[n] <= 1:
            return 0.0
        return round((dg[n] - 1) * math.log(1 - w / st[n]), 6)

    thr = round(math.log(0.05), 6)
    df = spark.createDataFrame(feed, "src long, dst long, w long")
    got = {(r.src, r.dst): r for r in disparity_backbone(df, 50).collect()}
    assert set(got) == set(base)
    for (a, b), w in base.items():
        r = got[(a, b)]
        assert (r.lalpha_src, r.lalpha_dst) == (la(a, w), la(b, w))
        assert r.keep == (min(la(a, w), la(b, w)) < thr)


def test_densest_peel_hand_golden(spark):
    """K5 (density 2.0) with a long pendant path: round 0 sees the
    whole graph, the first peel strips the path (path degrees <= 2 <
    3*avg at eps=0.5 thresholds), and the surviving K5 round wins
    is_best with density 2.0."""
    from careers_spark.operators.graph import densest_subgraph_rounds

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    path = [(100 + i, 101 + i) for i in range(6)] + [(4, 100)]
    df = spark.createDataFrame(k5 + path, "src long, dst long")
    # eps=0.1: the first peel keeps exactly deg > 2.2*rho = 3.12 = K5
    rows = {
        r.round: r
        for r in densest_subgraph_rounds(df, eps_mille=100).collect()
    }
    assert rows[0].n_nodes == 12 and rows[0].n_edges == 17
    best = [r for r in rows.values() if r.is_best]
    assert len(best) == 1
    assert (best[0].n_nodes, best[0].n_edges, best[0].density) == (5, 10, 2.0)


def test_densest_peel_python_lockstep(spark):
    """Exact round-by-round replay with integer thresholds on a random
    graph; best-round flag ties to (density, earliest round)."""
    import random

    from careers_spark.operators.graph import densest_subgraph_rounds

    rng = random.Random(19)
    edges = {
        tuple(sorted((rng.randrange(40), rng.randrange(40))))
        for _ in range(200)
    }
    edges = {(a, b) for a, b in edges if a != b}

    cur = set(edges)
    want = []
    r = 0
    while cur:
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        n_s, e_s = len(deg), len(cur)
        want.append((r, n_s, e_s))
        keep = {v for v, d in deg.items() if d * n_s * 1000 > 3000 * e_s}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        r += 1
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = sorted(
        (r.round, r.n_nodes, r.n_edges)
        for r in densest_subgraph_rounds(df, eps_mille=500).collect()
    )
    assert got == want
    best_rows = [
        r for r in densest_subgraph_rounds(df, eps_mille=500).collect()
        if r.is_best
    ]
    dens = [(e / n, -r) for r, n, e in want]
    br = -max(dens)[1]
    assert [r.round for r in best_rows] == [br]


def test_densest_peel_budget_raises(spark):
    import pytest as pt

    from careers_spark.operators.graph import densest_subgraph_rounds

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "src long, dst long")
    with pt.raises(RuntimeError, match="max_rounds"):
        densest_subgraph_rounds(df, max_rounds=0)


def test_sweep_cut_two_triangles_golden(spark):
    """Two triangles joined by one bridge: the best prefix is the
    first triangle with conductance 1/7."""
    from careers_spark.operators.graph import sweep_cut

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    # score/deg keys: .45 .40 .30 .20 .15 .10 -> sweep order 1..6
    scores = [(1, 0.9), (2, 0.8), (3, 0.9), (4, 0.6), (5, 0.3), (6, 0.2)]
    got = {
        r.rank: r
        for r in sweep_cut(
            spark.createDataFrame(edges, "src long, dst long"),
            spark.createDataFrame(scores, "node long, pr double"),
        ).collect()
    }
    assert [got[r].node for r in range(1, 7)] == [1, 2, 3, 4, 5, 6]
    r3 = got[3]
    assert (r3.vol, r3.cut, r3.phi, r3.is_best) == (7, 1, 0.142857, True)
    assert got[6].phi is None  # full prefix: min vol 0
    assert sum(1 for r in got.values() if r.is_best) == 1


def test_sweep_cut_python_lockstep(spark):
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.graph import sweep_cut

    rng = random.Random(37)
    edges = {
        tuple(sorted((rng.randrange(25), rng.randrange(25))))
        for _ in range(80)
    }
    edges = sorted((a, b) for a, b in edges if a != b)
    deg = {}
    adj = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {n: rng.random() for n in deg}
    order = sorted(deg, key=lambda n: (-(scores[n] / deg[n]), n))
    m2 = 2 * len(edges)
    vol = cut = 0
    seen = set()
    want = {}
    for r, n in enumerate(order, 1):
        vol += deg[n]
        cut += deg[n] - 2 * len(adj[n] & seen)
        seen.add(n)
        mn = min(vol, m2 - vol)
        phi = None
        if mn > 0:
            phi = float(
                Decimal(repr(cut / mn)).quantize(
                    Decimal("1e-6"), ROUND_HALF_UP
                )
            )
        want[r] = (n, vol, cut, phi)
    got = {
        r.rank: (r.node, r.vol, r.cut, r.phi)
        for r in sweep_cut(
            spark.createDataFrame(edges, "src long, dst long"),
            spark.createDataFrame(
                sorted(scores.items()), "node long, pr double"
            ),
        ).collect()
    }
    assert got == want
