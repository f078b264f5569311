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


def _clique(lo):
    ns = [f"n{i:02d}" for i in range(lo, lo + 4)]
    return [(a, b) for a in ns for b in ns if a < b]


def test_louvain_two_level_clique_of_cliques(spark):
    """Full Louvain loop on four bridged 4-cliques: phase 1 finds the
    cliques from singletons; phase 2 — now carrying intra-community
    mass as super-node self-loops — correctly REJECTS every merge.

    Hand-computed (m2 = 58): the four-clique partition has
    Q = 48/58 - (2*15^2 + 2*14^2)/58^2 = 0.5773; merging the
    double-bridged pairs gives Q = 56/58 - 2*(29/58)^2 = 0.4655. The
    pre-round-4 expectation (A-B and C-D merge) was the artifact of
    dropping self-loop mass at contraction: with super-node degrees
    reduced to bridge weight alone, every merge gain went positive.
    The Blondel gain with the mass carried is
    2 - 15*14/58 = -1.62 < 0 for A-B — no merge, matching the
    reference binary's objective. test_modularity_confirms_* pins the
    Q comparison with this module's own modularity()."""
    from careers_spark.operators.communities import louvain

    edges = (
        _clique(1) + _clique(5) + _clique(9) + _clique(13)
        + [("n04", "n05"), ("n03", "n06")]   # A-B double bridge
        + [("n12", "n13"), ("n11", "n14")]   # C-D double bridge
        + [("n01", "n09")]                   # single A-C bridge
    )
    got = {
        r.node: r.community
        for r in louvain(_edges(spark, edges), levels=2).collect()
    }
    assert len(got) == 16  # no node loss
    comms = [
        {got[f"n{i:02d}"] for i in range(lo, lo + 4)} for lo in (1, 5, 9, 13)
    ]
    for c in comms:
        assert len(c) == 1  # each clique is one community
    assert len({next(iter(c)) for c in comms}) == 4  # and they stay apart


def test_modularity_confirms_four_clique_optimum(spark):
    """The Q comparison behind the golden above: four cliques beat the
    merged pairing on the original graph."""
    from careers_spark.operators.communities import modularity

    edges = _edges(
        spark,
        _clique(1) + _clique(5) + _clique(9) + _clique(13)
        + [("n04", "n05"), ("n03", "n06"), ("n12", "n13"),
           ("n11", "n14"), ("n01", "n09")],
    )

    def q(label_of):
        labels = spark.createDataFrame(
            pd.DataFrame(
                [(f"n{i:02d}", label_of(i)) for i in range(1, 17)],
                columns=["node", "community"],
            )
        )
        return sum(r.q_contrib for r in modularity(edges, labels).collect())

    q4 = q(lambda i: f"c{(i - 1) // 4}")
    q2 = q(lambda i: f"c{(i - 1) // 8}")
    assert abs(q4 - 0.577289) < 1e-4
    assert abs(q2 - 0.465517) < 1e-4
    assert q4 > q2


def test_louvain_selfloop_mass_gates_phase2_merge(spark):
    """The round-4 closure golden, driven at the contracted level:
    super-nodes A/B with heavy internal mass (self-loop weight 10) and
    a weak bridge (1) must NOT merge — gain = 1 - 21*21/42 = -9.5,
    separate Q = 0.4524 > merged 0 — while a heavy bridge (25) must:
    gain = 25 - 45*45/90 = +2.5, separate Q = -0.0556 < merged 0.
    Without the self-loop carry both cases merged."""
    from careers_spark.operators.communities import louvain

    def run(bridge_w):
        edges = spark.createDataFrame(
            pd.DataFrame(
                [("A", "A", 10.0), ("B", "B", 10.0), ("A", "B", bridge_w)],
                columns=["src", "dst", "w"],
            )
        )
        got = {
            r.node: r.community
            for r in louvain(edges, weight="w", levels=1, rounds=4).collect()
        }
        return got["A"] == got["B"]

    assert run(1.0) is False   # weak bridge: internal mass blocks the merge
    assert run(25.0) is True   # heavy bridge: merge is modularity-positive


def test_louvain_keeps_nodes_of_disconnected_components(spark):
    """ADVICE r3: a disconnected clique that fully collapses in phase 1
    has no inter-community edges; with self-loop carry it still appears
    in the contracted graph, and the LEFT-join label composition keeps
    its nodes either way — no silent node loss on disconnected input."""
    from careers_spark.operators.communities import louvain

    edges = _clique(1) + _clique(5)  # two cliques, NO bridge
    got = {
        r.node: r.community
        for r in louvain(_edges(spark, edges), levels=3).collect()
    }
    assert len(got) == 8  # every node mapped
    a = {got[f"n{i:02d}"] for i in range(1, 5)}
    b = {got[f"n{i:02d}"] for i in range(5, 9)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_modularity_level_invariance_with_loops(spark):
    """Q(original graph, composed labels) == Q(contracted graph with
    self-loops, identity labels) — the invariant the carry exists for."""
    from careers_spark.operators.communities import modularity

    # original: two triangles bridged once, labeled by triangle
    tri1 = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0)]
    tri2 = [("x", "y", 1.0), ("y", "z", 1.0), ("x", "z", 1.0)]
    orig = spark.createDataFrame(
        pd.DataFrame(tri1 + tri2 + [("c", "x", 1.0)], columns=["src", "dst", "w"])
    )
    labels = spark.createDataFrame(
        pd.DataFrame(
            [(n, "T1") for n in "abc"] + [(n, "T2") for n in "xyz"],
            columns=["node", "community"],
        )
    )
    q_orig = sum(
        r.q_contrib for r in modularity(orig, labels, weight="w").collect()
    )
    # contracted by hand: self-loops carry the 3-edge internal mass
    contracted = spark.createDataFrame(
        pd.DataFrame(
            [("T1", "T1", 3.0), ("T2", "T2", 3.0), ("T1", "T2", 1.0)],
            columns=["src", "dst", "w"],
        )
    )
    ident = spark.createDataFrame(
        pd.DataFrame([("T1", "T1"), ("T2", "T2")], columns=["node", "community"])
    )
    q_contr = sum(
        r.q_contrib
        for r in modularity(contracted, ident, weight="w", loops=True).collect()
    )
    assert abs(q_orig - q_contr) < 1e-9


def test_louvain_partition_invariants_adversarial_shapes(spark):
    """Every node keeps exactly one label through arbitrary contraction
    depths, on the shapes that have historically lost nodes: disconnected
    components, input self-loops, isolated dumbbells, and a star."""
    from careers_spark.operators.communities import louvain

    shapes = {
        "disconnected_triangles": [("a", "b"), ("b", "c"), ("a", "c"),
                                   ("x", "y"), ("y", "z"), ("x", "z")],
        "self_loops_and_bridge": [("a", "a"), ("a", "b"), ("b", "b")],
        "dumbbell": _clique(1) + _clique(5) + [("n01", "n05")],
        "star": [("hub", f"leaf{i}") for i in range(6)],
    }
    for name, pairs in shapes.items():
        nodes = {u for u, v in pairs} | {v for u, v in pairs}
        got = {
            r.node: r.community
            for r in louvain(_edges(spark, pairs), levels=3).collect()
        }
        assert set(got) == nodes, name  # no node lost, none invented
        # labels are usable as a partition key: every community non-empty
        assert all(c is not None for c in got.values()), name


def test_conductance_two_cliques_one_bridge(spark):
    from careers_spark.operators.communities import conductance

    # two triangles joined by one bridge edge; labels = the triangles.
    # Each triangle: vol = 2*3 (intra, both directions) + 1 (bridge
    # endpoint) = 7; cut = 1; phi = 1/7
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(n, 1) for n in (1, 2, 3)] + [(n, 2) for n in (4, 5, 6)],
        "node long, community long",
    )
    got = {
        r.community: (r.vol_w, r.cut_w, r.conductance)
        for r in conductance(e, labels).collect()
    }
    assert got == {
        1: (7.0, 1.0, round(1 / 7, 6)),
        2: (7.0, 1.0, round(1 / 7, 6)),
    }


def test_conductance_whole_graph_is_null(spark):
    from careers_spark.operators.communities import conductance

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "node long, community long"
    )
    r = conductance(e, labels).collect()[0]
    # one community holding all volume: complement vol 0 -> NULL
    assert r.conductance is None and r.cut_w == 0.0


def test_conductance_zero_cut_with_long_weights(spark):
    from careers_spark.operators.communities import conductance

    # two disconnected weighted components, labels == components: every
    # cut is 0 with BIGINT weights — the case a float-valued na.fill
    # would silently skip (float fill ignores integer columns), leaving
    # NULL where 0.0 belongs
    e = spark.createDataFrame(
        [(1, 2, 3), (3, 4, 5)], "src long, dst long, n_obs long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2)], "node long, community long"
    )
    got = {
        r.community: (r.vol_w, r.cut_w, r.conductance)
        for r in conductance(e, labels, weight="n_obs").collect()
    }
    # m2 = 2*(3+5) = 16; vols 6 and 10; both cuts 0 -> conductance 0.0
    assert got == {1: (6.0, 0.0, 0.0), 2: (10.0, 0.0, 0.0)}


def test_conductance_weighted_matches_python(spark):
    from careers_spark.operators.communities import conductance

    import random

    rng = random.Random(37)
    edges = sorted(
        {tuple(sorted(rng.sample(range(8), 2))) for _ in range(14)}
    )
    rows = [(a, b, rng.randrange(1, 5)) for a, b in edges]
    e = spark.createDataFrame(rows, "src long, dst long, n_obs long")
    lab = {n: n % 3 for n in range(8)}
    labels = spark.createDataFrame(
        list(lab.items()), "node long, community long"
    )
    got = {
        r.community: (r.vol_w, r.cut_w, r.conductance)
        for r in conductance(e, labels, weight="n_obs").collect()
    }
    vol, cut = {}, {}
    m2 = 0
    for a, b, w in rows:
        for u, v in ((a, b), (b, a)):
            m2 += w
            vol[lab[u]] = vol.get(lab[u], 0) + w
            if lab[u] != lab[v]:
                cut[lab[u]] = cut.get(lab[u], 0) + w
    want = {
        c: (
            float(vol[c]),
            float(cut.get(c, 0)),
            None
            if min(vol[c], m2 - vol[c]) == 0
            else round(cut.get(c, 0) / min(vol[c], m2 - vol[c]), 6),
        )
        for c in vol
    }
    assert got == want


def test_ari_perfect_and_renamed(spark):
    from careers_spark.operators.communities import clustering_agreement

    la = spark.createDataFrame(
        [(i, i // 3) for i in range(12)], "node long, community long"
    )
    lb = spark.createDataFrame(
        [(i, 100 - i // 3) for i in range(12)], "node long, community long"
    )
    (r,) = clustering_agreement(la, lb).collect()
    assert r.ari == 1.0 and r.n == 12


def test_ari_sklearn_reference_values(spark):
    """Hand-computed ARI on the classic [0,0,1,1] vs [0,0,1,2] example
    (sklearn docs value 0.5714...) plus an independent-labels case."""
    from careers_spark.operators.communities import clustering_agreement

    la = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "node long, community long"
    )
    lb = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 2)], "node long, community long"
    )
    (r,) = clustering_agreement(la, lb).collect()
    assert r.ari == 0.571429
    # single-cluster vs single-cluster: degenerate denominator -> 1
    one = spark.createDataFrame(
        [(i, 7) for i in range(5)], "node long, community long"
    )
    (r2,) = clustering_agreement(one, one).collect()
    assert r2.ari == 1.0


def test_ari_python_lockstep_random(spark):
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.communities import clustering_agreement

    rng = random.Random(8)
    la = [(i, rng.randrange(5)) for i in range(200)]
    lb = [(i, rng.randrange(4)) for i in range(200)]
    cont = {}
    for (i, x), (_, y) in zip(la, lb):
        cont[(x, y)] = cont.get((x, y), 0) + 1

    def c2(v):
        return v * (v - 1) // 2

    S = sum(c2(v) for v in cont.values())
    am, bm = {}, {}
    for (x, y), v in cont.items():
        am[x] = am.get(x, 0) + v
        bm[y] = bm.get(y, 0) + v
    A = sum(c2(v) for v in am.values())
    B = sum(c2(v) for v in bm.values())
    C2 = c2(200)
    want = (2 * C2 * S - 2 * A * B) / (C2 * (A + B) - 2 * A * B)
    want = float(
        Decimal(repr(want)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )
    dfa = spark.createDataFrame(la, "node long, community long")
    dfb = spark.createDataFrame(lb, "node long, community long")
    (r,) = clustering_agreement(dfa, dfb).collect()
    assert (r.sum_ij, r.sum_a, r.sum_b) == (S, A, B)
    assert r.ari == want
