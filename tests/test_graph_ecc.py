"""eccentricity — goldens + closeness-refactor consistency."""


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_eccentricity_path_golden(spark):
    from careers_spark.operators.graph import eccentricity

    # path a-b-c-d-e: ecc = 4,3,2,3,4
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    got = {r.node: r.eccentricity for r in eccentricity(e).collect()}
    assert got == {"a": 4, "b": 3, "c": 2, "d": 3, "e": 4}


def test_eccentricity_disconnected_components(spark):
    from careers_spark.operators.graph import eccentricity

    e = _edges(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    got = {r.node: (r.n_reach, r.eccentricity) for r in eccentricity(e).collect()}
    assert got["a"] == (2, 1) and got["b"] == (2, 1)
    assert got["x"] == (3, 2) and got["y"] == (3, 1)


def test_eccentricity_consistent_with_closeness_reach(spark):
    """Both operators ride the same BFS table: reachable counts agree."""
    import random

    from careers_spark.operators.graph import closeness_centrality, eccentricity

    rng = random.Random(67)
    pairs = list(
        {
            (f"n{rng.randint(0, 11)}", f"n{rng.randint(0, 11)}")
            for _ in range(18)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    reach_c = {r.node: r.n_reach for r in closeness_centrality(e).collect()}
    reach_e = {r.node: r.n_reach for r in eccentricity(e).collect()}
    assert reach_c == reach_e


# ---------------------------------------------------------------------------
# attack_robustness


def test_attack_star_shatters_at_one(spark):
    from careers_spark.operators.graph import attack_robustness

    # star: hub h with 5 leaves — removing the single hub leaves no edges
    e = _edges(spark, [("h", f"l{i}") for i in range(5)])
    got = {r.k: r for r in attack_robustness(e, ks=(0, 1)).collect()}
    assert (got[0].n_nodes, got[0].n_edges, got[0].largest_cc) == (6, 5, 6)
    assert (got[1].n_nodes, got[1].n_edges, got[1].largest_cc) == (0, 0, 0)


def test_attack_ring_degrades_gracefully(spark):
    from careers_spark.operators.graph import attack_robustness

    # 6-ring: every removal only opens the ring (all degrees equal, so
    # ties break by node name)
    n = 6
    e = _edges(spark, [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)])
    got = {r.k: r for r in attack_robustness(e, ks=(0, 1, 2)).collect()}
    assert got[0].largest_cc == 6
    assert got[1].largest_cc == 5  # path of the 5 survivors
    # k=2 removes n0, n1 (tie-break asc): survivors n2..n5 still a path
    assert got[2].largest_cc == 4


def test_attack_two_cliques_bridge(spark):
    from careers_spark.operators.graph import attack_robustness

    # two triangles joined through hub b (degree 4); removing it splits
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("b", "x"), ("b", "y"), ("x", "y")]
    e = _edges(spark, tri1 + tri2)
    got = {r.k: r for r in attack_robustness(e, ks=(0, 1)).collect()}
    assert got[0].largest_cc == 5
    assert got[1].largest_cc == 2  # {a,c} and {x,y} remain
    assert got[1].n_nodes == 4
