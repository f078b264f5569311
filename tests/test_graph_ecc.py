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
