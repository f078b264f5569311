"""katz_centrality — hand-computed series goldens and python lockstep."""

import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_katz_star_hand_values(spark):
    """Directed star a->c, b->c: walks into c are the two length-1
    edges and nothing longer, so katz(c) = 2*beta exactly; a, b have
    no inbound walks at all."""
    from careers_spark.operators.graph import katz_centrality

    out = {
        r["node"]: r
        for r in katz_centrality(
            _edges(spark, [("a", "c"), ("b", "c")]),
            iterations=6,
            beta_inv=8,
        ).collect()
    }
    assert out["a"]["m_fp"] == 0 and out["b"]["m_fp"] == 0
    # m_6(c) = 2 * 8^5 (two length-1 walks at the last iteration's
    # 8^t weight) -> katz = 2/8
    assert out["c"]["katz"] == pytest.approx(2 / 8, abs=0)
    assert out["c"]["m_fp"] == 2 * 8**5


def test_katz_path_series(spark):
    """Path a->b->c: katz(b) = beta, katz(c) = beta + beta^2 — the
    2-walk a->b->c contributes the quadratic term."""
    from careers_spark.operators.graph import katz_centrality

    out = {
        r["node"]: r["katz"]
        for r in katz_centrality(
            _edges(spark, [("a", "b"), ("b", "c")]),
            iterations=6,
            beta_inv=8,
        ).collect()
    }
    assert out["a"] == 0.0
    assert out["b"] == pytest.approx(1 / 8, abs=0)
    assert out["c"] == pytest.approx(1 / 8 + 1 / 64, abs=0)


def test_katz_cycle_truncation_matches_python(spark):
    """On a 2-cycle the series never terminates — the K-term
    truncation must equal the literal python recurrence, m exact."""
    from careers_spark.operators.graph import katz_centrality

    pairs = [("a", "b"), ("b", "a"), ("a", "c")]
    out = {
        r["node"]: r
        for r in katz_centrality(
            _edges(spark, pairs), iterations=6, beta_inv=8
        ).collect()
    }

    nodes = {"a", "b", "c"}
    m = {v: 0 for v in nodes}
    for t in range(6):
        nxt = {v: 0 for v in nodes}
        for u, v in pairs:
            nxt[v] += 8**t + m[u]
        m = nxt
    for v in nodes:
        assert out[v]["m_fp"] == m[v], v
        assert out[v]["katz"] == round(m[v] / 8**6, 10), v


def test_katz_beta_inv_validation(spark):
    from careers_spark.operators.graph import katz_centrality

    with pytest.raises(ValueError):
        katz_centrality(_edges(spark, [("a", "b")]), beta_inv=1)
