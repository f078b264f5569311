"""join_cardinality_qerror + chao1_richness — goldens."""

import pytest


def _k(spark, keys):
    return spark.createDataFrame([(x,) for x in keys], "k long")


def test_qerror_uniform_join_is_one(spark):
    """Perfectly uniform FK join: the textbook estimate is exact,
    Q-error = 1."""
    from careers_spark.operators.skew import join_cardinality_qerror

    left = _k(spark, list(range(10)))  # 1 row per key
    right = _k(spark, [i for i in range(10) for _ in range(3)])  # 3 each
    out = join_cardinality_qerror(left, right, "k").collect()[0]
    assert out["actual"] == 30.0
    assert out["est_uniform"] == pytest.approx(10 * 30 / 10, abs=1e-9)
    assert out["q_error"] == 1.0


def test_qerror_skew_underestimated(spark):
    """One hub key holds nearly all right rows: uniformity
    underestimates the join badly, Q-error >> 1."""
    from careers_spark.operators.skew import join_cardinality_qerror

    left = _k(spark, [0] * 50 + list(range(1, 10)))
    right = _k(spark, [0] * 100 + list(range(1, 10)))
    out = join_cardinality_qerror(left, right, "k").collect()[0]
    actual = 50 * 100 + 9
    assert out["actual"] == float(actual)
    est = 59 * 109 / 10
    assert out["est_uniform"] == pytest.approx(est, abs=1e-6)
    assert out["q_error"] == pytest.approx(actual / est, abs=1e-4)
    assert out["q_error"] > 5


def test_qerror_disjoint_keys_null(spark):
    from careers_spark.operators.skew import join_cardinality_qerror

    out = join_cardinality_qerror(
        _k(spark, [1, 2]), _k(spark, [3, 4]), "k"
    ).collect()[0]
    assert out["actual"] == 0.0 and out["q_error"] is None


def test_chao1_textbook(spark):
    """5 singletons, 2 doubletons, 1 tripleton: d=8,
    chao1 = 8 + 5*4/(2*3) = 11.333..., undetected = 3.333..."""
    from careers_spark.operators.sketches import chao1_richness

    keys = (
        list(range(5))
        + [10, 10, 11, 11]
        + [20, 20, 20]
    )
    out = chao1_richness(_k(spark, keys), "k").collect()[0]
    assert out["d_obs"] == 8 and out["f1"] == 5 and out["f2"] == 2
    assert out["chao1"] == pytest.approx(8 + 5 * 4 / 6, abs=1e-6)
    assert out["undetected"] == pytest.approx(5 * 4 / 6, abs=1e-6)


def test_chao1_saturated_sample(spark):
    """No singletons: the estimator says the sample already saw
    everything (chao1 == d_obs)."""
    from careers_spark.operators.sketches import chao1_richness

    out = chao1_richness(_k(spark, [1, 1, 2, 2, 3, 3]), "k").collect()[0]
    assert out["f1"] == 0
    assert out["chao1"] == 3.0 and out["undetected"] == 0.0
