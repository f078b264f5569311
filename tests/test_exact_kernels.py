"""r6 exact-kernel pinning: the numpy mapInPandas rewrites of the
declared-exact cosine paths (similarity.brute_force_topk,
similarity.bitext_margin_pairs) must be BIT-identical to the original
pure-Catalyst implementations they replaced — same IEEE operation
sequence (sequential-over-dims fold, multiply-then-divide cosine) and
the same Spark round() semantics (shortest-repr decimal HALF_UP).

Also pins the round-emulation helper against Spark's own round() on
adversarial half-boundary doubles, and tpch_q14's promo_pct recipe
(round(x*1e6)/1e6) against DuckDB's round(x, 6) — the driver's
only-ever red row (VERDICT r5 #1).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from careers_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "pred,k,max_sim",
    [
        ("vec_id % 50 = 0", 5, None),
        ("true", 5, None),
        ("vec_id % 100 = 0", 3, 0.98),
        ("vec_id % 7 = 0", 11, 0.5),
        ("vec_id = 0", 4, None),
    ],
)
def test_brute_force_topk_bitexact_vs_catalyst(spark, embeddings, pred, k, max_sim):
    new = _rows(
        SIM.brute_force_topk(embeddings, k=k, query_pred=pred, max_sim=max_sim)
    )
    old = _rows(
        SIM.brute_force_topk_catalyst(
            embeddings, k=k, query_pred=pred, max_sim=max_sim
        )
    )
    assert new == old
    assert len(new) > 0


@pytest.mark.parametrize(
    "side,k,mm",
    [
        ("label % 2", 4, 1.0),
        ("label % 2", 2, 0.5),
        ("cast(vec_id % 5 = 0 as int)", 3, 0.9),
        ("label % 2", 1, 1.0),
    ],
)
def test_bitext_bitexact_vs_catalyst(spark, embeddings, side, k, mm):
    new = _rows(
        SIM.bitext_margin_pairs(embeddings, side_expr=side, k=k, min_margin=mm)
    )
    old = _rows(
        SIM.bitext_margin_pairs_catalyst(
            embeddings, side_expr=side, k=k, min_margin=mm
        )
    )
    assert new == old
    assert len(new) > 0


def test_np_round_matches_spark_round_on_half_boundaries(spark):
    rng = np.random.default_rng(11)
    base = rng.uniform(-50, 50, 4000)
    halves = (rng.integers(-5_000_000, 5_000_000, 4000).astype(np.float64) + 0.5) / 1e6
    near = halves + rng.choice([-1e-13, 0.0, 1e-13, 1e-10, -1e-10], 4000)
    xs = np.concatenate([base, halves, near, np.array([-0.0000004, 0.0, -0.0])])
    import pandas as pd

    got = np.array(
        spark.createDataFrame(pd.DataFrame({"x": xs}))
        .select(F.round("x", 6).alias("r"))
        .toPandas()["r"],
        dtype=np.float64,
    )
    want = SIM._np_round_half_up(xs, 6)
    assert (got.view(np.int64) == want.view(np.int64)).all()


def test_q14_promo_pct_recipe_matches_duckdb_round(spark):
    """round(x*1e6, 0)/1e6 in Spark == DuckDB round(x, 6) for every
    double, INCLUDING the representation-tie values where Spark's own
    round(x, 6) differs by 1 ulp (the r5 driver red)."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(5)
    # promo_pct-shaped ratios in [0, 100] plus adversarial half ties
    xs = np.concatenate(
        [
            rng.uniform(0, 100, 5000),
            (rng.integers(0, 100_000_000, 5000).astype(np.float64) + 0.5) / 1e6,
        ]
    )
    pdf = pd.DataFrame({"x": xs})
    got = np.array(
        spark.createDataFrame(pdf)
        .select((F.round(F.col("x") * F.lit(1e6), 0) / F.lit(1e6)).alias("r"))
        .toPandas()["r"],
        dtype=np.float64,
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = np.array(
        con.execute("select round(x, 6) as r from t").df()["r"], dtype=np.float64
    )
    assert (got.view(np.int64) == want.view(np.int64)).all()
