"""Margin-based bitext mining (similarity.bitext_margin_pairs):
perfect-partner corpus, hub suppression, mutuality, and a python
lockstep replicating the exact fixed-point/rounding chain."""

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from careers_spark.operators.similarity import bitext_margin_pairs


def _r(x, nd):
    """Spark/DuckDB round(): decimal HALF_UP, not python banker's."""
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


def _py_mine(rows, k, min_margin):
    """rows: (vec_id, [floats], label). Replicates the operator: cos
    rounded 6 -> fp BIGINT, exact integer kNN sums, one margin
    expression, mutual argmax with (margin desc, id asc) ties."""
    import math

    a = [(i, v) for i, v, l in rows if l % 2 == 0]
    b = [(i, v) for i, v, l in rows if l % 2 == 1]

    def cos(u, v):
        d = sum(float(x) * float(y) for x, y in zip(u, v))
        nu = math.sqrt(sum(float(x) * float(x) for x in u))
        nv = math.sqrt(sum(float(x) * float(x) for x in v))
        return _r(d / (nu * nv), 6)

    fp = {(x, y): int(_r(cos(xv, yv) * 1e6, 0)) for x, xv in a for y, yv in b}
    sum_x = {}
    for x, _ in a:
        top = sorted(((fp[(x, y)], -y) for y, _ in b), reverse=True)[:k]
        sum_x[x] = (sum(t for t, _ in top), len(top))
    sum_y = {}
    for y, _ in b:
        top = sorted(((fp[(x, y)], -x) for x, _ in a), reverse=True)[:k]
        sum_y[y] = (sum(t for t, _ in top), len(top))
    margin = {
        (x, y): _r(
            2.0 * fp[(x, y)] / (sx / kx + sy / ky), 9
        )
        for (x, y) in fp
        for sx, kx in [sum_x[x]]
        for sy, ky in [sum_y[y]]
    }
    fwd = {
        x: max(((margin[(x, y)], -y) for y, _ in b))
        for x, _ in a
    }
    bwd = {
        y: max(((margin[(x, y)], -x) for x, _ in a))
        for y, _ in b
    }
    out = {}
    for x, (mg, ny) in fwd.items():
        y = -ny
        if -bwd[y][1] == x and mg >= min_margin:
            out[(x, y)] = (_r(fp[(x, y)] / 1e6, 6), mg)
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [[float(x) for x in r[1]] for r in rows],
                "label": [r[2] for r in rows],
            }
        )
    )


def test_perfect_partners_all_mined(spark):
    # side 1 vectors are exact copies of side 0's: every pair is a
    # cos-1.0 mutual best with margin > 1 (neighborhood sims are < 1)
    base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.6, 0.8, 0.0]]
    rows = [(i, v, 0) for i, v in enumerate(base)] + [
        (10 + i, v, 1) for i, v in enumerate(base)
    ]
    got = {
        (r.src_id, r.dst_id): r.sim
        for r in bitext_margin_pairs(_df(spark, rows), k=2).collect()
    }
    assert got == {(0, 10): 1.0, (1, 11): 1.0, (2, 12): 1.0}


def test_hub_suppressed_by_margin(spark):
    """x0's raw-cosine best is the hub (close to everything on side
    A), but the hub's inflated neighborhood average pushes its margin
    below x0's true partner's — margin mining pairs (x0, partner)
    where cosine mining would pick the hub."""
    rows = [
        (0, [1.0, 0.05, 0.0], 0),   # x0
        (1, [0.0, 1.0, 0.05], 0),   # x1
        (2, [0.05, 0.0, 1.0], 0),   # x2
        (10, [1.0, 0.0, 0.0], 1),   # partner of x0 (cos ~.9988)
        (11, [0.0, 1.0, 0.0], 1),   # partner of x1
        (12, [0.0, 0.0, 1.0], 1),   # partner of x2
        (13, [0.72, 0.7, 0.69], 1),  # hub: close to every x
    ]
    want = _py_mine(rows, k=2, min_margin=1.0)
    got = {
        (r.src_id, r.dst_id): (r.sim, r.margin)
        for r in bitext_margin_pairs(_df(spark, rows), k=2).collect()
    }
    assert got == want
    assert (0, 10) in got and all(dst != 13 for _, dst in got)


def test_lockstep_on_seeded_random(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)], i % 2)
        for i in range(20)
    ]
    want = _py_mine(rows, k=3, min_margin=1.0)
    got = {
        (r.src_id, r.dst_id): (r.sim, r.margin)
        for r in bitext_margin_pairs(_df(spark, rows), k=3).collect()
    }
    assert got == want and len(got) > 0


def test_unpartnered_vector_stays_unpaired(spark):
    # side 0 has an extra vector orthogonal to everything on side 1:
    # its best y is someone else's partner, never mutual -> excluded
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.0, 0.0, 1.0], 0),  # no partner on side 1
        (10, [1.0, 0.0, 0.0], 1),
    ]
    got = {
        (r.src_id, r.dst_id)
        for r in bitext_margin_pairs(_df(spark, rows), k=2).collect()
    }
    assert got == {(0, 10)}


def test_triplet_mining_legs_and_filters(spark):
    from careers_spark.operators.similarity import triplet_mining

    # anchor 0: near-dup 1 (excluded from positives), true positive 2,
    # hard negative 3 (just below the pos band), far negative 4
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0]),   # cos ~1.0 -> dup, NOT a positive
        (2, [0.9, 0.4, 0.0]),     # cos ~0.91 -> positive
        (3, [0.4, 0.9, 0.0]),     # cos ~0.41 -> hard negative
        (4, [0.0, 0.0, 1.0]),     # cos 0 -> easy region
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [[float(x) for x in r[1]] for r in rows]})
    )
    got = triplet_mining(
        df, pos_threshold=0.5, dup_threshold=0.98, query_pred="vec_id = 0"
    ).collect()
    assert len(got) == 1
    t = got[0]
    assert (t.anchor_id, t.pos_id, t.hard_neg_id) == (0, 2, 3)
    assert t.pos_sim >= 0.5 and t.hard_neg_sim < 0.5
    assert t.rand_neg_id not in (0, 2)


def test_triplet_mining_no_positive_no_triple(spark):
    from careers_spark.operators.similarity import triplet_mining

    # everything orthogonal to the anchor: no positive -> no row
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, -1.0])]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [[float(x) for x in r[1]] for r in rows]})
    )
    assert (
        triplet_mining(df, query_pred="vec_id = 0").count() == 0
    )
