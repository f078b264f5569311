"""sliced_wasserstein — zero-on-identical, python lockstep, shift order."""

import hashlib
import math
import random
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _sgn(i: int, dim: int) -> int:
    return 1 - 2 * (int(hashlib.md5(f"{i}_{dim}".encode()).hexdigest()[:8], 16) % 2)


def _python_sw1(rows, pred, out_dims, bucket=100000, quant=1000000):
    """rows = (vec_id, [floats]); pred = callable(vec_id) -> in group A."""
    per = {}
    for vid, emb in rows:
        for d in range(out_dims):
            p = sum(
                _sgn(i, d)
                * int(
                    Decimal(repr(float(v) * quant)).quantize(
                        Decimal("1"), ROUND_HALF_UP
                    )
                )
                for i, v in enumerate(emb)
            )
            per.setdefault(d, []).append((math.floor(p / bucket), pred(vid)))
    out = {}
    for d, vals in per.items():
        grid = sorted({v for v, _ in vals})
        n_a = sum(1 for _, a in vals if a)
        n_b = len(vals) - n_a
        num = 0
        ca = cb = 0
        for gi, g in enumerate(grid):
            ca += sum(1 for v, a in vals if a and v == g)
            cb += sum(1 for v, a in vals if not a and v == g)
            gap = (grid[gi + 1] - g) if gi + 1 < len(grid) else 0
            num += abs(ca * n_b - cb * n_a) * gap
        out[d] = (n_a, n_b, num, _r6(num * bucket / (quant * n_a * n_b)))
    return out


_SCHEMA = "vec_id long, embedding array<float>, grp int"


def test_sw1_identical_groups_zero(spark):
    from careers_spark.operators.similarity import sliced_wasserstein

    rng = random.Random(41)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(15)]
    rows = [(i, base[i], 0) for i in range(15)] + [
        (100 + i, base[i], 1) for i in range(15)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = sliced_wasserstein(df, "grp = 1", out_dims=4).collect()
    # same multiset per group after the shared projection -> W1 = 0
    # BUT signs depend on vec_id? no: sign depends only on (i, dim), so
    # identical vectors project identically regardless of id.
    assert all(r.w1 == 0.0 for r in got)


def test_sw1_python_lockstep(spark):
    from careers_spark.operators.similarity import sliced_wasserstein

    rng = random.Random(43)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(24)
    ]
    df = spark.createDataFrame(
        [(i, e, 1 if i < 12 else 0) for i, e in rows], _SCHEMA
    )
    got = {
        r.dim: (r.n_a, r.n_b, r.w1_num, r.w1)
        for r in sliced_wasserstein(df, "vec_id < 12", out_dims=3).collect()
    }
    assert got == _python_sw1(rows, lambda v: v < 12, 3)


def test_sw1_orders_shift_magnitude(spark):
    from careers_spark.operators.similarity import sliced_wasserstein

    rng = random.Random(47)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(20)]

    def mk(shift):
        rows = [(i, base[i], 0) for i in range(20)] + [
            (100 + i, [v + shift for v in base[i]], 1) for i in range(20)
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        r = sliced_wasserstein(df, "grp = 1", out_dims=4).collect()
        return sum(x.w1 for x in r) / len(r)

    small, big = mk(0.05), mk(0.5)
    assert big > small
