"""Haar wavelet synopsis: pyramid exactness, Parseval residual, top-B
selection, and the guards."""

import datetime as dt
import random

import pytest

from careers_spark.operators.sketches import haar_synopsis


def _rebased(counts, T):
    """The operator grids from the first OBSERVED hour."""
    h0 = min(h for h, n in counts.items() if n > 0)
    return [counts.get(h0 + i, 0) for i in range(T)]


def _events(spark, counts, t0=dt.datetime(2024, 3, 1)):
    rows = [
        (t0 + dt.timedelta(hours=h, minutes=(j * 7) % 60),)
        for h, n in counts.items()
        for j in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp")


def _py_haar(y):
    """Unnormalized pyramid; returns (details[(level, idx)] = d, dc)."""
    details = {}
    cur = list(y)
    lvl = 0
    while len(cur) > 1:
        lvl += 1
        nxt = []
        for i in range(len(cur) // 2):
            nxt.append(cur[2 * i] + cur[2 * i + 1])
            details[(lvl, i)] = cur[2 * i] - cur[2 * i + 1]
        cur = nxt
    return details, cur[0]


def test_haar_exact_pyramid_and_parseval(spark):
    rng = random.Random(9)
    counts = {h: rng.randrange(0, 7) for h in range(13)}
    y = _rebased(counts, 16)
    details, dc = _py_haar(y)
    t_pow = 4
    out = haar_synopsis(
        _events(spark, counts), t_pow=t_pow, top_b=1000
    ).collect()
    got_det = {
        (r.level, r.idx): (r.coef, r.energy_x2l)
        for r in out
        if r.kind == "detail"
    }
    assert got_det == {
        k: (d, d * d * (1 << (t_pow - k[0]))) for k, d in details.items()
    }
    (ap,) = [r for r in out if r.kind == "approx"]
    assert (ap.coef, ap.energy_x2l) == (dc, dc * dc)
    (res,) = [r for r in out if r.kind == "residual"]
    assert res.energy_x2l == 0  # every coefficient kept
    # Parseval: sum of all kept scaled energies == total scaled energy
    total = sum(v * v for v in y) * (1 << t_pow)
    assert sum(r.energy_x2l for r in out if r.kind != "residual") == total


def test_haar_topb_selection_and_residual(spark):
    rng = random.Random(31)
    counts = {h: rng.randrange(0, 40) for h in range(29)}
    y = _rebased(counts, 32)
    details, dc = _py_haar(y)
    t_pow, B = 5, 6
    energies = sorted(
        (
            (d * d * (1 << (t_pow - lvl)), -lvl, -i)
            for (lvl, i), d in details.items()
        ),
        reverse=True,
    )
    kept = energies[:B]
    out = haar_synopsis(_events(spark, counts), t_pow=t_pow, top_b=B).collect()
    got = sorted(
        (r.energy_x2l, -r.level, -r.idx) for r in out if r.kind == "detail"
    )
    assert got == sorted(kept)
    total = sum(v * v for v in y) * (1 << t_pow)
    want_res = total - sum(e for e, _, _ in kept) - dc * dc
    (res,) = [r for r in out if r.kind == "residual"]
    assert res.energy_x2l == want_res
    assert want_res >= 0


def test_haar_guards(spark):
    with pytest.raises(ValueError, match="span"):
        haar_synopsis(
            _events(spark, {0: 1, 40: 1}), t_pow=5
        ).collect()


def test_ams_f2_python_lockstep(spark):
    """Signed occurrence sums == per-token replay; exact F2 and the
    mean estimate both pinned."""
    import hashlib

    from careers_spark.operators.sketches import ams_f2

    rows = [(0, "a a b c"), (1, "a b b"), (2, "c c c c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ams_f2(df, k=8, salt="t0").collect()
    counts = {"a": 3, "b": 3, "c": 5}

    def sign(tok, j):
        h = int(
            hashlib.md5(f"{tok}|{j}|t0".encode()).hexdigest()[:8], 16
        )
        return h % 2 * 2 - 1

    want_x = {
        j: sum(sign(t, j) * c for t, c in counts.items()) ** 2
        for j in range(8)
    }
    got_x = {r.j: r.value for r in out if r.kind == "x"}
    assert got_x == want_x
    (exact,) = [r.value for r in out if r.kind == "exact"]
    assert exact == 9 + 9 + 25
    (est,) = [r.value for r in out if r.kind == "est"]
    assert est == round(sum(want_x.values()) / 8)


def test_ams_f2_single_token_is_exact(spark):
    """One distinct token: every X_j = c^2 = F2 exactly (signs square
    away) — the unbiasedness sanity case."""
    from careers_spark.operators.sketches import ams_f2

    df = spark.createDataFrame([(0, "z z z z z")], "doc_id long, text string")
    out = ams_f2(df, k=4).collect()
    vals = {r.value for r in out}
    assert vals == {25}
