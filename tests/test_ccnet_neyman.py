"""ccnet_ppl_buckets + neyman_allocation — goldens and lockstep."""

import math

import pytest


# ------------------------------------------------------------- ccnet


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, g) for i, (t, g) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


def test_ccnet_skewed_mass_swallows_cuts(spark):
    """6 docs of the dominant token, 2 of a mid token, 1 of a rare
    one: the lowest bin alone holds >2/3 of the corpus, so BOTH cuts
    land on it — dominant docs are head, everything else tail, middle
    empty (documented bin-granularity semantics)."""
    from careers_spark.operators.textstats import ccnet_ppl_buckets

    rows = (
        [("aa aa aa", "x")] * 6
        + [("bb bb bb", "x")] * 2
        + [("cc cc cc", "x")]
    )
    out = {r["doc_id"]: r for r in ccnet_ppl_buckets(_docs(spark, rows)).collect()}
    for i in range(6):
        assert out[i]["bucket"] == "head"
    for i in (6, 7, 8):
        assert out[i]["bucket"] == "tail"
    assert out[0]["avg_nll"] == pytest.approx(-math.log(18 / 27), abs=1e-6)


def test_ccnet_languages_are_isolated(spark):
    """A second language's uniform corpus all lands in head no matter
    how skewed the first language is — models and cuts are per-lang."""
    from careers_spark.operators.textstats import ccnet_ppl_buckets

    rows = (
        [("aa aa aa", "x")] * 6
        + [("bb bb bb", "x")] * 2
        + [("cc cc cc", "x")]
        + [("pp pp", "y"), ("qq qq", "y"), ("rr rr", "y")]
    )
    out = {r["doc_id"]: r for r in ccnet_ppl_buckets(_docs(spark, rows)).collect()}
    for i in (9, 10, 11):
        assert out[i]["lang"] == "y" and out[i]["bucket"] == "head"


def test_ccnet_python_lockstep(spark):
    """Replay the per-lang fp model, integer binning, and cut algebra
    in python on a mixed corpus; every column must match."""
    from careers_spark.operators.textstats import ccnet_ppl_buckets

    words = ["data", "spark", "join", "shuffle", "skew", "plan"]
    rows = []
    for i in range(60):
        lang = "en" if i % 3 else "de"
        toks = [words[(i * 7 + j * 3) % len(words)] for j in range(4 + i % 5)]
        rows.append((" ".join(toks), lang))
    out = {r["doc_id"]: r for r in ccnet_ppl_buckets(_docs(spark, rows)).collect()}

    from collections import Counter, defaultdict

    toks = {i: t.split() for i, (t, _g) in enumerate(rows)}
    counts = defaultdict(Counter)
    for i, (_t, g) in enumerate(rows):
        counts[g].update(toks[i])
    totals = {g: sum(c.values()) for g, c in counts.items()}
    fp, binv = {}, {}
    for i, (_t, g) in enumerate(rows):
        f = sum(
            c * int(round(math.log(counts[g][w] / totals[g]) * 1e9))
            for w, c in Counter(toks[i]).items()
        )
        fp[i] = f
        binv[i] = (-f * 100) // (len(toks[i]) * 10**9)
    cuts = {}
    for g in counts:
        ids = [i for i, (_t, gg) in enumerate(rows) if gg == g]
        bc = Counter(binv[i] for i in ids)
        n, cum, c1, c2 = len(ids), 0, None, None
        for b in sorted(bc):
            cum += bc[b]
            if c1 is None and 3 * cum >= n:
                c1 = b
            if c2 is None and 3 * cum >= 2 * n:
                c2 = b
        cuts[g] = (c1, c2)
    for i, (_t, g) in enumerate(rows):
        r = out[i]
        n = len(toks[i])
        assert r["n_tokens"] == n
        assert r["nll_bin"] == binv[i]
        assert r["avg_nll"] == round(-fp[i] / (n * 1e9), 6)
        c1, c2 = cuts[g]
        want = "head" if binv[i] <= c1 else ("middle" if binv[i] <= c2 else "tail")
        assert r["bucket"] == want, i


# ------------------------------------------------------------ neyman


def _strata(spark, rows):
    return spark.createDataFrame(rows, "stratum string, value long")


def test_neyman_budget_follows_variance(spark):
    """Constant stratum has S=0 and gets nothing; all 10 seats go to
    the variable stratum."""
    from careers_spark.operators.sampling import neyman_allocation

    rows = [("flat", 100)] * 50 + [
        ("vary", 10 * (i % 7)) for i in range(50)
    ]
    out = {
        r["stratum"]: r
        for r in neyman_allocation(
            _strata(spark, rows), n_sample=10
        ).collect()
    }
    assert out["flat"]["sd"] == 0.0 and out["flat"]["n_alloc"] == 0
    assert out["vary"]["n_alloc"] == 10
    assert out["flat"]["weight_basis"] == "neyman"


def test_neyman_proportional_fallback(spark):
    """Every stratum zero-variance -> W=0 -> proportional on N_h,
    still summing exactly to the budget."""
    from careers_spark.operators.sampling import neyman_allocation

    rows = [("a", 5)] * 30 + [("b", 7)] * 10
    out = {
        r["stratum"]: r
        for r in neyman_allocation(
            _strata(spark, rows), n_sample=8
        ).collect()
    }
    assert all(r["weight_basis"] == "proportional" for r in out.values())
    assert out["a"]["n_alloc"] == 6 and out["b"]["n_alloc"] == 2


def test_neyman_python_lockstep_and_exact_total(spark):
    """Hamilton apportionment replayed in python; allocations match
    per-stratum and sum exactly to n_sample."""
    from careers_spark.operators.sampling import neyman_allocation

    rows = []
    for i in range(200):
        s = f"s{i % 5}"
        rows.append((s, (i * 13) % (20 + 30 * (i % 5))))
    out = {
        r["stratum"]: r
        for r in neyman_allocation(
            _strata(spark, rows), n_sample=37
        ).collect()
    }
    assert sum(r["n_alloc"] for r in out.values()) == 37

    from collections import defaultdict

    byv = defaultdict(list)
    for s, v in rows:
        byv[s].append(v)
    wfp = {}
    for s, vs in byv.items():
        n, sm = len(vs), sum(vs)
        ss = sum(v * v for v in vs)
        sd = (
            0.0
            if n < 2
            else math.sqrt((n * float(ss) - float(sm) * sm) / (n * (n - 1.0)))
        )
        wfp[s] = int(round(n * sd * 1e6))
    wt = sum(wfp.values())
    quota = {s: 37 * wfp[s] * 1.0 / wt for s in wfp}
    base = {s: math.floor(quota[s]) for s in wfp}
    extra = 37 - sum(base.values())
    order = sorted(wfp, key=lambda s: (-(quota[s] - base[s]), s))
    alloc = {
        s: base[s] + (1 if order.index(s) < extra else 0) for s in wfp
    }
    for s in wfp:
        assert out[s]["n_alloc"] == alloc[s], s
        assert out[s]["quota"] == round(quota[s], 6)


def test_neyman_validation(spark):
    from careers_spark.operators.sampling import neyman_allocation

    with pytest.raises(ValueError):
        neyman_allocation(_strata(spark, [("a", 1)]), n_sample=-1)
