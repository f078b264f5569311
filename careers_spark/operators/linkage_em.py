"""Fellegi-Sunter record linkage with EM parameter estimation — the
probabilistic entity-resolution model behind Splink (MoJ), which runs
this exact computation on Spark at national-registry scale.

Model: candidate pairs carry a binary agreement vector over K compare
features. Each pair is a match with prior lambda; feature k agrees with
probability m_k among matches and u_k among non-matches. EM alternates
the posterior match probability per pair (E) with the maximum-
likelihood parameter update (M).

The scale insight (Splink's too): the E-step depends only on the
agreement PATTERN, so the corpus-scale work collapses to ONE groupBy
over the pairs producing at most 2^K pattern counts — a bounded
dimension table. EM then iterates on those counts alone.

Exactness design: the EM iteration is generated ONCE as SQL text
(`em_query`) and evaluated by BOTH engines — Spark runs it via
spark.sql over the collected count literals (the Lloyd-centroid
driver-dimension pattern), DuckDB runs the identical text over a
count-pivot CTE. Every float expression is therefore the same
operation tree over the same exact integers: products in fixed k
order, pattern sums in fixed p order (an explicit chained `+`, never
an order-free SUM aggregate), round(,8) + clamp after every parameter
update so both engines re-enter each iteration on identical doubles.
No tolerance anywhere; the driver oracle is hash-exact.

Reference scope: the Careers reference resolves surface forms to
canonical entities with hand-tuned weights (AmbiguityForest.scala);
FS-EM is the principled, learned version of the same
agreement-weighting idea, included as first-class ER machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CLAMP_LO = "0.000001e0"
_CLAMP_HI = "0.999999e0"


def _clamp8(x: str) -> str:
    return f"least(greatest(round({x}, 8), {_CLAMP_LO}), {_CLAMP_HI})"


def _gamma_expr(p: int, K: int) -> str:
    """Posterior match probability for pattern p under the CURRENT
    scope's (lam, m_k, u_k) — products in fixed k order."""
    tm = " * ".join(
        f"m{k}" if (p >> k) & 1 else f"(1e0 - m{k})" for k in range(K)
    )
    tu = " * ".join(
        f"u{k}" if (p >> k) & 1 else f"(1e0 - u{k})" for k in range(K)
    )
    wm = f"(lam * {tm})"
    wu = f"((1e0 - lam) * {tu})"
    return f"round({wm} / ({wm} + {wu}), 8)"


def _em_pieces(K: int):
    """The shared expression texts: (param column list, count column
    list, gamma select-items, S chain, per-iteration param exprs)."""
    P = 1 << K
    ncols = ", ".join(f"n{p}" for p in range(P)) + ", ntot"
    params = (
        "lam, "
        + ", ".join(f"m{k}" for k in range(K))
        + ", "
        + ", ".join(f"u{k}" for k in range(K))
    )
    gammas = [f"{_gamma_expr(p, K)} AS gam{p}" for p in range(P)]
    s_chain = " + ".join(f"gam{p} * n{p}" for p in range(P))
    upd = [f"{_clamp8('s / ntot')} AS lam"]
    for k in range(K):
        hits = [p for p in range(P) if (p >> k) & 1]
        mnum = " + ".join(f"gam{p} * n{p}" for p in hits)
        upd.append(f"{_clamp8(f'({mnum}) / s')} AS m{k}")
    for k in range(K):
        hits = [p for p in range(P) if (p >> k) & 1]
        unum = " + ".join(f"(1e0 - gam{p}) * n{p}" for p in hits)
        upd.append(f"{_clamp8(f'({unum}) / (ntot - s)')} AS u{k}")
    return params, ncols, gammas, s_chain, upd


def em_query(
    count_sql: str,
    K: int,
    iters: int = 10,
    lam0: str = "0.1e0",
    m0: str = "0.9e0",
    u0: str = "0.1e0",
) -> str:
    """The full unrolled EM as one SQL query for the DuckDB oracle.
    Every CTE is MATERIALIZED — without it an inlining optimizer
    (Catalyst does this; DuckDB can) substitutes each iteration's
    expressions into the next and the tree grows exponentially.
    `count_sql` must yield ONE row with columns n0..n{2^K-1} (pattern
    id = sum of bit_k << k) and ntot. Returns: lam, m0.., u0..,
    gam0..gam{2^K-1} — converged parameters + final E-step
    posteriors."""
    P = 1 << K
    params, ncols, gammas, s_chain, upd = _em_pieces(K)
    init = (
        f"SELECT {lam0} AS lam, "
        + ", ".join(f"{m0} AS m{k}" for k in range(K))
        + ", "
        + ", ".join(f"{u0} AS u{k}" for k in range(K))
        + f", {ncols} FROM cnt"
    )
    ctes = [
        f"cnt AS MATERIALIZED ({count_sql})",
        f"fs0 AS MATERIALIZED ({init})",
    ]
    gsel = ", ".join(gammas)
    for it in range(1, int(iters) + 1):
        ctes.append(
            f"g{it} AS MATERIALIZED (SELECT {params}, {ncols}, {gsel} "
            f"FROM fs{it - 1})"
        )
        ctes.append(
            f"s{it} AS MATERIALIZED (SELECT *, ({s_chain}) AS s FROM g{it})"
        )
        ctes.append(
            f"fs{it} AS MATERIALIZED (SELECT "
            + ", ".join(upd)
            + f", {ncols} FROM s{it})"
        )
    ctes.append(
        f"gfin AS MATERIALIZED (SELECT {params}, {ncols}, {gsel} "
        f"FROM fs{int(iters)})"
    )
    gcols = ", ".join(f"gam{p}" for p in range(P))
    return "WITH " + ",\n".join(ctes) + f"\nSELECT {params}, {gcols} FROM gfin"


def _round8_py(x: float) -> float:
    """Scalar twin of Spark round(double, 8) — shortest-repr decimal
    HALF_UP (the similarity._np_round_half_up contract, reused here so
    the emulation is pinned by one shared test surface)."""
    import numpy as np

    from careers_spark.operators.similarity import _np_round_half_up

    return float(_np_round_half_up(np.array([x]), 8)[0])


def _clamp8_py(x: float) -> float:
    """least(greatest(round(x, 8), LO), HI) with Spark NaN ordering
    (NaN compares greater than any double, so it survives greatest and
    loses least -> HI)."""
    import math

    lo, hi = float(_CLAMP_LO), float(_CLAMP_HI)
    r = _round8_py(x)
    if math.isnan(r):
        return hi
    return min(max(r, lo), hi)


def _em_converge_py(obs: dict[int, int], K: int, iters: int):
    """The identical EM chain evaluated in Python floats — binary64
    * / + - are correctly rounded in both runtimes, products and
    pattern sums keep the generated expressions' fixed order, and
    round/clamp re-enter each iteration on the same 8-dp doubles, so
    every iterate matches the Spark/DuckDB expression tree bit-for-bit
    (pinned against the retained Spark loop in tests). Returns
    (lam, m[], u[], gam{p}) after `iters` rounds + one final E-step."""
    P = 1 << K
    n = [float(obs.get(p, 0)) for p in range(P)]
    ntot = float(sum(obs.values()))
    lam = 0.1
    m = [0.9] * K
    u = [0.1] * K

    def gammas():
        out = []
        for p in range(P):
            tm = 1.0
            tu = 1.0
            # products in fixed k order, matching _gamma_expr's
            # left-to-right chain
            for k in range(K):
                tm = tm * (m[k] if (p >> k) & 1 else (1.0 - m[k]))
                tu = tu * (u[k] if (p >> k) & 1 else (1.0 - u[k]))
            wm = lam * tm
            wu = (1.0 - lam) * tu
            out.append(_round8_py(wm / (wm + wu)))
        return out

    for _ in range(int(iters)):
        gam = gammas()
        s = 0.0
        for p in range(P):  # fixed p order, chained +
            s = s + gam[p] * n[p]
        new_lam = _clamp8_py(s / ntot)
        new_m = []
        new_u = []
        for k in range(K):
            hits = [p for p in range(P) if (p >> k) & 1]
            mnum = 0.0
            for p in hits:
                mnum = mnum + gam[p] * n[p]
            new_m.append(_clamp8_py(mnum / s))
        for k in range(K):
            hits = [p for p in range(P) if (p >> k) & 1]
            unum = 0.0
            for p in hits:
                unum = unum + (1.0 - gam[p]) * n[p]
            new_u.append(_clamp8_py(unum / (ntot - s)))
        lam, m, u = new_lam, new_m, new_u
    return lam, m, u, gammas()


def fs_em_linkage_spark(
    pairs: DataFrame,
    features: list[str],
    iters: int = 10,
) -> DataFrame:
    """Run FS-EM over a candidate-pair frame whose `features` columns
    are booleans. One distributed groupBy collapses the pairs to
    pattern counts (<= 2^K rows collected — the bounded-dimension
    driver pattern); the shared `em_query` text then converges the
    parameters in Spark SQL itself, so the oracle's identical text is
    guaranteed the identical float tree.

    Output: one row per OBSERVED pattern — (<features...>, n_pairs,
    gamma, lam, m0.., u0..) with gamma the converged posterior match
    probability of that agreement pattern.
    """
    K = len(features)
    if not 1 <= K <= 6:
        raise ValueError("fs_em_linkage: 1..6 features supported")
    P = 1 << K
    spark: SparkSession = pairs.sparkSession

    cnts = pairs.groupBy(
        *[F.col(f).cast("boolean").alias(f) for f in features]
    ).agg(F.count("*").alias("n_pairs"))
    obs = {}
    for r in cnts.collect():
        p = sum((1 if r[f] else 0) << k for k, f in enumerate(features))
        obs[p] = int(r["n_pairs"])
    if not obs:
        raise ValueError("fs_em_linkage: no candidate pairs")

    # Spark-side iteration: the SAME expression texts as the oracle's
    # MATERIALIZED CTE chain, with localCheckpoint as the
    # materialization barrier — Catalyst inlines CTEs, so a nested
    # em_query would grow the expression tree exponentially with
    # iteration count (measured: unusable past ~3 iterations).
    params, ncols_s, gammas, s_chain, upd = _em_pieces(K)
    ncols = [c.strip() for c in ncols_s.split(",")]
    cur = spark.sql(
        "SELECT 0.1e0 AS lam, "
        + ", ".join(f"0.9e0 AS m{k}" for k in range(K))
        + ", "
        + ", ".join(f"0.1e0 AS u{k}" for k in range(K))
        + ", "
        + ", ".join(f"{obs.get(p, 0)}L AS n{p}" for p in range(P))
        + f", {sum(obs.values())}L AS ntot"
    ).localCheckpoint(eager=True)
    for _ in range(int(iters)):
        g = cur.selectExpr("*", *gammas)
        s = g.selectExpr("*", f"({s_chain}) AS s")
        cur = s.selectExpr(*upd, *ncols).localCheckpoint(eager=True)
    fin = cur.selectExpr("*", *gammas).collect()[0]

    rows = []
    for p in sorted(obs):
        rows.append(
            tuple(bool((p >> k) & 1) for k in range(K))
            + (obs[p], float(fin[f"gam{p}"]), float(fin["lam"]))
            + tuple(float(fin[f"m{k}"]) for k in range(K))
            + tuple(float(fin[f"u{k}"]) for k in range(K))
        )
    schema = (
        ", ".join(f"{f} boolean" for f in features)
        + ", n_pairs long, gamma double, lam double, "
        + ", ".join(f"m{k} double" for k in range(K))
        + ", "
        + ", ".join(f"u{k} double" for k in range(K))
    )
    return spark.createDataFrame(rows, schema)


def fs_em_linkage(
    pairs: DataFrame,
    features: list[str],
    iters: int = 10,
) -> DataFrame:
    """Run FS-EM over a candidate-pair frame whose `features` columns
    are booleans. One distributed groupBy collapses the pairs to
    pattern counts (<= 2^K rows collected — the bounded-dimension
    driver pattern); the parameter convergence then runs over that
    one row of counts.

    r6 physical rewrite (guide §1.2): the Spark-side loop spent one
    localCheckpoint job per EM iteration ON A ONE-ROW FRAME (10 jobs +
    2 collects to converge 2K+1 scalars). The chain is * / + - and
    round(,8)/clamp only, so Python binary64 reproduces the identical
    expression tree bit-for-bit (`_em_converge_py`, pinned against the
    retained `fs_em_linkage_spark` loop in tests) — the whole
    convergence is now driver arithmetic on the already-collected
    pattern counts: one Spark job total.

    Output: one row per OBSERVED pattern — (<features...>, n_pairs,
    gamma, lam, m0.., u0..) with gamma the converged posterior match
    probability of that agreement pattern.
    """
    K = len(features)
    if not 1 <= K <= 6:
        raise ValueError("fs_em_linkage: 1..6 features supported")
    spark: SparkSession = pairs.sparkSession

    cnts = pairs.groupBy(
        *[F.col(f).cast("boolean").alias(f) for f in features]
    ).agg(F.count("*").alias("n_pairs"))
    obs = {}
    for r in cnts.collect():
        p = sum((1 if r[f] else 0) << k for k, f in enumerate(features))
        obs[p] = int(r["n_pairs"])
    if not obs:
        raise ValueError("fs_em_linkage: no candidate pairs")

    lam, m, u, gam = _em_converge_py(obs, K, iters)

    rows = []
    for p in sorted(obs):
        rows.append(
            tuple(bool((p >> k) & 1) for k in range(K))
            + (obs[p], gam[p], lam)
            + tuple(m)
            + tuple(u)
        )
    schema = (
        ", ".join(f"{f} boolean" for f in features)
        + ", n_pairs long, gamma double, lam double, "
        + ", ".join(f"m{k} double" for k in range(K))
        + ", "
        + ", ".join(f"u{k} double" for k in range(K))
    )
    return spark.createDataFrame(rows, schema)
