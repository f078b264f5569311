"""Deterministic probabilistic sketches: k-minimums cardinality
estimation and a Bloom-filter membership screen — both built on the
md5 hash family shared with MinHash so every output is oracle-checkable
hash-exactly.

``approx_count_distinct`` (Spark's HLL++) and DuckDB's ``approx_distinct``
are different sketches with different estimates, so an HLL query can
never be oracle-checked hash-exactly. This module implements the
k-independent-minimums cardinality sketch (the Flajolet-Martin /
"MinCount" family; Giroire 2009): for k independent uniform hash
functions, the minimum of n uniform(0,1) draws has expectation
1/(n+1), and the sum of k independent minima is Gamma(k, 1/(n+1)),
whose MLE gives

    n_est = k / sum_j(min_j) - 1        (stderr ~ n / sqrt(k))

Why this sketch and not KMV (k-smallest values of ONE hash): KMV needs
the k smallest elements per group — a per-group top-k, i.e. a sort or
heap. k independent minima are k plain ``min`` AGGREGATES: fully
algebraic, map-side combinable, one partial-agg shuffle on the group
key, zero sorts — the same physical shape as a count(*). At 10^12 rows
the sketch costs exactly one groupBy pass regardless of k.

Determinism/oracle-exactness: the hash family is the md5-derived affine
family shared with MinHash (dedup.py:26-28) — integer min is exact, and
the estimator folds the k minima in FIXED index order (an explicit
m_0/P + m_1/P + ... chain, not an aggregate), so both engines evaluate
the identical IEEE-double expression and the result hash-matches with
a final round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.dedup import (
    MINHASH_A0,
    MINHASH_A_STEP,
    MINHASH_B0,
    MINHASH_B_STEP,
    MINHASH_P,
    _hash64_expr,
)


def kmin_terms(key_sql: str, k: int) -> list[str]:
    """The k per-group minimum expressions (SQL, engine-portable)."""
    h = _hash64_expr(key_sql)
    out = []
    for j in range(k):
        a = MINHASH_A0 + j * MINHASH_A_STEP
        b = MINHASH_B0 + j * MINHASH_B_STEP
        out.append(f"min(({h} * {a} + {b}) % {MINHASH_P})")
    return out


def kmin_estimate_sql(k: int) -> str:
    """n_est from columns m0..m{k-1}, folded in fixed index order.

    Literals carry the ``e0`` exponent suffix: Spark parses a bare
    ``123.0`` as DECIMAL and would run the whole fold in decimal
    arithmetic (different rounding, Decimal output); ``123e0`` is a
    DOUBLE literal in both Spark and DuckDB.
    """
    s = " + ".join(f"(m{j} / {MINHASH_P}e0)" for j in range(k))
    return f"round({k}e0 / ({s}) - 1e0, 4)"


def bloom_position_exprs(col_sql: str, k: int, m: int, duck: bool = False) -> list[str]:
    """The k Bloom bit positions of a key — Kirsch-Mitzenmacher double
    hashing, ``pos_j = (h1 + j * h2) mod m``, which provably preserves
    the Bloom false-positive bound with only TWO base hashes (Kirsch &
    Mitzenmacher 2006). h1/h2 are the first/second 32-bit halves of the
    md5 (h2 forced odd so the probe stride never degenerates), identical
    in Spark and DuckDB, so the screen below is oracle-checkable
    hash-exactly."""
    if duck:
        h1 = f"('0x' || substr(md5({col_sql}), 1, 8))::BIGINT"
        h2 = f"(('0x' || substr(md5({col_sql}), 9, 8))::BIGINT * 2 + 1)"
    else:
        h1 = f"cast(conv(substr(md5({col_sql}), 1, 8), 16, 10) as bigint)"
        h2 = f"(cast(conv(substr(md5({col_sql}), 9, 8), 16, 10) as bigint) * 2 + 1)"
    return [f"(({h1} + {j} * {h2}) % {m})" for j in range(k)]


def bloom_contamination_screen(
    documents: DataFrame,
    eval_pred: str,
    n: int = 3,
    k: int = 4,
    m: int = 4096,
    threshold: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter instead of the
    exact eval-shingle set (dedup.contamination_flags) — the constant-
    memory screen used when the eval suite is too large to broadcast as
    strings.

    The filter state is the set of SET BIT POSITIONS of the eval
    split's n-gram shingles: at most ``m`` integers no matter how many
    eval shingles exist — that bound, not the eval corpus size, is what
    ships to every executor (at real scale: m ~ 10 bits per eval
    shingle gives ~1% FP; 10^8 eval shingles -> a 125 MB bitset, still
    a broadcast). A shingle screens "possibly contaminated" iff ALL k
    probe positions are set: misses are impossible (every inserted
    shingle set exactly those bits — the Bloom no-false-negative
    theorem), false positives happen when k independent collisions
    line up, at rate (1 - e^(-k*n_eval/m))^k.

    Physical shape: the k-probe explode runs over the train VOCABULARY
    (distinct shingles), not the (doc, shingle) pair table; position
    membership is a broadcast join; everything aggregating is
    partial-agg friendly. The exact screen rides along per distinct
    shingle so the output machine-exhibits the FP overcount
    (n_bloom >= n_exact always; `bloom_fp` counts the overshoot).

    Output per TRAIN doc: (doc_id, n_shingles, n_bloom, n_exact,
    bloom_fp, contaminated) — `contaminated` is the Bloom decision
    (the deployable one; conservative by construction).
    """
    from careers_spark.operators.dedup import doc_shingles

    sh = doc_shingles(documents, n)
    eval_ids = documents.filter(eval_pred).select("doc_id")
    eval_sh = (
        sh.join(F.broadcast(eval_ids), "doc_id", "left_semi")
        .select("sh").distinct()
    )
    pos = bloom_position_exprs("sh", k, m)
    eval_pos = (
        eval_sh.select(F.explode(F.array(*[F.expr(p) for p in pos])).alias("bit"))
        .distinct()
        .withColumn("set_", F.lit(1))
    )
    train = sh.join(F.broadcast(eval_ids), "doc_id", "left_anti")
    vocab = train.select("sh").distinct()
    vocab_bloom = (
        vocab.select("sh", F.posexplode(F.array(*[F.expr(p) for p in pos])).alias("j", "bit"))
        .join(F.broadcast(eval_pos), "bit", "left")
        .groupBy("sh")
        .agg((F.sum(F.coalesce("set_", F.lit(0))) == k).alias("bloom_hit"))
    )
    vocab_flags = vocab_bloom.join(
        F.broadcast(eval_sh.withColumn("exact_hit", F.lit(True))), "sh", "left"
    ).select(
        "sh", "bloom_hit", F.coalesce("exact_hit", F.lit(False)).alias("exact_hit")
    )
    per = (
        train.join(vocab_flags, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom"),
            F.sum(F.col("exact_hit").cast("long")).alias("n_exact"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_bloom",
        "n_exact",
        (F.col("n_bloom") - F.col("n_exact")).alias("bloom_fp"),
        (F.col("n_bloom") / F.col("n_shingles") >= threshold).alias("contaminated"),
    )


def distinct_sketch(
    df: DataFrame,
    group: str,
    key_sql: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate vs exact, in ONE aggregation.

    Output: (<group>, n_exact, n_est, rel_err) — ``n_exact`` via exact
    count(distinct) for calibration (itself a two-phase algebraic agg),
    ``n_est`` the k-minimums estimate, ``rel_err`` their relative gap.
    At sketch-only scale drop the exact column; the sketch alone is a
    single partial-agg pass.
    """
    # hash once per row; the k affine mixes ride the one md5 (the oracle
    # recomputes it inline — semantically identical, DuckDB CSE's it)
    aggs = [
        F.expr(
            f"min((_kmh * {MINHASH_A0 + j * MINHASH_A_STEP}"
            f" + {MINHASH_B0 + j * MINHASH_B_STEP}) % {MINHASH_P})"
        ).alias(f"m{j}")
        for j in range(k)
    ]
    aggs.append(F.expr(f"count(distinct {key_sql})").alias("n_exact"))
    return (
        df.withColumn("_kmh", F.expr(_hash64_expr(key_sql)))
        .groupBy(group)
        .agg(*aggs)
        .withColumn("n_est", F.expr(kmin_estimate_sql(k)))
        .withColumn(
            "rel_err",
            F.expr("round(abs(n_est - n_exact) / n_exact, 4)"),
        )
        .select(group, "n_exact", "n_est", "rel_err")
    )


def count_min_heavy_hitters(
    documents: DataFrame,
    d: int = 4,
    w: int = 1024,
    threshold: int = 100,
) -> DataFrame:
    """Heavy-hitter detection through a Count-Min sketch (Cormode &
    Muthukrishnan 2005) — the bounded-memory "which tokens are hot"
    screen a streaming/low-memory path uses instead of the exact
    word-count table. d rows x w cells; every cell holds the sum of the
    counts of all terms hashing into it, so

        est(t) = min_j sketch[j][cell_j(t)]  >=  true(t)

    — one-sided error (the CM theorem): a true heavy hitter can NEVER
    be missed, and overcounts are collision mass bounded by
    N/w per row w.h.p. The output machine-exhibits both halves:
    ``est >= threshold`` is the deployable screen, ``is_true_heavy``
    and ``overcount`` show its precision on this corpus.

    Cell positions reuse the Kirsch-Mitzenmacher double-hash family
    (bloom_position_exprs with m=w) — two md5 halves, engine-identical,
    so the whole sketch is oracle-checkable hash-exactly; every
    quantity is an integer count.

    Physical shape at scale: ONE partial-agg token count (the word_count
    shuffle — the sketch is built FROM the term-count table, which is
    vocabulary-sized, not corpus-sized); the d-row explode, the
    (j, cell) aggregation (d*w cells), and the probe join are all
    vocabulary-bounded; the d*w sketch is a broadcast. In a genuinely
    streaming setting the same cell expressions fold into
    one groupBy(j, cell) directly over the stream with no vocabulary
    table at all — the operator keeps the exact counts only to exhibit
    the error bound.

    Output: (term, est, true_cnt, overcount, is_true_heavy) for terms
    with est >= threshold, est/true_cnt BIGINT.
    """
    from careers_spark.operators.dedup import tokens_col

    counts = (
        documents.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    pos = bloom_position_exprs("term", d, w)
    cells = counts.select(
        "cnt", F.posexplode(F.array(*[F.expr(p) for p in pos])).alias("j", "cell")
    )
    sketch = cells.groupBy("j", "cell").agg(F.sum("cnt").alias("cell_sum"))
    probes = counts.select(
        "term",
        "cnt",
        F.posexplode(F.array(*[F.expr(p) for p in pos])).alias("j", "cell"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("term", "cnt")
        .agg(F.min("cell_sum").alias("est"))
    )
    return est.filter(F.col("est") >= threshold).select(
        "term",
        "est",
        F.col("cnt").alias("true_cnt"),
        (F.col("est") - F.col("cnt")).alias("overcount"),
        (F.col("cnt") >= threshold).alias("is_true_heavy"),
    )


# ---- deterministic HyperLogLog ---------------------------------------
# Spark's approx_count_distinct and DuckDB's approx_distinct are
# different HLL++ variants, so the BUILT-IN sketches can never
# hash-match. This is HLL implemented from its definition on the shared
# md5 hash, so registers, merges, and the estimate are engine-exact.
# What it adds over the k-minimums sketch above: MERGEABILITY — register
# vectors union by elementwise max, so per-partition/per-day/per-source
# sketches combine into any rollup without rescanning data (the
# production use of HLL at warehouse scale).


def hll_rho_expr(w_col: str, wbits: int) -> str:
    """rho = leading zeros of the (wbits)-wide suffix + 1, as a pure
    integer CASE chain (no float log2 — exact in both engines)."""
    whens = " ".join(
        f"WHEN {w_col} >= {1 << (wbits - r)} THEN {r}"
        for r in range(1, wbits + 1)
    )
    return f"CASE WHEN {w_col} = 0 THEN {wbits + 1} {whens} END"


def hll_estimate_expr(m: int, wbits: int) -> str:
    """The HLL estimator over (s_int, n_present) where s_int =
    sum(2^(SCALE - M_j)) for present buckets on the 2^-SCALE integer
    lattice (SCALE = wbits + 2 >= every register, so terms are exact
    positive integers and the sum is order-free), absent buckets
    carrying register 0. alpha for m >= 128 (Flajolet et al. 2007);
    linear counting below 2.5m with zero registers (ln is the
    established cross-engine-lockstep libm call). 32-bit hash space:
    the large-range correction is out of reach of these corpora and
    deliberately omitted (documented)."""
    scale = wbits + 2
    alpha = "0.7213e0 / (1e0 + 1.079e0 / {m}e0)".format(m=m)
    s_full = f"(s_int + ({m} - n_present) * {1 << scale})"
    raw = f"({alpha}) * {m}e0 * {m}e0 * {1 << scale}e0 / {s_full}"
    v = f"({m} - n_present)"
    return (
        f"CASE WHEN ({raw}) <= 2.5e0 * {m} AND {v} > 0 "
        f"THEN round({m} * ln({m}e0 / {v}), 4) "
        f"ELSE round({raw}, 4) END"
    )


def hll_registers(
    df: DataFrame, group: str, key_sql: str, p: int = 8
) -> DataFrame:
    """(group, bucket, M) register table — the mergeable sketch state.
    One partial-agg groupBy (max is algebraic); at most 2^p rows per
    group survive. Registers from different frames/groups merge by
    groupBy(bucket).max(M) — pure algebra, no data rescan."""
    m = 1 << int(p)
    wbits = 32 - int(p)
    return (
        df.withColumn("_h", F.expr(_hash64_expr(key_sql)))
        .select(
            F.col(group).alias("grp"),
            F.expr(f"_h % {m}").alias("bucket"),
            F.expr(hll_rho_expr(f"(_h div {m})", wbits)).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_distinct(
    df: DataFrame,
    group: str,
    key_sql: str,
    p: int = 8,
    with_merged_total: bool = True,
) -> DataFrame:
    """Per-group HLL distinct estimate vs exact, plus (by default) a
    '__all__' row whose registers are the MERGE of the per-group
    registers — proving in-query that union-by-max reproduces the
    direct global sketch without touching the rows again.

    Output: (grp, n_exact, n_est, rel_err).
    """
    m = 1 << int(p)
    wbits = 32 - int(p)
    scale = wbits + 2
    regs = hll_registers(df, group, key_sql, p)

    def estimate(r: DataFrame) -> DataFrame:
        per = r.groupBy("grp").agg(
            F.expr(f"sum(shiftleft(1L, {scale} - M))").alias("s_int"),
            F.count("*").alias("n_present"),
        )
        return per.select(
            "grp", F.expr(hll_estimate_expr(m, wbits)).alias("n_est")
        )

    est = estimate(regs)
    if with_merged_total:
        merged = regs.groupBy("bucket").agg(F.max("M").alias("M")).select(
            F.lit("__all__").alias("grp"), "bucket", "M"
        )
        est = est.unionByName(estimate(merged))

    exact = df.groupBy(F.col(group).alias("grp")).agg(
        F.expr(f"count(distinct {key_sql})").alias("n_exact")
    )
    if with_merged_total:
        exact = exact.unionByName(
            df.agg(
                F.expr(f"count(distinct {key_sql})").alias("n_exact")
            ).select(F.lit("__all__").alias("grp"), "n_exact")
        )
    return exact.join(est, "grp").select(
        "grp",
        "n_exact",
        "n_est",
        F.expr("round(abs(n_est - n_exact) / n_exact, 4)").alias("rel_err"),
    )


def hll_overlap(
    df: DataFrame,
    group: str,
    key_sql: str,
    p: int = 8,
) -> DataFrame:
    """Pairwise audience-overlap estimates between groups from their
    HLL sketches alone — the sketch set algebra warehouses run on
    billions of users: |A ∩ B| = E(A) + E(B) - E(A ∪ B), where the
    union sketch is just the elementwise register max (no rescan of
    either side's rows; inclusion-exclusion inherits HLL's error).

    Everything reuses the deterministic register/estimator machinery
    (integer registers, dyadic estimator sum, lockstep ln), so the
    whole pairwise matrix is oracle-exact. The pair fan-out works on
    REGISTER tables (2^p rows per group — dimension-sized), never on
    rows.

    Output: (grp_a, grp_b, est_a, est_b, est_union, est_overlap),
    grp_a < grp_b.
    """
    m = 1 << int(p)
    wbits = 32 - int(p)
    scale = wbits + 2
    regs = hll_registers(df, group, key_sql, p)

    def estimate(r: DataFrame, keys: list[str]) -> DataFrame:
        per = r.groupBy(*keys).agg(
            F.expr(f"sum(shiftleft(1L, {scale} - M))").alias("s_int"),
            F.count("*").alias("n_present"),
        )
        return per.select(
            *keys, F.expr(hll_estimate_expr(m, wbits)).alias("est")
        )

    singles = estimate(regs, ["grp"])
    # union registers: buckets present in only ONE side still belong
    # to the union (an inner bucket join would drop them), so each
    # pair's register set is the UNION ALL of both sides' registers
    # reduced by max
    pairs = (
        singles.select(F.col("grp").alias("grp_a"))
        .crossJoin(singles.select(F.col("grp").alias("grp_b")))
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    tagged = (
        pairs.join(regs, pairs.grp_a == regs.grp)
        .select("grp_a", "grp_b", "bucket", "M")
        .unionByName(
            pairs.join(regs, pairs.grp_b == regs.grp).select(
                "grp_a", "grp_b", "bucket", "M"
            )
        )
    )
    union_est = estimate(
        tagged.groupBy("grp_a", "grp_b", "bucket").agg(
            F.max("M").alias("M")
        ),
        ["grp_a", "grp_b"],
    ).withColumnRenamed("est", "est_union")
    ea = singles.select(
        F.col("grp").alias("grp_a"), F.col("est").alias("est_a")
    )
    eb = singles.select(
        F.col("grp").alias("grp_b"), F.col("est").alias("est_b")
    )
    return (
        union_est.join(ea, "grp_a")
        .join(eb, "grp_b")
        .select(
            "grp_a",
            "grp_b",
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_overlap"),
        )
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Equi-join cardinality estimation by Count-Min inner product
    (Cormode & Muthukrishnan 2005, §4.2) — the query-planner primitive
    that decides broadcast-vs-shuffle and flags exploding joins BEFORE
    paying for them: |L join R| = sum_k cL(k)*cR(k), and the CM
    estimate min_j sum_cell A_j[cell]*B_j[cell] is ONE-SIDED
    (estimate >= true, never an undercount — colliding keys only ADD
    cross terms), with overshoot bounded by |L|*|R|/w per row w.h.p.

    The exact size rides along (a vocabulary-sized count join, cheap
    at these SFs) so the output machine-exhibits the theorem:
    cms_estimate >= exact_size on every run. In production only the
    two d x w sketches meet — each side's sketch builds in one
    partial-agg pass and is a broadcast regardless of key cardinality,
    which is the point: the planner estimates the join without
    shuffling either input.

    Everything is integer counts on the shared Kirsch-Mitzenmacher
    md5 double-hash family — oracle-exact.

    Output: ONE row (exact_size, cms_estimate, overestimate_ratio,
    d, w).
    """
    def side_counts(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(F.col(key).cast("string").alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("cnt"))
        )

    cl, cr = side_counts(left, key_left), side_counts(right, key_right)
    pos = bloom_position_exprs("k", d, w)

    def sketch(counts: DataFrame, name: str) -> DataFrame:
        return (
            counts.select(
                "cnt",
                F.posexplode(
                    F.array(*[F.expr(p) for p in pos])
                ).alias("j", "cell"),
            )
            .groupBy("j", "cell")
            .agg(F.sum("cnt").alias(name))
        )

    inner = (
        sketch(cl, "a").join(sketch(cr, "b"), ["j", "cell"])
        .groupBy("j")
        .agg(F.sum(F.col("a") * F.col("b")).alias("ip"))
        .agg(F.min("ip").alias("cms_estimate"))
    )
    exact = (
        cl.join(cr.withColumnRenamed("cnt", "cnt_r"), "k")
        .agg(
            F.coalesce(
                F.sum(F.col("cnt") * F.col("cnt_r")), F.lit(0)
            ).cast("long").alias("exact_size")
        )
    )
    return exact.crossJoin(inner).select(
        "exact_size",
        "cms_estimate",
        F.expr(
            "case when exact_size > 0 then "
            "round(cms_estimate / cast(exact_size as double), 6) end"
        ).alias("overestimate_ratio"),
        F.lit(int(d)).alias("d"),
        F.lit(int(w)).alias("w"),
    )


def bitmap_distinct(
    events: DataFrame,
    group: str = "event_type",
    key: str = "user_id",
) -> DataFrame:
    """EXACT mergeable distinct counting via bitmap words — the
    ClickHouse/Doris `groupBitmap` technique that replaces HLL when
    the answer must be exact AND re-aggregable: each non-negative key
    sets one bit (word = key div 63, bit = key mod 63 — 63 bits per
    word keeps every mask a positive BIGINT; bit 63 would overflow
    DuckDB's left shift and wrap Spark's), per-(group, word) masks
    fold with the ALGEBRAIC bit_or aggregate (map-side combinable,
    constant state per word), and the distinct count is the bit_count
    sum. UNLIKE a count-distinct, the mask table is a reusable
    artifact: any rollup of groups is a word-aligned bit_or — no
    rescan, no approximation (HLL's merge property with exactness).

    Both properties are machine-exhibited in the output: every group
    row carries the exact countDistinct beside the bitmap count
    (equal by the bijection key <-> (word, bit)), and the '__ALL__'
    row is computed ONLY from the per-group masks (word-level bit_or
    re-aggregation), equaling the direct global distinct.

    State per group = (max key / 63) words worst case — dense-id
    domains (the FK/user-id case this targets); sparse or huge
    domains are HLL's territory (`hll_registers`).

    Output: (group, n_distinct_bitmap, n_distinct_exact, words_used);
    group = '__ALL__' for the merged-rollup row.
    """
    base = events.select(
        F.col(group).cast("string").alias("g"), F.col(key).alias("k")
    )
    masks = (
        base.select(
            "g",
            F.expr("k div 63").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(k % 63 as int))").alias(
                "m"
            ),
        )
        .groupBy("g", "word")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )
    per_group = masks.groupBy("g").agg(
        F.sum(F.expr("bit_count(mask)")).cast("long").alias(
            "n_distinct_bitmap"
        ),
        F.count("*").alias("words_used"),
    )
    exact = base.groupBy("g").agg(
        F.countDistinct("k").alias("n_distinct_exact")
    )
    rolled = (
        masks.groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
        .agg(
            F.sum(F.expr("bit_count(mask)")).cast("long").alias(
                "n_distinct_bitmap"
            ),
            F.count("*").alias("words_used"),
        )
        .withColumn("g", F.lit("__ALL__"))
    )
    all_exact = base.agg(
        F.countDistinct("k").alias("n_distinct_exact")
    ).withColumn("g", F.lit("__ALL__"))
    out = per_group.join(exact, "g").unionByName(
        rolled.join(all_exact, "g")
    )
    return out.select(
        F.col("g").alias(group),
        "n_distinct_bitmap",
        "n_distinct_exact",
        "words_used",
    )


def haar_synopsis(
    events: DataFrame,
    ts: str = "ts",
    t_pow: int = 10,
    top_b: int = 32,
) -> DataFrame:
    """Haar wavelet synopsis of the hourly volume series (Matias,
    Vitter & Wang SIGMOD'98) — the classic B-term approximate-query-
    processing summary: keep the B largest-energy wavelet coefficients
    and answer range aggregates from them with an L2 error bound that
    Parseval makes EXACT and integer, exhibited in the output itself.

    The transform is the UNNORMALIZED Haar pyramid on the zero-padded
    2^t_pow hourly grid (rebased to the corpus min hour): level l
    pairs level l-1 via one groupBy(i div 2) computing sum and
    difference — integers throughout, no sqrt(2) anywhere. The
    normalized energy of detail d at level l is d^2 / 2^l, so every
    energy is carried as the BIGINT d^2 * 2^(t_pow - l); top-B
    selection orders by that scaled integer (tie: level, idx) and by
    Parseval the residual L2^2 * 2^t_pow = total - kept - approx
    exactly. Levels run on the bounded GRID table (2^t_pow rows, then
    halving) — raw rows feed only the first hourly groupBy; the level
    loop is t_pow dimension-sized jobs, the Lloyd-loop cost shape.

    Overflow guard: energies are BIGINT, so the total event count must
    stay below 2^26 (d <= N, d^2 * 2^t_pow < 2^63); RAISES past it —
    the documented swap at larger corpora is the embedding_gramian
    DECIMAL(38,0)/HUGEINT recipe. The hour span must fit the grid
    (RAISES otherwise).

    Output: (kind, level, idx, coef, energy_x2l) — top-B 'detail'
    rows, the always-kept 'approx' (DC) row, and one 'residual' row
    whose energy_x2l is the exact scaled L2^2 reconstruction error.
    """
    T = 1 << int(t_pow)
    hour_us = 3_600_000_000
    hourly = (
        events.select(
            F.expr(f"unix_micros(cast({ts} as timestamp)) div {hour_us}").alias(
                "h"
            )
        )
        .groupBy("h")
        .agg(F.count("*").alias("y"))
    )
    stats = hourly.agg(
        F.min("h").alias("h0"),
        F.max("h").alias("h1"),
        F.sum("y").alias("n"),
    ).collect()[0]
    if stats.n is None:
        raise ValueError("haar_synopsis: empty input")
    if stats.h1 - stats.h0 + 1 > T:
        raise ValueError(
            f"haar_synopsis: span {stats.h1 - stats.h0 + 1}h exceeds the "
            f"2^{t_pow} grid; raise t_pow"
        )
    if stats.n >= (1 << 26):
        raise ValueError(
            "haar_synopsis: total count >= 2^26 would overflow BIGINT "
            "energies; swap to the DECIMAL(38,0) recipe"
        )
    spark = events.sparkSession
    grid = (
        spark.range(T)
        .withColumnRenamed("id", "i")
        .join(
            hourly.select(
                (F.col("h") - F.lit(int(stats.h0))).alias("i"), "y"
            ),
            "i",
            "left",
        )
        .select("i", F.coalesce("y", F.lit(0)).alias("a"))
    )
    total = grid.agg(
        F.sum(F.expr(f"a * a * cast({T} as bigint)")).alias("e")
    )
    details = []
    cur = grid
    for lvl in range(1, int(t_pow) + 1):
        nxt = cur.groupBy(F.expr("i div 2").alias("i")).agg(
            F.sum("a").alias("a"),
            F.sum(F.expr("case when i % 2 = 0 then a else -a end")).alias(
                "d"
            ),
        )
        scale = 1 << (int(t_pow) - lvl)
        details.append(
            nxt.select(
                F.lit("detail").alias("kind"),
                F.lit(lvl).alias("level"),
                F.col("i").cast("long").alias("idx"),
                F.col("d").alias("coef"),
                F.expr(f"d * d * cast({scale} as bigint)").alias(
                    "energy_x2l"
                ),
            )
        )
        cur = nxt.select("i", "a").localCheckpoint(eager=True)
    approx = cur.select(
        F.lit("approx").alias("kind"),
        F.lit(int(t_pow)).alias("level"),
        F.lit(0).cast("long").alias("idx"),
        F.col("a").alias("coef"),
        F.expr("a * a").alias("energy_x2l"),
    )
    alldet = details[0]
    for d in details[1:]:
        alldet = alldet.unionByName(d)
    top = alldet.orderBy(
        F.desc("energy_x2l"), "level", "idx"
    ).limit(int(top_b))
    kept = top.unionByName(approx)
    resid = (
        kept.agg(F.sum("energy_x2l").alias("k"))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit("residual").alias("kind"),
            F.lit(None).cast("int").alias("level"),
            F.lit(None).cast("long").alias("idx"),
            F.lit(None).cast("long").alias("coef"),
            (F.col("e") - F.col("k")).alias("energy_x2l"),
        )
    )
    return kept.unionByName(resid)


def ams_f2(
    documents: DataFrame,
    k: int = 16,
    salt: str = "ams0",
) -> DataFrame:
    """Alon-Matias-Szegedy F2 sketch (STOC'96, the Godel-prize
    second-frequency-moment estimator) over the token stream, beside
    the exact F2 = sum c_t^2 it estimates. F2 is the self-join size /
    skew moment a planner wants before shuffling on a key.

    The sketch is why this is a SCALE operator: each estimator X_j =
    (sum_t s_j(t) * c_t)^2 needs only the signed sum over raw token
    OCCURRENCES — sum_occ s_j(tok) — so all k signed sums are ONE
    map-side-combinable aggregation over the exploded stream with NO
    per-token groupBy, O(k) state per partition (the streaming/AMS
    point). The exact F2 (which DOES need the token aggregation) is
    computed beside it as the certificate the estimate is judged
    against. Signs are derandomized md5 bits (s = md5(tok|j|salt)%2
    *2-1), so every X_j is an exact INTEGER and engine-identical;
    E[X_j] = F2 by 2-wise independence, mean-of-k one division.

    Output: one row per estimator (kind='x', j, value = X_j) plus
    ('exact', NULL, F2) and ('est', NULL, round(mean X_j)) — the whole
    sketch is machine-checkable, not just the estimate.
    """
    from careers_spark.operators.dedup import tokens_col

    occ = documents.select(
        F.explode(tokens_col("text")).alias("tok")
    )
    sign = (
        "(cast(conv(substr(md5(concat(tok, '|', '{j}', '|', '{s}')), 1, 8),"
        " 16, 10) as bigint) % 2 * 2 - 1)"
    )
    sums = occ.agg(
        *[
            F.sum(F.expr(sign.format(j=j, s=salt))).alias(f"s{j}")
            for j in range(int(k))
        ]
    )
    xs = sums.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(f"s{j} * s{j}").alias("value"),
                    )
                    for j in range(int(k))
                ]
            )
        ).alias("e")
    ).select(
        F.lit("x").alias("kind"),
        F.col("e.j").alias("j"),
        F.col("e.value").alias("value"),
    )
    exact = (
        occ.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * c")).alias("value"))
        .select(
            F.lit("exact").alias("kind"),
            F.lit(None).cast("int").alias("j"),
            "value",
        )
    )
    est = xs.agg(
        F.expr("cast(round(avg(value), 0) as bigint)").alias("value")
    ).select(
        F.lit("est").alias("kind"),
        F.lit(None).cast("int").alias("j"),
        "value",
    )
    return xs.unionByName(exact).unionByName(est)


def chao1_richness(df: DataFrame, key: str) -> DataFrame:
    """Chao1 species-richness estimator (Chao 1984) of the TOTAL
    distinct-key population from an observed sample — "how many
    distinct users / tokens / entities exist, including the ones this
    sample never saw":

        chao1 = d_obs + f1 * (f1 - 1) / (2 * (f2 + 1))

    (the bias-corrected form, finite even with no doubletons) where f1
    and f2 are the singleton and doubleton counts of the
    frequency-of-frequencies table — the capacity-planning complement
    to hll_distinct_users (which counts what IS here) and the
    population-side sibling of good_turing's unseen MASS (which
    weighs it). The undetected-count lower bound f1^2/(2 f2) is what a
    crawler uses to decide whether another fetch round is worth it.

    Exactness: d_obs, f1, f2 are exact integers from one per-key
    count rollup + one fof rollup (bounded by the distinct count
    values); chao1 and the classic Chao variance close as shared-text
    doubles with ONE division each. No sampling, no sketch error —
    this estimates the POPULATION, exactly computing the estimator.

    Output: one row — (d_obs, f1, f2, chao1, undetected).
    """
    counts = df.groupBy(F.col(key).alias("k")).agg(
        F.count("*").alias("c")
    )
    fof = counts.agg(
        F.count("*").alias("d_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    chao = "(d_obs + f1 * (f1 - 1e0) / (2 * (f2 + 1)))"
    return fof.select(
        "d_obs",
        "f1",
        "f2",
        F.expr(f"round({chao}, 6)").alias("chao1"),
        F.expr(f"round({chao} - d_obs, 6)").alias("undetected"),
    )
