"""Deterministic sampling for training-data pipelines.

Random sampling (df.sample) is neither reproducible across runs nor
oracle-checkable; these operators decide keep/drop from an md5-derived
bucket of the row's key, so the SAME rows are kept on every run, on
every engine, at every parallelism — and the sample composition is
seedable (change `salt`) without touching the data. This is the
standard language/quality rebalancing step of an LLM data pipeline
(e.g. downsample boilerplate-heavy English, keep all low-resource
languages).

Pure Catalyst: the bucket is a projection, the keep decision a filter —
both push down to the scan side of any downstream join, and nothing
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.dedup import _hash64_expr


def _check_salt(salt: str) -> str:
    """Salts are interpolated into SQL string literals in BOTH engines,
    whose escape rules differ (Spark honors backslash escapes, DuckDB
    does not) — restrict to characters that are literal in both."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9_.-]*", salt):
        raise ValueError(f"salt may contain only [A-Za-z0-9_.-] (got {salt!r})")
    return salt


def bucket_expr(key: str, salt: str) -> str:
    """md5-derived bucket in [0, 100) — engine-identical SQL both sides."""
    keyed = f"concat(cast({key} as string), '{_check_salt(salt)}')"
    return f"{_hash64_expr(keyed)} % 100"


def stratified_hash_sample(
    df: DataFrame,
    key: str = "doc_id",
    strata: str = "lang",
    rates: dict[str, int] | None = None,
    default_pct: int = 10,
    salt: str = "s0",
) -> DataFrame:
    """Keep a row iff bucket(key, salt) < its stratum's keep-percentage.

    `rates` maps stratum value -> integer percentage (0-100); strata not
    listed fall back to `default_pct`. Expected kept fraction per
    stratum is pct/100 with deterministic membership.

    Output: (doc_id, <strata>, bucket) for kept rows.
    """
    rates = rates or {}
    cases = " ".join(
        f"when {strata} = '{v}' then {int(p)}" for v, p in sorted(rates.items())
    )
    pct = f"case {cases} else {int(default_pct)} end" if cases else str(int(default_pct))
    return (
        df.withColumn("bucket", F.expr(bucket_expr(key, salt)))
        .filter(F.expr(f"bucket < ({pct})"))
        .select(key, strata, "bucket")
    )


def temperature_weights(
    df: DataFrame,
    strata: str = "lang",
    alpha_sqrt: bool = True,
) -> DataFrame:
    """Temperature-based stratum sampling weights — the multilingual
    rebalancing step of mT5/XLM-R-style pretraining: sample stratum l
    with probability q_l ∝ p_l^alpha where p_l is its natural share,
    flattening the head and boosting the tail.

    alpha is fixed at 0.5 (T = 2), computed as sqrt(p): IEEE requires
    sqrt to be correctly rounded, so BOTH engines produce the identical
    double — pow/exp/ln chains would not carry that guarantee for
    arbitrary alpha. The normalizer is an integer sum of fixed-point
    quantized weights (round(sqrt(p)*1e12) as BIGINT — the
    unigram_logloss recipe), so addition order can't perturb it.

    Physical shape: ONE algebraic groupBy over the corpus + a broadcast
    1-row total + a broadcast normalizer — the per-stratum table is
    dimension-sized at any corpus scale.

    Output: (<strata>, n_docs, share, weight, boost) where share = p_l,
    weight = q_l (sums to ~1), boost = q_l/p_l (the up/down-sampling
    factor a sampler applies per stratum).
    """
    if not alpha_sqrt:
        raise NotImplementedError("only alpha = 0.5 (sqrt) is exactness-safe")
    per = df.groupBy(strata).agg(F.count("*").alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    wfp = per.crossJoin(F.broadcast(tot)).withColumn(
        "w_fp",
        F.expr(
            "cast(round(sqrt(n_docs / cast(n_total as double)) * 1000000000000e0, 0)"
            " as bigint)"
        ),
    )
    z = wfp.agg(F.sum("w_fp").alias("z"))
    return wfp.crossJoin(F.broadcast(z)).select(
        strata,
        "n_docs",
        F.expr("round(n_docs / cast(n_total as double), 6)").alias("share"),
        F.expr("round(cast(w_fp as double) / z, 6)").alias("weight"),
        F.expr(
            "round(cast(w_fp as double) / z * n_total / n_docs, 6)"
        ).alias("boost"),
    )


def hash_topn_sample(
    df: DataFrame,
    n: int,
    key: str = "doc_id",
    strata: str = "lang",
    salt: str = "s0",
) -> DataFrame:
    """EXACTLY-n-per-stratum deterministic sample: rows rank by their
    md5 hash (then key) within the stratum and the first n win — the
    fixed-budget counterpart of the rate-based stratified_hash_sample
    (eval-set construction wants "500 docs per language", not "0.1%"):
    hash-ordering makes the pick uniform-ish yet reproducible across
    runs/engines/parallelism, and re-seedable by salt.

    One window per stratum (hash shuffle on strata + partition-local
    sort). Strata must individually fit a partition's sort — true for
    per-language corpus work; at extreme stratum sizes pre-filter with
    the rate-based sampler first (hybrid: rate-sample to ~10n, then
    exact-n — the standard two-phase trick).

    Output: (<key>, <strata>, rk) for kept rows, rk in 1..n.
    """
    from pyspark.sql import Window

    h = _hash64_expr(f"concat(cast({key} as string), '{_check_salt(salt)}')")
    w = Window.partitionBy(strata).orderBy(F.expr(h), F.col(key))
    return (
        df.select(key, strata)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(n))
    )


def dataset_split(
    df: DataFrame,
    key: str = "doc_id",
    strata: str = "lang",
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test assignment by md5 bucket — the
    split must be a pure function of the example's identity (never of
    row order or run) so that re-runs, engine ports, and incremental
    ingests all agree on membership and no example migrates between
    splits across snapshots (the classic leakage bug).

    Pure projection — zero shuffles; the bucket predicate pushes into
    any downstream scan.

    Output: (<key>, <strata>, bucket, split) with split in
    {train, val, test} at train_pct / val_pct / remainder.
    """
    t, v = int(train_pct), int(val_pct)
    return df.select(
        key,
        strata,
        F.expr(bucket_expr(key, salt)).alias("bucket"),
    ).withColumn(
        "split",
        F.expr(
            f"case when bucket < {t} then 'train'"
            f" when bucket < {t + v} then 'val' else 'test' end"
        ),
    )


def dsir_log_weights(
    documents: DataFrame,
    target_pred: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al., NeurIPS 2023 — Data
    Selection via Importance Resampling): score every document by how
    much more likely its hashed n-gram features are under a TARGET
    distribution (docs matching `target_pred`) than under the raw
    corpus, log w(x) = sum_f tf_f * (ln p_target(f) - ln p_raw(f)).
    Features are unigrams + bigrams hashed into `n_buckets` buckets
    (the paper's hashed generative model); both bag-of-buckets models
    are Laplace-smoothed, so no zero-probability buckets exist.

    Determinism is the unigram_logloss recipe: each bucket's
    log-probability DIFFERENCE is fixed-point quantized once —
    round((ln(pt) - ln(pr)) * 1e9) as BIGINT — so the per-doc
    reduction is an exact integer sum, order-free at any parallelism
    (the 1e-9 quantization is ~7 orders below the 6-dp output).

    Physical shape: one feature explode -> (doc, bucket) tf groupBy;
    the two models are ONE n_buckets-sized count table (target flag
    aggregated alongside) broadcast back; one per-doc integer-sum
    groupBy. No window, no sort; the raw model includes ALL docs so
    the target corpus never needs a second scan.

    Output: (doc_id, is_target, n_feats, log_ir) — log_ir in nats,
    positive = target-like.
    """
    feats = (
        documents.select(
            "doc_id",
            F.expr(f"({target_pred})").alias("is_target"),
            F.expr(
                "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"
            ).alias("toks"),
        )
        .select(
            "doc_id",
            "is_target",
            F.explode(
                F.expr(
                    "concat(toks, case when size(toks) >= 2 then "
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> concat_ws(' ', slice(toks, i + 1, 2))) "
                    "else array() end)"
                )
            ).alias("f"),
        )
        .withColumn("b", F.expr(f"{_hash64_expr('f')} % {int(n_buckets)}"))
    )
    tf = feats.groupBy("doc_id", "is_target", "b").agg(
        F.count("*").alias("tf")
    )
    model = feats.groupBy("b").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = model.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    B = int(n_buckets)
    diff_fp = (
        f"cast(round((ln((c_tgt + 1) / cast(n_tgt + {B} as double)) - "
        f"ln((c_raw + 1) / cast(n_raw + {B} as double))) * 1000000000e0, 0) "
        "as bigint)"
    )
    return (
        tf.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(totals))
        .withColumn("_c", F.expr(f"tf * {diff_fp}"))
        .groupBy("doc_id", "is_target")
        .agg(F.sum("tf").alias("n_feats"), F.sum("_c").alias("_fp"))
        .select(
            "doc_id",
            "is_target",
            "n_feats",
            F.expr("round(_fp / 1000000000e0, 6)").alias("log_ir"),
        )
    )


def dsir_resample(
    documents: DataFrame,
    target_pred: str,
    k: int = 100,
    n_buckets: int = 4096,
    salt: str = "dsir0",
) -> DataFrame:
    """The resampling half of DSIR: draw `k` NON-target documents
    without replacement with probability proportional to their
    importance weight, via the Gumbel-top-k trick (Vieira 2014) made
    deterministic — key = log w(x) + Gumbel(h(x)), where the Gumbel
    noise g = -ln(-ln(u)) uses the md5-derived uniform
    u = (h % 1e6 + 0.5) / 1e6 (never 0 or 1), so the draw is
    reproducible across runs/engines/parallelism and re-seedable by
    salt. The key rides the same 1e-9 fixed-point lattice as log_ir,
    so ranking is an exact integer comparison.

    Target docs are the reference distribution, not candidates — only
    non-target rows compete. Top-k is a (key desc, doc_id) rank —
    k-bounded, planned as TakeOrdered, never a full global sort.

    Output: (doc_id, log_ir, gumbel_key, rk).
    """
    w = dsir_log_weights(documents, target_pred, n_buckets=n_buckets)
    cand = w.filter(~F.col("is_target"))
    keyed_col = f"concat(cast(doc_id as string), '{_check_salt(salt)}')"
    u = f"(({_hash64_expr(keyed_col)} % 1000000) + 0.5e0) / 1000000e0"
    keyed = cand.withColumn(
        "_kfp",
        F.expr("cast(round(log_ir * 1000000000e0, 0) as bigint)")
        + F.expr(f"cast(round(-ln(-ln({u})) * 1000000000e0, 0) as bigint)"),
    )
    from pyspark.sql import Window

    wn = Window.orderBy(F.desc("_kfp"), F.asc("doc_id"))
    return (
        keyed.withColumn("rk", F.row_number().over(wn))
        .filter(F.col("rk") <= int(k))
        .select(
            "doc_id",
            "log_ir",
            F.expr("round(_kfp / 1000000000e0, 6)").alias("gumbel_key"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# Poisson(1) CDF thresholds as shared literals (both engines compare
# the same md5-derived uniform against the same decimal text), capped
# at weight 6 (P(w > 6) ~ 8.3e-5 — the documented truncation).
_POIS_CDF = [
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
]


def poisson_weight_expr(key: str, rep: str, salt: str) -> str:
    """Deterministic Poisson(1) draw: md5-derived uniform inverted
    through the literal CDF — identical SQL text in both engines."""
    keyed = (
        f"concat(cast({key} as string), '|', cast({rep} as string), "
        f"'{_check_salt(salt)}')"
    )
    u = f"(({_hash64_expr(keyed)} % 1000000) + 0.5e0) / 1000000e0"
    chain = " ".join(
        f"when {u} < {t} then {w}" for w, t in enumerate(_POIS_CDF)
    )
    return f"case {chain} else 6 end"


def _poisson_ci_close(base: DataFrame, rep_sums: DataFrame, B: int) -> DataFrame:
    """Shared closing algebra for the Poisson bootstrap: replicate
    means from exact integer (s, n) pairs, percentile-by-rank bounds.
    Identical expression text for the catalyst and kernel producers so
    every rounding decision is made by the same Spark operators."""
    full = base.agg(
        F.count("*").alias("n_rows"),
        F.round(F.expr("sum(v) * 1e0 / count(*)"), 6).alias("mean_full"),
    )
    reps = rep_sums.filter(F.col("n") > 0).select(
        "b", F.round(F.expr("s * 1e0 / n"), 6).alias("m")
    )
    from pyspark.sql import Window

    wn = Window.orderBy("m", "b")
    ranked = reps.withColumn("rk", F.row_number().over(wn))
    lo_rk = -(-25 * B // 1000)  # ceil(0.025*B)
    hi_rk = -(-975 * B // 1000)  # ceil(0.975*B)
    bounds = ranked.agg(
        F.count("*").alias("n_replicates"),
        F.max(F.when(F.col("rk") == lo_rk, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == hi_rk, F.col("m"))).alias("ci_hi"),
    )
    return full.crossJoin(bounds).select(
        "n_rows", "mean_full", "n_replicates", "ci_lo", "ci_hi"
    )


def poisson_bootstrap_ci_catalyst(
    df: DataFrame,
    value: str = "value",
    key: str = "id",
    n_reps: int = 200,
    salt: str = "boot0",
) -> DataFrame:
    """The original pure-Catalyst Poisson bootstrap (B-way explode +
    md5 CASE weights evaluated as JVM expressions). Kept as the
    reference implementation `poisson_bootstrap_ci` (the kernel) is
    pinned bit-exact against in tests; the md5-per-(row, replicate)
    expression chain costs ~20us/pair interpreted, so prefer the
    kernel beyond toy N."""
    B = int(n_reps)
    # the weight expr references the RENAMED id column — never the
    # caller's key name (which could collide with the salt text)
    w_expr = poisson_weight_expr("id", "b", salt)
    v = F.col(value).cast("long")
    base = df.select(F.col(key).alias("id"), v.alias("v"))
    rep_sums = (
        base.select(
            "id", "v", F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("b")
        )
        .withColumn("w", F.expr(w_expr))
        .groupBy("b")
        .agg(F.sum(F.expr("w * v")).alias("s"), F.sum("w").alias("n"))
    )
    return _poisson_ci_close(base, rep_sums, B)


def poisson_bootstrap_ci(
    df: DataFrame,
    value: str = "value",
    key: str = "id",
    n_reps: int = 200,
    salt: str = "boot0",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean of an
    INTEGER metric (Chamandy et al., Google 2012 — "Estimating
    uncertainty for massive data streams"): instead of materializing B
    resamples-with-replacement (impossible at corpus scale), each row
    gets an independent Poisson(1) weight per replicate, which
    converges to the multinomial bootstrap as N grows. Here the draws
    are md5-derived and the CDF thresholds are shared literals, so the
    whole interval is deterministic, re-seedable by salt, and
    oracle-exact — every replicate's (sum, count) is an exact integer
    pair and its mean one rounded division.

    The 95% interval is percentile-by-rank over the B replicate means:
    lo = ceil(0.025*B)-th smallest, hi = ceil(0.975*B)-th (ties broken
    by replicate id) — exact picks, no interpolation.

    r6 physical rewrite (guide §4.2): the B md5 draws per row moved
    from an exploded Catalyst expression chain (B*N rows through
    concat+md5+conv+CASE, ~20 us/pair) into a mapInPandas kernel that
    accumulates the exact integer (s[b], n[b]) pairs partition-locally
    and emits B partial rows per task — same md5 bytes, same
    (m + 0.5)/1e6 IEEE uniform, same CDF-threshold comparisons
    (searchsorted over the identical parsed-double thresholds), pinned
    bit-exact against `poisson_bootstrap_ci_catalyst` in tests. The
    B-way row fan-out never materializes, and the shuffle carries B
    rows per task instead of B partial rows per task plus the exploded
    map side. Integer keys only (the md5 text is cast(id as string));
    non-integral keys take the catalyst path unchanged.

    Shapes: one map-side pass (B-bounded accumulator per task), one
    B-sized groupBy, one B-row window. B is bounded, so nothing scales
    with corpus size except the single weighted-sum pass.

    Output: one row (n_rows, mean_full, n_replicates, ci_lo, ci_hi).
    """
    B = int(n_reps)
    salt = _check_salt(salt)
    v = F.col(value).cast("long")
    base = df.select(F.col(key).alias("id"), v.alias("v"))
    idt = dict(base.dtypes)["id"]
    if idt not in ("tinyint", "smallint", "int", "bigint"):
        return poisson_bootstrap_ci_catalyst(df, value, key, n_reps, salt)
    thresholds = [float(t) for t in _POIS_CDF]
    n_par = df.sparkSession.sparkContext.defaultParallelism

    def gen(batches):
        from hashlib import md5

        import numpy as np
        import pandas as pd

        thr = np.array(thresholds)
        sufs = [f"|{b}{salt}".encode() for b in range(B)]
        s = np.zeros(B, np.int64)
        n = np.zeros(B, np.int64)
        w6 = np.full(B, 6, np.int64)
        any_rows = False
        nn_v = 0  # non-null v seen: all-null partials must stay NULL
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            for idv, vv in zip(pdf["id"].tolist(), pdf["v"].tolist()):
                if idv is None or idv != idv:
                    # cast(null as string) nulls the md5 chain; every
                    # CASE branch compares null < t (null) -> ELSE 6
                    w = w6
                else:
                    ib = str(int(idv)).encode()
                    m = (
                        np.fromiter(
                            (
                                int.from_bytes(
                                    md5(ib + sf).digest()[:4], "big"
                                )
                                for sf in sufs
                            ),
                            np.int64,
                            B,
                        )
                        % 1000000
                    )
                    u = (m.astype(np.float64) + 0.5) / 1000000.0
                    # CASE "first t with u < t" == count of t <= u
                    w = np.searchsorted(thr, u, side="right")
                n += w
                if vv is not None and vv == vv:
                    nn_v += 1
                    s += w * int(vv)
        if any_rows:
            yield pd.DataFrame(
                {
                    "b": np.arange(B, dtype=np.int64),
                    "s": pd.array(s, dtype="Int64")
                    if nn_v
                    else pd.array([None] * B, dtype="Int64"),
                    "n": n,
                }
            )

    rep_sums = (
        base.repartition(n_par)
        .mapInPandas(gen, schema="b bigint, s bigint, n bigint")
        .groupBy("b")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    return _poisson_ci_close(base, rep_sums, B)


def rendezvous_shards(
    df: DataFrame,
    key: str,
    shards: list[str],
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1996) — the consistent data-placement rule behind
    cacheless routing, Kafka-style partition stickiness, and
    shared-nothing shard maps: each key goes to the shard with the
    highest md5(key, shard) draw, so ADDING a shard moves ONLY the
    keys the new shard now wins (~1/(n+1) of them) and removing one
    moves only its own keys — no global reshuffle, unlike `pmod(hash,
    n)` placement where changing n remaps nearly everything. That
    minimal-disruption property is pinned by test, not just cited.

    Pure Catalyst projection: the per-shard draws are a LITERAL array
    of (hash, shard) structs and the argmax is array_max's
    lexicographic struct ordering — no explode, no shuffle, no UDF;
    the decision pushes to the scan like the other sampling ops.
    Hash ties (md5 collisions across 64 hex chars) break to the
    larger shard name via the struct's second field — deterministic
    either way.

    Output: input rows + (shard string, shard_h BIGINT winning draw).
    """
    if not shards or len(set(shards)) != len(shards):
        raise ValueError("shards must be a non-empty list of unique names")
    clash = {"shard", "shard_h"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — the output "
            "would carry ambiguous duplicates; rename them first"
        )
    draws = ", ".join(
        f"struct(cast(conv(substr(md5(concat(cast({key} as string), "
        f"'|', '{s}')), 1, 8), 16, 10) as bigint) as h, '{s}' as s)"
        for s in shards
    )
    win = F.expr(f"array_max(array({draws}))")
    return df.withColumn("_w", win).select(
        "*",
        F.col("_w.s").alias("shard"),
        F.col("_w.h").alias("shard_h"),
    ).drop("_w")


def weighted_sample_topk(
    df: DataFrame,
    n: int,
    key: str = "doc_id",
    strata: str = "lang",
    weight: str = "quality",
    salt: str = "es0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly n per stratum —
    Efraimidis & Spirakis '06 (equivalently Gumbel top-k): each row
    draws key u^(1/w) and the n largest win, which realizes the
    sequential weighted draw in ONE pass with no sequential state.
    The quality-weighted counterpart of hash_topn_sample: high-weight
    docs are proportionally likelier to make the eval set, yet the
    pick stays reproducible across runs/engines/parallelism and
    re-seedable by salt.

    Derandomized and engine-exact: u = (h + 1) / 2^32 from the shared
    md5 family (never 0), and u^(1/w) is ranked through its monotone
    log transform lk = round(ln(u), 6) / w_int — ln carried on the
    repo's pinned rounded-6 lockstep (pow() cross-engine bit-identity
    is unpinned, so it never runs), the division one IEEE op on a
    BIGINT weight (round(w * 1e6), the 1e-6 lattice convention). Ties
    break by key. Rows with w_int <= 0 can never be sampled and are
    filtered (stated, matching the ES definition domain).

    One window per stratum, the hash_topn_sample physical shape and
    the same extreme-stratum two-phase caveat.

    Output: (<key>, <strata>, w_int, lk, rk) for kept rows, rk 1..n.
    """
    from pyspark.sql import Window

    h = _hash64_expr(f"concat(cast({key} as string), '{_check_salt(salt)}')")
    u = f"(({h}) % 4294967296 + 1) / 4294967296e0"
    lk = f"round(ln({u}), 6) / w_int"
    w = Window.partitionBy(strata).orderBy(
        F.desc("lk"), F.col(key)
    )
    return (
        df.select(
            key,
            strata,
            F.expr(f"cast(round({weight} * 1000000e0, 0) as bigint)").alias(
                "w_int"
            ),
        )
        .filter(F.col("w_int") > 0)
        .withColumn("lk", F.expr(lk))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(n))
    )


def neyman_allocation(
    df: DataFrame,
    stratum: str = "stratum",
    value: str = "value",
    n_sample: int = 100,
) -> DataFrame:
    """Neyman optimal allocation (Neyman 1934) — the survey-sampling
    answer to "I can afford n_sample eval labels; how many per
    stratum?": minimum-variance allocation puts n_h proportional to
    N_h * S_h, so big AND internally-variable strata get more budget
    than big-but-homogeneous ones (where proportional allocation
    over-spends). The budgeting complement to stratified_hash_sample
    (which draws the rows once the quota is known).

    Exactness: per-stratum moment sums are exact integers (the
    ols_simple channels — sum-of-squares rides DECIMAL(38,0)); the
    sample standard deviation is ONE shared-text sqrt over them (IEEE
    sqrt is correctly rounded, the ab_conversion precedent); the
    Neyman weight N_h * S_h is QUANTIZED to 1e-6 (BIGINT) before the
    cross-stratum total so W is an order-free exact integer sum. The
    integer allocation is largest-remainder apportionment (Hamilton):
    base = floor(n * w_fp / W_fp) with the leftover seats going to the
    largest fractional parts (ties by stratum id) — floors, fractions,
    and the ranking are identical shared-text doubles in both engines,
    and sum(n_alloc) == n_sample exactly by construction. Degenerate
    corpus (every stratum zero-variance, W=0) falls back to
    PROPORTIONAL allocation on N_h — the standard fallback, flagged in
    the `weight_basis` column. Single-row strata have no sample sd and
    count as S_h = 0 (they need no within-stratum budget), documented.

    Physical shape: one partial-agg groupBy(stratum), then pure
    dimension-table algebra (a strata-sized window for the remainder
    ranking). The corpus is touched once.

    Output: (stratum, n_pop, sd, quota, n_alloc, weight_basis) —
    quota the real-valued Neyman share of n_sample, n_alloc the
    integer apportionment summing exactly to n_sample.
    """
    if n_sample < 0:
        raise ValueError("n_sample must be >= 0")
    from pyspark.sql import Window

    v = F.col(value).cast("long")
    g = df.groupBy(F.col(stratum).alias("stratum")).agg(
        F.count("*").alias("n_pop"),
        F.sum(v).alias("s"),
        F.sum(v.cast("decimal(19,0)") * v).alias("ss"),
    )
    sd = (
        "case when n_pop < 2 then 0e0 else "
        "sqrt((n_pop * cast(ss as double) - cast(s as double) * s)"
        " / (n_pop * (n_pop - 1e0))) end"
    )
    g = g.withColumn(
        "w_fp",
        F.expr(f"cast(round(n_pop * ({sd}) * 1000000e0, 0) as bigint)"),
    )
    tot = g.agg(
        F.sum("w_fp").alias("w_tot"), F.sum("n_pop").alias("pop_tot")
    )
    scored = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "weight_basis",
            F.when(F.col("w_tot") > 0, F.lit("neyman")).otherwise(
                F.lit("proportional")
            ),
        )
        .withColumn(
            "quota",
            F.expr(
                f"case when w_tot > 0 then {int(n_sample)} * w_fp * 1e0 / w_tot"
                f" else {int(n_sample)} * n_pop * 1e0 / pop_tot end"
            ),
        )
        .withColumn("base", F.expr("cast(floor(quota) as bigint)"))
        .withColumn("frac", F.expr("quota - floor(quota)"))
    )
    wrk = Window.orderBy(F.desc("frac"), F.asc("stratum"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        scored.withColumn("rk", F.row_number().over(wrk))
        .withColumn("extra", F.lit(int(n_sample)) - F.sum("base").over(wall))
        .select(
            "stratum",
            "n_pop",
            F.expr(f"round({sd}, 6)").alias("sd"),
            F.expr("round(quota, 6)").alias("quota"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
            ).alias("n_alloc"),
            "weight_basis",
        )
    )
