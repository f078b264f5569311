"""PII detection and redaction over a document corpus.

The pre-training hygiene step every published pipeline applies before
the text reaches a model (C4 removes pages on a blocklist, CCNet and
The Pile scrub emails/IPs, Llama's data card documents PII filtering):
find personally-identifying spans with conservative patterns and
replace them with typed placeholder tokens, reporting per-document
counts so the curation layer can gate on them.

Everything is JVM-side `regexp_count` / `regexp_replace` — zero Python
in the data path, pure map work (no shuffle at any scale; the plan is
a single project over the scan). The patterns are deliberately written
in the common subset of Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, `\\b` — with no constructs where
leftmost-first (backtracking) and leftmost-longest (RE2) semantics can
disagree, so the redacted text is byte-identical across engines and an
md5 of it is an exact oracle.

Reference anchors: the dictionary-gating predicates this engine
already mirrors (allowedPhrase / allowedContext,
PhraseMapLookup.scala) are the same shape — corpus-wide text
normalization by rule — applied here to the privacy axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Conservative, cross-engine-safe patterns. Order of REDACTION is
# email -> ip -> phone: the replacement tokens contain no digits or
# '@', so earlier passes can never create or destroy later matches.
# COUNTS are computed per-pattern on the ORIGINAL text, independently
# (a span matching two patterns counts in both — documented behavior;
# the gate cares about "any PII", not a partition of spans).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}
PII_TOKENS = {"email": "<EMAIL>", "ip": "<IP>", "phone": "<PHONE>"}
_REDACT_ORDER = ("email", "ip", "phone")


def pii_scrub(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + the redacted text's fingerprint.

    Output: (doc_id, n_emails, n_ips, n_phones, n_pii, is_clean,
    redacted_fp) — the fingerprint (md5 of the fully-redacted text)
    rather than the text itself, so the result table stays narrow
    enough to join back as a curation gate at 100 TB; the redaction
    expression is deterministic, so any consumer can re-materialize
    the cleaned text with `redact_text` and verify against the fp.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[k]))
        .cast("long")
        .alias(f"n_{k}s")
        for k in _REDACT_ORDER
    ]
    red = redact_text(F.col(text_col))
    total = F.expr("n_emails + n_ips + n_phones")
    return (
        documents.select(id_col, *counts, F.md5(red).alias("redacted_fp"))
        .withColumn("n_pii", total.cast("long"))
        .withColumn("is_clean", F.col("n_pii") == 0)
        .select(
            id_col,
            "n_emails",
            "n_ips",
            "n_phones",
            "n_pii",
            "is_clean",
            "redacted_fp",
        )
    )


def redact_text(col):
    """The redaction expression itself (email -> ip -> phone), exposed
    so callers can materialize cleaned text with the exact semantics
    the fingerprint in `pii_scrub` commits to."""
    out = col
    for k in _REDACT_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[k], PII_TOKENS[k])
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive: str | None = None,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier tuple
    (Sweeney 2002; Machanavajjhala 2007): every row whose QI
    equivalence class holds fewer than k members is re-identifiable
    at confidence 1/class-size, and a class with few DISTINCT
    sensitive values leaks the attribute even when k is met. This is
    the release-gate audit a dataset publisher runs before sharing —
    the output is per-class, so the caller both reads the headline
    (min class size = the dataset's k) and joins classes back to rows
    to suppress or generalize the offenders.

    One groupBy over the QI columns (partial-agg friendly — class
    counts and the exact distinct both combine map-side; the distinct
    is over the class's OWN sensitive values, bounded by class size).
    All outputs are integers — trivially oracle-exact.

    Output: one row per equivalence class — (*quasi_identifiers,
    class_size, l_distinct, meets_k, meets_l) where l_distinct is the
    sensitive attribute's distinct count within the class and the two
    flags evaluate the release thresholds (class_size >= k,
    l_distinct >= l). No sensitive VALUES appear in the output, only
    counts — the audit itself is publishable.
    """
    if not quasi_identifiers:
        raise ValueError("quasi_identifiers must be non-empty")
    aggs = [F.count("*").alias("class_size")]
    if sensitive is not None:
        aggs.append(F.countDistinct(sensitive).alias("l_distinct"))
    out = df.groupBy(*quasi_identifiers).agg(*aggs)
    out = out.withColumn("meets_k", F.col("class_size") >= int(k))
    if sensitive is not None:
        out = out.withColumn("meets_l", F.col("l_distinct") >= int(l))
    return out


def dp_noisy_counts(
    df: DataFrame,
    dims: list[str],
    eps_mille: int = 1000,
    salt: str = "dp0",
) -> DataFrame:
    """Laplace-mechanism count release (Dwork et al. '06) for a
    GROUP BY histogram — the standard epsilon-DP mechanism for "how
    many documents per (lang, source)" style releases: noisy = count
    + Laplace(sensitivity/eps) with sensitivity 1 (one row changes one
    cell), then post-processed by integer rounding and clamping at 0
    (post-processing preserves DP).

    DERANDOMIZED for this repo's machine-checkability contract: the
    Laplace draw comes from the group key's md5 via the inverse CDF,

        u = (h + 0.5) / 2^32 in (0,1),  b = 1000 / eps_mille,
        noise = -b * sign(u - 1/2) * round(ln(1 - 2|u - 1/2|), 6)

    (the pinned rounded-6 ln lockstep), so the release is reproducible
    across engines/parallelism and re-seedable by salt. A REAL privacy
    deployment must draw fresh secret randomness instead — a keyed
    hash of the PUBLIC group name provides no privacy; this operator
    exhibits the mechanism, budget accounting, and error profile, and
    says so. `n_true` is emitted beside the release for exactly that
    evaluation purpose (drop it in a real release).

    One partial-agg groupBy; the noise is a pure projection over the
    dimension-sized histogram.

    Output: (<dims...>, n_true, eps_mille, noise, noisy_n).
    """
    from careers_spark.operators.dedup import _hash64_expr

    key = "concat_ws('|', " + ", ".join(
        f"cast({d} as string)" for d in dims
    ) + f", '{salt}')"
    b = f"(1000.0 / {int(eps_mille)})"
    u = f"(({_hash64_expr(key)}) + 0.5) / 4294967296e0"
    noise = (
        f"round(-{b} * sign({u} - 0.5)"
        f" * round(ln(1.0 - 2.0 * abs({u} - 0.5)), 6), 6)"
    )
    g = df.groupBy(*dims).agg(F.count("*").alias("n_true"))
    return g.select(
        *dims,
        "n_true",
        F.lit(int(eps_mille)).alias("eps_mille"),
        F.expr(noise).alias("noise"),
        F.expr(
            f"greatest(cast(round(n_true + {noise}, 0) as bigint), 0)"
        ).alias("noisy_n"),
    )


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive: str,
    t_mille: int = 200,
) -> DataFrame:
    """t-closeness release audit (Li, Li & Venkatasubramanian ICDE'07)
    — the third rung of the anonymization ladder after k-anonymity and
    l-diversity (both in k_anonymity_audit): an equivalence class can
    be k-large and l-diverse yet still leak if its SENSITIVE-value
    distribution skews far from the corpus's. For categorical
    sensitive attributes the prescribed distance is total variation,

        TV(cell) = 1/2 * sum_v | p_cell(v) - p_corpus(v) |,

    and the class passes iff TV <= t.

    Exactness: cross-multiplied integers end to end — the per-value
    deviation |n_cv * N - g_v * n_c| is an exact BIGINT (headroom to
    ~3e9 rows with BIGINT; the DECIMAL(38,0) swap is documented
    beyond), tv_num their order-free sum over the sensitive vocabulary
    (a broadcast dim joined under every cell so absent values
    contribute their full corpus mass), tv ONE closing division, and
    the pass flag an INTEGER comparison (tv_num * 1000 <= t_mille * 2
    * n_c * N) so the gate never depends on rounding.

    Output: (qi..., n_c, tv_num, tv, meets_t).
    """
    n_cv = (
        df.groupBy(*qi_cols, F.col(sensitive).alias("sv"))
        .agg(F.count("*").alias("n_cv"))
    )
    cells = df.groupBy(*qi_cols).agg(F.count("*").alias("n_c"))
    gl = df.groupBy(F.col(sensitive).alias("sv")).agg(
        F.count("*").alias("g_v")
    )
    tot = df.agg(F.count("*").alias("n_all"))
    grid = (
        cells.crossJoin(F.broadcast(gl))
        .join(n_cv, [*qi_cols, "sv"], "left")
        .withColumn("n_cv", F.coalesce(F.col("n_cv"), F.lit(0).cast("long")))
        .crossJoin(F.broadcast(tot))
    )
    agg = grid.groupBy(*qi_cols, "n_c", "n_all").agg(
        F.sum(F.expr("abs(n_cv * n_all - g_v * n_c)")).alias("tv_num")
    )
    return agg.select(
        *qi_cols,
        "n_c",
        "tv_num",
        F.expr("round(tv_num / (2e0 * n_c * n_all), 6)").alias("tv"),
        (
            F.col("tv_num") * 1000
            <= F.lit(int(t_mille)) * 2 * F.col("n_c") * F.col("n_all")
        ).alias("meets_t"),
    )


def dp_topk_exponential(
    df: DataFrame,
    dims: list[str],
    k: int = 3,
    eps_mille: int = 1000,
    salt: str = "em0",
) -> DataFrame:
    """Exponential-mechanism top-k selection (McSherry & Talwar '07)
    over a GROUP BY histogram — the epsilon-DP way to release "which
    categories are most frequent" WITHOUT releasing the counts, the
    selection-query complement of dp_noisy_counts' Laplace release.
    One-shot top-k via the Gumbel-max equivalence (Durfee & Rogers
    '19): add Gumbel(2*sensitivity/eps) noise to each utility (the
    count, sensitivity 1) and take the k largest — distributionally
    identical to k sequential exponential-mechanism draws without
    replacement, at one pass.

    DERANDOMIZED like dp_noisy_counts and for the same machine-
    checkability contract (a REAL release must use secret randomness;
    this exhibits mechanism, budget, and error profile): u from the
    group key's md5, noise = -ln(-ln(u)) on the pinned rounded-6 ln
    lockstep, key = count + (2000/eps_mille) * gumbel. Ties on the
    6-dp noisy key break by the dimension values (deterministic).

    The noisy key is a projection over the dimension-sized histogram;
    the top-k sort is a bounded TopK (never corpus-sized). `n_true`
    rides along for evaluation only — drop it in a real release.

    Output: k rows (rank, <dims...>, n_true, noisy_key).
    """
    from careers_spark.operators.dedup import _hash64_expr

    key = "concat_ws('|', " + ", ".join(
        f"cast({d} as string)" for d in dims
    ) + f", '{salt}')"
    u = f"(({_hash64_expr(key)}) + 0.5) / 4294967296e0"
    gumbel = f"round(-ln(-ln({u})), 6)"
    noisy = f"round(n_true + (2000.0 / {int(eps_mille)}) * {gumbel}, 6)"
    g = df.groupBy(*dims).agg(F.count("*").alias("n_true"))
    scored = g.select(*dims, "n_true", F.expr(noisy).alias("noisy_key"))
    w = Window.orderBy(
        F.desc("noisy_key"), *[F.asc(d) for d in dims]
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("rank", *dims, "n_true", "noisy_key")
    )


def entropy_l_diversity(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive: str,
    l: int = 2,
) -> DataFrame:
    """Entropy l-diversity audit (Machanavajjhala et al. 2007, Def.
    4.2) — the middle rung of the anonymization ladder this repo
    already walks: k_anonymity_audit checks class sizes and DISTINCT
    l-diversity, t_closeness_audit checks distributional distance to
    the corpus; entropy l-diversity sits between them, requiring each
    QI equivalence class's sensitive-value distribution to carry at
    least ln(l) nats of entropy (a class can hold l distinct values
    yet still leak if one value dominates — the skew distinct-l
    misses and this catches).

    Exactness (the mutual_information recipe): per-class entropy is
    -sum_v (c_v/n) ln(c_v/n); each cell's ln is FIXED-POINT QUANTIZED
    — cell contribution = -c_v * round(ln(c_v/n) * 1e9) as BIGINT —
    so the per-class reduction is an order-free exact integer sum,
    and the release predicate entropy >= ln(l) is decided ON THE
    LATTICE as the pure integer comparison

        ent_fp >= class_size * round(ln(l) * 1e9)

    (both sides exact BIGINT; no float enters the decision — the
    page_hinkley alarm convention).

    Physical shape: one (QI, sensitive) groupBy (partial-agg), one
    QI re-aggregation of it for class sizes, one equi-join back on
    the QI key — cells bounded by class-size x QI cardinality, the
    corpus touched once. No window, no sort, no driver loop.

    Output: one row per equivalence class — (*quasi_identifiers,
    class_size, l_distinct, entropy, meets_entropy_l). As in
    k_anonymity_audit, no sensitive VALUES appear — the audit itself
    is publishable.
    """
    if not quasi_identifiers:
        raise ValueError("quasi_identifiers must be non-empty")
    if l < 1:
        raise ValueError("l must be >= 1")
    cells = df.groupBy(*quasi_identifiers, sensitive).agg(
        F.count("*").alias("c_v")
    )
    classes = cells.groupBy(*quasi_identifiers).agg(
        F.sum("c_v").alias("class_size"),
        F.count("*").alias("l_distinct"),
    )
    import math

    lnl_fp = int(round(math.log(l) * 1e9))
    joined = cells.join(classes, quasi_identifiers)
    per = joined.groupBy(*quasi_identifiers).agg(
        F.first("class_size").alias("class_size"),
        F.first("l_distinct").alias("l_distinct"),
        F.sum(
            F.expr(
                "-c_v * cast(round(ln(c_v / cast(class_size as double))"
                " * 1000000000e0, 0) as bigint)"
            )
        ).alias("ent_fp"),
    )
    return per.select(
        *quasi_identifiers,
        "class_size",
        "l_distinct",
        F.expr("round(ent_fp / (class_size * 1000000000e0), 6)").alias(
            "entropy"
        ),
        (F.col("ent_fp") >= F.col("class_size") * F.lit(lnl_fp)).alias(
            "meets_entropy_l"
        ),
    )
