"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Catalyst (regex + array functions) — one pass over `text`,
fully codegen'd, filter-pushdown friendly. Every operator has an exact
DuckDB-SQL twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.dedup import tokens_col, _hash64_expr, shingles_expr

# compact per-language function-word lists for the n-gram/stopword
# language heuristic (deterministic, SQL-expressible)
LANG_WORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "une", "que", "avec"],
}

STOP_LIST = [
    "the", "and", "of", "to", "in", "is", "that", "for", "with", "was",
    "a", "on", "it", "as", "at", "by",
]
STOPWORDS_SQL = "(" + ",".join(f"'{w}'" for w in STOP_LIST) + ")"


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens, regex word tokens, and a BPE-ish estimate
    (chars/4 — the common heuristic for byte-level BPE vocabularies)."""
    return documents.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("ws_tokens"),
        F.size(tokens_col("text")).alias("word_tokens"),
        F.ceil(F.length("text") / 4).cast("bigint").alias("bpe_est"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics -> one quality score.

    score = clamp01(0.3*len_ok + 0.3*(1 - punct_ratio*4) + 0.4*stop_ratio*2)
    — a deterministic analogue of common pretraining-corpus filters.
    """
    toks = tokens_col("text")
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOP_LIST)))
    punct = F.length(F.regexp_replace("text", r"[^!-/:-@\[-`{-~]", ""))
    d = documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(punct / F.greatest(F.length("text"), F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6).alias("stop_ratio"),
    )
    len_ok = F.when((F.col("n_chars") >= 100) & (F.col("n_chars") <= 20000), 1.0).otherwise(0.0)
    raw = (
        0.3 * len_ok
        + 0.3 * F.greatest(F.lit(0.0), 1 - F.col("punct_ratio") * 4)
        + 0.4 * F.least(F.lit(1.0), F.col("stop_ratio") * 2)
    )
    return d.withColumn("quality", F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw)), 6))


def lang_id(documents: DataFrame) -> DataFrame:
    """Function-word-hit language heuristic. Ties -> 'und'."""
    toks = tokens_col("text")

    def hits(words):
        # single-param lambda: pyspark's higher-order-function wrapper
        # binds a Column to EVERY parameter, defaults included
        wl = list(words)
        return lambda t: t.isin(*wl)

    cols = [
        F.size(F.filter(toks, hits(words))).alias(f"n_{lang}")
        for lang, words in LANG_WORDS.items()
    ]
    d = documents.select("doc_id", *cols)
    best = F.greatest(*[F.col(f"n_{lg}") for lg in LANG_WORDS])
    winners = F.filter(
        F.array(*[
            F.when(F.col(f"n_{lg}") == best, F.lit(lg)).otherwise(F.lit(None))
            for lg in LANG_WORDS
        ]),
        lambda x: x.isNotNull(),
    )
    return d.select(
        "doc_id",
        F.when((best > 0) & (F.size(winners) == 1), winners[0])
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprints: full-text md5 + a 64-bit rolling min-hash of
    word 5-grams (a 1-hash minhash — the winnowing-style signature)."""
    sh5 = (
        documents.select("doc_id", tokens_col("text").alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "case when size(toks) >= 5 then "
                    "transform(sequence(0, size(toks) - 5), i -> concat_ws(' ', slice(toks, i + 1, 5))) "
                    "else array(concat_ws(' ', toks)) end"
                )
            ).alias("g"),
        )
        .groupBy("doc_id")
        .agg(F.expr(f"min({_hash64_expr('g')})").alias("rolling_min"))
    )
    return documents.select("doc_id", F.md5("text").alias("text_md5")).join(
        sh5, "doc_id"
    )


def tfidf_top_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF
    (sklearn convention: idf = ln((N+1)/(df+1)) + 1).

    Pure Catalyst: one token explode -> (doc, term) count -> term
    document-frequency -> score -> per-doc row_number window. The
    window partitions BY DOCUMENT (a document's distinct-term set is
    small and bounded), so no global sort exists anywhere; the df
    aggregation is partial-agg friendly and the corpus size N is one
    bounded count() job. Scores are rounded to 6 places BEFORE the
    ranking order-by so the (score desc, term asc) tie-break is
    engine-identical in the DuckDB oracle.

    Output: (doc_id, term, tf, score, rank), rank 1..k per doc.
    """
    from pyspark.sql import Window

    n_docs = documents.count()
    tf = (
        documents.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score",
        F.expr(f"round(tf * (ln(({n_docs} + 1.0) / (df + 1)) + 1), 6)"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )


def gopher_repetition(documents: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    table A1): the fraction of the document occupied by its most common
    2-gram, and the fraction occupied by duplicated 3-grams. Highly
    repetitive documents (keyword stuffing, scraped navigation, looping
    generations) fail both.

    This is the token-OCCURRENCE analogue of the paper's
    character-fraction rules (the corpus here is single-line synthetic
    text with uniform token lengths, so occurrence fraction == char
    fraction up to a constant): for each n, explode the document into
    n-gram occurrences, count per (doc, gram) — one partial-agg-friendly
    groupBy, map-side combinable, no window and no per-doc sort — then
    reduce to per-doc (max count, duplicated count, total). `keep`
    applies the paper's thresholds (top-2-gram <= 0.20, dup-3-gram
    <= 0.18).

    Output: (doc_id, top_bigram_frac, dup_trigram_frac, keep), one row
    per document with >= 3 tokens.
    """

    def per_doc(n: int, prefix: str) -> DataFrame:
        occ = (
            documents.select("doc_id", tokens_col("text").alias("toks"))
            .select("doc_id", F.explode(F.expr(shingles_expr(n))).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
        )
        return occ.groupBy("doc_id").agg(
            F.max("c").alias(f"{prefix}_top"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                f"{prefix}_dup"
            ),
            F.sum("c").alias(f"{prefix}_total"),
        )

    bg = per_doc(2, "bg")
    tg = per_doc(3, "tg")
    top2 = F.col("bg_top") / F.col("bg_total")
    dup3 = F.col("tg_dup") / F.col("tg_total")
    return (
        bg.join(tg, "doc_id")
        .select(
            "doc_id",
            F.round(top2, 6).alias("top_bigram_frac"),
            F.round(dup3, 6).alias("dup_trigram_frac"),
            ((top2 <= 0.20) & (dup3 <= 0.18)).alias("keep"),
        )
    )


def token_pmi(documents: DataFrame, min_pairs: int = 20) -> DataFrame:
    """Pointwise mutual information over document-level token
    co-occurrence — the classic collocation / related-term statistic
    (Church & Hanks 1990), and the salience score behind the KG edge
    weights' "observed together more than chance" intuition:

        pmi(a, b) = ln( n_ab * N / (n_a * n_b) )

    with doc-level counts (a token counts once per document, mirroring
    the dictionary's WordInTopicCounter convention).

    Physical shape: one distinct-token explode, a doc_id self-join for
    pair counts (a < b canonical order — the entity-graph construction's
    shuffle shape, AQE-split on hub tokens), then TWO BROADCAST joins
    against the unigram count table (vocabulary-sized, tiny relative to
    the pair table) and a broadcast 1-row N. Everything aggregating is
    algebraic; ln is applied once per surviving pair and rounded to 6 —
    both engines' libm ln is correctly rounded, and the tfidf oracle
    already pins ln-lockstep cross-engine.

    Output: (a, b, n_ab, pmi) for pairs with n_ab >= min_pairs.
    """
    from careers_spark.operators.dedup import tokens_col

    tokd = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("tok")
    )
    uni = tokd.groupBy("tok").agg(F.count("*").alias("n_tok"))
    n_docs = documents.select(F.count("*").alias("n_docs"))
    a = tokd.selectExpr("doc_id", "tok as a")
    b = tokd.selectExpr("doc_id as d2", "tok as b")
    pairs = (
        a.join(b, (a.doc_id == b.d2) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    return (
        pairs.join(F.broadcast(uni.selectExpr("tok as a", "n_tok as n_a")), "a")
        .join(F.broadcast(uni.selectExpr("tok as b", "n_tok as n_b")), "b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n_docs")
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def unigram_logloss(documents: DataFrame) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own unigram language model — the distributed stand-in for the
    perplexity filter (CCNet / Wenzek et al. 2020 score documents with
    a KenLM model and keep the low-perplexity band; with no external
    model in this environment, the corpus unigram MLE plays that role:
    unusual token distributions score high).

    Determinism: a per-doc SUM of ln() doubles would be addition-order
    dependent, so each token's log-probability is FIXED-POINT QUANTIZED
    first — contribution = tf * round(ln(count/N) * 1e9) as BIGINT —
    and the per-doc reduction is an exact integer sum (the documented
    1e-9 quantization is ~7 orders below the reported 6-dp rounding).
    ln itself is cross-engine lockstep (pinned by the tfidf/PMI
    oracles); no OOV exists because the model IS the corpus.

    Physical shape: one token explode -> (doc, term) tf groupBy, one
    vocabulary-sized count table broadcast back onto it, one 1-row
    total broadcast, one per-doc integer-sum groupBy. All partial-agg
    friendly; no window, no sort.

    Output: (doc_id, n_tokens, avg_nll) — avg_nll in nats/token,
    higher = more surprising under the corpus distribution.
    """
    tf = (
        documents.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    counts = tf.groupBy("term").agg(F.sum("tf").alias("n_term"))
    total = counts.agg(F.sum("n_term").alias("n_total"))
    return (
        tf.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_c",
            F.expr("tf * cast(round(ln(n_term / cast(n_total as double)) * 1000000000e0, 0) as bigint)"),
        )
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("_c").alias("_nll_fp"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr("round(-_nll_fp / (n_tokens * 1000000000e0), 6)").alias("avg_nll"),
        )
    )


def source_reputation(documents: DataFrame, strata: str = "source") -> DataFrame:
    """Per-source curation dashboard — the domain-reputation table a
    web-scale pipeline ranks its crawl sources by (the CCNet /
    RefinedWeb "which domains are worth keeping" step): volume, mean
    quality, exact-duplicate share, and Gopher-repetition keep share.

    Engine-exactness: the per-source quality MEAN rides integer
    micro-units (round(quality * 1e6) as BIGINT — quality is already
    6-dp-rounded, so the micro value is exact), because summing doubles
    across a group is addition-order dependent while integer sums are
    not; the mean divides once at the end. Dup/keep shares are integer
    count ratios.

    Physical shape: one corpus-wide groupBy(text_hash) for dup counts
    joined back on the hash, 1:1 doc_id joins for the quality/gopher
    legs (co-partitioned on doc_id at scale), then ONE algebraic
    groupBy(source). Nothing here is more than a partial-agg shuffle.

    Output: (source, n_docs, n_dup_docs, n_gopher_keep, mean_quality,
    dup_frac, keep_frac).
    """
    q = quality_score(documents).select(
        "doc_id",
        F.expr("cast(round(quality * 1000000, 0) as bigint)").alias("_qmu"),
    )
    g = gopher_repetition(documents).select(
        "doc_id", F.col("keep").cast("long").alias("_gk")
    )
    h = documents.select("doc_id", F.md5("text").alias("_th"))
    hc = h.groupBy("_th").agg(F.count("*").alias("_n_same"))
    dup = h.join(hc, "_th").select(
        "doc_id", (F.col("_n_same") > 1).cast("long").alias("_dup")
    )
    per = (
        documents.select("doc_id", strata)
        .join(q, "doc_id")
        .join(dup, "doc_id")
        .join(g, "doc_id", "left")
        .groupBy(strata)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_dup").alias("n_dup_docs"),
            F.sum(F.coalesce("_gk", F.lit(0))).alias("n_gopher_keep"),
            F.sum("_qmu").alias("_q_sum"),
        )
    )
    return per.select(
        strata,
        "n_docs",
        "n_dup_docs",
        "n_gopher_keep",
        F.expr("round(_q_sum / (n_docs * 1000000e0), 6)").alias("mean_quality"),
        F.expr("round(n_dup_docs / cast(n_docs as double), 6)").alias("dup_frac"),
        F.expr("round(n_gopher_keep / cast(n_docs as double), 6)").alias("keep_frac"),
    )


def length_histogram(
    documents: DataFrame,
    strata: str = "lang",
    col: str = "n_chars",
    width: int = 100,
) -> DataFrame:
    """Fixed-width histogram of ``col`` per stratum with in-stratum
    shares — the corpus length-distribution report every curation run
    starts from.

    One algebraic groupBy for the bins plus a broadcast join against
    the per-stratum totals (stratum-count-sized). Integer bucket edges
    via `div`; share rounded to 6. Scales as a pure two-pass
    aggregation — no window, no sort.

    Output: (<strata>, bucket_lo, n, share).
    """
    bins = (
        documents.groupBy(
            strata, F.expr(f"({col} div {width}) * {width}").alias("bucket_lo")
        )
        .agg(F.count("*").alias("n"))
    )
    totals = documents.groupBy(strata).agg(F.count("*").alias("n_total"))
    return (
        bins.join(F.broadcast(totals), strata)
        .select(
            strata,
            "bucket_lo",
            "n",
            F.expr("round(n / cast(n_total as double), 6)").alias("share"),
        )
    )


def length_quantiles(
    documents: DataFrame,
    strata: str = "lang",
    col: str = "n_chars",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    exact: bool = True,
) -> DataFrame:
    """Per-stratum length quantiles.

    exact=True uses Spark's `percentile` (linear interpolation on the
    sorted values — the same convention as DuckDB's quantile_cont, so
    the oracle is hash-exact). Exact percentile buffers each group's
    values in the aggregation state, which is fine for per-language
    corpus reports (languages are few) but NOT for high-cardinality
    strata at 10^12 rows — there, pass exact=False for
    `approx_percentile` (GK sketch, bounded state; no cross-engine
    oracle, hence not the driver-query default).

    Output: (<strata>, q, value) — one row per (stratum, quantile).
    """
    fn = "percentile" if exact else "approx_percentile"
    arr = "array(" + ", ".join(f"{q}d" for q in qs) + ")"
    agg = documents.groupBy(strata).agg(
        F.expr(f"{fn}({col}, {arr})").alias("vals")
    )
    pos = ", ".join(
        f"struct({q}d as q, round(vals[{i}], 6) as value)"
        for i, q in enumerate(qs)
    )
    return agg.select(
        strata, F.explode(F.expr(f"array({pos})")).alias("s")
    ).select(strata, F.col("s.q").alias("q"), F.col("s.value").alias("value"))


def quality_percentile_filter(
    documents: DataFrame,
    strata: str = "lang",
    q: float = 0.25,
) -> DataFrame:
    """Per-stratum percentile quality gate: keep a document iff its
    quality_score is >= its stratum's q-quantile — the adaptive
    "drop the worst quartile of every language" curation step (a fixed
    global threshold over-prunes low-resource strata whose score
    distribution sits lower; CCNet cuts per-language for the same
    reason).

    The threshold is Spark `percentile` per stratum (linear
    interpolation, the DuckDB quantile_cont convention pinned by
    length_quantiles) over the ALREADY-ROUNDED quality column, rounded
    to 6 — both engines compare the identical doubles, so the boundary
    decision is engine-exact. The per-stratum threshold table is
    dimension-sized and broadcast; exact percentile buffers per-group
    values, fine for per-language groups (see length_quantiles for the
    high-cardinality caveat).

    Output: (doc_id, <strata>, quality, thr, keep).
    """
    scored = quality_score(documents).select("doc_id", "quality")
    with_lang = documents.select("doc_id", strata).join(scored, "doc_id")
    thr = with_lang.groupBy(strata).agg(
        F.expr(f"round(percentile(quality, {q}d), 6)").alias("thr")
    )
    return with_lang.join(F.broadcast(thr), strata).select(
        "doc_id",
        strata,
        "quality",
        "thr",
        (F.col("quality") >= F.col("thr")).alias("keep"),
    )


def vocab_coverage(
    documents: DataFrame,
    min_counts: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
) -> DataFrame:
    """Vocabulary-size vs corpus-coverage curve — the tokenizer-design
    primitive: for each candidate frequency floor, how many distinct
    tokens survive and what fraction of all token OCCURRENCES they
    cover (the complement is the OOV mass a vocab truncated at that
    floor would map to <unk>).

    ONE token-count aggregation (the word-count shuffle), then a
    vocabulary-sized cross join against the tiny threshold dimension
    and one algebraic groupBy — integers throughout, one final division
    per row.

    Output: (min_count, vocab_size, covered, total, coverage).
    """
    counts = (
        documents.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    spark = documents.sparkSession
    thr = spark.createDataFrame(
        [(int(m),) for m in min_counts], "min_count long"
    )
    return (
        counts.crossJoin(F.broadcast(thr))
        .groupBy("min_count")
        .agg(
            F.sum(F.expr("case when cnt >= min_count then 1 else 0 end")).alias(
                "vocab_size"
            ),
            F.sum(F.expr("case when cnt >= min_count then cnt else 0 end")).alias(
                "covered"
            ),
            F.sum("cnt").alias("total"),
        )
        .select(
            "min_count",
            "vocab_size",
            "covered",
            "total",
            F.expr("round(covered / cast(total as double), 6)").alias("coverage"),
        )
    )


def bigram_ref_nll(
    documents: DataFrame,
    ref_pred: str = "doc_id % 97 = 0",
    nll_keep_max: float = 4.5,
) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed BIGRAM
    language model trained on a REFERENCE slice — the CCNet / Wenzek
    et al. 2020 perplexity filter proper (train on the trusted slice,
    score the crawl, keep the low-perplexity band). `unigram_logloss`
    scores a document against the corpus's own unigram distribution;
    this one scores against a held-out model with real OOV handling,
    which is what the published filter actually does.

    Model: tokens outside the reference vocabulary map to '<unk>';
    P(b|a) = (C(a,b) + 1) / (C(a) + V + 1) where C are reference-slice
    bigram/context counts and V the reference vocabulary size (so the
    '<unk>'-extended vocabulary has V+1 types and an unseen context
    scores uniform 1/(V+1)). An EMPTY reference slice degenerates to
    V=0 and every document scoring 0 nats — callers own a non-empty
    reference. Documents with fewer than 2 tokens have no bigrams and
    are absent from the output (documented, matches the oracle).

    Engine-exactness: all counts are integers, so num/den is a ratio of
    exact doubles and ln is cross-engine lockstep (pinned by the
    tfidf/PMI oracles); each distinct bigram TYPE's log-probability is
    fixed-point quantized ONCE (round(ln * 1e9) as BIGINT, the
    unigram_logloss recipe) and the per-doc reduction is a pure integer
    sum, so addition order cannot leak IEEE noise. keep compares the
    6-dp-rounded value, identical in both engines.

    Physical shape: one token explode; bigrams from an array transform
    (no positional self-join); the reference model (vocab, bigram
    counts, context counts, V) is dictionary-sized and broadcast — the
    scoring pass over the big side is map-side joins plus one per-doc
    partial-agg groupBy. No window, no sort.

    Output: (doc_id, n_bigrams, avg_nll, keep) — avg_nll in nats per
    bigram, keep = avg_nll <= nll_keep_max.
    """
    t = documents.select("doc_id", tokens_col("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i-1] as a, toks[i] as b))"
            )
        ).alias("g"),
    ).select("doc_id", "g.a", "g.b")
    is_ref = f"({ref_pred})"
    ref_docs = documents.filter(is_ref).select("doc_id")
    ref_bg = bg.join(F.broadcast(ref_docs), "doc_id").select("a", "b")
    vocab = ref_bg.select(F.col("a").alias("term")).union(
        ref_bg.select(F.col("b").alias("term"))
    ).distinct()
    vn = vocab.agg(F.count("*").alias("v"))
    cab = ref_bg.groupBy("a", "b").agg(F.count("*").alias("cab"))
    ca = ref_bg.groupBy("a").agg(F.count("*").alias("ca"))

    mapped = (
        bg.join(
            F.broadcast(vocab.select(F.col("term").alias("a"), F.lit(1).alias("_ka"))),
            "a",
            "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("term").alias("b"), F.lit(1).alias("_kb"))),
            "b",
            "left",
        )
        .select(
            "doc_id",
            F.when(F.col("_ka").isNull(), F.lit("<unk>")).otherwise(F.col("a")).alias("a"),
            F.when(F.col("_kb").isNull(), F.lit("<unk>")).otherwise(F.col("b")).alias("b"),
        )
    )
    tf = mapped.groupBy("doc_id", "a", "b").agg(F.count("*").alias("tf"))
    types = tf.select("a", "b").distinct()
    scored = (
        types.join(F.broadcast(cab), ["a", "b"], "left")
        .join(F.broadcast(ca), "a", "left")
        .crossJoin(F.broadcast(vn))
        .select(
            "a",
            "b",
            F.expr(
                "cast(round(ln((coalesce(cab, 0) + 1)"
                " / cast(coalesce(ca, 0) + v + 1 as double))"
                " * 1000000000e0, 0) as bigint)"
            ).alias("fp"),
        )
    )
    return (
        tf.join(F.broadcast(scored), ["a", "b"])
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_bigrams"), F.sum(F.expr("tf * fp")).alias("_fp"))
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("round(-_fp / (n_bigrams * 1000000000e0), 6)").alias("avg_nll"),
        )
        .withColumn("keep", F.col("avg_nll") <= F.lit(float(nll_keep_max)))
    )


def ngram_novelty(documents: DataFrame, n: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word-n-gram shingles that NO earlier document (smaller
    doc_id — corpus order) contains. The dataset-ordering /
    marginal-contribution curve: late near-duplicate documents score
    near 0, genuinely fresh content near 1 (the quantity suffix-array
    dedup studies plot as "fraction of novel text" over crawl order).

    Engine-exactness: integer counts and one final division rounded to
    6 — nothing else.

    Physical shape: the doc_shingles explode, one partial-agg
    groupBy(sh) for the global first-occurrence (min doc_id is
    algebraic), one shuffle-on-shingle join back, one per-doc count
    aggregation. Same scale posture as dup_span_fraction.

    Output: (doc_id, n_shingles, n_novel, novel_frac).
    """
    from careers_spark.operators.dedup import doc_shingles

    sh = doc_shingles(documents, n)
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.expr("case when first_doc = doc_id then 1 else 0 end")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("round(n_novel / cast(n_shingles as double), 6)").alias(
                "novel_frac"
            ),
        )
    )


def rake_keywords(documents: DataFrame, k: int = 5) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    deg(w)/freq(w) within its document (deg = summed lengths of the
    phrases its occurrences sit in), and a phrase scores the sum of its
    member word scores. Top-k phrases per document.

    Engine-exactness: deg and freq are integers, so the word score is
    ONE double division — then converted to FIXED-POINT BIGINT
    (round(1e9 * deg / freq), the bigram_lm_filter recipe) so the
    phrase score is an exact integer SUM, immune to addition order;
    the reported score is one final rounded division. The rank
    tie-break is (score desc, phrase asc) over [a-z0-9 ] strings —
    collation-independent.

    Physical shape at scale: phrase segmentation is one per-DOCUMENT
    running sum window (partition = doc, bounded by document length —
    the digest-family shape, never a global sort); everything else is
    partial-agg groupBys and a doc-keyed join. Identical duplicate
    phrases within a document merge (identical members -> identical
    score).

    Output: (doc_id, phrase, rake_score, rk).
    """
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "w")
    ).withColumn("is_stop", F.col("w").isin(STOP_LIST).cast("int"))
    run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mem = (
        toks.withColumn("phrase_id", F.sum("is_stop").over(run))
        .filter("is_stop = 0")
        .select("doc_id", "phrase_id", "pos", "w")
    )
    plen = mem.groupBy("doc_id", "phrase_id").agg(F.count("*").alias("L"))
    ws = (
        mem.join(plen, ["doc_id", "phrase_id"])
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("freq"), F.sum("L").alias("deg"))
        .select(
            "doc_id",
            "w",
            F.expr(
                "cast(round(1000000000e0 * deg / freq, 0) as bigint)"
            ).alias("score_fp"),
        )
    )
    ph = (
        mem.join(ws, ["doc_id", "w"])
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.sum("score_fp").alias("fp"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
        )
    )
    dd = ph.groupBy("doc_id", "phrase").agg(F.min("fp").alias("fp"))
    rk = Window.partitionBy("doc_id").orderBy(F.desc("fp"), F.asc("phrase"))
    return (
        dd.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= int(k))
        .select(
            "doc_id",
            "phrase",
            F.round(F.col("fp") / F.lit(1000000000.0), 6).alias("rake_score"),
            "rk",
        )
    )


def robust_length_stats(
    documents: DataFrame,
    group: str = "lang",
    val: str = "n_chars",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized robust statistics per group: the plain mean next to a
    mean computed after clamping values into the [p05, p95] band — the
    outlier-robust summary a corpus report shows beside raw averages.

    Exactness: percentile bounds follow the pinned percentile /
    quantile_cont convention, are rounded to 6dp and then to INTEGER
    clamp bounds (round half-up, identical in both engines), so every
    clamped value is an integer, both sums are exact BIGINTs, and each
    mean is ONE rounded division.

    Physical shape: one groupBy(group) computing raw aggregates and
    percentiles, then a second conditional-sum pass with the bounds
    joined back (broadcast — group cardinality is tiny). No windows.

    Output: (group, n, mean_raw, p_lo, p_hi, winsorized_mean).
    """
    bounds = documents.groupBy(group).agg(
        F.round(F.expr(f"percentile({val}, {lo}e0)"), 6).alias("_plo"),
        F.round(F.expr(f"percentile({val}, {hi}e0)"), 6).alias("_phi"),
    ).select(
        group,
        "_plo",
        "_phi",
        F.expr("cast(round(_plo, 0) as bigint)").alias("_lo_i"),
        F.expr("cast(round(_phi, 0) as bigint)").alias("_hi_i"),
    )
    return (
        documents.select(group, F.col(val).cast("long").alias("_v"))
        .join(F.broadcast(bounds), group)
        .groupBy(group)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("_v") / F.count("*"), 6).alias("mean_raw"),
            F.min("_plo").alias("p_lo"),
            F.min("_phi").alias("p_hi"),
            F.round(
                F.sum(F.expr("least(greatest(_v, _lo_i), _hi_i)"))
                / F.count("*"),
                6,
            ).alias("winsorized_mean"),
        )
    )


def term_index_summary(documents: DataFrame, min_df: int = 5) -> DataFrame:
    """Inverted-index construction summary: per term, document
    frequency, collection frequency, and the top-scoring posting (max
    tf, tie -> smaller doc_id, via one algebraic max(struct)) — the
    statistics row a search index keeps at the head of each posting
    list.

    Two partial-agg groupBys ((doc, term) then term); the min_df floor
    prunes the hapax tail before output. All integers — hash-exact
    with no rounding anywhere.

    Output: (term, df, cf, top_doc, top_tf).
    """
    tf = (
        documents.select(
            "doc_id", F.explode(tokens_col("text")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max(
                F.struct(F.col("tf"), (-F.col("doc_id")).alias("nd"))
            ).alias("_top"),
        )
        .filter(F.col("df") >= int(min_df))
        .select(
            "term",
            "df",
            "cf",
            (-F.col("_top.nd")).cast("long").alias("top_doc"),
            F.col("_top.tf").alias("top_tf"),
        )
    )


def source_kl(documents: DataFrame, strata: str = "source") -> DataFrame:
    """Per-source unigram KL divergence from the whole-corpus token
    distribution — the drift/contamination diagnostic for multi-feed
    corpora ("which crawl feed stopped looking like the corpus"), the
    distributional complement of `source_reputation`'s quality view:

        KL(P_s || Q) = sum_t p_t ln(p_t / q_t),   p = in-source freq,
                                                  q = corpus freq

    Exactness: with integer counts, KL = (1/n_s) * sum_t c_st *
    ln(ratio_t) where ratio = (c_st * N) / (n_s * c_t). The ln is
    applied once per (source, term), rounded to 6 (the tfidf-pinned
    ln-lockstep recipe), lifted to a 1e6 fixed-point BIGINT and
    multiplied by the integer count — so the sum over terms is exact
    in any order and the one final division is engine-identical.
    Terms absent from a source contribute 0 (their p_t is 0); every
    source term exists in the corpus, so q_t > 0 always.

    Physical shape: one token explode, one (strata, term) groupBy
    (partial-agg), then broadcast joins against the vocabulary-sized
    corpus table and two 1-row/stratum aggregates. No windows.

    Output: (<strata>, n_tokens, n_terms, kl).
    """
    from careers_spark.operators.dedup import tokens_col

    tok = documents.select(
        F.col(strata), F.explode(tokens_col("text")).alias("tok")
    )
    per = tok.groupBy(strata, "tok").agg(F.count("*").alias("c_s"))
    totals = per.groupBy(strata).agg(
        F.sum("c_s").alias("n_s"), F.count("*").alias("n_terms")
    )
    corpus = per.groupBy("tok").agg(F.sum("c_s").alias("c_all"))
    n_all = per.agg(F.sum("c_s").alias("n_all"))
    contrib = (
        per.join(totals, strata)
        .join(F.broadcast(corpus), "tok")
        .crossJoin(F.broadcast(n_all))
        .select(
            strata,
            "n_s",
            "n_terms",
            F.expr(
                "c_s * cast(round(round(ln(cast(c_s as double)"
                " * cast(n_all as double)"
                " / (cast(n_s as double) * cast(c_all as double))), 6)"
                " * 1000000, 0) as bigint)"
            ).alias("fp"),
        )
    )
    return (
        contrib.groupBy(strata, "n_s", "n_terms")
        .agg(F.sum("fp").alias("sum_fp"))
        .select(
            strata,
            F.col("n_s").alias("n_tokens"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.expr(
                "round(cast(sum_fp as double)"
                " / (cast(n_s as double) * 1000000e0), 6)"
            ).alias("kl"),
        )
    )


def zipf_alpha(
    documents: DataFrame, min_count: int = 5, strata: str | None = None
) -> DataFrame:
    """Power-law (Zipf) exponent of the token frequency distribution —
    the corpus-health scalar every tokenizer/vocabulary design doc
    quotes (natural corpora sit near alpha ~ 2 for token frequencies;
    synthetic or templated corpora drift visibly).

    Estimated by the continuous MLE of Clauset-Shalizi-Newman (2009)
    over term counts c >= min_count:

        alpha = 1 + n / sum_t ln(c_t / min_count)

    which needs NO rank variable at all — unlike the regress-on-ln-rank
    textbook fit, there is no global sort or window anywhere: one
    vocabulary groupBy, per-term ln rounded to 6 and lifted to 1e6
    fixed-point BIGINT (the source_kl recipe) so the sum is exact in
    any order, one final division. Terms at exactly min_count
    contribute ln(1) = 0, as the estimator requires.

    Output: one row (n_terms, n_tail_terms, alpha) — n_tail_terms the
    terms above the floor that actually inform the estimate.
    """
    from careers_spark.operators.dedup import tokens_col

    counts = (
        documents.select(F.explode(tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    return (
        counts.agg(
            F.count("*").alias("n_terms"),
            F.sum(
                F.expr(f"case when c >= {min_count} then 1 else 0 end")
            ).alias("n_tail_terms"),
            F.sum(
                F.expr(
                    f"case when c >= {min_count} then "
                    f"cast(round(round(ln(cast(c as double) / {min_count}e0), 6)"
                    " * 1000000, 0) as bigint) else 0 end"
                )
            ).alias("_sfp"),
        )
        .select(
            "n_terms",
            F.col("n_tail_terms").cast("long").alias("n_tail_terms"),
            F.expr(
                "case when _sfp = 0 then null else "
                "round(1e0 + cast(n_tail_terms as double)"
                " / (cast(_sfp as double) / 1000000e0), 6) end"
            ).alias("alpha"),
        )
    )


# ---------------------------------------------------------------------------
def readability(documents: DataFrame) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade level — the classic
    readability pair as a curation signal (alongside quality_score's
    length/punct/stopword ratios), computed with a DETERMINISTIC
    syllable heuristic so the scores are engine-exact:

      sentences = greatest(1, count of [.!?]+ runs in the raw text)
      words     = shared tokenizer token count
      syllables = sum over tokens of greatest(1, count of [aeiouy]+
                  vowel-group runs) — the standard dictionary-free
                  approximation.

    All three counts are exact integers; each score is ONE double
    expression written with identical text in Spark and DuckDB
    (decimal-literal trap dodged with e0 notation), rounded to 6.
    Pure map work: one projection over the scan, no shuffle.

    Output: (doc_id, n_words, n_sents, n_syll, flesch, fk_grade);
    scores NULL for token-less documents.
    """
    d = documents.select(
        "doc_id",
        F.size(tokens_col("text")).alias("n_words"),
        F.expr("greatest(1, regexp_count(text, '[.!?]+'))")
        .cast("int")
        .alias("n_sents"),
        F.coalesce(
            F.expr(
                "aggregate(transform("
                "filter(split(lower(text), '[^a-z0-9]+'), t -> t != ''), "
                "t -> greatest(1, regexp_count(t, '[aeiouy]+'))), "
                "0L, (a, v) -> a + cast(v as bigint))"
            ),
            F.lit(0).cast("bigint"),
        ).alias("n_syll"),
    )
    flesch = (
        "round(206.835e0 - 1.015e0 * (n_words / n_sents)"
        " - 84.6e0 * (n_syll / n_words), 6)"
    )
    fk = (
        "round(0.39e0 * (n_words / n_sents)"
        " + 11.8e0 * (n_syll / n_words) - 15.59e0, 6)"
    )
    return d.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syll",
        F.when(F.col("n_words") > 0, F.expr(flesch)).alias("flesch"),
        F.when(F.col("n_words") > 0, F.expr(fk)).alias("fk_grade"),
    )


def char_entropy(documents: DataFrame) -> DataFrame:
    """Per-document character-unigram Shannon entropy in nats — the
    cheap stand-in for the compression-ratio quality signal (CCNet /
    Gopher drop documents whose bytes compress too well; H over the
    character distribution is the analytic version: boilerplate,
    repeated padding, and character-level gibberish all sit far below
    natural text's band).

    Same exactness recipe as unigram_logloss, but WITHIN-doc: the
    per-character log-probability ln(c/n) is fixed-point quantized to
    the 1e-9 lattice once per (doc, char) row, the entropy numerator
    sum(c * fp) is then an exact BIGINT, and H = -sum/(n * 1e9) is one
    rounded division. Characters come from regexp_extract_all(text,
    '.') — '.' excludes newlines in BOTH regex engines (java.util
    and RE2), which is the documented counting domain.

    Physical shape: one char explode -> (doc, char) groupBy (partial-
    agg friendly; fan-out = text length, same as every shingle op),
    one per-doc integer-sum groupBy. No window, no sort, no join.

    Output: (doc_id, n_chars_counted, distinct_chars, entropy_nats).
    """
    cf = (
        documents.select(
            "doc_id",
            F.explode(F.expr("regexp_extract_all(text, '.', 0)")).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    per_doc = cf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("distinct_chars"),
        F.collect_list(F.struct("ch", "c")).alias("_cs"),
    )
    # fp quantization needs n (the per-doc total), so it runs after the
    # per-doc agg on the bounded distinct-char list — sized by the
    # alphabet, not the text
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        "distinct_chars",
        F.expr(
            "round(-aggregate(_cs, cast(0 as bigint), (acc, x) -> acc + "
            "x.c * cast(round(ln(x.c / cast(n as double)) * 1000000000e0, 0)"
            " as bigint)) / (n * 1000000000e0), 6)"
        ).alias("entropy_nats"),
    )


def lexical_richness(documents: DataFrame) -> DataFrame:
    """Per-document vocabulary-richness profile — the lexical-diversity
    quality signals (template/spam text reuses few types; natural prose
    doesn't): type-token ratio, hapax share (types occurring once —
    Zipf's tail presence), and Herdan's C = ln V / ln N, the
    length-robust TTR variant (plain TTR decays mechanically with doc
    length, which is why C is reported alongside it).

    All counts are integers from ONE (doc, term) groupBy + one per-doc
    groupBy (both partial-agg friendly, no join/window/sort); TTR and
    hapax share are single rounded divisions; Herdan's C is one
    ln/ln expression over integers (ln lockstep pinned by tfidf/PMI),
    NULL for docs with N < 2 where the denominator degenerates.

    Output: (doc_id, n_tokens, n_types, n_hapax, ttr, hapax_share,
    herdan_c).
    """
    tf = (
        documents.select(
            "doc_id", F.explode(tokens_col("text")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    per = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.expr("round(n_types / cast(n_tokens as double), 6)").alias("ttr"),
        F.expr("round(n_hapax / cast(n_types as double), 6)").alias(
            "hapax_share"
        ),
        F.expr(
            "case when n_tokens >= 2 then "
            "round(ln(cast(n_types as double)) / "
            "ln(cast(n_tokens as double)), 6) end"
        ).alias("herdan_c"),
    )


def source_wasserstein(
    documents: DataFrame,
    strata: str = "source",
    value: str = "n_chars",
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover) distance between each
    stratum's `value` distribution and the whole corpus — the
    GEOMETRIC drift metric beside source_kl's information-theoretic
    one: W1 integrates |CDF_s - CDF_corpus| over the value axis, so it
    has the value's own units ("this feed's documents are ~40 chars
    shifted") and never explodes on disjoint supports the way KL does.

    Exactness: on the merged value grid the integrand is constant
    between consecutive distinct values, so

      W1 = sum_g |c_s(g) * N - c(g) * n_s| * gap_g / (n_s * N)

    with c_s/c cumulative counts — the numerator is an order-free
    BIGINT sum (emitted as w1_num so the certificate is integer), the
    denominator one final division. The grid is the corpus's distinct-
    value table (bounded lattice, the auc_score convention); the
    stratum x grid matrix is strata x |grid| rows — dimension-sized,
    never corpus-sized. BIGINT headroom: |c_s*N| <= N^2 and gap <= the
    value span; at 10^12-row corpora swap the sums to DECIMAL(38,0)
    (the embedding_gramian recipe).

    Output: (strata, n_s, w1_num, w1).
    """
    from pyspark.sql import Window

    v = F.col(value).cast("long")
    grid = documents.groupBy(v.alias("v")).agg(F.count("*").alias("c"))
    wg = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    grid = grid.select(
        "v",
        F.sum("c").over(wg).alias("cum_all"),
        (F.coalesce(F.lead("v").over(Window.orderBy("v")), F.col("v"))
         - F.col("v")).alias("gap"),
    )
    totals = documents.groupBy(F.col(strata).alias("s")).agg(
        F.count("*").alias("n_s")
    )
    n_all = documents.agg(F.count("*").alias("n_all"))
    sh = documents.groupBy(
        F.col(strata).alias("s"), v.alias("v")
    ).agg(F.count("*").alias("c_s"))
    mat = (
        totals.crossJoin(F.broadcast(grid))
        .join(sh, ["s", "v"], "left")
        .select(
            "s",
            "n_s",
            "v",
            "cum_all",
            "gap",
            F.coalesce("c_s", F.lit(0)).alias("c_s"),
        )
    )
    ws = Window.partitionBy("s").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    terms = mat.select(
        "s",
        "n_s",
        "cum_all",
        "gap",
        F.sum("c_s").over(ws).alias("cum_s"),
    ).crossJoin(F.broadcast(n_all))
    return (
        terms.groupBy("s", "n_s", "n_all")
        .agg(
            F.sum(
                F.expr("abs(cum_s * n_all - cum_all * n_s) * gap")
            ).alias("w1_num")
        )
        .select(
            F.col("s").alias(strata),
            "n_s",
            "w1_num",
            F.round(
                F.expr("w1_num / (n_s * cast(n_all as double))"), 6
            ).alias("w1"),
        )
    )


def vocab_growth(
    documents: DataFrame,
    n_points: int = 20,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve + exponent — how fast the
    distinct-token vocabulary V grows with corpus size N (V ~ K*N^b,
    b~0.5 for natural text): THE scaling diagnostic for tokenizer and
    dictionary sizing before a 100 TB ingest (it says whether the
    surface-form table will fit broadcast at 1000x the corpus).

    Order-free exactness: "vocabulary after the first t documents" is
    a function of each token's FIRST-occurrence doc id (one min
    aggregation), not of any scan order — V at a checkpoint counts
    tokens with first_doc <= threshold, N sums per-doc token counts up
    to it. Doc ids are range-bucketed into n_points checkpoints
    (integer binning, the stump recipe); both curves are cumulative
    sums over the n_points-row bucket table. The Heaps exponent is the
    trend_slopes OLS on (ln N, ln V) lifted to 1e6 fixed point
    (rounded-6 lockstep ln), all sums exact BIGINTs, one division.

    Output: (ck, n_cum, v_cum, beta) — one row per non-empty
    checkpoint, beta identical on every row (broadcast 1-row fit).
    """
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id", F.explode(tokens_col("text")).alias("tok")
    )
    bounds = documents.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    bexpr = f"((doc_id - mn) * {int(n_points)}) div (mx - mn + 1)"
    ntok = (
        documents.select("doc_id", F.size(tokens_col("text")).alias("nt"))
        .crossJoin(F.broadcast(bounds))
        .groupBy(F.expr(bexpr).alias("ck"))
        .agg(F.sum("nt").alias("n_b"))
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("doc_id"))
    vtok = (
        first.crossJoin(F.broadcast(bounds))
        .groupBy(F.expr(bexpr).alias("ck"))
        .agg(F.count("*").alias("v_b"))
    )
    w = Window.orderBy("ck").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        ntok.join(vtok, "ck", "left")
        .select(
            "ck",
            F.sum("n_b").over(w).alias("n_cum"),
            F.sum(F.coalesce("v_b", F.lit(0))).over(w).alias("v_cum"),
        )
    )
    pts = curve.select(
        "ck",
        "n_cum",
        "v_cum",
        F.expr("cast(round(ln(n_cum) * 1000000, 0) as bigint)").alias("lx"),
        F.expr("cast(round(ln(v_cum) * 1000000, 0) as bigint)").alias("ly"),
    )
    fit = pts.agg(
        F.count("*").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.expr("lx * lx")).alias("sxx"),
        F.sum(F.expr("lx * ly")).alias("sxy"),
    ).select(
        F.expr(
            "case when k * sxx - sx * sx <> 0 then "
            "round((k * sxy - sx * sy) "
            "/ cast(k * sxx - sx * sx as double), 6) end"
        ).alias("beta")
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "ck", "n_cum", "v_cum", "beta"
    )


def moore_lewis_selection(
    documents: DataFrame, in_domain: str = "in_domain"
) -> DataFrame:
    """Moore-Lewis cross-entropy data selection (Moore & Lewis, ACL
    2010) — THE classic targeted-data-selection score: rank every
    document by H_in(d) - H_gen(d), the difference between its
    per-token cross-entropy under an IN-DOMAIN language model and
    under the GENERAL-corpus model. Documents that look more like the
    target domain than like the average of the pool score negative;
    the canonical keep rule is score < 0 (intelligent selection), with
    the score itself the knob for stricter quotas. This is the
    domain-adaptation complement to dsir_weights (hashed-n-gram
    importance resampling) and unigram_logloss (single-model
    perplexity band): two models, one differenced score.

    ``in_domain`` is a boolean column on ``documents`` naming the seed
    subset (e.g. lang = 'en', a curated whitelist, a labeled sample).
    Both unigram models are add-one Laplace-smoothed over the GENERAL
    vocabulary (the in-domain model must back off on tokens it never
    saw; smoothing the general model identically keeps the difference
    unbiased):

        p_m(t) = (c_{m,t} + 1) / (N_m + V)

    Exactness (the unigram_logloss recipe): each term's two log-probs
    are FIXED-POINT QUANTIZED — round(ln p * 1e9) as BIGINT — and the
    per-document reduction sums tf * (lnfp_gen - lnfp_in) as exact
    integers (order-free, engine-identical; ln is the pinned
    cross-engine lockstep). The keep predicate score_fp < 0 is a pure
    INTEGER comparison — no float enters the decision.

    Physical shape: one token explode -> (doc, term) tf groupBy; the
    general and in-domain count tables are two partial-agg rollups of
    it (vocabulary-sized, broadcast back); one 1-row totals broadcast;
    one per-doc integer-sum groupBy. The corpus is touched once; no
    window, no sort, no driver loop.

    Output: (doc_id, n_tokens, ce_in, ce_gen, ml_score, selected) —
    cross-entropies in nats/token, ml_score = ce_in - ce_gen computed
    from the SAME integer sum that decides `selected` (not a
    difference of the two 6-dp roundings).
    """
    tf = (
        documents.select(
            "doc_id",
            F.col(in_domain).cast("boolean").alias("_dom"),
            F.explode(tokens_col("text")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("_dom").alias("_dom"))
    )
    counts = tf.groupBy("term").agg(
        F.sum("tf").alias("n_gen"),
        F.sum(F.when(F.col("_dom"), F.col("tf")).otherwise(F.lit(0))).alias(
            "n_in"
        ),
    )
    totals = counts.agg(
        F.sum("n_gen").alias("tot_gen"),
        F.sum("n_in").alias("tot_in"),
        F.count("*").alias("vocab"),
    )
    lnfp = (
        "cast(round(ln(({c} + 1e0) / ({t} + vocab)) * 1000000000e0, 0)"
        " as bigint)"
    )
    scored = (
        tf.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_d",
            F.expr(
                "tf * ("
                + lnfp.format(c="n_gen", t="tot_gen")
                + " - "
                + lnfp.format(c="n_in", t="tot_in")
                + ")"
            ),
        )
        .withColumn(
            "_li", F.expr("tf * " + lnfp.format(c="n_in", t="tot_in"))
        )
        .withColumn(
            "_lg", F.expr("tf * " + lnfp.format(c="n_gen", t="tot_gen"))
        )
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum("_d").alias("_score_fp"),
            F.sum("_li").alias("_in_fp"),
            F.sum("_lg").alias("_gen_fp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.expr("round(-_in_fp / (n_tokens * 1000000000e0), 6)").alias(
            "ce_in"
        ),
        F.expr("round(-_gen_fp / (n_tokens * 1000000000e0), 6)").alias(
            "ce_gen"
        ),
        F.expr("round(_score_fp / (n_tokens * 1000000000e0), 6)").alias(
            "ml_score"
        ),
        (F.col("_score_fp") < F.lit(0)).alias("selected"),
    )


def textrank_keywords(
    documents: DataFrame,
    window: int = 2,
    iterations: int = 6,
    k: int = 20,
    min_cooc: int = 1,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) —
    the graph-based companion to rake_keywords: build the word
    co-occurrence graph (an undirected edge between two non-stopword
    tokens that co-occur within ``window`` positions of the ORIGINAL
    token sequence, weighted by co-occurrence count) and rank words by
    weighted PageRank over it; the top-k are the corpus keywords.

    Positions come from one posexplode; stopwords are filtered AFTER
    position assignment, so they occupy window slots but can never be
    edge endpoints (the paper's syntactic filter, with the stopword
    list standing in for the POS tagger this environment lacks). The
    +-window co-occurrence is the skipgram_pairs shape: an offset
    explode (1..window) on the left and an EQUI-join on
    (doc_id, pos + off) — never an inequality join. `min_cooc` prunes
    hapax edges, bounding the graph at corpus scale.

    PageRank itself is graph.pagerank verbatim — integer edge weights
    plus the per-iteration 10-dp rounding make the unrolled oracle
    hash-exact (the entity_pagerank_weighted lockstep). The final
    top-k is a bounded TopK over the vocabulary-sized score table with
    deterministic ties (pr desc, term asc).

    Output: (rank, term, pr) — k rows.
    """
    from careers_spark.functions.text import STOP_WORDS
    from careers_spark.operators.graph import pagerank

    toks = (
        documents.select(
            "doc_id",
            F.posexplode(tokens_col("text")).alias("pos", "term"),
        )
        .filter(~F.col("term").isin(*sorted(STOP_WORDS)))
    )
    left = toks.select(
        "doc_id",
        "pos",
        F.col("term").alias("t1"),
        F.explode(
            F.array(*[F.lit(i) for i in range(1, int(window) + 1)])
        ).alias("off"),
    )
    right = toks.select(
        "doc_id", F.col("pos").alias("pos2"), F.col("term").alias("t2")
    )
    pairs = (
        left.join(
            right,
            (left["doc_id"] == right["doc_id"])
            & (right["pos2"] == left["pos"] + left["off"]),
        )
        .filter(F.col("t1") != F.col("t2"))
        .select(
            F.least("t1", "t2").alias("x"),
            F.greatest("t1", "t2").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= int(min_cooc))
    )
    e = pairs.select(
        F.col("x").alias("src"), F.col("y").alias("dst"), "w"
    ).unionAll(
        pairs.select(
            F.col("y").alias("src"), F.col("x").alias("dst"), "w"
        )
    )
    from pyspark.sql import Window

    # The edge table is vocabulary^2-bounded and min_cooc-pruned —
    # checkpoint it once so the empty-graph guard (pagerank's 1/N
    # teleport is undefined on zero nodes) doesn't recompute the
    # co-occurrence aggregation.
    e = e.localCheckpoint(eager=True)
    if e.isEmpty():
        return documents.sparkSession.createDataFrame(
            [], "rank int, term string, pr double"
        )
    # r6: the word co-occurrence graph is large enough that the lazy
    # 6-iteration prefix re-execution dominates — checkpoint iterates
    # (A/B at sf0.1: 7.2s -> 3.7s; values identical, see pagerank)
    pr = pagerank(
        e, weight="w", iterations=int(iterations), checkpoint_iterates=True
    )
    wnd = Window.orderBy(F.desc("pr"), F.asc("node"))
    return (
        pr.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= int(k))
        .select("rank", F.col("node").alias("term"), "pr")
    )


def ccnet_ppl_buckets(documents: DataFrame) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    split each language's documents into head / middle / tail thirds
    by language-model score — THE published recipe for tiering a web
    crawl before pre-training (head = cleanest third, tail = usually
    dropped or down-sampled). CCNet scores with per-language KenLM
    models; with no external model in this environment each language's
    own corpus unigram MLE plays that role (the unigram_logloss
    stand-in, per language), so a document is scored against ITS OWN
    language's distribution and buckets never compare across
    languages.

    Exactness end-to-end: per-token ln p(t|lang) is FIXED-POINT
    QUANTIZED at 1e9 (the unigram_logloss recipe), the per-doc sum is
    an exact BIGINT, and the BUCKET BOUNDARIES are integer algebra on
    a 0.01-nat bin lattice (the stump integer-binning recipe):

        nll_bin = (-nll_fp * 100) div (n_tokens * 10^9)   -- BIGINT
        head cut  c1(lang) = min bin with 3*cum(bin) >= n(lang)
        tail cut  c2(lang) = min bin with 3*cum(bin) >= 2*n(lang)

    — cumulative over the per-language BIN table (dimension-sized,
    never a corpus-wide sort; boundary ties share a bin and land in
    the lower bucket, documented bin-granularity semantics). No float
    enters any bucket decision.

    Physical shape: one token explode -> (doc, term) tf groupBy; the
    per-language model is a (lang, term) rollup broadcast back; bins
    aggregate per (lang, bin); two bounded windows over the bin table;
    one broadcast cut join back onto docs. The corpus is touched once.

    Output: (doc_id, lang, n_tokens, avg_nll, nll_bin, bucket) with
    bucket in {'head', 'middle', 'tail'}.
    """
    from pyspark.sql import Window

    tf = (
        documents.select(
            "doc_id", "lang", F.explode(tokens_col("text")).alias("term")
        )
        .groupBy("doc_id", "lang", "term")
        .agg(F.count("*").alias("tf"))
    )
    counts = tf.groupBy("lang", "term").agg(F.sum("tf").alias("n_term"))
    totals = counts.groupBy("lang").agg(F.sum("n_term").alias("n_total"))
    docs = (
        tf.join(F.broadcast(counts), ["lang", "term"])
        .join(F.broadcast(totals), "lang")
        .withColumn(
            "_c",
            F.expr(
                "tf * cast(round(ln(n_term / cast(n_total as double))"
                " * 1000000000e0, 0) as bigint)"
            ),
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("_c").alias("_fp"))
        .withColumn(
            "nll_bin",
            F.expr("(-_fp * 100) div (n_tokens * 1000000000)"),
        )
    )
    bins = docs.groupBy("lang", "nll_bin").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy("nll_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("lang")
    cuts = (
        bins.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall))
        .groupBy("lang")
        .agg(
            F.min(
                F.when(3 * F.col("cum") >= F.col("n"), F.col("nll_bin"))
            ).alias("c1"),
            F.min(
                F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("nll_bin"))
            ).alias("c2"),
        )
    )
    return (
        docs.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("round(-_fp / (n_tokens * 1000000000e0), 6)").alias(
                "avg_nll"
            ),
            "nll_bin",
            F.when(F.col("nll_bin") <= F.col("c1"), F.lit("head"))
            .when(F.col("nll_bin") <= F.col("c2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def good_turing(documents: DataFrame) -> DataFrame:
    """Good-Turing frequency-of-frequencies analysis (Good 1953) —
    the foundation under Katz backoff and the standard answer to "how
    much probability mass belongs to tokens we have NEVER seen": the
    unseen mass is estimated by the singleton share N_1/N, and each
    observed count r is discounted to r* = (r+1) * N_{r+1} / N_r. The
    vocabulary-sizing companion to corpus_vocab_growth (Heaps) and
    corpus_zipf_alpha (Zipf): together they answer "what happens to
    the tokenizer at 100x the data".

    Everything is exact integer algebra over the frequency-of-
    frequencies table: term counts from one explode + groupBy, N_r
    from a second (bounded: one row per DISTINCT count value), mass =
    r * N_r / N and r* each ONE division of exact BIGINTs rounded at
    6 dp. N_{r+1} comes from a self equi-join on r+1 (dimension-
    sized); where count class r+1 is empty, raw GT is undefined and
    r_star is NULL (the simple-GT smoothing fix is out of scope,
    stated). The r=0 summary row carries the unseen-mass estimate
    N_1/N in `mass` (Good-Turing's claim: that is the probability the
    NEXT token is novel).

    Output: (r, n_r, mass, r_star) — one row per observed count value
    plus the r=0 unseen row, ordered by r.
    """
    tf = (
        documents.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("r"))
    )
    fof = tf.groupBy("r").agg(F.count("*").alias("n_r"))
    total = tf.agg(F.sum("r").alias("n_tot"))
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next")
    )
    body = (
        fof.join(nxt, "r", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "r",
            "n_r",
            F.expr("round(r * n_r * 1e0 / n_tot, 6)").alias("mass"),
            F.expr(
                "case when n_next is null then null"
                " else round((r + 1) * n_next * 1e0 / n_r, 6) end"
            ).alias("r_star"),
        )
    )
    unseen = (
        fof.filter(F.col("r") == 1)
        .crossJoin(F.broadcast(total))
        .select(
            F.lit(0).cast("long").alias("r"),
            F.lit(0).cast("long").alias("n_r"),
            F.expr("round(n_r * 1e0 / n_tot, 6)").alias("mass"),
            F.lit(None).cast("double").alias("r_star"),
        )
    )
    return body.unionAll(unseen)
