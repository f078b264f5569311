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
