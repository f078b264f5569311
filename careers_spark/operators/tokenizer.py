"""Tokenizer-design statistics: BPE merge-pair counting.

The first iteration of byte-pair encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") counts
adjacent symbol-pair occurrences across the corpus vocabulary, weighted
by word frequency, and merges the most frequent pair. This module
computes that statistic — the table a tokenizer designer reads before
picking merges — as two partial-agg-friendly groupBys:

    corpus tokens -> (word, freq)          one shuffle on word
    word chars    -> (pair, sum freq)      one shuffle on pair

The end-of-word marker follows the paper: each word is terminated so
that word-final pairs are distinguishable from word-internal ones. We
use ``_`` as the marker character — the tokenizer splits on
``[^a-z0-9]+`` so no real token can contain it.

Scale: the second stage's key space is bounded by the symbol alphabet
squared (37^2 here), and the first is vocabulary-sized with map-side
combine on both — no windows, no sorts, no per-row Python.

Reference scope: the Careers reference builds its NER lexicon from
word/phrase statistics (PhraseMap.scala's word counting); subword-unit
statistics are the LLM-era continuation of the same corpus-vocabulary
pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from careers_spark.operators.dedup import tokens_col

EOW = "_"


def bpe_pair_counts(documents: DataFrame, min_count: int = 2) -> DataFrame:
    """Adjacent character-pair counts over the corpus vocabulary,
    weighted by word frequency — the argmax of ``pair_count`` is BPE's
    first merge.

    Every position counts: a pair occurring twice inside one word
    contributes twice per word occurrence (the paper's statistic), and
    ``n_words`` is the number of distinct vocabulary words containing
    the pair at least once.

    Output: (pair, pair_count, n_words), pairs with
    ``pair_count >= min_count``.
    """
    freq = (
        documents.select(F.explode(tokens_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    w = freq.withColumn("sym", F.concat(F.col("tok"), F.lit(EOW)))
    # sym has length >= 2 (token length >= 1 plus the marker), so the
    # sequence below is never descending (Spark's sequence(1, 0) trap).
    pairs = w.select(
        "tok",
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(sym) - 1), i -> substring(sym, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("pair_count"),
            F.countDistinct("tok").alias("n_words"),
        )
        .filter(F.col("pair_count") >= min_count)
    )


def bpe_learn(documents: DataFrame, n_merges: int = 8) -> DataFrame:
    """The FULL iterative BPE training loop (Sennrich et al. 2016
    learn_bpe): n_merges rounds of count-adjacent-pairs -> merge the
    most frequent pair everywhere -> recount, over the corpus
    vocabulary weighted by word frequency. bpe_pair_counts is round
    one's statistic; this runs the actual loop and emits the learned
    merge table — the artifact a tokenizer ships.

    Exactness design: word encodings are strings of pipe-wrapped
    symbols ("|h||e||l||l||o||_|"); applying a merge is ONE literal
    regexp_replace of "|l||r|" with "|lr|", whose left-to-right
    non-overlapping scan IS BPE's greedy merge order (overlapping
    "a a a" merges once, the reference semantics), and is
    engine-identical because symbols never contain the pipe. Pair
    counts are the paper's zip statistic (overlapping positions all
    count), all integers; the argmax tie-break is (count desc, left
    asc, right asc). The whole loop is therefore unrollable into
    DuckDB CTEs (the louvain/kmeans fixpoint recipe) with zero
    tolerance.

    Raises if the vocabulary runs out of pairs before n_merges (the
    hierarchy.py budget convention) rather than silently returning
    fewer merges than the unrolled oracle computes.

    Shapes: word frequency is the one corpus-scale shuffle; every
    round then works on the VOCABULARY table (dimension-sized by
    definition — this is why tokenizer training is feasible at all):
    one split+explode, one partial-agg pair groupBy, a 1-row argmax
    collected to the driver (the Lloyd-centroid pattern), one map-side
    regexp. localCheckpoint per round keeps lineage flat.

    Output: (rk, left_sym, right_sym, pair_count) — the ordered merge
    table, rk = 1..n_merges.
    """
    spark = documents.sparkSession
    freq = (
        documents.select(F.explode(tokens_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    cur = freq.select(
        "tok",
        "freq",
        F.expr(
            "concat('|', concat_ws('||', transform(sequence(1, "
            f"length(concat(tok, '{EOW}'))), "
            f"i -> substring(concat(tok, '{EOW}'), i, 1))), '|')"
        ).alias("enc"),
    ).localCheckpoint(eager=True)

    merges = []
    for rnd in range(int(n_merges)):
        pairs = cur.select(
            "freq",
            F.expr(
                "explode(case when size(split(substring(enc, 2, "
                "length(enc) - 2), '\\\\|\\\\|')) >= 2 then "
                "transform(sequence(1, size(split(substring(enc, 2, "
                "length(enc) - 2), '\\\\|\\\\|')) - 1), "
                "i -> struct(element_at(split(substring(enc, 2, "
                "length(enc) - 2), '\\\\|\\\\|'), i) as l, "
                "element_at(split(substring(enc, 2, length(enc) - 2), "
                "'\\\\|\\\\|'), i + 1) as r)) "
                "else array() end)"
            ).alias("p"),
        ).select("freq", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        pc = pairs.groupBy("l", "r").agg(F.sum("freq").alias("cnt"))
        best = pc.agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("nc"),
                    F.col("l").alias("l"),
                    F.col("r").alias("r"),
                )
            ).alias("b")
        ).collect()[0]["b"]
        if best is None:
            raise RuntimeError(
                f"bpe_learn: vocabulary exhausted after {rnd} merges "
                f"(asked for {n_merges})"
            )
        l, r, cnt = best["l"], best["r"], -best["nc"]
        merges.append((rnd + 1, l, r, int(cnt)))
        pat = f"\\|{l}\\|\\|{r}\\|"
        cur = cur.withColumn(
            "enc", F.regexp_replace("enc", pat, f"|{l}{r}|")
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rk int, left_sym string, right_sym string, pair_count long"
    )


def bpe_fertility(documents: DataFrame, n_merges: int = 8) -> DataFrame:
    """Tokenizer fertility under the learned BPE: per document, how
    many subword symbols the n_merges-round BPE vocabulary spends per
    word — THE tokenizer-efficiency metric (multilingual papers
    report fertility per language to size vocabularies; cost scales
    with subwords, not words).

    Composes bpe_learn (the exact training loop) with an encode pass:
    the learned merges apply to the corpus VOCABULARY as the same
    n_merges literal regexp_replace chain (one projection over the
    dimension-sized vocab table — documents never re-scan), each
    word's subword count is the symbol count of its final encoding,
    and per-doc totals come from one explode + a broadcast vocab
    join. All integers; fertility one rounded division.

    Output: (doc_id, n_tokens, n_subwords, fertility).
    """
    merges = bpe_learn(documents, n_merges=n_merges).collect()
    vocab = (
        documents.select(F.explode(tokens_col()).alias("tok"))
        .distinct()
        .withColumn(
            "enc",
            F.expr(
                "concat('|', concat_ws('||', transform(sequence(1, "
                f"length(concat(tok, '{EOW}'))), "
                f"i -> substring(concat(tok, '{EOW}'), i, 1))), '|')"
            ),
        )
    )
    for m in sorted(merges, key=lambda r: r.rk):
        l, r = m.left_sym, m.right_sym
        vocab = vocab.withColumn(
            "enc",
            F.regexp_replace("enc", f"\\|{l}\\|\\|{r}\\|", f"|{l}{r}|"),
        )
    word_sym = vocab.select(
        "tok",
        F.expr(
            "cast(size(split(substring(enc, 2, length(enc) - 2), "
            "'\\\\|\\\\|')) as bigint)"
        ).alias("n_sym"),
    )
    toks = documents.select("doc_id", F.explode(tokens_col()).alias("tok"))
    return (
        toks.join(F.broadcast(word_sym), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("n_sym").alias("n_subwords"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_subwords",
            F.expr(
                "round(n_subwords / cast(n_tokens as double), 6)"
            ).alias("fertility"),
        )
    )
