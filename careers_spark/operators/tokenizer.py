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
