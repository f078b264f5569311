"""Sequence packing for LLM pretraining batches.

The sample-packing step of a training-data pipeline: documents are
concatenated in a deterministic order into fixed token-budget training
sequences ("concatenate and chunk" — every pretraining stack does a
variant of this so short documents don't waste context-window slots).

Packing needs only LOCAL contiguity — a document's sequence assignment
depends on the docs before it in ITS stream, not on any global order —
so the stream is sharded: each (stratum, shard) pair is packed
independently with one in-partition window. At 100 TB you raise
`shards` into the thousands and every sort stays partition-local and
bounded; there is no global sort anywhere. Shard assignment is
md5-derived (same engine-identical hash family as sampling.py), so the
layout is deterministic across runs, engines, and parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from careers_spark.operators.dedup import _hash64_expr, tokens_col


def pack_sequences(
    documents: DataFrame,
    window: int = 512,
    strata: str = "lang",
    shards: int = 1,
    key: str = "doc_id",
) -> DataFrame:
    """Assign every document a (stream, seq_id, offset) packing position.

    Within each (strata, shard) stream, documents are ordered by `key`
    and laid head-to-tail; position = exclusive running token count.
    seq_id = position // window (which training sequence the document
    STARTS in), offset = position % window, straddles = the document
    crosses its sequence's right boundary (it will be split across two
    training sequences — the metric packing efficiency studies track).

    Output: (doc_id, <strata>, shard, n_tokens, seq_id, offset,
    straddles).
    """
    shard = F.expr(
        f"{_hash64_expr(f'cast({key} as string)')} % {int(shards)}"
    ).alias("shard")
    toks = documents.select(
        F.col(key).alias("doc_id"),
        F.col(strata).alias(strata),
        shard,
        F.size(tokens_col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strata, "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        strata,
        "shard",
        "n_tokens",
        F.floor(pos / window).cast("bigint").alias("seq_id"),
        (pos % window).cast("bigint").alias("offset"),
        ((pos % window) + F.col("n_tokens") > window).alias("straddles"),
    )


def chunk_tokens(
    documents: DataFrame,
    size: int = 64,
    stride: int = 48,
    key: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the RAG-ingestion primitive
    that splits every document into fixed-size token windows with
    `size - stride` tokens of overlap (the complement of
    pack_sequences: packing fills training sequences, chunking feeds a
    retrieval index).

    Chunk starts sit at 0, stride, 2*stride, ...; the count is chosen so
    the final window always covers the document tail:
    n <= size -> 1 chunk, else 1 + ceil((n - size)/stride) via integer
    division. A zero-token document still yields one (empty) chunk so
    every doc_id survives into the index.

    Physical shape at 100 TB: pure projection + per-row explode — NO
    shuffle at any scale; chunk rows inherit the scan's partitioning
    and the expected fan-out is n/stride rows per document.

    Engine exactness: starts/lengths are integer arithmetic and the
    chunk content is fingerprinted as md5 of the space-joined token
    slice — Spark `slice`/`array_join` and DuckDB list slicing /
    `array_to_string` clamp identically at the tail.

    Output: (doc_id, chunk_id, start_tok, chunk_len, chunk_hash).
    """
    size, stride = int(size), int(stride)
    if not (1 <= stride <= size):
        raise ValueError(
            f"stride must be in [1, size]; stride={stride} > size={size}"
            " would leave tokens covered by no chunk"
        )
    t = documents.select(
        F.col(key).alias("doc_id"), tokens_col("text").alias("toks")
    ).withColumn("n", F.size("toks"))
    t = t.withColumn(
        "n_chunks",
        F.expr(
            f"case when n <= {size} then 1"
            f" else 1 + ((n - {size}) + {stride} - 1) div {stride} end"
        ),
    )
    c = t.select(
        "doc_id",
        "toks",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id"),
    ).withColumn("start_tok", (F.col("chunk_id") * stride).cast("bigint"))
    chunk = F.expr(f"slice(toks, start_tok + 1, {size})")
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "start_tok",
        F.size(chunk).cast("bigint").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )
