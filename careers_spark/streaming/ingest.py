"""Structured-Streaming ingest for the transcripts table.

The reference has no streaming — its closest analogue is the polling
batch worker with max-id cursors (reference:
applications/WebCVProcess.scala:213-298). The Spark-native equivalent:
`readStream` over the transcripts location, event-time watermark on
`ts`, exactly-once de-dup on the (conv_id, turn_idx) key, and either

  - append to the batch transcripts table (the pipeline then runs in
    its normal checkpointed batch mode per micro-batch window), or
  - `foreachBatch` incremental mention detection: the batch operators
    are reused verbatim on each micro-batch (mention detection is
    per-turn stateless, so streaming it is embarrassing; coherence
    needs the whole conversation, so it stays in the batch/compaction
    layer — same split as the reference's online-annotate vs offline
    model-build).

Also provides a streaming per-window mention-rate aggregate as the
monitoring query (tumbling window + watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from careers_spark import schema as S


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(S.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def dedup_late_turns(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once turn stream: watermark + key de-dup.

    State size is bounded by the watermark horizon — at 10^12-turn scale
    the (conv_id, turn_idx) de-dup state holds only the horizon's keys.
    """
    return stream.withWatermark("ts", watermark).dropDuplicates(
        ["conv_id", "turn_idx"]
    )


def turn_rate_by_window(stream: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Monitoring aggregate: turns per tumbling event-time window per
    role, with watermarked late-data handling."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"))
        .select("window", "role", "n_turns")
    )


def stream_mentions_to_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    automaton,
    once: bool = True,
):
    """foreachBatch incremental mention detection: reuse the batch
    operator per micro-batch, append to a partitioned sink."""
    from careers_spark.operators.mentions import detect_mentions

    stream = dedup_late_turns(read_transcript_stream(spark, in_path))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = detect_mentions(spark, batch_df, automaton)
        out.write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="30 seconds").start()
    return q
