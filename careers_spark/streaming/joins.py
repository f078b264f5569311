"""Stream-stream interval join: purchases enriched with the same-user
clicks in their trailing window, as a Structured Streaming inner join.

This is the streaming twin of the batch bounded range join
(temporal.windowed_count_join / the clicks_before_purchase driver
query): same half-open ``[purchase_ts - window, purchase_ts)``
semantics, but over two UNBOUNDED streams. Spark's stream-stream join
buffers both sides in the state store; the event-time constraint in
the join condition PLUS the watermarks are what bound that state —
a click older than (watermark - window) can never match a future
purchase and is evicted. Without the interval condition the state
would grow forever; with it, state is O(events inside one watermark
horizon), independent of stream age — the property that lets this run
indefinitely on a real cluster.

Emission: inner join in append mode — a (purchase, click) pair emits
exactly once, when both sides have arrived (possibly in different
micro-batches; the test forces that with maxFilesPerTrigger=1).
Late-side completeness is the watermark contract: pairs whose click is
older than the watermark when the purchase arrives may be lost, the
standard stream-stream tradeoff — pick the delay from the feed's real
lateness bound.

Exactness check (pytest, not oracle — the driver harness is batch):
the drained stream's pair set must equal the batch inequality join on
the identical data, across a multi-micro-batch split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_purchase_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    window_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (purchase, qualifying click) from two streaming frames.

    Both inputs need (user_id, event_id, ts). Output one row per
    (purchase, click) with the click in ``[p_ts - window_s, p_ts)``:
    (user_id, purchase_id, purchase_ts, click_id, click_ts).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {int(window_s)} SECONDS"))
        & (c["click_ts"] < p["purchase_ts"])
    )
    return p.join(c, cond, "inner").select(
        "user_id", "purchase_id", "purchase_ts", "click_id", "click_ts"
    )
