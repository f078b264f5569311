"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The Spark-side machinery (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual media decode is STUBBED — the
container has no image/audio libraries — behind `decoder=`:

  - decoder="fake"  : deterministic features derived from the payload
                      bytes (md5-based), so plumbing tests are exact;
  - decoder="real"  : raises NotImplementedError with the integration
                      point documented (swap in PIL/torchaudio there).

At scale, assets are partitioned by (kind, bucket(asset_id)) so decode
stages shard evenly and a single corrupted batch retries in isolation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURE_DIM = 8


def synth_assets(documents: DataFrame) -> DataFrame:
    """Deterministic fake assets derived from the documents table (binary
    payload = utf-8 text bytes; metadata from lengths) — exercises binary
    columns end-to-end without external media."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic pseudo-embedding: md5 bytes -> FEATURE_DIM floats."""
    dig = hashlib.md5(payload or b"").digest()
    arr = np.frombuffer(dig[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0).tolist()


def extract_features(assets: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + featurize each asset in Arrow batches.

    decoder="real" is the integration point for actual media libraries
    (PIL.Image.open / torchaudio.load on payload bytes) — not available
    in this environment.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder}")

    def fn(batches):
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio; plug in here"
                )
            feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURES
    )


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224, decoder: str = "fake"
) -> DataFrame:
    """Resize stage for image assets.

    decoder="fake" emits a deterministic resized payload (md5-keyed
    bytes of the target size header + original digest) so the batch
    shape / schema / partition behavior is fully exercised;
    decoder="real" is the PIL integration point (not in this env).
    Output keeps the ASSETS schema with updated meta + payload.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder}")

    def fn(batches):
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resize needs PIL; plug in here "
                    "(Image.open(BytesIO(payload)).resize((w, h)))"
                )
            out = pdf.copy()
            mask = out["kind"] == "image"
            out.loc[mask, "payload"] = out.loc[mask, "payload"].map(
                lambda p: hashlib.md5(p or b"").digest() + bytes([width % 256, height % 256])
            )
            out.loc[mask, "meta"] = out.loc[mask, "meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    return assets.mapInPandas(fn, schema=ASSETS)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan (timestamps only — decode is stubbed):
    one row per planned frame, derived from metadata, pure Catalyst."""
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                ).cast("array<bigint>")
            ).alias("frame_ts_ms"),
        )
    )


def frame_budget_allocation(
    assets: DataFrame, total_frames: int = 1000
) -> DataFrame:
    """Fixed-budget frame allocation across the video corpus —
    decode-time is the expensive resource in a multimodal pipeline,
    and this plans it: `total_frames` decoded frames distributed
    proportionally to duration by the Hamilton largest-remainder
    method (the neyman_eval_allocation seat algebra applied to
    decode budget), so allocations are integers that sum EXACTLY to
    the budget.

    Exact integer algebra end to end: quota numerator total * dur,
    floor via integer div, remainders ranked (remainder desc,
    asset_id asc) with the top `leftover` taking +1. The rank is an
    orderBy + limit-shaped top-k bounded by the BUDGET (leftover <
    total_frames, a constant) — at corpus scale the remainder rank
    compiles to TakeOrderedAndProject, never a global sort of all
    videos (the key_skew_report shape).

    Output: (asset_id, duration_ms, base_alloc, extra, n_frames);
    sum(n_frames) == total_frames whenever any video has positive
    duration.
    """
    from pyspark.sql import Window

    t = int(total_frames)
    v = assets.filter(F.col("kind") == "video").select(
        "asset_id",
        F.col("meta.duration_ms").cast("long").alias("duration_ms"),
    )
    tot = v.agg(
        F.sum("duration_ms").alias("total_dur"),
    )
    j = v.crossJoin(F.broadcast(tot)).select(
        "asset_id",
        "duration_ms",
        F.expr(f"({t} * duration_ms) div total_dur").alias(
            "base_alloc"
        ),
        F.expr(f"({t} * duration_ms) % total_dur").alias("rem"),
    )
    left = j.agg(
        (F.lit(t) - F.sum("base_alloc")).cast("long").alias("leftover")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("asset_id"))
    return (
        j.crossJoin(F.broadcast(left))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "asset_id",
            "duration_ms",
            "base_alloc",
            (F.col("rk") <= F.col("leftover"))
            .cast("int")
            .cast("long")
            .alias("extra"),
        )
        .withColumn(
            "n_frames", F.col("base_alloc") + F.col("extra")
        )
    )
