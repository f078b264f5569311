"""Stream-stream interval join == the batch inequality join on the
same data, with the two sides arriving in SEPARATE micro-batches (the
join state must buffer across batches)."""

import pandas as pd

from careers_spark.streaming.joins import clicks_before_purchase_stream

SCHEMA = "user_id long, event_id long, ts timestamp"


def _write(spark, path, rows):
    pdf = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_id": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows], unit="s"),
        }
    )
    spark.createDataFrame(pdf, schema=SCHEMA).write.mode("append").parquet(path)


def test_stream_join_equals_batch(spark, tmp_path):
    clicks = [
        (1, 100, 1000), (1, 101, 2000), (1, 102, 4600),   # u1
        (2, 200, 50),                                      # u2: too early
        (3, 300, 7000),                                    # u3: after purchase
    ]
    purchases = [
        (1, 900, 4600),   # window [1000, 4600): clicks 100, 101 (102 at == excluded)
        (2, 901, 4000),   # window [400, 4000): none (click at 50 too old)
        (3, 902, 6000),   # click at 7000 is later: none
        (1, 903, 1500),   # window [-2100, 1500): click 100 only
    ]
    cp, pp = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    # two files per side -> with maxFilesPerTrigger=1 the sides land in
    # different micro-batches and pairs must come from buffered state
    _write(spark, cp, clicks[:2])
    _write(spark, cp, clicks[2:])
    _write(spark, pp, purchases[:2])
    _write(spark, pp, purchases[2:])

    cs = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").load(cp)
    )
    ps = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").load(pp)
    )
    out = str(tmp_path / "pairs")
    q = (
        clicks_before_purchase_stream(cs, ps, window_s=3600)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.read.parquet(out).collect()
    }

    # batch truth: plain inequality join on the identical rows
    cb = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": [r[0] for r in clicks],
             "click_id": [r[1] for r in clicks],
             "click_ts": pd.to_datetime([r[2] for r in clicks], unit="s")}
        )
    )
    pb = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": [r[0] for r in purchases],
             "purchase_id": [r[1] for r in purchases],
             "purchase_ts": pd.to_datetime([r[2] for r in purchases], unit="s")}
        )
    )
    from pyspark.sql import functions as F

    want = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in pb.join(
            cb,
            (pb.user_id == cb.user_id)
            & (cb.click_ts >= pb.purchase_ts - F.expr("INTERVAL 3600 SECONDS"))
            & (cb.click_ts < pb.purchase_ts),
        ).select(pb.user_id, "purchase_id", "click_id").collect()
    }
    assert got == want
    assert got == {(1, 900, 100), (1, 900, 101), (1, 903, 100)}
