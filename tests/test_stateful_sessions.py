"""Stateful streaming sessionizer: cross-batch continuation, gap
splits, and state survival across a query RESTART (checkpointed state
store)."""

import pandas as pd
import pytest

from careers_spark.streaming.sessions import sessionize_stream

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


OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)


def _drain(spark, in_path, out_path, ckpt):
    # file sink, not memory: the memory sink cannot recover from a
    # checkpoint, and state survival across a query RESTART is exactly
    # what this test exercises
    stream = (
        spark.readStream.format("parquet").schema(SCHEMA).load(in_path)
    )
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _sessions(spark, out_path):
    return {
        (r.user_id, int(r.session_start.timestamp()),
         int(r.session_end.timestamp()), r.n_events)
        for r in spark.read.schema(OUT_SCHEMA).parquet(out_path).collect()
    }


def test_stateful_sessions(spark, tmp_path):
    in_path = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # batch A
    _write(
        spark,
        in_path,
        [
            (1, 10, 1000), (1, 11, 1100), (1, 12, 1200),  # u1 open session
            (2, 20, 1000), (2, 21, 5000),                  # u2: gap inside A
            (3, 30, 1000),                                 # u3 single event
        ],
    )
    out = str(tmp_path / "sessions")
    _drain(spark, in_path, out, ckpt)
    # only u2's first session is provably closed within batch A
    assert _sessions(spark, out) == {(2, 1000, 1000, 1)}

    # batch B — NEW query instance, same checkpoint + sink: state must
    # restore from the checkpointed store, not restart from scratch
    _write(
        spark,
        in_path,
        [
            (1, 13, 1300), (1, 14, 10000),  # u1: extends, then closes
            (3, 31, 1500), (3, 32, 9999),   # u3: cross-batch continuation
        ],
    )
    _drain(spark, in_path, out, ckpt)
    # u1's session spans batches A+B (4 events), u3's spans too (2);
    # the open tails (u1@10000, u2@5000, u3@9999) are NOT emitted
    assert _sessions(spark, out) == {
        (2, 1000, 1000, 1),
        (1, 1000, 1300, 4),
        (3, 1000, 1500, 2),
    }


def test_stateful_sessions_rejects_time_regression(spark, tmp_path):
    in_path = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions")
    _write(spark, in_path, [(7, 1, 5000)])
    _drain(spark, in_path, out, ckpt)
    # a second poll delivering an event BEFORE the open session end
    # violates the append-ordered-feed contract and must fail loudly
    _write(spark, in_path, [(7, 2, 4000)])
    with pytest.raises(Exception):
        _drain(spark, in_path, out, ckpt)


def test_event_time_timeout_flushes_open_sessions(spark, tmp_path):
    """With a watermark, an open session flushes once the watermark
    passes its gap horizon — no sentinel event for that user needed."""
    in_path = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions")

    def drain():
        stream = (
            spark.readStream.format("parquet").schema(SCHEMA).load(in_path)
        )
        from careers_spark.streaming.sessions import sessionize_stream

        q = (
            sessionize_stream(stream, gap_s=1800, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch A: u1's session (stays open); watermark ends at 1200
    _write(spark, in_path, [(1, 10, 1000), (1, 11, 1200)])
    drain()
    assert _sessions(spark, out) == set()

    # batch B: a different user far in the future advances the
    # watermark beyond u1's horizon (1200 + 1800) at batch END
    _write(spark, in_path, [(9, 90, 1_000_000)])
    drain()

    # batch C: timeouts are evaluated against the NEW watermark -> u1's
    # open session flushes even though u1 sent nothing since batch A
    _write(spark, in_path, [(9, 91, 1_000_001)])
    drain()
    got = _sessions(spark, out)
    assert (1, 1000, 1200, 2) in got
