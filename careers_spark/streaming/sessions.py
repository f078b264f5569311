"""Custom stateful streaming operator: gap-based sessionization via
`applyInPandasWithState`.

The batch `sessionize` driver query counts sessions with a lag window;
the streaming version cannot (a window needs the whole history), so
per-user session state lives in the state store: the open session's
(start, end, n_events) survives across micro-batches AND across query
restarts (the state store is checkpointed — test_stateful_sessions
restarts the query between batches deliberately).

Semantics (mirrors the batch query): events of one user ordered by
(ts, event_id); a gap of MORE than `gap_s` seconds between consecutive
events closes the session. A closed session is emitted exactly once —
when a later event proves the gap. The final open session per user
stays in state and is NOT emitted (an append-only feed can always
extend it); callers wanting a forced flush send a per-user sentinel
event beyond the horizon, the standard close-out.

Contract: per-user event times must be non-decreasing ACROSS polls
(append-only commit-ordered feed, the same assumption as the
incremental polling loop); within one micro-batch any order is fine
(sorted here). A row older than the open session's end would belong to
an already-emitted session and raises rather than silently corrupting
counts.

Scale: state is O(active users) x one (start, end, n) triple — bounded
regardless of history length; the shuffle is the groupBy(user_id) hash
exchange that any per-user operator pays. Arrow-batched pandas, no
per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, end long, n long"


def _session_fn(gap_us: int, timeout: bool):
    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if timeout and state.hasTimedOut:
            # the watermark passed this open session's gap horizon: no
            # in-order event can extend it any more — flush and clear
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "session_start": pd.to_datetime([start], unit="us"),
                    "session_end": pd.to_datetime([end], unit="us"),
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0
        closed = []
        for ts in rows["ts_us"]:
            ts = int(ts)
            if start is None:
                start, end, n = ts, ts, 1
            elif ts - end > gap_us:
                closed.append((start, end, n))
                start, end, n = ts, ts, 1
            else:
                if ts < end:
                    raise ValueError(
                        f"user {key[0]}: event at {ts}us precedes the open "
                        f"session end {end}us — the feed is not append-ordered"
                    )
                end, n = ts, n + 1
        state.update((start, end, n))
        if timeout:
            # flush when the event-time watermark passes end + gap (ms)
            state.setTimeoutTimestamp((end + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_s: int = 1800, watermark: str | None = None
) -> DataFrame:
    """Closed gap-sessions from a streaming events frame.

    `events` needs (user_id, event_id, ts); output one row per CLOSED
    session: (user_id, session_start, session_end, n_events).

    With ``watermark`` set (e.g. "10 minutes"), open sessions ALSO
    flush via event-time timeout once the watermark passes their gap
    horizon (end + gap) — the full sessionization semantics: every
    session eventually emits, idle users cost no state forever
    (state.remove() on flush), and no sentinel close-out events are
    needed. Without it, behavior is as before: only gap-proven closes
    emit and the open tail waits in state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    use_timeout = watermark is not None
    # the watermarked event-time column must survive into the grouped
    # input, so keep `ts` alongside the integer ts_us the fn consumes
    prepped = events.select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    if use_timeout:
        prepped = prepped.withWatermark("ts", watermark)
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(int(gap_s) * 1_000_000, use_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
