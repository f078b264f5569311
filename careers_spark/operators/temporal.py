"""Temporal joins and time-bucket rollups.

Operators Spark's built-in surface lacks (plus the rolling-window
report that pairs with them), expressed so Catalyst keeps the
scale-friendly physical plan:

- ``asof_join``: for every left row, the most recent right row at/before
  (or strictly before) its timestamp — the classic point-in-time join
  (market data, attribution). Implemented SORT-BASED, not join-based:
  tag the two sides, union, and take a running ``last`` over a single
  (key, ts) window. ONE shuffle on the key, no range-predicate join
  (Spark would execute that as a broadcast-nested-loop or an exploding
  inequality sort-merge), no per-left-row probe. This is exactly how a
  distributed as-of join is built at scale (the union-window form of
  the merge in pandas.merge_asof / QuestDB ASF joins).

- ``windowed_count_join``: per left row, count right rows of the same
  key in the trailing interval ``(ts - window, ts)`` — a bounded range
  join. Implemented with the band-bucketing trick: both sides bucket
  ts into ``window``-sized bands; every qualifying right row is in the
  left row's band or the one before, so the candidate set comes from an
  EQUI-join on (key, bucket) after exploding the left side to its two
  covering buckets, and the exact interval predicate filters the
  residue. Shuffle is on (key, bucket) — never a cartesian, never an
  unbounded inequality join.

- ``rolling_window_agg``: trailing N-day rolling count/sum per key via
  a RANGE frame over integer days-since-epoch — one key shuffle + a
  partition-local sort, same-day rows are peers so the value is
  intra-day-order independent.

- ``time_bucket_rollup``: multi-resolution continuous aggregates in the
  TimescaleDB hypertable style — the fine grain aggregates from raw,
  every coarser grain aggregates FROM THE NEXT FINER GRAIN (counts and
  integer-cent sums are algebraic, so re-aggregation is exact). At
  10^12 rows the hour grain reads the 5-minute aggregate (~5 orders of
  magnitude smaller), not the raw table.

The reference's analogue is the per-day/per-week activity rollups its
report layer derives from event timestamps; these operators are the
Spark-native generalization.

All money/value sums ride integer cents (``round(value * 100)`` as
BIGINT): integer sums are exact in any addition order, so rollup-of-
rollup equals rollup-of-raw bit-for-bit and the DuckDB oracles hash-
match without tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _us(ts: str) -> Column:
    """Epoch microseconds as BIGINT (DuckDB twin: epoch_us(ts)).

    Parquet timestamps load as TIMESTAMP_NTZ, which unix_micros rejects;
    the cast to TIMESTAMP interprets the wall-clock in the session
    timezone (pinned to UTC in session.py:44), matching DuckDB's
    epoch_us on the same naive value. On an already-tz'd TIMESTAMP the
    cast is a no-op.
    """
    return F.unix_micros(F.col(ts).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    payload: list[str],
    strict: bool = True,
) -> DataFrame:
    """Point-in-time join: enrich each left row with the payload of the
    most recent right row whose ``ts`` is before (``strict=True``) or
    at-or-before (``strict=False``) the left row's ``ts``.

    "Most recent" ties on equal right-side ``ts`` break toward the
    larger ``tiebreak`` (which must be unique within the right side for
    a deterministic result; an id column is the natural choice).

    Physical shape: union both sides with a side tag, ONE window over
    (key) ordered by (ts_us, side_order, tiebreak), running
    ``last(payload, ignorenulls)`` with an UNBOUNDED PRECEDING .. CURRENT
    ROW frame. Right rows carry the payload, left rows carry null; the
    side order places qualifying right rows before the left row (strict:
    equal-ts right rows sort AFTER the left row, so they are excluded;
    non-strict: before, so included). One hash shuffle on ``key``, one
    partition-local sort — the sort-merge as-of, with no join operator
    at all.

    Output: all left columns plus ``<p>_asof`` for each payload column
    (null when no right row qualifies).
    """
    side_right = F.lit(1) if strict else F.lit(0)
    side_left = F.lit(0) if strict else F.lit(1)
    lcols = left.columns
    l = (
        left.withColumn("_side", side_left)
        .withColumn("_ts_us", _us(ts))
        .select(
            key, "_ts_us", "_side", F.col(tiebreak).alias("_tb"),
            *[F.lit(None).cast(right.schema[p].dataType).alias(f"_p_{p}") for p in payload],
            F.struct(*lcols).alias("_row"),
        )
    )
    r = (
        right.withColumn("_side", side_right)
        .withColumn("_ts_us", _us(ts))
        .select(
            key, "_ts_us", "_side", F.col(tiebreak).alias("_tb"),
            *[F.col(p).alias(f"_p_{p}") for p in payload],
            F.lit(None).cast(l.schema["_row"].dataType).alias("_row"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts_us", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = l.unionByName(r).select(
        "_row",
        *[F.last(f"_p_{p}", ignorenulls=True).over(w).alias(f"{p}_asof") for p in payload],
    )
    return enriched.filter(F.col("_row").isNotNull()).select(
        *[F.col(f"_row.{c}").alias(c) for c in lcols],
        *[f"{p}_asof" for p in payload],
    )


def windowed_count_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    window_us: int,
    out: str = "n_in_window",
) -> DataFrame:
    """Per left row, the number of right rows with the same ``key`` in
    the half-open trailing interval ``[ts - window_us, ts)``.

    Band bucketing: with bucket width == window width, every qualifying
    right row lands in bucket(left) or bucket(left)-1, so candidates
    come from an equi-join on (key, bucket) against the left side
    exploded to those two buckets — 2x the left rows, never a range
    join. Left rows with zero matches are recovered by a final left
    join of the (small, one-row-per-left-key) counts back onto left.

    Output: all left columns plus ``out`` (BIGINT, 0 when none).
    """
    # integer division (`div` / DuckDB `//`), never float floor: epoch
    # micros are ~2^51, where double division error is the same order as
    # a 1-us remainder — exact integer buckets cost nothing and remove
    # the boundary hazard entirely
    lb = left.withColumn("_ts_us", _us(ts))
    rb = (
        right.withColumn("_ts_us", _us(ts))
        .withColumn("_bkt", F.expr(f"_ts_us div {window_us}"))
        .select(F.col(key).alias("_rk"), "_bkt", F.col("_ts_us").alias("_rts"))
    )
    # probe on DISTINCT (key, ts) pairs: left rows sharing a timestamp
    # would otherwise explode duplicate probes and double-count; the
    # per-pair counts join back onto every left row at the end
    probes = (
        lb.select(key, "_ts_us")
        .distinct()
        .select(
            key,
            F.col("_ts_us").alias("_lts"),
            F.explode(
                F.array(
                    F.expr(f"_ts_us div {window_us} - 1"),
                    F.expr(f"_ts_us div {window_us}"),
                )
            ).alias("_bkt"),
        )
    )
    hits = (
        probes.join(rb, (probes[key] == rb._rk) & (probes._bkt == rb._bkt))
        .filter((F.col("_rts") >= F.col("_lts") - F.lit(window_us)) & (F.col("_rts") < F.col("_lts")))
        .groupBy(probes[key].alias("_k"), "_lts")
        .agg(F.count("*").alias("_n"))
    )
    return (
        lb.join(hits, (lb[key] == hits._k) & (lb._ts_us == hits._lts), "left")
        .select(*left.columns, F.coalesce("_n", F.lit(0)).alias(out))
    )


def rolling_window_agg(
    rows: DataFrame,
    key: str,
    ts: str,
    value: str,
    days: int = 7,
    out_prefix: str = "roll",
) -> DataFrame:
    """Trailing ``days``-day rolling count + sum per ``key`` — the
    moving-aggregate report (7-day rolling revenue per customer, rolling
    event volume per user) that pairs with the as-of/range-join family.

    RANGE frame over integer DAYS-since-epoch (``_ts_us div 86400e6`` as
    an exact integer division — never float floor), frame
    ``[day - (days-1), day]``. A RANGE frame treats same-day rows as
    peers: every row of a (key, day) group gets the identical rolling
    value in both engines regardless of intra-day order, which is what
    makes the DuckDB oracle hash-exact. Value sums ride integer cents
    (module convention) so addition order can't leak IEEE noise.

    Physical shape: ONE hash shuffle on ``key`` + a partition-local
    sort — the canonical distributed windowed rollup; no global sort,
    no self-join, no explode. At 10^12 rows the only skew hazard is a
    pathological single key, absorbed the same way every per-key window
    in this repo is (keys here are customers/users — bounded fan-in).

    Output: all input columns plus ``<prefix>_n`` and ``<prefix>_cents``.
    """
    day = F.expr(f"unix_micros(cast({ts} as timestamp)) div 86400000000")
    cents = F.expr(f"cast(round({value} * 100, 0) as bigint)")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_day"))
        .rangeBetween(-(days - 1), Window.currentRow)
    )
    return (
        rows.withColumn("_day", day)
        .withColumn("_cents", cents)
        .withColumn(f"{out_prefix}_n", F.count("*").over(w))
        .withColumn(f"{out_prefix}_cents", F.sum("_cents").over(w))
        .drop("_day", "_cents")
    )


def rollup_anomalies(
    events: DataFrame,
    dims: list[str],
    ts: str = "ts",
    bucket_us: int = 3_600_000_000,
    baseline: int = 24,
    min_baseline: int = 12,
    z_threshold: int = 3,
) -> DataFrame:
    """Volume-anomaly detection over a time-bucket rollup — the
    monitoring query a hypertable feeds ("did error volume spike this
    hour vs the trailing day"): each bucket's event count is compared
    to the mean/std of the TRAILING ``baseline`` buckets (current
    excluded; gaps handled by a RANGE frame over the integer bucket
    index, so missing buckets simply don't contribute).

    The anomaly DECISION is pure integer arithmetic: with x the current
    count and (n, s, q) the frame's count/sum/sum-of-squares,

        |x - s/n| > z * std   <=>   (x*n - s)^2 > z^2 * (n*q - s^2)

    — both sides exact BIGINTs, so the flag can never flip on IEEE
    noise and the DuckDB oracle hash-matches. The reported z itself is
    the one scalar double  (x*n - s) / sqrt(n*q - s^2),  rounded to 6
    (NULL when the frame is degenerate: fewer than ``min_baseline``
    buckets or zero variance).

    Physical shape: one algebraic groupBy to the bucket grain (the
    hypertable fine-grain pass), then ONE window per dims-key over the
    tiny bucket table — at 10^12 raw rows the window input is ~6 orders
    of magnitude smaller than raw.

    Output: (<dims...>, bucket_us, n_events, baseline_n, z, is_anomaly).
    """
    buckets = (
        events.withColumn("_us", _us(ts))
        .groupBy(*dims, F.expr(f"_us div {bucket_us}").alias("_bkt"))
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy(*dims)
        .orderBy("_bkt")
        .rangeBetween(-baseline, -1)
    )
    st = (
        buckets.withColumn("_n", F.count("n_events").over(w))
        .withColumn("_s", F.sum("n_events").over(w))
        .withColumn("_q", F.sum(F.expr("n_events * n_events")).over(w))
    )
    lhs = F.expr("(n_events * _n - _s) * (n_events * _n - _s)")
    rhs = F.expr(f"{z_threshold * z_threshold} * (_n * _q - _s * _s)")
    enough = F.col("_n") >= min_baseline
    # the integer inequality handles a ZERO-VARIANCE baseline naturally:
    # rhs is 0, so any deviation from the constant (lhs > 0) flags — the
    # most obvious anomaly shape must not be suppressed; only the
    # REPORTED z needs the var > 0 guard (it would divide by zero)
    return st.select(
        *dims,
        F.expr(f"_bkt * {bucket_us}").alias("bucket_us"),
        "n_events",
        F.coalesce("_n", F.lit(0)).alias("baseline_n"),
        F.when(
            enough & (F.expr("_n * _q - _s * _s") > 0),
            F.expr("round((n_events * _n - _s) / sqrt(_n * _q - _s * _s), 6)"),
        ).alias("z"),
        F.when(enough, lhs > rhs).otherwise(F.lit(False)).alias("is_anomaly"),
    )


def time_bucket_rollup(
    events: DataFrame,
    dims: list[str],
    ts: str = "ts",
    value: str = "value",
    fine_us: int = 300_000_000,
    coarse_us: int = 3_600_000_000,
) -> DataFrame:
    """Hypertable-style two-grain continuous aggregate.

    The fine grain (default 5 min) aggregates from raw; the coarse grain
    (default 1 h; must be a multiple of ``fine_us``) aggregates FROM THE
    FINE GRAIN — count and integer-cent sum are algebraic, so the
    re-aggregation is exact and the coarse pass reads a table ~
    ``coarse_us/fine_us`` times smaller than raw. Value sums ride
    integer cents for addition-order-independent exactness.

    Output: (grain, <dims...>, bucket_us, n, sum_cents) — the union of
    both grains, ``grain`` in {'fine', 'coarse'}, ``bucket_us`` the
    bucket start in epoch microseconds.
    """
    if coarse_us % fine_us != 0:
        raise ValueError("coarse_us must be a multiple of fine_us")
    cents = F.expr(f"cast(round({value} * 100, 0) as bigint)")
    fine = (
        events.withColumn("_us", _us(ts))
        .groupBy(
            *dims,
            F.expr(f"(_us div {fine_us}) * {fine_us}").alias("bucket_us"),
        )
        .agg(F.count("*").alias("n"), F.sum(cents).alias("sum_cents"))
    )
    coarse = (
        fine.groupBy(
            *dims,
            F.expr(f"(bucket_us div {coarse_us}) * {coarse_us}").alias("bucket_us"),
        )
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )
    return fine.select(F.lit("fine").alias("grain"), *dims, "bucket_us", "n", "sum_cents").unionByName(
        coarse.select(F.lit("coarse").alias("grain"), *dims, "bucket_us", "n", "sum_cents")
    )


def gap_fill_hourly(
    events: DataFrame,
    ts: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Gap-filled dense hourly series per key — the time_bucket_gapfill
    / densify primitive of a hypertable layer: every (key, hour) cell of
    the global [min, max] hour range exists in the output, with cnt = 0
    and is_gap = true where the raw stream had no rows, plus a
    forward-filled last_active_hour (the most recent hour <= h with
    activity — locf on the time axis).

    Physical shape: the raw stream collapses to hourly counts FIRST
    (one algebraic groupBy, ~4-6 orders smaller than raw), the hour
    grid is a broadcast 1-row bounds aggregate exploded per key (grid
    size = n_keys x n_hours, dimension-sized), and the forward fill is
    a running MAX of hour-when-active — algebraic, no last(ignorenulls)
    state — over the per-key window.

    Everything is integer arithmetic (epoch-hours via integer division
    of epoch-us), so the DuckDB oracle hash-matches with no tolerance.

    Output: (<key>, hour, cnt, is_gap, last_active_hour) — hour is
    hours-since-epoch BIGINT; last_active_hour NULL before the key's
    first activity.
    """
    # integer `div` (not `/`, which is double division in Spark SQL);
    # event epochs are positive so Spark's truncating div == DuckDB's
    # floor //
    hours = events.select(
        F.col(key).alias("k"),
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) div 3600000000"
        ).alias("hour"),
    )
    counts = hours.groupBy("k", "hour").agg(F.count("*").alias("cnt"))
    bounds = counts.agg(
        F.min("hour").alias("hmin"), F.max("hour").alias("hmax")
    )
    keys = counts.select("k").distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "k", F.explode(F.expr("sequence(hmin, hmax)")).alias("hour")
    )
    filled = grid.join(counts, ["k", "hour"], "left").select(
        "k",
        "hour",
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
        F.col("cnt").isNull().alias("is_gap"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        F.col("k").alias(key),
        "hour",
        "cnt",
        "is_gap",
        F.max(F.when(F.col("cnt") > 0, F.col("hour"))).over(w).alias(
            "last_active_hour"
        ),
    )


def time_decayed_agg(
    events: DataFrame,
    ts: str = "ts",
    key: str = "event_type",
    value: str = "value",
    half_life_days: int = 1,
) -> DataFrame:
    """Half-life time-decayed aggregate — the feature-store recency
    primitive ("revenue decayed at half-life h"): every event
    contributes value * 2^(-age/h), so yesterday counts half of today
    (with h = 1 day).

    Exactness without float traps: ages are INTEGER day buckets
    (epoch-us div), the decay 2^-n comes from `1 / shiftleft(1, n)` —
    an exact power of two, no libm pow — and each event's contribution
    is fixed-point quantized round(cents * 1e6 / 2^n) BIGINT, so the
    per-key reduction is an exact integer sum (the unigram_logloss
    recipe). The reference day is the corpus max (broadcast 1-row
    aggregate), making the output a deterministic function of the
    data alone.

    Physical shape: one projection + one broadcast crossJoin + one
    partial-agg groupBy — a single pass at any scale.

    Output: (<key>, n_events, decayed_fp, decayed) — decayed =
    decayed_fp / 1e6 in value units x100 (cents), rounded to 6.
    """
    h = int(half_life_days)
    base = events.select(
        F.col(key).alias("k"),
        F.expr(f"unix_micros(cast({ts} as timestamp)) div 86400000000").alias("day"),
        F.expr(f"cast(round({value} * 100, 0) as bigint)").alias("cents"),
    )
    ref = base.agg(F.max("day").alias("ref_day"))
    # integer `div` for the age (never float /); shift capped at 62 so a
    # stray ancient event can't overflow the BIGINT power of two (its
    # contribution is already sub-fixed-point at that age)
    contrib = base.crossJoin(F.broadcast(ref)).withColumn(
        "fp",
        F.expr(
            f"cast(round(cents * 1000000e0"
            f" / shiftleft(cast(1 as bigint),"
            f" cast(least((ref_day - day) div {h}, 62) as int)), 0)"
            " as bigint)"
        ),
    )
    return (
        contrib.groupBy(F.col("k").alias(key))
        .agg(F.count("*").alias("n_events"), F.sum("fp").alias("decayed_fp"))
        .select(
            key,
            "n_events",
            "decayed_fp",
            F.expr("round(decayed_fp / 1000000e0, 6)").alias("decayed"),
        )
    )


def latest_state(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """CDC / changelog compaction: the single most-recent row per key —
    the "merge latest state" every table-format upsert (Delta MERGE,
    Hudi snapshot read, Kafka compacted topic) performs. Most-recent =
    max (ts, tiebreak); the tiebreak must be unique per key so the
    winner is deterministic under equal timestamps.

    One shuffle on the key; the rank is a partition-local sort. An
    algebraic max(struct(ts_us, tiebreak, payload)) form exists (the
    IVF-assignment trick) and avoids the sort entirely — kept as a
    window here because payload-through-struct changes column
    nullability; swap at billion-key scale.

    Output: all event columns for the winning row per key.
    """
    cols = events.columns
    w = Window.partitionBy(key).orderBy(
        _us(ts).desc(), F.col(tiebreak).desc()
    )
    return (
        events.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(*cols)
    )


def scd2_history(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    attrs: list[str] | None = None,
) -> DataFrame:
    """SCD Type-2 dimension build from a changelog: every change row
    becomes a validity interval — ``valid_from`` is the row's own
    timestamp, ``valid_to`` the NEXT change's timestamp for the same
    key (exclusive upper bound, the [from, to) convention), NULL for
    the key's current version (``is_current``). This is the history
    table a warehouse MERGE maintains incrementally, stated as one
    declarative pass over the log — the batch complement of
    ``latest_state`` (which keeps only the last interval's row).

    Ordering inside a key is (ts, tiebreak); the tiebreak must be
    unique per key so interval boundaries are deterministic. Rows
    sharing a timestamp produce zero-length intervals for all but the
    last — the standard convention (an interval query ``from <= t < to``
    never returns them, and the audit trail keeps every version).

    Physical shape: ONE window (= one hash shuffle on the key + a
    partition-local sort). ``lead`` is partition-local; nothing global.
    At 10^12 rows this is the same cost as any per-key ordering pass,
    and the key-hash partitioning it produces is exactly how the
    history table should be laid out for point-in-time probes anyway.

    Output: (key, tiebreak, <attrs...>, valid_from, valid_to,
    is_current).
    """
    attrs = ["event_type", "value"] if attrs is None else attrs
    w = Window.partitionBy(key).orderBy(_us(ts), F.col(tiebreak))
    return events.select(
        key,
        tiebreak,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Exact sliding-window distinct actors per day — the DAU/WAU/MAU
    family. Rolling COUNT DISTINCT does not decompose algebraically
    (distinct is not re-aggregable across overlapping windows), so the
    standard window-function formulation either keeps whole sets in
    window state or falls back to sketches. This stays exact by
    restructuring:

      1. collapse raw events to the DISTINCT (key, day) presence table
         — one partial-agg pass; at most users x active-days rows,
         orders of magnitude below raw events;
      2. explode each presence row to the ``window_days`` report days
         it supports (a presence on day d makes the user active on
         report days d .. d+w-1);
      3. one countDistinct(key) per report day.

    The explode factor is the window length (7 for WAU, 30 for MAU) on
    the ALREADY-COLLAPSED presence table, so total work is
    O(presence x w) — the exact-answer price, linear and shuffle-
    friendly (partial-agg on (day, key) pairs), with no per-window set
    state anywhere. For w beyond ~90 switch to a sketch; below that
    this is cheaper than it looks because presence << events.

    Report days with zero active users don't appear (no gap-fill here;
    compose with gap_fill_hourly's grid pattern if needed). Days at the
    corpus tail still report (partial windows), matching the SQL
    RANGE-frame semantics on the dense day grid.

    Output: (day_us, n_active) — day bucket start in epoch-us, exact
    distinct count, only for days with >= 1 event (report day must
    itself be an observed day: we count a day as reportable when ANY
    user was present that day, the DAU grid).
    """
    day_us = 86_400_000_000
    presence = (
        events.select(
            F.col(key).alias("_k"),
            F.expr(f"unix_micros(cast({ts} as timestamp)) div {day_us}").alias("_d"),
        )
        .distinct()
    )
    observed = presence.select(F.col("_d").alias("_rd")).distinct()
    exploded = presence.select(
        "_k",
        F.explode(
            F.sequence(F.col("_d"), F.col("_d") + F.lit(int(window_days) - 1))
        ).alias("_rd"),
    )
    return (
        exploded.join(observed, "_rd")
        .groupBy("_rd")
        .agg(F.countDistinct("_k").alias("n_active"))
        .select(
            F.expr(f"_rd * {day_us}").alias("day_us"),
            F.col("n_active").cast("long").alias("n_active"),
        )
    )


def trend_slopes(
    events: DataFrame,
    dims: list[str] | None = None,
    ts: str = "ts",
) -> DataFrame:
    """Per-group least-squares trend of daily volume — "is error volume
    growing?" as a closed-form regression, no ML library: with x the
    integer day and y the day's event count,

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)

    Every S-term is a BIGINT sum of integer products, so numerator and
    denominator are EXACT in both engines regardless of aggregation
    order — the one double division is correctly rounded and identical,
    then rounded to 9. Degenerate groups (single day: denominator 0)
    report NULL slope rather than infinity.

    Days are re-based to the group's min day before the quadratic
    sums: slope is shift-invariant, and rebasing keeps n*Sxx bounded by
    n * span^2 instead of n * epoch_day^2 (overflow headroom at
    century-long spans and billion-row days alike).

    Physical shape: one algebraic groupBy to the (dims, day) grain,
    one window-free second groupBy for the five sums (the rebase min
    rides along as a group-side min + join-free subtraction via a
    two-level aggregate). At 10^12 raw rows the regression input is
    the tiny bucket table.

    Output: (<dims...>, n_days, total_events, slope_per_day).
    """
    dims = ["event_type"] if dims is None else dims
    day_us = 86_400_000_000
    daily = (
        events.withColumn("_d", F.expr(f"unix_micros(cast({ts} as timestamp)) div {day_us}"))
        .groupBy(*dims, "_d")
        .agg(F.count("*").alias("_y"))
    )
    # rebase x to the group's min day: two-level aggregate (min rides
    # the same shuffle partitioning, so no extra exchange)
    w_min = daily.groupBy(*dims).agg(F.min("_d").alias("_d0"))
    rb = daily.join(w_min, dims).withColumn("_x", F.col("_d") - F.col("_d0"))
    sums = rb.groupBy(*dims).agg(
        F.count("*").alias("n_days"),
        F.sum("_y").alias("total_events"),
        F.sum("_x").alias("_sx"),
        F.sum(F.expr("_x * _x")).alias("_sxx"),
        F.sum(F.expr("_x * _y")).alias("_sxy"),
        F.sum("_y").alias("_sy"),
    )
    den = F.expr("n_days * _sxx - _sx * _sx")
    num = F.expr("n_days * _sxy - _sx * _sy")
    return sums.select(
        *dims,
        F.col("n_days").cast("long").alias("n_days"),
        F.col("total_events").cast("long").alias("total_events"),
        F.when(den != 0, F.round(num / den.cast("double"), 9)).alias(
            "slope_per_day"
        ),
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    ts: str = "ts",
    tiebreak: str = "event_id",
    delete_col: str | None = None,
) -> DataFrame:
    """Apply a changelog to a base snapshot — the Delta/Hudi/Iceberg
    MERGE INTO stated as plain relational algebra: the new snapshot is
    (a) the winning change row per key (most recent by (ts, tiebreak),
    via latest_state), optionally dropping rows whose winner is a
    delete marker, unioned with (b) base rows whose key has no change
    (left anti join).

    Columns must match between base and changes (plus the optional
    boolean ``delete_col`` on changes). Updates and inserts need no
    distinction — a winner whose key exists in base replaces it, a new
    key appends.

    Physical shape: one key shuffle for the per-key winner (the
    latest_state rank), one anti-join base->changes on the key. The
    changelog is normally orders of magnitude smaller than the base,
    so the anti-join broadcasts the compacted change-key set under AQE
    and the base is never shuffled — the property that makes MERGE
    cheap on a 100 TB table.

    Output: the new snapshot, same schema as base.
    """
    winners = latest_state(changes, key=key, ts=ts, tiebreak=tiebreak)
    if delete_col is not None:
        surviving = winners.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        change_keys = winners.select(key)  # deletes still mask base rows
    else:
        surviving = winners
        change_keys = winners.select(key)
    untouched = base.join(change_keys, on=key, how="left_anti").select(
        *base.columns
    )
    return untouched.unionByName(surviving.select(*base.columns))


def ohlc_bars(
    events: DataFrame,
    dims: list[str],
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """OHLC candlestick bars — open/high/low/close + volume per
    (dims, bucket), the canonical financial/metrics time-series rollup
    every hypertable engine ships beside the plain rollup.

    Open and close are the VALUES AT the bucket's first/last event,
    which is not an algebraic min/max of the value itself — the
    standard trap is a window sort per bucket. Here they ride ONE
    algebraic aggregation via the max(struct(...)) argmax recipe:
    min/max over struct((ts_us, tiebreak, value)) orders
    lexicographically by time then tiebreak, so the struct's value
    field IS the first/last value, deterministic under duplicate
    timestamps. No window and no GLOBAL sort anywhere: struct
    aggregates plan as partial SortAggregate — partition-local sorts
    that still combine map-side, so the only exchange is the hash
    shuffle on the grouping key (plan-asserted).

    High/low are plain min/max of the raw double (no arithmetic —
    comparing doubles is exact); volume sums ride integer cents (the
    module convention) so the only non-integer outputs are copied
    input values.

    Output: (<dims...>, bucket_us, n_events, open, high, low, close,
    vol_cents).
    """
    cents = F.expr(f"cast(round({value} * 100, 0) as bigint)")
    first = F.min(
        F.struct(
            F.col("_us").alias("t"),
            F.col(tiebreak).alias("tb"),
            F.col(value).alias("v"),
        )
    )
    last = F.max(
        F.struct(
            F.col("_us").alias("t"),
            F.col(tiebreak).alias("tb"),
            F.col(value).alias("v"),
        )
    )
    return (
        events.withColumn("_us", _us(ts))
        .withColumn("_cents", cents)
        .groupBy(*dims, F.expr(f"_us div {bucket_us}").alias("_bkt"))
        .agg(
            F.count("*").alias("n_events"),
            first.alias("_o"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            last.alias("_c"),
            F.sum("_cents").alias("vol_cents"),
        )
        .select(
            *dims,
            F.expr(f"_bkt * {bucket_us}").alias("bucket_us"),
            "n_events",
            F.col("_o.v").alias("open"),
            "high",
            "low",
            F.col("_c.v").alias("close"),
            "vol_cents",
        )
    )


def ewma_hourly(
    events: DataFrame,
    ts: str = "ts",
    dims: list[str] | None = None,
    window: int = 24,
) -> DataFrame:
    """Exponentially-weighted moving average of hourly event counts
    with alpha = 1/2, truncated to the trailing `window` buckets — the
    smoothed-rate series behind alerting baselines and trend views
    (the EWMA control chart, Roberts 1959).

        ewma(h) = sum_{i=0..W-1} count(h - i hours) * 2^-(i+1)

    Exactness is the dyadic-lattice trick: every weight is a power of
    two, so each contribution is kept as an exact INTEGER in units of
    2^-window (count << (window-1-i)) and summed as BIGINT — exact in
    any order, at any parallelism, in any engine, with no float sum
    anywhere. The one double appears at the end: ewma = sum / 2^window,
    a single exact division (BIGINT head-room holds while total counts
    per bucket stay under ~2^39 with window=24).

    Shapes: one partial-agg groupBy to the hourly spine, an explode of
    the W-row offset sequence (fan-out W, bounded), one partial-agg
    groupBy on the target hour, and a broadcast-sized semi-join back to
    the observed spine so only real hours are emitted (missing hours
    contribute zero by absence, the standard truncated-EWMA
    convention). No windows, no global sort.

    Output: (<dims...>, hour, n_events, ewma).
    """
    dims = dims or ["event_type"]
    hour = F.date_trunc("hour", F.col(ts)).alias("hour")
    c = events.groupBy(*dims, hour).agg(F.count("*").alias("n_events"))
    fan = c.select(
        *dims,
        "hour",
        "n_events",
        F.explode(F.sequence(F.lit(0), F.lit(int(window) - 1))).alias("i"),
    ).select(
        *dims,
        F.expr(f"hour + make_interval(0, 0, 0, 0, i)").alias("hour"),
        F.expr(
            f"n_events * shiftleft(1L, {int(window)} - 1 - i)"
        ).alias("contrib"),
    )
    acc = fan.groupBy(*dims, "hour").agg(F.sum("contrib").alias("acc"))
    spine = c.select(*dims, "hour", "n_events")
    return spine.join(acc, dims + ["hour"]).select(
        *dims,
        "hour",
        "n_events",
        F.expr(f"acc / cast(shiftleft(1L, {int(window)}) as double)").alias(
            "ewma"
        ),
    )


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval-overlap join without a nested loop — the bucket-and-
    verify range-join strategy (the trick behind every scalable
    spatial/temporal range join; Spark would otherwise plan
    BroadcastNestedLoopJoin for the pure inequality predicate, which
    is O(|L| * |R|) and a non-starter at corpus scale).

    Inputs: left(l_id, l_start_us, l_end_us), right(r_id, r_start_us,
    r_end_us) — CLOSED microsecond intervals (touching endpoints
    overlap with overlap_us = 0). Each side explodes to the bucket ids
    its interval covers (fan-out = interval length / bucket_us + 1 —
    pick bucket_us near the typical interval length to keep it small),
    candidates come from the bucket equi-join, duplicates from
    multi-bucket overlaps collapse in the pair groupBy, and the exact
    closed-overlap predicate verifies. Any true overlap shares the
    bucket containing max(l_start, r_start), so recall is exact — this
    is an optimization, not an approximation.

    Output: (l_id, r_id, overlap_us) — exact integer microseconds.
    """
    b = int(bucket_us)

    def fan(df: DataFrame, sid: str, s: str, e: str) -> DataFrame:
        return df.select(
            sid,
            s,
            e,
            F.explode(
                F.sequence(
                    F.expr(f"{s} div {b}"), F.expr(f"{e} div {b}")
                )
            ).alias("_bkt"),
        )

    lf = fan(left, "l_id", "l_start_us", "l_end_us")
    rf = fan(right, "r_id", "r_start_us", "r_end_us")
    return (
        lf.join(rf, "_bkt")
        .filter(
            (F.col("l_start_us") <= F.col("r_end_us"))
            & (F.col("r_start_us") <= F.col("l_end_us"))
        )
        .groupBy("l_id", "r_id")
        .agg(
            F.first(
                F.least("l_end_us", "r_end_us")
                - F.greatest("l_start_us", "r_start_us")
            ).alias("overlap_us")
        )
    )


def user_sessions(
    events: DataFrame,
    gap_s: int = 1800,
    ts: str = "ts",
    user: str = "user_id",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Session intervals per user under the standard inactivity-gap
    rule (same gap as the sessionize count query): a new session
    starts when the previous event is more than `gap_s` away. The
    session id is the per-user cumulative count of session starts —
    a per-USER ordered window (partition-local sort, never global).

    Output: (user_id, session_id, l_start_us, l_end_us, n_events) —
    closed microsecond bounds (single-event sessions have start ==
    end)."""
    w = Window.partitionBy(user).orderBy(ts, tiebreak)
    ses = (
        events.withColumn("_us", _us(ts))
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("_us") - F.col("_prev") > gap_s * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return ses.groupBy(user, "session_id").agg(
        F.min("_us").alias("l_start_us"),
        F.max("_us").alias("l_end_us"),
        F.count("*").alias("n_events"),
    )


def forecast_backtest(
    events: DataFrame,
    ts: str = "ts",
    dims: list[str] | None = None,
    window: int = 24,
    season: int = 24,
) -> DataFrame:
    """One-step-ahead forecast backtest: the EWMA(alpha=1/2) forecast
    f(h) = sum_{i=1..W} count(h-i) * 2^-i versus the seasonal-naive
    baseline f_sn(h) = count(h - season), scored by MAE and their
    ratio — MASE (Hyndman & Koehler 2006), the standard scale-free
    forecast-accuracy metric (< 1 means the model beats the naive
    seasonal repeat).

    Exactness: the EWMA forecast rides the same 2^-window dyadic
    integer lattice as ewma_hourly (contributions count << (W-i), sum
    BIGINT), actuals and seasonal forecasts are integers on that
    lattice (<< W), so every |error| is an exact integer and both MAEs
    are single closing divisions; MASE is one division of two exact
    dyadic doubles. Hours scored are those with BOTH a full-window
    history start and a seasonal ancestor PRESENT (inner joins — the
    honest backtest set, no zero-filled fantasies).

    Shapes: one hourly rollup, a W-row offset explode, two partial-agg
    groupBys, one dimension-sized final agg. No windows, no sort.

    Output per dims: (<dims...>, n_scored, mae_ewma, mae_naive, mase).
    """
    dims = dims or ["event_type"]
    b = int(window)
    hour = F.date_trunc("hour", F.col(ts)).alias("hour")
    c = events.groupBy(*dims, hour).agg(F.count("*").alias("x"))

    # forecast contributions land at hour + i for i in 1..W (strictly
    # one-step-ahead: the target hour's own count never contributes)
    fan = c.select(
        *dims,
        F.explode(F.sequence(F.lit(1), F.lit(b))).alias("i"),
        F.col("hour").alias("src"),
        "x",
    ).select(
        *dims,
        F.expr("src + make_interval(0, 0, 0, 0, i)").alias("hour"),
        F.expr(f"x * shiftleft(1L, {b} - i)").alias("contrib"),
    )
    fcst = fan.groupBy(*dims, "hour").agg(F.sum("contrib").alias("f_fp"))

    sn = c.select(
        *dims,
        F.expr(f"hour + make_interval(0, 0, 0, 0, {int(season)})").alias("hour"),
        F.col("x").alias("x_season"),
    )
    scored = (
        c.join(fcst, dims + ["hour"])
        .join(sn, dims + ["hour"])
        .select(
            *dims,
            # errors as exact integers on the 2^-W lattice
            F.abs(
                F.expr(f"x * shiftleft(1L, {b})") - F.col("f_fp")
            ).alias("e_ewma"),
            F.expr(
                f"abs(x - x_season) * shiftleft(1L, {b})"
            ).alias("e_naive"),
        )
    )
    agg = scored.groupBy(*dims).agg(
        F.count("*").alias("n_scored"),
        F.sum("e_ewma").alias("se"),
        F.sum("e_naive").alias("sn"),
    )
    denom = f"cast(shiftleft(1L, {b}) as double)"
    return agg.select(
        *dims,
        "n_scored",
        F.expr(f"se / (n_scored * 1e0) / {denom}").alias("mae_ewma"),
        F.expr(f"sn / (n_scored * 1e0) / {denom}").alias("mae_naive"),
        F.when(F.col("sn") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("se") / (F.col("sn") * F.lit(1.0)), 6))
        .alias("mase"),
    )


def _hour_grid(events: DataFrame, ts: str) -> DataFrame:
    """Gap-filled GLOBAL hourly count series on the integer epoch-hour
    lattice: every hour of [min, max] appears once with its exact count
    (0 where the stream was silent). Grid size is dimension-sized
    (n_hours), never row-sized."""
    hours = events.select(
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) div 3600000000"
        ).alias("hour")
    )
    counts = hours.groupBy("hour").agg(F.count("*").alias("x"))
    bounds = counts.agg(
        F.min("hour").alias("hmin"), F.max("hour").alias("hmax")
    )
    grid = bounds.select(
        F.explode(F.sequence("hmin", "hmax")).alias("hour")
    )
    return grid.join(counts, "hour", "left").select(
        "hour", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )


def acf_hourly(
    events: DataFrame, ts: str = "ts", max_lag: int = 24
) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series at lags
    1..max_lag — the Box-Jenkins identification tool (is the stream
    periodic? does load decay?), exactly:

    with n hours, S = sum(x), and the SCALED centered value
    c_t = n*x_t - S (an exact BIGINT — no rational mean anywhere),

        acf(k) = sum_{t<=n-k} c_t * c_{t+k}  /  sum_t c_t^2

    numerator and denominator are exact BIGINTs (in range while
    n^3 * max_count^2 < 2^63 — ~a decade of hours at 100k events/hour)
    and the single closing division is shared-text. The series is
    gap-filled (missing hours count 0) so lag alignment is physical
    time, not row adjacency.

    Shapes: one algebraic groupBy to hourly counts, a dimension-sized
    hour grid, a bounded explode of the lag list, and one equi-join of
    the grid to itself on hour+k — no window over row counts, no sort.

    Output: (lag, n, s, num, den, acf) — one row per lag.
    """
    grid = _hour_grid(events, ts)
    tot = grid.agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    c = grid.crossJoin(F.broadcast(tot)).select(
        "hour",
        "n",
        "s",
        (F.col("n") * F.col("x") - F.col("s")).alias("c"),
    )
    den = c.agg(F.sum(F.col("c") * F.col("c")).alias("den"))
    fan = c.select(
        "hour",
        F.col("c").alias("c_t"),
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.lit(int(max_lag)).cast("long"))
        ).alias("lag"),
    ).withColumn("h2", F.col("hour") + F.col("lag"))
    lead = c.select(F.col("hour").alias("h2"), F.col("c").alias("c_lead"))
    nums = (
        fan.join(lead, "h2")
        .groupBy("lag")
        .agg(F.sum(F.col("c_t") * F.col("c_lead")).alias("num"))
    )
    return (
        nums.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n",
            "s",
            "num",
            "den",
            F.when(F.col("den") == 0, F.lit(None).cast("double"))
            .otherwise(F.expr("round(num / (den * 1e0), 6)"))
            .alias("acf"),
        )
        .orderBy("lag")
    )


def cusum_changepoint(events: DataFrame, ts: str = "ts") -> DataFrame:
    """CUSUM level-shift changepoint over the gap-filled hourly count
    series — where did the stream's rate change? The Brownian-bridge
    statistic, exactly:

        g(k)  = |n*S_k - k*S_n|        (exact BIGINT, k = 1..n-1)
        stat  = max_k g(k) / sqrt(n * (n*Sxx - S^2))

    i.e. max |S_k - (k/n) S_n| standardized by sigma_hat*sqrt(n), with
    EVERY sum an exact integer and ONE shared-text closing expression.
    The argmax hour (deterministic tie-break: earliest hour) is the
    estimated changepoint — the last hour of the 'before' segment.

    Shapes: hourly counts via one algebraic groupBy, then ONE window
    cumulative sum over the dimension-sized hour grid (n_hours rows,
    never row counts) and an algebraic max(struct) — no row-level sort.

    Output: one row (n, s, sxx, at_hour, g_num, cusum_stat);
    stat NULL for a constant series (zero variance).
    """
    grid = _hour_grid(events, ts)
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "hour",
        "x",
        F.sum("x").over(w).alias("s_k"),
        F.row_number()
        .over(Window.orderBy("hour"))
        .cast("long")
        .alias("k"),
    )
    tot = grid.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).where(F.col("k") < F.col("n"))
    best = scored.agg(
        F.max(
            F.struct(
                F.abs(
                    F.col("n") * F.col("s_k") - F.col("k") * F.col("s")
                ).alias("g_num"),
                (-F.col("hour")).alias("neg_h"),
            )
        ).alias("b"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("sxx").alias("sxx"),
    )
    return best.select(
        "n",
        "s",
        "sxx",
        (-F.col("b.neg_h")).alias("at_hour"),
        F.col("b.g_num").alias("g_num"),
        F.when(
            F.expr("n * 1e0 * sxx - s * 1e0 * s") <= 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.expr(
                "round(g_num / sqrt(n * 1e0 * (n * 1e0 * sxx - s * 1e0 * s)), 6)"
            )
        )
        .alias("cusum_stat"),
    )


def interarrival_burstiness(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    min_gaps: int = 2,
) -> DataFrame:
    """Per-actor inter-arrival statistics and the Goh-Barabasi
    burstiness coefficient B = (sigma - mu)/(sigma + mu) (Goh &
    Barabasi 2008): B -> -1 for clockwork arrivals, 0 for a Poisson
    process, -> +1 for extreme burst-and-silence patterns — the
    standard "is this actor a bot / a batch job / a human?" signal
    over event streams.

    Gaps are exact integer SECONDS from a per-key lag window
    (partition-local sort, the sessionize shape — never global).
    sum(d) and sum(d*d) are exact BIGINTs (bounded by the corpus time
    span, so no overflow at any per-key cardinality); mean/cv/B are
    then single double expressions over those integers with sqrt's
    IEEE correct rounding — identical text in both engines, rounded
    to 6. Keys with fewer than `min_gaps` gaps or zero total span
    report NULL cv/burstiness (a constant stream has sigma = 0, B =
    -1; a single gap has no dispersion to measure).

    Output: (key, n_gaps, mean_gap_s, cv, burstiness).
    """
    # integer `div`, never float-divide-then-cast: double->long casts
    # TRUNCATE in Spark but ROUND in DuckDB (the clicks_before_purchase
    # lesson), and `div` is exact on the microsecond integers anyway
    gaps = (
        events.select(
            F.col(key), _us(ts).alias("_us"), F.col(tiebreak).alias("_tb")
        )
        .select(
            key,
            F.expr(
                "( _us - lag(_us) over "
                "(partition by {k} order by _us, _tb)) div 1000000".format(
                    k=key
                )
            ).alias("d"),
        )
        .filter(F.col("d").isNotNull())
    )
    agg = gaps.groupBy(key).agg(
        F.count("*").alias("n_gaps"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sd2"),
    )
    guard = (F.col("n_gaps") >= int(min_gaps)) & (F.col("sd") > 0)
    var_num = "cast(n_gaps as double) * sd2 - cast(sd as double) * sd"
    return agg.select(
        F.col(key),
        "n_gaps",
        F.expr("round(sd / cast(n_gaps as double), 6)").alias("mean_gap_s"),
        F.when(
            guard, F.expr(f"round(sqrt({var_num}) / sd, 6)")
        ).alias("cv"),
        F.when(
            guard,
            F.expr(
                f"round((sqrt({var_num}) - sd)"
                f" / (sqrt({var_num}) + sd), 6)"
            ),
        ).alias("burstiness"),
    )


def rolling_median(
    events: DataFrame,
    window_days: int = 7,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
) -> DataFrame:
    """Exact trailing-window MEDIAN per key — the robust companion to
    rolling_window_agg's sum/count: medians shrug off the value
    spikes that drag a rolling mean (the standard monitoring
    distinction). Exact rolling quantiles are the textbook
    hard-at-scale window (not algebraic, not re-aggregable); this
    stays exact the same way the rolling sum does — a RANGE frame
    over integer days-since-epoch, so the frame holds the raw values
    of the trailing `window_days` and percentile() evaluates over
    that SET. Same-day rows are peers: every row of a (key, day)
    sees the identical frame, which is why the output collapses to
    one row per (key, day) with no information loss.

    Exactness: percentile() interpolation over a well-defined value
    set is order-independent and matches DuckDB's quantile_cont
    convention (pinned by length_quantiles); the median is rounded
    to 6 after interpolation. Day ids are integer `div` of epoch
    microseconds.

    At genuinely unbounded per-key density, swap percentile for
    approx_percentile (GK sketch, bounded state) — the same
    documented trade as length_quantiles' exact=False.

    Output: (key, day, n_in_window, median_val).
    """
    d = int(window_days)
    base = events.select(
        F.col(key),
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) div 86400000000"
        ).alias("day"),
        F.col(val).alias("v"),
    )
    over = (
        f"(partition by {key} order by day "
        f"range between {d - 1} preceding and current row)"
    )
    return (
        base.select(
            key,
            "day",
            F.expr(f"count(*) over {over}").alias("n_in_window"),
            F.expr(f"round(percentile(v, 0.5e0) over {over}, 6)").alias(
                "median_val"
            ),
        )
        .dropDuplicates([key, "day"])
    )


def vwap_daily(
    lineitem: DataFrame,
    ts: str = "l_shipdate",
    price: str = "l_extendedprice",
    qty: str = "l_quantity",
) -> DataFrame:
    """Daily volume-weighted average price — the finance-bar statistic
    beside ohlc_bars: VWAP = sum(price * qty) / sum(qty), the
    benchmark an execution desk compares fills against.

    Fixed-point exact: prices ride integer cents and quantities
    integer centi-units (round(x * 100) BIGINT), so both sums are
    order-free integers and VWAP is ONE rounded division — the
    decayed_revenue recipe. One partial-agg groupBy; no window, no
    sort.

    Output: (day, n_fills, qty_centi, notional_fp, vwap) where
    notional_fp is in cent x centi-unit fixed point.
    """
    base = lineitem.select(
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) div 86400000000"
        ).alias("day"),
        F.expr(f"cast(round({price} * 100) as bigint)").alias("p_c"),
        F.expr(f"cast(round({qty} * 100) as bigint)").alias("q_c"),
    )
    return (
        base.groupBy("day")
        .agg(
            F.count("*").alias("n_fills"),
            F.sum("q_c").alias("qty_centi"),
            F.sum(F.col("p_c") * F.col("q_c")).alias("notional_fp"),
        )
        .select(
            "day",
            "n_fills",
            "qty_centi",
            "notional_fp",
            F.expr(
                "case when qty_centi > 0 then "
                "round(notional_fp / (qty_centi * 100e0), 6) end"
            ).alias("vwap"),
        )
    )


def theil_sen_slopes(
    events: DataFrame,
    dims: list[str] | None = None,
    ts: str = "ts",
) -> DataFrame:
    """Theil-Sen robust trend of daily volume — the median of all
    pairwise slopes (y_b - y_a)/(x_b - x_a), the estimator with a
    29% breakdown point that one spiky day cannot drag (the robust
    complement of `trend_slopes`' least squares, exactly as
    rolling_median complements the rolling mean).

    The pair blow-up runs over the (dims, day) BUCKET table, never raw
    rows: at most span^2/2 pairs per group regardless of corpus size
    (one algebraic groupBy to the day grain first, the trend_slopes
    shape). Each pairwise slope is ONE exact-integer division — dy and
    dx are BIGINTs, the double quotient is correctly rounded and
    engine-identical. The median uses the percentile()/quantile_cont
    convention already pinned by rolling_median; even pair counts
    interpolate the two middle quotients. Rounded to 9 at the end.

    Output: (<dims...>, n_days, n_pairs, ts_slope). Single-day groups
    (no pairs) report NULL slope. dims defaults to ["event_type"]
    (the trend_slopes convention); pass [] for a global trend.
    """
    dims = ["event_type"] if dims is None else dims
    day_us = 86_400_000_000
    daily = (
        events.withColumn(
            "_d", F.expr(f"unix_micros(cast({ts} as timestamp)) div {day_us}")
        )
        .groupBy(*dims, "_d")
        .agg(F.count("*").alias("_y"))
    )
    a = daily.select(*dims, F.col("_d").alias("_da"), F.col("_y").alias("_ya"))
    b = daily.select(*dims, F.col("_d").alias("_db"), F.col("_y").alias("_yb"))
    on = dims if dims else None
    pairs = (
        a.join(b, on=on) if on else a.crossJoin(b)
    ).filter(F.col("_da") < F.col("_db")).withColumn(
        "_slope", F.expr("(_yb - _ya) / (_db - _da)")
    )
    # a constant join key stands in for the empty-dims global group so
    # a pairless (single-day) group still reports (n_pairs=0, NULL)
    gdims = dims if dims else ["_g"]
    if not dims:
        daily = daily.withColumn("_g", F.lit(1))
        pairs = pairs.withColumn("_g", F.lit(1))
    n_days = daily.groupBy(*gdims).agg(F.count("*").alias("n_days"))
    med = pairs.groupBy(*gdims).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.expr("percentile(_slope, 0.5)"), 9).alias("ts_slope"),
    )
    return n_days.join(med, on=gdims, how="left").select(
        *dims,
        "n_days",
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        "ts_slope",
    )


def seasonal_decompose(
    events: DataFrame,
    ts: str = "ts",
    period: int = 24,
) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly volume
    series (the moving-average method behind statsmodels
    seasonal_decompose; Cleveland's STL is its loess refinement) —
    y = trend + seasonal + residual, the decomposition every
    monitoring stack runs before alerting so daily rhythm does not
    page anyone.

    Exactness recipe: the series lives on the gap-filled hour grid
    (absent hours count 0, the haar_synopsis convention, so window
    denominators are honest). trend = the centered `period`-wide
    moving average (ROWS frame, integer sum, ONE division), defined
    only where the full window exists (edges NULL — stated, the
    statsmodels behavior). The detrended series is quantized to the
    1e-6 lattice BEFORE the per-hour-of-day averaging, so the
    seasonal means are integer sums with one division each —
    order-free exact — and seasonal is mean-centered (sum of
    seasonals over a period = 0 up to lattice rounding) exactly as
    the classical method prescribes. residual = one rounded
    subtraction. Grid windows are bounded (hours, not rows); the only
    corpus-sized work is the first groupBy.

    Output: (h, hod, y, trend, seasonal, residual) — trend/seasonal/
    residual NULL at the edge hours.
    """
    from pyspark.sql import Window

    hour_us = 3_600_000_000
    hourly = (
        events.select(
            F.expr(f"unix_micros(cast({ts} as timestamp)) div {hour_us}").alias(
                "h"
            )
        )
        .groupBy("h")
        .agg(F.count("*").alias("y"))
    )
    bounds = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    ).collect()[0]
    spark = events.sparkSession
    grid = (
        spark.range(int(bounds.h1 - bounds.h0 + 1))
        .select((F.col("id") + int(bounds.h0)).alias("h"))
        .join(hourly, "h", "left")
        .select("h", F.coalesce("y", F.lit(0)).alias("y"))
    )
    half = int(period) // 2
    wma = Window.orderBy("h").rowsBetween(-(half - 1), half)
    wcnt = F.count("*").over(wma)
    trended = grid.select(
        "h",
        F.expr(f"h % {int(period)}").alias("hod"),
        "y",
        F.when(
            wcnt == int(period),
            F.round(F.sum("y").over(wma) / int(period), 6),
        ).alias("trend"),
    )
    dq = trended.withColumn(
        "dq",
        F.expr("cast(round((y - trend) * 1000000e0, 0) as bigint)"),
    )
    seas = (
        dq.filter("dq is not null")
        .groupBy("hod")
        .agg(
            F.sum("dq").alias("sd"),
            F.count("*").alias("cd"),
        )
    )
    # mean-center the seasonal profile (classical step 3): subtract
    # the grand mean of the per-hod means, all on the 1e-6 lattice
    seas = seas.select(
        "hod", F.expr("cast(round(sd / cd, 0) as bigint)").alias("sq")
    )
    center = seas.agg(
        F.expr("cast(round(avg(sq), 0) as bigint)").alias("c")
    )
    seas = seas.crossJoin(F.broadcast(center)).select(
        "hod", ((F.col("sq") - F.col("c")) / 1e6).alias("seasonal")
    )
    return (
        dq.join(F.broadcast(seas), "hod")
        .select(
            "h",
            "hod",
            "y",
            "trend",
            F.when(F.col("trend").isNotNull(), F.round("seasonal", 6)).alias(
                "seasonal"
            ),
            F.when(
                F.col("trend").isNotNull(),
                F.round(
                    F.col("y") - F.col("trend") - F.round("seasonal", 6), 6
                ),
            ).alias("residual"),
        )
    )


def holt_weights(n: int) -> tuple[list[int], list[int], int]:
    """Exact dyadic Holt (double-exponential) smoothing weights for
    alpha = beta = 1/2 and n observations, init (l_1, b_1) = (y_1, 0).

    The recurrence  l_t = (y_t + l_{t-1} + b_{t-1}) / 2,
                    b_t = (l_t - l_{t-1}) / 2 + b_{t-1} / 2
    is linear in the observations, so the final state is a dot
    product: (l_n, b_n) = sum_t (wl_t, wb_t) * y_t, with every weight
    a dyadic rational. This function runs the 2x2 companion recursion
    in exact Fractions and returns the weights as INTEGERS at a common
    power-of-two denominator 2^K — the ndcg precomputed-literal
    recipe applied to a recurrence: the runtime plan is one exact
    integer dot product, zero iterations.

    Returns (wl, wb, K) with wl/wb lists of n ints (index t-1) and
    denominator 2**K.
    """
    from fractions import Fraction as Fr

    if n < 1:
        raise ValueError("need at least one observation")
    # coefficient vectors of (l, b) in terms of y_1..y_n
    wl = [Fr(0)] * n
    wb = [Fr(0)] * n
    wl[0] = Fr(1)
    for t in range(1, n):
        nl = [Fr(0)] * n
        nb = [Fr(0)] * n
        for i in range(t):
            # l_t = y_t/2 + (l + b)/2 ; b_t = (l_t - l)/2 + b/2
            nl[i] = (wl[i] + wb[i]) / 2
            nb[i] = (nl[i] - wl[i]) / 2 + wb[i] / 2
        nl[t] = Fr(1, 2)
        nb[t] = Fr(1, 4)
        wl, wb = nl, nb
    denom = 1
    for f in wl + wb:
        denom = max(denom, f.denominator)
    k = denom.bit_length() - 1
    assert (1 << k) == denom, "denominators must be powers of two"
    scale = 1 << k
    return (
        [int(f * scale) for f in wl],
        [int(f * scale) for f in wb],
        k,
    )


def holt_linear_forecast(
    events: DataFrame,
    horizons: tuple[int, ...] = (1, 2, 3, 7),
    conv_type: str = "purchase",
    ts: str = "ts",
    value: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Holt linear-trend (double exponential smoothing) forecast of
    daily revenue at alpha = beta = 1/2, h-step-ahead as
    l_n + h * b_n — trend-aware smoothing beside ewma_hourly's
    level-only filter.

    The iterative recurrence never runs at query time: its exact
    dyadic weights (holt_weights) are embedded as integer array
    LITERALS over the gap-filled day spine, so the whole fit is ONE
    map-side-combining dot product in DECIMAL(38,0) (integer cents x
    integer weights — exact in any order; headroom to ~1e13 daily
    cents at the 30-day window), then each forecast is one shared-text
    double expression. The only driver action is the 1-row day-bounds
    aggregate (a bounded-scalar collect, the nlist-centroid
    convention) needed because the weight literals depend on the
    window length.

    Output: (h, forecast_cents) per horizon, rounded to 6; days with
    no conversions contribute y = 0 through the dense spine.
    """
    daily = (
        events.filter(F.col(type_col) == conv_type)
        .select(
            F.expr(
                f"unix_micros(cast({ts} as timestamp)) div 86400000000"
            ).alias("day"),
            F.expr(f"cast(round({value} * 100, 0) as bigint)").alias("vc"),
        )
        .groupBy("day")
        .agg(F.sum("vc").alias("y"))
    )
    lo, hi = daily.agg(F.min("day"), F.max("day")).collect()[0]
    n = int(hi - lo) + 1
    wl, wb, k = holt_weights(n)
    spark = events.sparkSession
    spine = spark.range(n).select(
        (F.col("id") + F.lit(int(lo))).alias("day"),
        (F.col("id") + 1).alias("t"),
    )
    dense = spine.join(daily, "day", "left").select(
        "t", F.coalesce(F.col("y"), F.lit(0).cast("long")).alias("y")
    )
    wl_lit = "array(" + ",".join(f"{w}" for w in wl) + ")"
    wb_lit = "array(" + ",".join(f"{w}" for w in wb) + ")"
    state = dense.agg(
        F.sum(
            F.expr(
                f"cast(element_at({wl_lit}, cast(t as int)) as decimal(38,0))"
                " * y"
            )
        ).alias("l_fp"),
        F.sum(
            F.expr(
                f"cast(element_at({wb_lit}, cast(t as int)) as decimal(38,0))"
                " * y"
            )
        ).alias("b_fp"),
    )
    hs = ",".join(str(int(h)) for h in horizons)
    return (
        state.select(
            F.explode(F.expr(f"array({hs})")).alias("h"), "l_fp", "b_fp"
        )
        .select(
            "h",
            F.expr(
                f"round((cast(l_fp as double) + h * cast(b_fp as double))"
                f" / {1 << k}e0, 6)"
            ).alias("forecast_cents"),
        )
    )


def seasonal_adjusted_anomalies(
    events: DataFrame,
    ts: str = "ts",
    period: int = 24,
    k_mads: int = 5,
) -> DataFrame:
    """Seasonality-aware anomaly flags — the alerting step the
    decomposition exists for: score each hour's RESIDUAL (volume minus
    trend minus daily profile) against a robust MAD band, so neither
    the daily rhythm nor the long-run trend can page anyone, and a
    single genuine spike cannot widen its own detection band the way
    it would a stddev rule.

    med and mad come from exact percentile() over the residual lattice
    (the length_quantiles convention — DuckDB quantile_cont twin);
    the flag compares |residual - med| > k * greatest(mad, 1) on
    already-rounded values, identical in both engines — the one-COUNT
    floor keeps a near-perfect series (mad ~ 0, where the centered MA
    smears a spike into its neighbors' residuals) from flagging that
    smear as k "zero-width MADs". Edge hours (NULL residual under the
    centered MA) are reported with NULL flag rather than silently
    dropped — an alerting gap the caller must know about.

    Output: (h, y, residual, med, mad, is_anomaly).
    """
    dec = seasonal_decompose(events, ts=ts, period=period)
    stats = dec.filter(F.col("residual").isNotNull()).agg(
        F.expr("percentile(residual, 0.5e0)").alias("med0")
    )
    with_med = dec.crossJoin(F.broadcast(stats)).withColumn(
        "med", F.round(F.col("med0"), 6)
    )
    mad_row = (
        with_med.filter(F.col("residual").isNotNull())
        .agg(
            F.expr(
                "round(percentile(abs(residual - med), 0.5e0), 6)"
            ).alias("mad")
        )
    )
    return (
        with_med.crossJoin(F.broadcast(mad_row))
        .select(
            "h",
            "y",
            "residual",
            "med",
            "mad",
            F.when(F.col("residual").isNull(), F.lit(None).cast("boolean"))
            .otherwise(
                F.abs(F.col("residual") - F.col("med"))
                > F.lit(int(k_mads)) * F.greatest(F.col("mad"), F.lit(1e0))
            )
            .alias("is_anomaly"),
        )
    )


def page_hinkley(
    events: DataFrame, ts: str = "ts", lambda_counts: int = 50
) -> DataFrame:
    """Page-Hinkley drift monitor over the gap-filled hourly count
    series — the sequential mean-shift detector (Page 1954, Hinkley
    1971; the streaming-ML drift test in river/MOA) beside the
    retrospective cusum_changepoint: it accumulates deviation from the
    series mean and alarms when the current cumulative exceeds its
    running minimum by more than lambda.

    Exact integer algebra (the cusum recipe): with S = sum x over N
    hours, the mean-centered cumulative scaled by N is

        m2_t = N * cum_t - t * S            (exact BIGINT)
        PH_t = (m2_t - min_{i<=t} m2_i) / N

    so the alarm predicate PH_t > lambda is the INTEGER comparison
    m2_t - min m2 > lambda * N — no float enters the decision. The
    cumulative and running-min windows run over the hour grid
    (dimension-sized; cusum precedent), the corpus is touched once by
    the hourly groupBy.

    Output: one row per hour (hour, n_events, mdev, ph, alarm) —
    hour on the integer epoch-hour lattice (the acf_hourly
    convention), mdev/ph as 6-dp doubles in count units.
    """
    grid = _hour_grid(events, ts)
    tot = grid.agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    w = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        grid.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum("x").over(w))
        .withColumn("t", F.row_number().over(Window.orderBy("hour")))
        .withColumn("m2", F.col("n") * F.col("cum") - F.col("t") * F.col("s"))
        .withColumn("m2min", F.min("m2").over(w))
    )
    return cum.select(
        "hour",
        F.col("x").alias("n_events"),
        F.expr("round(m2 * 1e0 / n, 6)").alias("mdev"),
        F.expr("round((m2 - m2min) * 1e0 / n, 6)").alias("ph"),
        (
            (F.col("m2") - F.col("m2min"))
            > F.lit(int(lambda_counts)) * F.col("n")
        ).alias("alarm"),
    )


def mann_kendall(events: DataFrame, ts: str = "ts") -> DataFrame:
    """Mann-Kendall trend test (Mann 1945, Kendall 1975) on the
    gap-filled hourly count series — the SIGNIFICANCE companion to
    theil_sen_slopes (which reports the robust slope magnitude; MK
    says whether a monotone trend exists at all), and the standard
    pre-test before acting on event_trend_slopes' OLS fit:

        S = sum_{i<j} sign(x_j - x_i)

    over time-ordered pairs, with the tie-corrected variance
    Var = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18 and the
    continuity-corrected normal score Z = (S -/+ 1)/sqrt(Var).

    Exactness: S is a pure INTEGER pair sum; the variance NUMERATOR is
    an exact BIGINT (tie multiplicities from the distinct-value
    table); Z is one shared-text double (an IEEE sqrt + one division).
    The pair join runs over the gap-filled hour GRID — dimension-sized
    (n_hours^2/2 pairs, the theil_sen precedent), never over corpus
    rows; the corpus is touched once by the hourly groupBy. Zeros from
    silent hours are real observations (they tie with each other — the
    tie correction absorbs them).

    Output: one row — (n_hours, s_stat, var_s, z); z is NULL when
    every hour ties (Var = 0).
    """
    grid = _hour_grid(events, ts).localCheckpoint(eager=True)
    a = grid.select(F.col("hour").alias("ha"), F.col("x").alias("xa"))
    b = grid.select(F.col("hour").alias("hb"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("hb") > F.col("ha"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    n_t = grid.agg(F.count("*").alias("n"))
    tie = (
        grid.groupBy("x")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    return (
        s.crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(tie))
        .select(
            F.col("n").alias("n_hours"),
            "s_stat",
            F.expr(
                "round((n * (n - 1e0) * (2 * n + 5)"
                " - tie_term) / 18e0, 6)"
            ).alias("var_s"),
            F.expr(
                "case when (n * (n - 1e0) * (2 * n + 5) - tie_term)"
                " = 0 then null"
                " when s_stat > 0 then round((s_stat - 1e0)"
                " / sqrt((n * (n - 1e0) * (2 * n + 5) - tie_term)"
                " / 18e0), 6)"
                " when s_stat < 0 then round((s_stat + 1e0)"
                " / sqrt((n * (n - 1e0) * (2 * n + 5) - tie_term)"
                " / 18e0), 6)"
                " else 0e0 end"
            ).alias("z"),
        )
    )


def _lateness_table(
    events: DataFrame,
    arrival: str,
    ts: str,
    bucket_us: int,
) -> DataFrame:
    """Per-event lateness (seconds) against the bucket-grain arrival
    frontier: the max event-time seen in STRICTLY earlier arrival
    buckets. Shapes are all bounded: one partial-agg groupBy(bucket),
    one cumulative window over the bucket DIMENSION (hours, never
    rows), one broadcast join back to events — the scalable stand-in
    for a per-event running max, which would need a global sort."""
    e = events.select(
        F.expr(f"unix_micros(cast({ts} as timestamp))").alias("us"),
        F.col(arrival).cast("long").alias("arr"),
    ).withColumn("hr", F.expr(f"arr div {int(bucket_us)}"))
    h = e.groupBy("hr").agg(F.max("us").alias("mx"))
    wf = Window.orderBy("hr").rowsBetween(
        Window.unboundedPreceding, -1
    )
    f = h.select("hr", F.max("mx").over(wf).alias("frontier"))
    return e.join(F.broadcast(f), "hr").select(
        F.expr(
            "case when frontier is not null and frontier > us"
            " then (frontier - us) div 1000000 else 0 end"
        ).alias("late_s")
    )


def event_lateness_profile(
    events: DataFrame,
    arrival: str = "arrival_us",
    ts: str = "ts",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Watermark-design diagnostic: the distribution of event-time
    lateness relative to the arrival stream — the number that sizes
    `withWatermark`'s delay. An event is late by (frontier - ts) when
    events from strictly earlier arrival hours already carried a
    larger event time; the p99 of that distribution is the classic
    "watermark delay that keeps 99% of events" choice, and max_late_s
    is the delay for losslessness.

    Exactness: lateness is integer seconds from exact epoch-us
    arithmetic; quantiles are ORDER STATISTICS over the distinct-
    lateness cumulative (the response_latency convention — never an
    interpolation), so every output is an exact integer or one
    rounded division.

    Output: one row — (n_events, n_late, late_frac, p50_s, p90_s,
    p99_s, max_late_s).
    """
    late = _lateness_table(events, arrival, ts, bucket_us)
    vals = late.groupBy("late_s").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("late_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        vals.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall))
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.sum(F.when(F.col("late_s") > 0, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.min(
                F.when(2 * F.col("cum") >= F.col("n"), F.col("late_s"))
            ).alias("p50_s"),
            F.min(
                F.when(
                    10 * F.col("cum") >= 9 * F.col("n"), F.col("late_s")
                )
            ).alias("p90_s"),
            F.min(
                F.when(
                    100 * F.col("cum") >= 99 * F.col("n"),
                    F.col("late_s"),
                )
            ).alias("p99_s"),
            F.max("late_s").alias("max_late_s"),
        )
        .select(
            "n_events",
            "n_late",
            F.expr("round(n_late * 1e0 / n_events, 6)").alias(
                "late_frac"
            ),
            "p50_s",
            "p90_s",
            "p99_s",
            "max_late_s",
        )
    )


def watermark_drop_rates(
    events: DataFrame,
    delays_s=(0, 60, 600, 3600),
    arrival: str = "arrival_us",
    ts: str = "ts",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """The other side of the watermark trade: for each candidate
    `withWatermark` delay, exactly how many events would arrive too
    late and be dropped. Pure counts over the shared lateness table —
    one aggregate pass computing every candidate simultaneously, then
    a stack to rows.

    Output: (delay_s, n_dropped, drop_rate) — one row per candidate.
    """
    late = _lateness_table(events, arrival, ts, bucket_us)
    aggs = [F.count("*").cast("long").alias("n")]
    for i, d in enumerate(delays_s):
        aggs.append(
            F.sum(F.when(F.col("late_s") > int(d), 1).otherwise(0))
            .cast("long")
            .alias(f"d{i}")
        )
    wide = late.agg(*aggs)
    pairs = ", ".join(
        f"{int(d)}, d{i}" for i, d in enumerate(delays_s)
    )
    return wide.selectExpr(
        f"stack({len(delays_s)}, {pairs}) as (delay_s, n_dropped)", "n"
    ).select(
        "delay_s",
        "n_dropped",
        F.expr("round(n_dropped * 1e0 / n, 6)").alias("drop_rate"),
    )
