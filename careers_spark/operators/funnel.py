"""Product-analytics operators over event streams: ordered funnels and
cohort retention.

The reference's report layer derives per-user activity summaries from
event timestamps (the per-day/per-week rollups its serving pages show);
these are the two standard distributed generalizations every event
warehouse ships (Amplitude/Mixpanel-style funnels, cohort grids).

Both are pure conditional aggregations — no window over the full event
stream, no per-user sort, no explode:

- ``funnel_user_stages``: stage s's per-user timestamp is the MIN event
  time of stage s STRICTLY AFTER the user's stage s-1 timestamp — one
  (join + conditional min-agg) pass per stage, S small and fixed. Each
  pass shuffles on the user key only; the frontier frames are
  one-row-per-user (bounded by distinct users, far smaller than
  events).

- ``cohort_retention``: cohort = integer week of the user's first
  event; the (cohort, offset) grid is one distinct + two algebraic
  groupBys. Weeks are exact integer ``div`` buckets of epoch-us.

Engine-exactness: every value is an integer (epoch-us mins, counts,
week indices) or a final single round() of an integer ratio, so the
DuckDB oracles hash-match with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.temporal import _us

WEEK_US = 7 * 86_400_000_000


def funnel_user_stages(
    events: DataFrame,
    stages: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel timestamps: ``t1`` is the user's earliest
    stage-1 event; ``t{s}`` the earliest stage-s event STRICTLY after
    ``t{s-1}`` (simultaneous cross-stage events do not chain — the
    conservative ordering). A user appears iff they reached stage 1;
    unreached later stages are NULL.

    Output: (<key>, t1, t2, ..., t{S}) — epoch-us BIGINTs.
    """
    ev = events.select(
        F.col(key).alias("_k"), F.col(type_col).alias("_et"), _us(ts).alias("_t")
    )
    cur = (
        ev.filter(F.col("_et") == stages[0])
        .groupBy("_k")
        .agg(F.min("_t").alias("t1"))
    )
    for i, st in enumerate(stages[1:], start=2):
        nxt = (
            ev.filter(F.col("_et") == st)
            .join(cur.select("_k", F.col(f"t{i-1}").alias("_prev")), "_k")
            .filter(F.col("_t") > F.col("_prev"))
            .groupBy("_k")
            .agg(F.min("_t").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "_k", "left")
    return cur.withColumnRenamed("_k", key)


def funnel_summary(
    events: DataFrame,
    stages: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-stage funnel report: users reaching each stage in order,
    conversion from the previous stage, and the total lag from stage 1
    (integer microseconds — exact in any addition order).

    Output: (stage_idx, stage, n_users, conv_from_prev, total_lag_us).
    """
    per_user = funnel_user_stages(events, stages, key, ts, type_col)
    aggs = []
    for i in range(1, len(stages) + 1):
        aggs.append(F.count(f"t{i}").alias(f"n{i}"))
        aggs.append(
            F.sum(
                F.when(F.col(f"t{i}").isNotNull(), F.col(f"t{i}") - F.col("t1"))
            ).alias(f"lag{i}")
        )
    wide = per_user.agg(*aggs)
    rows = []
    for i, st in enumerate(stages, start=1):
        # conversion out of an empty stage is undefined, not 0/0: NULL
        # (ANSI division would raise; DuckDB doubles would emit inf/nan)
        conv = (
            F.lit(1.0)
            if i == 1
            else F.expr(
                f"case when n{i-1} = 0 then null "
                f"else round(n{i} / cast(n{i-1} as double), 6) end"
            )
        )
        rows.append(
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(st).alias("stage"),
                F.col(f"n{i}").alias("n_users"),
                conv.alias("conv_from_prev"),
                F.coalesce(F.col(f"lag{i}"), F.lit(0)).alias("total_lag_us"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention grid: users are cohorted by the integer
    epoch-week of their FIRST event; for every later week they were
    active, the (cohort, offset) cell counts them.

    Output: (cohort_week, offset_weeks, n_active) — offset 0 is the
    cohort's own week, so its n_active is the cohort size.
    """
    wk = events.select(
        F.col(key).alias("_k"), F.expr(f"unix_micros(cast({ts} as timestamp)) div {WEEK_US}").alias("_w")
    ).distinct()
    first = wk.groupBy("_k").agg(F.min("_w").alias("cohort_week"))
    return (
        wk.join(first, "_k")
        .groupBy("cohort_week", (F.col("_w") - F.col("cohort_week")).alias("offset_weeks"))
        .agg(F.count("*").alias("n_active"))
    )


def event_transitions(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next = b | current = a) — the user-journey summary that
    complements the ordered funnel (funnel counts one prescribed path;
    this measures every observed hop).

    Each user's events order by (ts, tiebreak) — the tiebreak makes
    same-timestamp ordering deterministic — and every consecutive pair
    (a -> b) counts once. One key shuffle + partition-local sort for
    the lead(), then an algebraic pair count; per-source totals join
    back broadcast-sized (the event vocabulary). Integer counts, one
    division, rounded to 6.

    Output: (from_event, to_event, n, p) — p sums to 1 per from_event.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(
        F.col("t").cast("timestamp"), F.col("tb")
    )
    hops = (
        events.select(
            F.col(key).alias("k"),
            F.col(ts).alias("t"),
            F.col(event).alias("from_event"),
            F.col(tiebreak).alias("tb"),
        )
        .withColumn("to_event", F.lead("from_event").over(w))
        .filter(F.col("to_event").isNotNull())
    )
    counts = hops.groupBy("from_event", "to_event").agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("from_event").agg(F.sum("n").alias("n_from"))
    return counts.join(F.broadcast(totals), "from_event").select(
        "from_event",
        "to_event",
        "n",
        F.expr("round(n / cast(n_from as double), 6)").alias("p"),
    )


def conversion_latency(
    events: DataFrame,
    stages: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Latency distribution between consecutive funnel stages: for every
    user who chained stage s-1 -> s (funnel_user_stages semantics), the
    s-1 -> s delay in whole seconds, summarized as exact quantiles — the
    "how long does conversion take" report that pairs with the funnel's
    "how many convert".

    Delays are INTEGER seconds (epoch-us difference div 1e6); the
    quantile is Spark `percentile` (linear interpolation == DuckDB
    quantile_cont, the pinned length_quantiles convention). Per-hop
    converter counts ride along so the quantiles are interpretable.

    Output: (hop, n_users, q, latency_s) — one row per (stage hop,
    quantile); hop = '<from>-><to>'.
    """
    if len(stages) < 2:
        raise ValueError("conversion_latency needs >= 2 funnel stages")
    st = funnel_user_stages(events, stages, key, ts, type_col)
    arr = "array(" + ", ".join(f"{q}d" for q in qs) + ")"
    hops = []
    for i in range(2, len(stages) + 1):
        d = st.filter(F.col(f"t{i}").isNotNull()).select(
            F.expr(f"(t{i} - t{i-1}) div 1000000").alias("lat_s")
        )
        pos = ", ".join(
            f"struct({q}d as q, round(vals[{j}], 6) as latency_s)"
            for j, q in enumerate(qs)
        )
        agg = (
            d.agg(
                F.count("*").alias("n_users"),
                F.expr(f"percentile(lat_s, {arr})").alias("vals"),
            )
            .select(
                F.lit(f"{stages[i-2]}->{stages[i-1]}").alias("hop"),
                "n_users",
                F.explode(F.expr(f"array({pos})")).alias("s"),
            )
            .select("hop", "n_users", F.col("s.q"), F.col("s.latency_s"))
        )
        hops.append(agg)
    out = hops[0]
    for h in hops[1:]:
        out = out.unionByName(h)
    return out


def top_journeys(
    events: DataFrame,
    k: int = 20,
    key: str = "user_id",
    ts: str = "ts",
    event: str = "event_type",
    tiebreak: str = "event_id",
    max_steps: int = 20,
) -> DataFrame:
    """Top-k most-common user journeys: each user's event types in
    (ts, tiebreak) order concatenated into a path string ('a>b>c'),
    truncated to the first `max_steps` hops (unbounded paths make the
    journey table as big as the user table is long-tailed — every
    journey study truncates), counted, and ranked.

    Physical shape: one groupBy(key) with sort_array(collect_list(
    struct(...))) — per-user state bounded by that user's event count
    (truncate upstream for pathological keys); then an algebraic path
    count and a TakeOrdered top-k (no full sort). Deterministic: the
    struct sort carries the unique tiebreak.

    Output: (journey, n_users, rank) — rank by (n_users desc, journey).
    """
    from pyspark.sql import Window

    paths = (
        events.select(
            F.col(key).alias("k"),
            F.struct(
                F.col(ts).cast("timestamp").alias("t"),
                F.col(tiebreak).alias("tb"),
                F.col(event).alias("et"),
            ).alias("s"),
        )
        .groupBy("k")
        .agg(
            F.expr(
                f"concat_ws('>', slice(transform(sort_array(collect_list(s)),"
                f" x -> x.et), 1, {int(max_steps)}))"
            ).alias("journey")
        )
    )
    counts = paths.groupBy("journey").agg(F.count("*").alias("n_users"))
    top = counts.orderBy(F.desc("n_users"), F.col("journey")).limit(int(k))
    w = Window.orderBy(F.desc("n_users"), F.col("journey"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "journey", "n_users", "rank"
    )


def multi_touch_attribution(
    events: DataFrame,
    window_us: int = 86_400_000_000,
    touch_type: str = "click",
    conv_type: str = "purchase",
) -> DataFrame:
    """Multi-touch attribution: distribute each conversion's value over
    the same user's touch events in the trailing half-open window
    ``[conv_ts - window_us, conv_ts)`` under the three standard models
    at once — first-touch, last-touch, and linear.

    First/last are (ts, event_id) total orders computed as algebraic
    min/max(struct) aggregates (ties: the earlier model takes the
    smaller event_id, the later the larger). Linear credit is ONE
    double division of integer cents by the touch count, rounded to 6.
    Conversions with zero in-window touches have nothing to attribute
    and are absent (the unattributed remainder is the complement of
    this output against the conversions table).

    Physical shape: the candidate pairs come from the same band-bucket
    equi-join as `temporal.windowed_count_join` (bucket width == window
    width, probes exploded to two buckets, DISTINCT (user, ts) probes)
    — never an inequality join; credit assignment is one groupBy over
    conversions plus a broadcastable per-conversion stats join back
    onto the pairs.

    Output: (conv_id, touch_id, credit_first_cents, credit_last_cents,
    credit_linear).
    """
    w = int(window_us)
    conv = events.filter(F.col("event_type") == conv_type).select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        _us("ts").alias("_cts"),
        F.expr("cast(round(value * 100, 0) as bigint)").alias("_vc"),
    )
    touch = (
        events.filter(F.col("event_type") == touch_type)
        .select(
            F.col("event_id").alias("touch_id"),
            F.col("user_id").alias("_tu"),
            _us("ts").alias("_tts"),
        )
        .withColumn("_bkt", F.expr(f"_tts div {w}"))
    )
    probes = (
        conv.select("user_id", "_cts")
        .distinct()
        .select(
            "user_id",
            "_cts",
            F.explode(
                F.array(
                    F.expr(f"_cts div {w} - 1"), F.expr(f"_cts div {w}")
                )
            ).alias("_bkt"),
        )
    )
    pairs = (
        probes.join(
            touch,
            (probes.user_id == touch._tu) & (probes._bkt == touch._bkt),
        )
        .filter(
            (F.col("_tts") >= F.col("_cts") - F.lit(w))
            & (F.col("_tts") < F.col("_cts"))
        )
        .select("user_id", "_cts", "touch_id", "_tts")
    )
    cp = conv.join(pairs, ["user_id", "_cts"]).select(
        "conv_id", "_vc", "touch_id", "_tts"
    )
    stats = cp.groupBy("conv_id").agg(
        F.count("*").alias("_n"),
        F.min(F.struct(F.col("_tts"), F.col("touch_id"))).alias("_first"),
        F.max(F.struct(F.col("_tts"), F.col("touch_id"))).alias("_last"),
    )
    is_first = (F.col("_tts") == F.col("_first._tts")) & (
        F.col("touch_id") == F.col("_first.touch_id")
    )
    is_last = (F.col("_tts") == F.col("_last._tts")) & (
        F.col("touch_id") == F.col("_last.touch_id")
    )
    return (
        cp.join(stats, "conv_id")
        .select(
            "conv_id",
            "touch_id",
            F.when(is_first, F.col("_vc"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("credit_first_cents"),
            F.when(is_last, F.col("_vc"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("credit_last_cents"),
            F.round(F.col("_vc") / F.col("_n"), 6).alias("credit_linear"),
        )
    )


def rfm_segments(events: DataFrame, conv_type: str = "purchase") -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    the conversion events — the classic warehouse marketing rollup.

    Each per-user metric is scored 1-4 against the corpus quartiles of
    that metric (VALUE-based cuts, not rank-based ntile): score 4 is
    the best quartile — most recent, most frequent, highest spend. The
    reference timestamp is the corpus max event time (deterministic —
    no wall clock), recency in whole integer days via `div`.

    Boundary semantics (documented, engine-identical): for recency
    (low is good) score = 1 + [v <= q25] + [v <= q50] + [v <= q75];
    for frequency/monetary (high is good) score = 1 + [v >= q75] +
    [v >= q50] + [v >= q25]; quartiles are interpolated percentiles
    rounded to 6dp before the comparisons. ``segment`` packs the three
    digits as r*100 + f*10 + m.

    Physical shape at scale: one partial-agg groupBy(user) over the
    conversions, one 1-row global aggregate for the reference ts and
    one for the quartiles (both broadcast via crossJoin) — NO global
    window or sort anywhere, unlike rank-based ntile scoring; ties
    share a bucket deterministically.

    Output: (user_id, recency_days, frequency, monetary_cents,
    r_score, f_score, m_score, segment).
    """
    conv = events.filter(F.col("event_type") == conv_type).select(
        "user_id",
        _us("ts").alias("_ts"),
        F.expr("cast(round(value * 100, 0) as bigint)").alias("_vc"),
    )
    ref = conv.agg(F.max("_ts").alias("_ref"))
    pu = (
        conv.groupBy("user_id")
        .agg(
            F.max("_ts").alias("_last"),
            F.count("*").alias("frequency"),
            F.sum("_vc").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.expr("(_ref - _last) div 86400000000").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    qs = pu.agg(
        *[
            F.round(F.expr(f"percentile({c}, {p}e0)"), 6).alias(
                f"_{c[0]}q{int(p * 100)}"
            )
            for c in ("recency_days", "frequency", "monetary_cents")
            for p in (0.25, 0.5, 0.75)
        ]
    )
    scored = pu.crossJoin(F.broadcast(qs))
    low_good = (
        "cast(1 + if(recency_days <= _rq25, 1, 0)"
        " + if(recency_days <= _rq50, 1, 0)"
        " + if(recency_days <= _rq75, 1, 0) as int)"
    )
    f_hi = (
        "cast(1 + if(frequency >= _fq75, 1, 0)"
        " + if(frequency >= _fq50, 1, 0)"
        " + if(frequency >= _fq25, 1, 0) as int)"
    )
    m_hi = (
        "cast(1 + if(monetary_cents >= _mq75, 1, 0)"
        " + if(monetary_cents >= _mq50, 1, 0)"
        " + if(monetary_cents >= _mq25, 1, 0) as int)"
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.expr(low_good).alias("r_score"),
        F.expr(f_hi).alias("f_score"),
        F.expr(m_hi).alias("m_score"),
    ).withColumn(
        "segment",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int"),
    )


def ab_conversion_test(
    events: DataFrame,
    conv_type: str = "purchase",
    key: str = "user_id",
    type_col: str = "event_type",
    salt: str = "ab",
) -> DataFrame:
    """Two-proportion z-test for an A/B experiment over the event
    stream — the ship/no-ship statistic of every growth experiment:
    did variant B's user-level conversion rate beat variant A's beyond
    sampling noise?

    Variant assignment is the repo's deterministic md5-affine draw on
    (user, salt) — reproducible across engines/runs and re-seedable,
    exactly how real experiment frameworks bucket users. Conversion is
    user-level (>= 1 conv_type event), so the unit of analysis matches
    the randomization unit — the classic A/B pitfall (event-level
    rates on user-level assignment) is structurally impossible here.

    All counts are exact integers from two distinct-aggregations; the
    pooled z statistic

        z = (p1 - p0) / sqrt(p * (1-p) * (1/n0 + 1/n1))

    is ONE double expression over those integers (sqrt is
    IEEE-correctly-rounded — the lang_temperature_weights argument),
    rounded to 6. Degenerate pools (p in {0, 1} or an empty arm)
    report NULL z rather than dividing by zero.

    Output: one row (n_0, c_0, n_1, c_1, rate_0, rate_1, lift, z).
    """
    from careers_spark.operators.dedup import _hash64_expr

    keyed = f"concat(cast({key} as string), '|', '{salt}')"
    per_user = (
        events.select(
            F.col(key),
            F.expr(f"{_hash64_expr(keyed)} % 2").alias("variant"),
            F.when(F.col(type_col) == conv_type, 1).otherwise(0).alias("cv"),
        )
        .groupBy(key, "variant")
        .agg(F.max("cv").alias("converted"))
    )
    wide = per_user.agg(
        F.sum(F.expr("case when variant = 0 then 1 else 0 end")).alias("n_0"),
        F.sum(F.expr("case when variant = 0 then converted else 0 end")).alias("c_0"),
        F.sum(F.expr("case when variant = 1 then 1 else 0 end")).alias("n_1"),
        F.sum(F.expr("case when variant = 1 then converted else 0 end")).alias("c_1"),
    )
    z = (
        "case when n_0 = 0 or n_1 = 0 then null else "
        "(case when (c_0 + c_1) = 0 or (c_0 + c_1) = (n_0 + n_1) then null "
        "else round((cast(c_1 as double) / cast(n_1 as double)"
        " - cast(c_0 as double) / cast(n_0 as double))"
        " / sqrt((cast(c_0 + c_1 as double) / cast(n_0 + n_1 as double))"
        " * (1e0 - cast(c_0 + c_1 as double) / cast(n_0 + n_1 as double))"
        " * (1e0 / cast(n_0 as double) + 1e0 / cast(n_1 as double))), 6)"
        " end) end"
    )
    return wide.select(
        "n_0",
        "c_0",
        "n_1",
        "c_1",
        F.expr(
            "case when n_0 = 0 then null else "
            "round(cast(c_0 as double) / cast(n_0 as double), 6) end"
        ).alias("rate_0"),
        F.expr(
            "case when n_1 = 0 then null else "
            "round(cast(c_1 as double) / cast(n_1 as double), 6) end"
        ).alias("rate_1"),
        F.expr(
            "case when n_0 = 0 or n_1 = 0 or c_0 = 0 then null else "
            "round((cast(c_1 as double) / cast(n_1 as double))"
            " / (cast(c_0 as double) / cast(n_0 as double)) - 1e0, 6) end"
        ).alias("lift"),
        F.expr(z).alias("z"),
    )


def sequential_pattern_support(
    events: DataFrame,
    min_support: int = 2,
    key: str = "user_id",
    etype: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """Length-2 sequential-pattern support (the a -> b core of
    AprioriAll / PrefixSpan): for each ordered event-type pair, how
    many actors exhibit "a at some point, b strictly later" — the
    gaps-allowed subsequence relation, NOT adjacency (that is
    event_transitions' Markov view; the two disagree exactly when a
    third event intervenes, which is the point of sequence mining).

    Scale shape: the stream collapses FIRST to one row per (actor,
    type) carrying min/max event time — a partial-agg groupBy that
    shrinks the data by the actor's event count; "a before b" is then
    min_ts(a) < max_ts(b) over a per-actor self-join of that bounded
    frame (fan-out <= distinct-types^2 per actor, independent of
    stream length). Support counts actors once per pattern by
    construction. All integers.

    Ties: a strictly-later b requires max_ts(b) > min_ts(a) as raw
    microseconds — simultaneous events never support a sequence.

    Output: (ante, cons, n_actors, support_frac) for ordered pairs
    with n_actors >= min_support, ante != cons.
    """
    from careers_spark.operators.temporal import _us

    spans = events.groupBy(
        F.col(key).alias("k"), F.col(etype).alias("t")
    ).agg(
        F.min(_us(ts)).alias("first_us"),
        F.max(_us(ts)).alias("last_us"),
    )
    n_actors = events.select(key).distinct().count()
    a = spans.selectExpr("k", "t as ante", "first_us")
    b = spans.selectExpr("k as k2", "t as cons", "last_us")
    return (
        a.join(
            b,
            (a.k == b.k2)
            & (F.col("ante") != F.col("cons"))
            & (F.col("first_us") < F.col("last_us")),
        )
        .groupBy("ante", "cons")
        .agg(F.count("*").alias("n_actors"))
        .filter(F.col("n_actors") >= int(min_support))
        .select(
            "ante",
            "cons",
            "n_actors",
            F.expr(
                f"round(n_actors / cast({n_actors} as double), 6)"
            ).alias("support_frac"),
        )
    )


def markov_attribution(
    events: DataFrame,
    channels: list[str],
    conv_type: str = "purchase",
    iterations: int = 6,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2014) —
    the principled alternative to last-touch/linear heuristics
    (multi_touch_attribution): model journeys as a first-order chain
    over channels with CONV/NULL absorbing states, compute the
    conversion probability from START by value iteration, and credit
    each channel by its REMOVAL EFFECT — how much conversion
    probability disappears when that channel is knocked out (its
    visits redirected to NULL).

    Exactness design: the value function lives on the 1e-10 INTEGER
    lattice — v(CONV) = 1e10, v(NULL) = v(removed) = 0, and each
    update is v'(s) = round((sum_t n_st * v(t)) / n_s) computed as
    the pure-integer half-up (2*num + den) div (2*den): numerators
    are exact BIGINT sums of integer products (any order), so every
    iteration, every scenario, and both engines produce identical
    integers — no float recurrence at all (stronger than the
    pagerank round-per-iteration recipe). A fixed `iterations` unroll
    is sound the usual way: a converged synchronous iteration is a
    fixpoint.

    Scale shape: journey extraction (the corpus-scale work) is one
    per-user window pass — prefix-to-first-conversion filter, lag-free
    lead transitions — plus one integer groupBy; the chain solve runs
    on the collected CHANNELS^2-bounded transition table (the
    Lloyd-centroid / FS-EM dimension-collect pattern).

    Output: one row per channel — (channel, p_base_fp, p_without_fp,
    removal_fp, removal_effect, attribution); removal_effect =
    removal/p_base, attribution = removal/sum(removals), each ONE
    rounded division of integers.
    """
    from pyspark.sql import Window

    from careers_spark.operators.temporal import _us

    spark = events.sparkSession
    w = Window.partitionBy(key).orderBy(_us(ts), tiebreak)
    conv = F.col("event_type") == conv_type
    base = (
        events.select(key, ts, tiebreak, "event_type")
        .withColumn(
            "_prior_convs",
            F.coalesce(
                F.sum(F.when(conv, 1).otherwise(0)).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .filter(F.col("_prior_convs") == 0)
        .withColumn(
            "state",
            F.when(conv, F.lit("CONV")).otherwise(F.col("event_type")),
        )
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("next_state", F.lead("state").over(w))
    )
    trans = (
        base.filter(F.col("state") != "CONV")
        .select(
            F.col("state").alias("s"),
            F.coalesce(F.col("next_state"), F.lit("NULL")).alias("t"),
        )
        .unionByName(
            base.filter(F.col("_rn") == 1).select(
                F.lit("START").alias("s"), F.col("state").alias("t")
            )
        )
        .groupBy("s", "t")
        .agg(F.count("*").alias("n"))
    )
    rows = trans.collect()  # CHANNELS^2-bounded dimension table
    n_out = {}
    n_st = {}
    for r in rows:
        n_out[r.s] = n_out.get(r.s, 0) + r.n
        n_st[(r.s, r.t)] = r.n

    scale = 10_000_000_000
    states = ["START"] + list(channels)

    def solve(removed: str | None) -> int:
        v = {s: 0 for s in states}
        v["CONV"] = scale
        v["NULL"] = 0
        for _ in range(int(iterations)):
            nv = {}
            for s in states:
                if s == removed or n_out.get(s, 0) == 0:
                    nv[s] = 0
                    continue
                num = 0
                for t in sorted(set(list(v) + ["CONV", "NULL"])):
                    c = n_st.get((s, t), 0)
                    if c:
                        vt = 0 if t == removed else v.get(t, 0)
                        num += c * vt
                den = n_out[s]
                nv[s] = (2 * num + den) // (2 * den)
            nv["CONV"] = scale
            nv["NULL"] = 0
            v = nv
        return v["START"]

    p_base = solve(None)
    removals = {c: p_base - solve(c) for c in channels}
    total_removal = sum(removals.values())
    out = []
    for c in channels:
        rm = removals[c]
        out.append(
            (
                c,
                p_base,
                p_base - rm,
                rm,
                round(rm / p_base, 6) if p_base > 0 else None,
                round(rm / total_removal, 6) if total_removal > 0 else None,
            )
        )
    return spark.createDataFrame(
        out,
        "channel string, p_base_fp long, p_without_fp long, "
        "removal_fp long, removal_effect double, attribution double",
    )


def survival_km(
    events: DataFrame,
    censor_days: int = 7,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes with right-censoring
    (Kaplan & Meier 1958) — THE retention statistic: a user's
    lifetime is last-activity minus first-activity in whole days;
    users still active within `censor_days` of the corpus end are
    CENSORED (we cannot know they churned — dropping them would bias
    survival down, counting them as churned would bias it up; KM is
    the estimator that handles exactly this). At each observed
    lifetime t: S(t) = S(t-) * (n_at_risk - n_churned)/n_at_risk,
    with censored users leaving the risk set after their time.

    Exactness: the survival product is a SEQUENTIAL recursion, kept
    exact on the 1e-10 integer lattice with the pure-integer half-up
    step S' = (2*S*(n-d) + n) div (2*n) (the markov_attribution
    arithmetic) — Spark computes it driver-side over the BOUNDED
    distinct-lifetime table (the Lloyd/FS-EM dimension pattern; the
    corpus-scale work — per-user lifetime extraction — is one
    groupBy), and the oracle replays the identical recursion as a
    DuckDB recursive CTE over the same integers.

    Output: one row per distinct lifetime day with an event or
    censoring — (day, n_at_risk, n_churned, n_censored, surv_fp,
    survival).
    """
    from careers_spark.operators.temporal import _us

    spark = events.sparkSession
    spans = events.groupBy(key).agg(
        F.min(_us(ts)).alias("first_us"), F.max(_us(ts)).alias("last_us")
    )
    max_us = events.agg(F.max(_us(ts))).collect()[0][0]
    lim = int(censor_days) * 86_400_000_000
    per_day = (
        spans.select(
            F.expr("(last_us - first_us) div 86400000000").alias("day"),
            (F.lit(max_us) - F.col("last_us") < F.lit(lim)).alias(
                "censored"
            ),
        )
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("censored"), 0).otherwise(1))
            .cast("long")
            .alias("n_churned"),
            F.sum(F.when(F.col("censored"), 1).otherwise(0))
            .cast("long")
            .alias("n_censored"),
        )
    )
    rows = sorted(per_day.collect(), key=lambda r: r.day)  # bounded dim
    total = sum(r.n_churned + r.n_censored for r in rows)
    scale = 10_000_000_000
    s = scale
    at_risk = total
    out = []
    for r in rows:
        n, d = at_risk, r.n_churned
        if d > 0:
            s = (2 * s * (n - d) + n) // (2 * n)
        out.append(
            (
                int(r.day),
                n,
                int(d),
                int(r.n_censored),
                s,
                round(s / scale, 6),
            )
        )
        at_risk -= r.n_churned + r.n_censored
    return spark.createDataFrame(
        out,
        "day long, n_at_risk long, n_churned long, n_censored long, "
        "surv_fp long, survival double",
    )


def logrank_test(
    events: DataFrame,
    censor_days: int = 7,
    salt: str = "lr0",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Log-rank test (Mantel-Cox) between two md5-assigned arms'
    survival curves — KM's inferential companion and the ship/no-ship
    statistic for retention experiments: at every churn time t the
    arm-1 churn count contributes O - E where E = d_t * n_1t / n_t
    under the null that both arms share one hazard, and
    Z = (O - E)/sqrt(V) with the hypergeometric variance
    V_t = d_t * n_1t * (n_t - n_1t) * (n_t - d_t) / (n_t^2 (n_t - 1)).

    Lifetimes/censoring exactly as survival_km; arm assignment is the
    shared deterministic md5 draw (ab_conversion_test's), so the
    analysis unit matches the randomization unit. E and V are sums of
    RATIONAL terms — each term is quantized ONCE by pure-integer
    half-up division onto a fixed-point lattice (1e-9 for E, 1e-8 for
    V — the coarser V lattice keeps the worst-case BIGINT numerator
    under 2^63 at any per-day risk-set size the corpus can produce),
    so both accumulations are exact integer sums and Z is one double
    expression over the descaled integers, rounded to 6.

    Everything is groupBys + one reverse-cumulative window over the
    BOUNDED distinct-lifetime-day table (dimension-sized by
    construction — days, not users).

    Output: one row (n_users_0, n_users_1, observed_1, expected_1_fp,
    variance_fp, z).
    """
    from careers_spark.operators.dedup import _hash64_expr
    from careers_spark.operators.temporal import _us

    keyed = f"concat(cast({key} as string), '|', '{salt}')"
    spans = events.groupBy(key).agg(
        F.min(_us(ts)).alias("first_us"), F.max(_us(ts)).alias("last_us")
    )
    lim = int(censor_days) * 86_400_000_000
    mx = events.agg(F.max(_us(ts)).alias("max_us"))
    per_day = (
        spans.crossJoin(F.broadcast(mx))
        .select(
            F.expr("(last_us - first_us) div 86400000000").alias("day"),
            (F.col("max_us") - F.col("last_us") < F.lit(lim)).alias(
                "cens"
            ),
            F.expr(f"{_hash64_expr(keyed)} % 2").alias("arm"),
        )
        .groupBy("day")
        .agg(
            F.sum(F.when(~F.col("cens"), 1).otherwise(0))
            .cast("long")
            .alias("d_all"),
            F.sum(F.when(~F.col("cens") & (F.col("arm") == 1), 1)
                  .otherwise(0)).cast("long").alias("d_1"),
            F.count("*").cast("long").alias("leave_all"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("leave_1"),
        )
    )
    from pyspark.sql import Window

    # reverse cumulative: at-risk sets at each day (bounded day table)
    wrev = Window.orderBy(F.desc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_day.select(
        "day",
        "d_all",
        "d_1",
        F.sum("leave_all").over(wrev).alias("n_t"),
        F.sum("leave_1").over(wrev).alias("n_1t"),
    )
    terms = risk.select(
        "d_all",
        "d_1",
        "n_t",
        "n_1t",
        F.expr(
            "case when d_all > 0 then "
            "(2 * d_all * n_1t * 1000000000 + n_t) div (2 * n_t) "
            "else 0 end"
        ).alias("e_fp"),
        F.expr(
            "case when d_all > 0 and n_t > 1 then "
            "(2 * d_all * n_1t * (n_t - n_1t) * (n_t - d_all) "
            " * 100000000 + n_t * n_t * (n_t - 1)) "
            "div (2 * n_t * n_t * (n_t - 1)) else 0 end"
        ).alias("v_fp"),
    )
    tot_users = spans.select(
        F.expr(f"{_hash64_expr(keyed)} % 2").alias("arm")
    ).groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_users_0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_users_1"),
    )
    agg = terms.agg(
        F.sum("d_1").cast("long").alias("observed_1"),
        F.sum("e_fp").cast("long").alias("expected_1_fp"),
        F.sum("v_fp").cast("long").alias("variance_fp"),
    )
    return tot_users.crossJoin(agg).select(
        "n_users_0",
        "n_users_1",
        "observed_1",
        "expected_1_fp",
        "variance_fp",
        F.expr(
            "case when variance_fp > 0 then "
            "round((observed_1 - expected_1_fp / 1000000000e0) "
            "/ sqrt(variance_fp / 100000000e0), 6) end"
        ).alias("z"),
    )


def shapley_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    key: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Simplified Shapley-value channel attribution (Zhao et al. 2018,
    the order-free formulation used by Google/Meta attribution
    products) — the cooperative-game complement of the Markov
    removal-effect model: each channel's credit is its average
    marginal contribution to the observed coalitions' conversion
    rates,

        phi(i) = sum_{S observed, i in S} (v(S) - v(S \\ {i})) / |S|

    where v(S) is the empirical conversion rate of users whose touched
    channel set is EXACTLY S, and v of an unobserved subset is 0 (the
    standard simplified convention; full Shapley would need a model
    over all 2^k subsets).

    Scale shape: users collapse to their channel set in one groupBy;
    everything after runs on the SETS table, whose cardinality is
    bounded by 2^|channels| regardless of user count — the explode,
    the reduced-set lookup join, and the per-channel sum are all
    bounded-dimension work. v(S) is rounded to the 1e-9 lattice and
    lifted to BIGINT; each marginal term is one shared-text division
    re-rounded to the lattice, so the cross-set sum is exact and
    phi one closing division.

    Output: (channel, n_sets, phi) — n_sets = observed coalitions the
    channel appears in.
    """
    per_user = events.groupBy(key).agg(
        F.array_sort(
            F.collect_set(
                F.when(F.col(type_col) != conv_type, F.col(type_col))
            )
        ).alias("channels"),
        F.max(
            F.when(F.col(type_col) == conv_type, 1).otherwise(0)
        ).alias("conv"),
    ).filter(F.size("channels") > 0)
    sets = (
        per_user.groupBy(
            F.array_join(F.col("channels"), "|").alias("sk"),
            F.col("channels"),
        )
        .agg(F.count("*").alias("n_s"), F.sum("conv").alias("c_s"))
        .select(
            "sk",
            "channels",
            F.expr(
                "cast(round(round(c_s * 1e0 / n_s, 9) * 1000000000, 0)"
                " as bigint)"
            ).alias("v_fp"),
        )
    )
    slim = sets.select(F.col("sk").alias("rk"), F.col("v_fp").alias("vr_fp"))
    exploded = sets.select(
        F.explode("channels").alias("channel"), "v_fp", "channels"
    ).select(
        "channel",
        "v_fp",
        F.size("channels").alias("sz"),
        F.array_join(
            F.filter("channels", lambda c: c != F.col("channel")), "|"
        ).alias("rk"),
    )
    joined = exploded.join(F.broadcast(slim), "rk", "left").withColumn(
        "vr_fp", F.coalesce(F.col("vr_fp"), F.lit(0).cast("long"))
    )
    terms = joined.select(
        "channel",
        F.expr(
            "cast(round(round((v_fp - vr_fp) / (sz * 1000000000e0), 9)"
            " * 1000000000, 0) as bigint)"
        ).alias("t_fp"),
    )
    return terms.groupBy("channel").agg(
        F.count("*").alias("n_sets"),
        F.expr("round(sum(t_fp) / 1000000000e0, 6)").alias("phi"),
    )


# Two-sided alpha = 0.05 and power = 0.80 normal quantiles, written as
# exact decimal literals (both engines' parsers are correctly-rounded,
# so each parses to the identical double).
Z_ALPHA_05 = "1.959963984540054"
Z_BETA_80 = "0.8416212335729143"


def ab_power_mde(
    events: DataFrame,
    conv_type: str = "purchase",
    key: str = "user_id",
    type_col: str = "event_type",
    salt: str = "ab",
    z_alpha: str = Z_ALPHA_05,
    z_beta: str = Z_BETA_80,
) -> DataFrame:
    """Minimum detectable effect of the running A/B design — the
    experiment-DESIGN statistic completing the lifecycle around
    ab_conversion's readout: at the current arm sizes and pooled
    conversion rate, the smallest absolute (and relative) lift the
    two-proportion z-test can detect at alpha = .05 two-sided with 80%
    power,

        MDE = (z_a + z_b) * sqrt(p * (1-p) * (1/n_0 + 1/n_1)).

    Arm assignment and user-level conversion are ab_conversion's exact
    aggregates (same salt -> same arms); the MDE is one shared-text
    double expression (sqrt is IEEE-correctly-rounded) over those
    integers, rounded to 6. NULL when an arm is empty or the pooled
    rate is degenerate (0 or 1 — no binomial variance to power
    against).

    Output: one row (n_0, n_1, c_0, c_1, rate_pooled, mde_abs,
    mde_rel).
    """
    from careers_spark.operators.dedup import _hash64_expr

    keyed = f"concat(cast({key} as string), '|', '{salt}')"
    per_user = (
        events.select(
            F.col(key),
            F.expr(f"{_hash64_expr(keyed)} % 2").alias("variant"),
            F.when(F.col(type_col) == conv_type, 1).otherwise(0).alias("cv"),
        )
        .groupBy(key, "variant")
        .agg(F.max("cv").alias("converted"))
    )
    wide = per_user.agg(
        F.sum(F.expr("case when variant = 0 then 1 else 0 end")).alias("n_0"),
        F.sum(F.expr("case when variant = 0 then converted else 0 end")).alias("c_0"),
        F.sum(F.expr("case when variant = 1 then 1 else 0 end")).alias("n_1"),
        F.sum(F.expr("case when variant = 1 then converted else 0 end")).alias("c_1"),
    )
    pooled = "(c_0 + c_1) * 1e0 / (n_0 + n_1)"
    mde = (
        f"round(({z_alpha} + {z_beta})"
        f" * sqrt(({pooled}) * (1e0 - ({pooled}))"
        f" * (1e0 / n_0 + 1e0 / n_1)), 6)"
    )
    degenerate = (
        "n_0 = 0 or n_1 = 0 or (c_0 + c_1) = 0 or (c_0 + c_1) = (n_0 + n_1)"
    )
    return wide.select(
        "n_0",
        "n_1",
        "c_0",
        "c_1",
        F.expr(
            f"case when n_0 + n_1 = 0 then null"
            f" else round({pooled}, 6) end"
        ).alias("rate_pooled"),
        F.expr(
            f"case when {degenerate} then null else {mde} end"
        ).alias("mde_abs"),
        F.expr(
            f"case when {degenerate} then null"
            f" else round(({mde}) / ({pooled}), 6) end"
        ).alias("mde_rel"),
    )


# O'Brien-Fleming-style boundary constant for K=4 equally-spaced looks
# at two-sided alpha = .05 (the classic OBF table value; b_k scales as
# C * sqrt(K / k) so early peeks need overwhelming evidence).
OBF_C_K4 = "2.024"


def group_sequential_looks(
    events: DataFrame,
    looks: int = 4,
    conv_type: str = "purchase",
    key: str = "user_id",
    type_col: str = "event_type",
    ts: str = "ts",
    salt: str = "ab",
    obf_c: str = OBF_C_K4,
) -> DataFrame:
    """Group-sequential interim analysis with O'Brien-Fleming
    boundaries — the peeking-safe experiment monitor: the experiment
    timeline splits into ``looks`` equal calendar slices, and at each
    cumulative look the two-proportion z (ab_conversion's exact
    aggregates restricted to users SEEN by the cutoff, conversions BY
    the cutoff) is compared against b_k = C * sqrt(K / k), which
    spends almost no alpha early so the final look keeps nearly the
    fixed-horizon threshold.

    Everything is one per-user collapse (first-seen day, first-
    conversion day, md5 arm) exploded across the K looks into a
    conditional aggregation — K is a literal, so the plan is one
    groupBy(look) regardless of corpus size; day cutoffs come from a
    broadcast 1-row bounds aggregate (no driver collect). z and the
    boundary are single shared-text expressions over exact integers;
    the reject flag compares the two rounded columns, identical in
    both engines.

    Output: (look, n_0, c_0, n_1, c_1, z, boundary, reject) — one row
    per look; the final look's z equals ab_conversion's z on the same
    stream (pinned by test).
    """
    from careers_spark.operators.dedup import _hash64_expr

    keyed = f"concat(cast({key} as string), '|', '{salt}')"
    day = F.expr(f"unix_micros(cast({ts} as timestamp)) div 86400000000")
    per_user = (
        events.select(
            F.col(key),
            F.expr(f"{_hash64_expr(keyed)} % 2").alias("arm"),
            day.alias("d"),
            F.when(F.col(type_col) == conv_type, day).alias("cd"),
        )
        .groupBy(key, "arm")
        .agg(F.min("d").alias("first_d"), F.min("cd").alias("conv_d"))
    )
    bounds = events.select(day.alias("d")).agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    k = int(looks)
    lk = per_user.crossJoin(F.broadcast(bounds)).select(
        "arm",
        "first_d",
        "conv_d",
        "lo",
        "hi",
        F.explode(F.expr(f"sequence(1, {k})")).alias("look"),
    ).withColumn(
        "cutoff", F.expr(f"lo + ((hi - lo + 1) * look) div {k} - 1")
    )
    agg = (
        lk.filter(F.col("first_d") <= F.col("cutoff"))
        .groupBy("look")
        .agg(
            F.sum(F.expr("case when arm = 0 then 1 else 0 end")).alias("n_0"),
            F.sum(
                F.expr(
                    "case when arm = 0 and conv_d is not null"
                    " and conv_d <= cutoff then 1 else 0 end"
                )
            ).alias("c_0"),
            F.sum(F.expr("case when arm = 1 then 1 else 0 end")).alias("n_1"),
            F.sum(
                F.expr(
                    "case when arm = 1 and conv_d is not null"
                    " and conv_d <= cutoff then 1 else 0 end"
                )
            ).alias("c_1"),
        )
    )
    z = (
        "case when n_0 = 0 or n_1 = 0 then null else "
        "(case when (c_0 + c_1) = 0 or (c_0 + c_1) = (n_0 + n_1) then null "
        "else round((cast(c_1 as double) / cast(n_1 as double)"
        " - cast(c_0 as double) / cast(n_0 as double))"
        " / sqrt((cast(c_0 + c_1 as double) / cast(n_0 + n_1 as double))"
        " * (1e0 - cast(c_0 + c_1 as double) / cast(n_0 + n_1 as double))"
        " * (1e0 / cast(n_0 as double) + 1e0 / cast(n_1 as double))), 6)"
        " end) end"
    )
    bound = f"round({obf_c} * sqrt({k}e0 / look), 6)"
    return agg.select(
        F.col("look").cast("int").alias("look"),
        "n_0",
        "c_0",
        "n_1",
        "c_1",
        F.expr(z).alias("z"),
        F.expr(bound).alias("boundary"),
        F.expr(
            f"case when ({z}) is null then false"
            f" else abs({z}) >= ({bound}) end"
        ).alias("reject"),
    )


def sprt_monitor(
    events: DataFrame,
    ts: str = "ts",
    success: str = "is_success",
    p0_mille: int = 100,
    p1_mille: int = 130,
    alpha_mille: int = 50,
    beta_mille: int = 200,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test on a Bernoulli rate
    (Wald 1945) — the OTHER classic sequential monitor beside the
    group-sequential O'Brien-Fleming looks (sequential_ab_looks) and
    the Page-Hinkley mean-shift alarm: test H0: p = p0 against
    H1: p = p1 continuously, stopping the moment the evidence crosses
    either boundary. SPRT is optimal (minimum expected sample size at
    both hypotheses) — the reason ramp-up gates and data-quality
    monitors use it.

    After n trials with k successes the log-likelihood ratio is

        LLR = k * ln(p1/p0) + (n - k) * ln((1-p1)/(1-p0))

    decided against ln((1-beta)/alpha) (reject H0) and
    ln(beta/(1-alpha)) (accept H0). All four constants are PYTHON-TIME
    fixed-point literals (round(ln(.)*1e9), the pinned ln lattice), so
    LLR_fp = k*c1 + (n-k)*c0 is an exact BIGINT and every
    boundary crossing is a pure INTEGER comparison — no float in any
    decision (the page_hinkley convention).

    Looks happen once per hour that saw traffic (an empty hour changes
    no cumulative count, so skipping it is exact): one corpus groupBy
    to (hour, n, k), cumulative windows over the DIMENSION-sized hour
    table. `is_first_decision` marks the first crossing — the moment a
    real deployment would have stopped; rows after it are shown for
    monitoring honesty (SPRT semantics end at the first crossing).

    Output: (hour, n_cum, k_cum, llr, decision, is_first_decision)
    with decision in {'accept_h0', 'reject_h0', 'continue'}.
    """
    import math

    from pyspark.sql import Window

    for nm, v in (
        ("p0_mille", p0_mille),
        ("p1_mille", p1_mille),
        ("alpha_mille", alpha_mille),
        ("beta_mille", beta_mille),
    ):
        if not 0 < v < 1000:
            raise ValueError(f"{nm} must be in (0, 1000)")
    if p0_mille == p1_mille:
        raise ValueError("p0 and p1 must differ")
    p0, p1 = p0_mille / 1000.0, p1_mille / 1000.0
    al, be = alpha_mille / 1000.0, beta_mille / 1000.0
    c1 = int(round(math.log(p1 / p0) * 1e9))
    c0 = int(round(math.log((1 - p1) / (1 - p0)) * 1e9))
    up = int(round(math.log((1 - be) / al) * 1e9))
    lo = int(round(math.log(be / (1 - al)) * 1e9))
    hours = events.select(
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) div 3600000000"
        ).alias("hour"),
        F.col(success).cast("long").alias("k"),
    ).groupBy("hour").agg(
        F.count("*").alias("n_h"), F.sum("k").alias("k_h")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hours.withColumn("n_cum", F.sum("n_h").over(w))
        .withColumn("k_cum", F.sum("k_h").over(w))
        .withColumn(
            "llr_fp",
            F.expr(f"k_cum * {c1} + (n_cum - k_cum) * {c0}"),
        )
        .withColumn(
            "decision",
            F.when(F.col("llr_fp") >= F.lit(up), F.lit("reject_h0"))
            .when(F.col("llr_fp") <= F.lit(lo), F.lit("accept_h0"))
            .otherwise(F.lit("continue")),
        )
    )
    prior = (
        Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, -1)
    )
    return cum.withColumn(
        "_nd",
        F.coalesce(
            F.sum(
                F.when(F.col("decision") != "continue", 1).otherwise(0)
            ).over(prior),
            F.lit(0),
        ),
    ).select(
        "hour",
        "n_cum",
        "k_cum",
        F.expr("round(llr_fp / 1000000000e0, 6)").alias("llr"),
        "decision",
        (
            (F.col("decision") != "continue") & (F.col("_nd") == 0)
        ).alias("is_first_decision"),
    )


def srm_check(
    events: DataFrame,
    variant: str = "variant",
    weights_mille: dict | None = None,
    crit_mille: int = 3841,
) -> DataFrame:
    """Sample-ratio-mismatch check (the first thing a trustworthy A/B
    platform validates — Fabijan et al., KDD 2019 call SRM "the most
    useful A/B guardrail"): a chi-square goodness-of-fit of observed
    variant counts against the DESIGNED split. A significant mismatch
    means the assignment or logging pipeline is broken and every
    downstream metric is untrustworthy — this gate runs BEFORE
    ab_conversion, not after.

        chi2 = sum_v (o_v - n*w_v)^2 / (n*w_v)
             = sum_v (1000*o_v - n*wm_v)^2 / (1000 * n * wm_v)

    with designed weights on the mille lattice — numerators are exact
    BIGINT cross-products, each contribution ONE shared-text double
    division, and the alarm compares against the caller's critical
    value (default 3.841 = chi2_{1, 0.05}; pass the df-appropriate
    one). A variant OBSERVED but not in the design is the worst SRM of
    all: it is flagged (`designed` false), excluded from the chi2 (its
    expected count is zero — the statistic is undefined there), and
    trips the alarm unconditionally. Designed-but-absent variants
    contribute their full expected mass.

    One groupBy over the corpus + a broadcast design-table FULL join;
    everything downstream is dimension-sized.

    Output: one row per variant — (variant, n_obs, w_mille, expected,
    contrib, chi2_total, srm_alarm) with chi2_total/srm_alarm repeated
    per row (the woe_iv release convention).
    """
    if not weights_mille:
        raise ValueError("weights_mille must be a non-empty dict")
    if sum(weights_mille.values()) != 1000:
        raise ValueError("designed weights must sum to 1000 mille")
    if any(w <= 0 for w in weights_mille.values()):
        raise ValueError("designed weights must be positive")
    spark = events.sparkSession
    design = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(weights_mille.items())],
        "variant string, w_mille int",
    )
    obs = events.groupBy(F.col(variant).alias("variant")).agg(
        F.count("*").alias("n_obs")
    )
    j = (
        design.join(obs, "variant", "full")
        .select(
            "variant",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            "w_mille",
        )
        .crossJoin(
            F.broadcast(
                obs.agg(F.sum("n_obs").alias("n_all"))
            )
        )
        .withColumn("designed", F.col("w_mille").isNotNull())
        .withColumn(
            "contrib",
            F.expr(
                "case when w_mille is null then null else"
                " round((1000 * n_obs - n_all * cast(w_mille as bigint))"
                " * (1000 * n_obs - n_all * cast(w_mille as bigint))"
                " * 1e0 / (1000e0 * n_all * w_mille), 6) end"
            ),
        )
    )
    # contribs are already 6-dp-rounded, so lifting them to 1e-6
    # integers makes the cross-variant total an order-free exact sum
    tot = j.agg(
        F.sum(
            F.expr(
                "case when designed then"
                " cast(round(contrib * 1000000e0, 0) as bigint) end"
            )
        ).alias("_cfp"),
        F.max(F.when(~F.col("designed"), 1).otherwise(0)).alias(
            "undesigned"
        ),
    ).select(
        F.expr("round(_cfp / 1000000e0, 6)").alias("chi2_total"),
        "undesigned",
    )
    return j.crossJoin(F.broadcast(tot)).select(
        "variant",
        "n_obs",
        "w_mille",
        F.expr(
            "case when w_mille is null then null"
            " else round(n_all * w_mille / 1000e0, 6) end"
        ).alias("expected"),
        "contrib",
        "chi2_total",
        (
            (F.col("chi2_total") > F.lit(int(crit_mille)) / F.lit(1000.0))
            | (F.col("undesigned") == 1)
        ).alias("srm_alarm"),
    )
