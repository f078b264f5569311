"""Conversation-shape profiling over multi-turn transcripts.

The data-quality table an agent-transcript training pipeline prints
before fine-tuning on conversations (the transcript analogue of the
documents_profile / quality_score layer): per conversation, how many
turns each role contributed, whether the user/assistant alternation is
well-formed (consecutive same-role turns are a format smell that
derails chat templates), how verbose each side is, how often tools
fire, and how long the conversation ran. Shape outliers — single-turn
"conversations", assistant monologues, tool storms — are exactly what
curation drops before SFT.

Reference anchor: the reference processes conversations as ordered
(conv_id, turn_idx) streams (its per-document page parse,
PhraseTopicCombiner's per-doc grouping); this operator profiles that
same ordering contract, which the resolver's per-conversation windows
already rely on.

Exactness: token counts use the house tokenizer lattice
(tokens_col == the DuckDB regexp twin), every other value is an
integer count, an epoch-second difference, or one rounded ratio —
hash-exact oracles with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.dedup import tokens_col


def conversation_shape(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    tool: str = "tool",
    ts: str = "ts",
) -> DataFrame:
    """Per-conversation shape profile. Alternation violations count
    turn boundaries where the role repeats (lag over the conversation's
    own turn order — per-conv partitions, bounded by conversation
    length, never a global sort). The verbosity ratio divides user by
    assistant token totals (NULL when the assistant never spoke — a
    real shape defect, surfaced rather than defaulted). Tool turns are
    rows whose tool marker is non-empty.

    Output: (conv_id, n_turns, n_user, n_assistant, n_tool,
    alternation_violations, user_tokens, assistant_tokens,
    verbosity_ratio, tool_rate, duration_s).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ti")
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.col(role).alias("r"),
        F.size(tokens_col(text)).alias("ntok"),
        (
            F.col(tool).isNotNull() & (F.col(tool) != F.lit(""))
        ).alias("is_tool"),
        F.expr(f"unix_micros(cast({ts} as timestamp))").alias("us"),
    ).withColumn("prev_r", F.lag("r").over(w))
    return (
        t.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("r") == "user", 1).otherwise(0)).alias(
                "n_user"
            ),
            F.sum(
                F.when(F.col("r") == "assistant", 1).otherwise(0)
            ).alias("n_assistant"),
            F.sum(F.when(F.col("is_tool"), 1).otherwise(0)).alias(
                "n_tool"
            ),
            F.sum(
                F.when(F.col("prev_r") == F.col("r"), 1).otherwise(0)
            ).alias("alternation_violations"),
            F.sum(
                F.when(F.col("r") == "user", F.col("ntok")).otherwise(
                    F.lit(0)
                )
            ).alias("user_tokens"),
            F.sum(
                F.when(
                    F.col("r") == "assistant", F.col("ntok")
                ).otherwise(F.lit(0))
            ).alias("assistant_tokens"),
            F.expr("(max(us) - min(us)) div 1000000").alias(
                "duration_s"
            ),
        )
        .select(
            "conv_id",
            "n_turns",
            "n_user",
            "n_assistant",
            "n_tool",
            "alternation_violations",
            "user_tokens",
            "assistant_tokens",
            F.expr(
                "case when assistant_tokens = 0 then null"
                " else round(user_tokens * 1e0 / assistant_tokens, 6)"
                " end"
            ).alias("verbosity_ratio"),
            F.expr("round(n_tool * 1e0 / n_turns, 6)").alias(
                "tool_rate"
            ),
            "duration_s",
        )
    )


def tool_grounding(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    tool: str = "tool",
) -> DataFrame:
    """Tool-grounding audit: for every TOOL turn, does the next
    assistant turn actually USE the tool output (share at least one
    content token with it)? A low grounding rate is
    the classic agent-transcript defect — the model called a tool and
    then ignored it (or hallucinated past it); SFT curation drops or
    down-weights those conversations. The assistant turn examined is
    the FIRST assistant turn after the tool turn within the same
    conversation (intervening tool/user turns allowed).

    Exactness: overlap is the intersection size of the two turns'
    DISTINCT token sets on the house tokenizer lattice — an integer;
    the per-turn pairing is a min-over-later-assistant-turns algebra
    (one conditional min per tool turn over the conversation's own
    turns — bounded partitions). No floats anywhere but the final
    corpus-level rate, which the caller derives; this operator emits
    the per-tool-turn evidence rows.

    Output: one row per tool turn — (conv_id, tool_turn, tool_name,
    assistant_turn, n_overlap, grounded) with assistant_turn NULL (and
    grounded false) when no assistant ever followed.
    """
    from pyspark.sql import Window

    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.col(role).alias("r"),
        F.array_distinct(tokens_col(text)).alias("toks"),
        F.col(tool).alias("tool_name"),
    )
    tools = t.filter(
        F.col("tool_name").isNotNull() & (F.col("tool_name") != "")
    ).select(
        "conv_id",
        F.col("ti").alias("tool_turn"),
        "tool_name",
        F.col("toks").alias("tool_toks"),
    )
    assist = t.filter(F.col("r") == "assistant").select(
        F.col("conv_id").alias("_ac"),
        F.col("ti").alias("a_ti"),
        F.col("toks").alias("a_toks"),
    )
    # the ">" predicate lives INSIDE the left join so a tool turn
    # whose assistants all precede it still emits its NULL row
    paired = (
        tools.join(
            assist,
            (F.col("conv_id") == F.col("_ac"))
            & (F.col("a_ti") > F.col("tool_turn")),
            "left",
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("conv_id", "tool_turn").orderBy(
                    F.col("a_ti").asc_nulls_last()
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return paired.select(
        "conv_id",
        "tool_turn",
        "tool_name",
        F.col("a_ti").alias("assistant_turn"),
        F.when(
            F.col("a_ti").isNotNull(),
            F.size(F.array_intersect("tool_toks", "a_toks")),
        ).otherwise(F.lit(0)).alias("n_overlap"),
        (
            F.col("a_ti").isNotNull()
            & (F.size(F.array_intersect("tool_toks", "a_toks")) >= 1)
        ).alias("grounded"),
    )


def response_latency(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    ts: str = "ts",
) -> DataFrame:
    """User->assistant response-latency profile: for every user turn
    answered by a later assistant turn (first one after it, same
    conversation), the wait in whole seconds — the agent-ops latency
    metric, summarized per corpus as exact integer-second quantiles
    plus the count of DANGLING user turns (never answered: a shape
    defect the mean would silently hide).

    Latencies are exact epoch-second differences; the quantile is the
    k-th smallest via the distinct-value cumulative (the pinned
    percentile convention — p50/p90 as order statistics at
    ceil(q * n), never an interpolating percentile whose cross-engine
    semantics drift).

    Output: one row — (n_user_turns, n_answered, n_dangling, p50_s,
    p90_s, max_s); quantiles NULL when nothing was answered.
    """
    from pyspark.sql import Window

    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.col(role).alias("r"),
        F.expr(f"unix_micros(cast({ts} as timestamp))").alias("us"),
    )
    users = t.filter(F.col("r") == "user").select(
        "conv_id", F.col("ti").alias("u_ti"), F.col("us").alias("u_us")
    )
    assist = t.filter(F.col("r") == "assistant").select(
        F.col("conv_id").alias("_ac"),
        F.col("ti").alias("a_ti"),
        F.col("us").alias("a_us"),
    )
    paired = (
        users.join(
            assist,
            (F.col("conv_id") == F.col("_ac"))
            & (F.col("a_ti") > F.col("u_ti")),
            "left",
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("conv_id", "u_ti").orderBy(
                    F.col("a_ti").asc_nulls_last()
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "conv_id",
            "u_ti",
            F.expr(
                "case when a_ti is null then null"
                " else (a_us - u_us) div 1000000 end"
            ).alias("lat_s"),
        )
    )
    lat = paired.filter(F.col("lat_s").isNotNull())
    vals = lat.groupBy("lat_s").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("lat_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    qs = (
        vals.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall))
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("n"), F.col("lat_s"))
            ).alias("p50_s"),
            F.min(
                F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("lat_s"))
            ).alias("p90_s"),
            F.max("lat_s").alias("max_s"),
        )
    )
    counts = paired.agg(
        F.count("*").alias("n_user_turns"),
        F.sum(F.when(F.col("lat_s").isNotNull(), 1).otherwise(0)).alias(
            "n_answered"
        ),
        F.sum(F.when(F.col("lat_s").isNull(), 1).otherwise(0)).alias(
            "n_dangling"
        ),
    )
    return counts.crossJoin(F.broadcast(qs)).select(
        "n_user_turns", "n_answered", "n_dangling", "p50_s", "p90_s",
        "max_s",
    )


def context_budget(
    transcripts: DataFrame,
    budget_tokens: int = 2048,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text: str = "text",
) -> DataFrame:
    """Context-accumulation cost model: a chat model re-reads the
    WHOLE conversation prefix at every turn, so the quantity that
    matters for SFT packing and truncation policy is the cumulative
    token count AT each turn, not per-turn lengths. Per conversation
    this reports the final context size, the first turn at which the
    running context exceeds ``budget_tokens`` (NULL = the whole
    conversation fits), how many turns run over, and the total
    attention cost proxy sum-of-prefix-lengths (the quadratic-ish
    bill a trainer actually pays).

    All exact integers: house-lattice token counts, one cumulative
    window over each conversation's own turns (bounded partitions),
    one rollup. attention_cost = sum over turns of the INCLUSIVE
    prefix token count — an exact BIGINT.

    Output: (conv_id, n_turns, total_tokens, first_turn_over,
    n_turns_over, attention_cost).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("ti")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.size(tokens_col(text)).cast("long").alias("ntok"),
    ).withColumn("ctx", F.sum("ntok").over(w))
    return t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("ntok").alias("total_tokens"),
        F.min(
            F.when(F.col("ctx") > F.lit(int(budget_tokens)), F.col("ti"))
        ).alias("first_turn_over"),
        F.sum(
            F.when(F.col("ctx") > F.lit(int(budget_tokens)), 1).otherwise(0)
        ).alias("n_turns_over"),
        F.sum("ctx").alias("attention_cost"),
    )


def assistant_repetition(
    transcripts: DataFrame,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """Stuck-agent loop detection: an assistant that repeats itself
    verbatim within one conversation is the signature failure mode of
    agent rollouts (retry loops, tool-error spirals), and exact-repeat
    turns are pure negative training signal. Per conversation:
    assistant turn count, DISTINCT normalized assistant texts (md5 of
    the lower/space-collapsed form — the dedup_exact normalization),
    the repeated-turn count, and the most-repeated text's multiplicity
    (max_burst — 2+ flags a loop).

    One per-(conv, md5) rollup + one per-conv rollup, exact integers
    throughout; conversations with no assistant turns emit (0, 0, 0,
    0) rather than vanishing — absence of assistant output is itself a
    shape defect the caller wants visible.

    Output: (conv_id, n_assistant, n_distinct, n_repeated_turns,
    max_burst).
    """
    convs = transcripts.select(F.col(conv).alias("conv_id")).distinct()
    a = transcripts.filter(F.col(role) == "assistant").select(
        F.col(conv).alias("conv_id"),
        F.expr(
            f"md5(regexp_replace(lower(trim({text})), '\\\\s+', ' '))"
        ).alias("h"),
    )
    per_text = a.groupBy("conv_id", "h").agg(F.count("*").alias("c"))
    per_conv = per_text.groupBy("conv_id").agg(
        F.sum("c").alias("n_assistant"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") - 1).alias("n_repeated_turns"),
        F.max("c").alias("max_burst"),
    )
    return convs.join(per_conv, "conv_id", "left").select(
        "conv_id",
        F.coalesce("n_assistant", F.lit(0)).alias("n_assistant"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        F.coalesce("n_repeated_turns", F.lit(0)).alias(
            "n_repeated_turns"
        ),
        F.coalesce("max_burst", F.lit(0)).alias("max_burst"),
    )


def turn_order_audit(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    ts: str = "ts",
) -> DataFrame:
    """Ordering-contract audit for the (conv_id, turn_idx) stream —
    the ingest validation for THE invariant every downstream operator
    in this engine relies on (the resolver's per-conversation windows,
    the per-turn text-equality check, the digesting order): per
    conversation, duplicated turn indices, gaps in the index sequence,
    and timestamp INVERSIONS (wall time decreasing while turn_idx
    increases — the clock-skew / out-of-order-ingest smell).

    All exact integers: dup count = n_rows - n_distinct_idx; gap count
    = (max_idx - min_idx + 1) - n_distinct_idx; inversions via one lag
    over the conversation's own turn order (bounded partitions). The
    corpus-level read is `clean` — a conversation passing all three.

    Output: (conv_id, n_turns, n_dup_idx, n_gaps, n_ts_inversions,
    clean).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ti", "us")
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.expr(f"unix_micros(cast({ts} as timestamp))").alias("us"),
    ).withColumn("prev_us", F.lag("us").over(w))
    return (
        t.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            (F.count("*") - F.countDistinct("ti")).alias("n_dup_idx"),
            (
                F.max("ti") - F.min("ti") + 1 - F.countDistinct("ti")
            ).alias("n_gaps"),
            F.sum(
                F.when(F.col("us") < F.col("prev_us"), 1).otherwise(0)
            ).alias("n_ts_inversions"),
        )
        .withColumn(
            "clean",
            (F.col("n_dup_idx") == 0)
            & (F.col("n_gaps") == 0)
            & (F.col("n_ts_inversions") == 0),
        )
    )


def canned_responses(
    transcripts: DataFrame,
    min_convs: int = 2,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
    target_role: str = "assistant",
) -> DataFrame:
    """Cross-conversation canned-response detector — the complement of
    assistant_repetition's WITHIN-conversation loops: an assistant
    text appearing verbatim across many conversations is template
    output (boilerplate refusals, greeting stubs), and SFT curation
    caps its multiplicity so the model doesn't overfit the template.
    Groups normalized assistant texts (the assistant_repetition md5
    form) corpus-wide and reports those spanning >= ``min_convs``
    conversations, with one example text carried for triage (MIN by
    raw text — deterministic).

    One (hash) rollup with countDistinct convs — partial-agg friendly;
    the example rides as an algebraic min, never a sort.

    Output: (text_hash, example_text, n_turns, n_convs) — ordered by
    nothing (the caller ranks); all counts exact.
    """
    a = transcripts.filter(F.col(role) == target_role).select(
        F.col(conv).alias("conv_id"),
        F.col(text).alias("raw"),
        F.expr(
            f"md5(regexp_replace(lower(trim({text})), '\\\\s+', ' '))"
        ).alias("text_hash"),
    )
    return (
        a.groupBy("text_hash")
        .agg(
            F.min("raw").alias("example_text"),
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .filter(F.col("n_convs") >= int(min_convs))
    )


def assistant_ngram_diversity(
    transcripts: DataFrame,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """distinct-1 / distinct-2 generation-diversity ratios (Li et al.
    2016, "A Diversity-Promoting Objective Function for Neural
    Conversation Models") over each conversation's assistant side —
    the degeneracy signal SFT curation reads next to the
    assistant_repetition burst detector: a low distinct-2 means the
    assistant is recycling phrasing even when no single turn repeats
    verbatim.

    distinct-n = (# distinct token n-grams) / (# token n-grams), over
    all assistant turns of the conversation pooled together; n-grams
    never cross a turn boundary (the within-turn transform, the
    bigram_doc_freq lattice). Ratios are NULL when the conversation
    has no n-grams of that order (again surfaced, not defaulted).

    Shape at scale: two explode -> partial-agg groupBy(conv_id)
    passes (count + countDistinct) joined on the conversation key —
    no window, no sort; conversations with assistant turns but zero
    tokens keep their row via the left joins from the conversation
    spine.

    Output: (conv_id, n_unigrams, distinct_unigrams, n_bigrams,
    distinct_bigrams, distinct_1, distinct_2).
    """
    t = transcripts.filter(F.col(role) == "assistant").select(
        F.col(conv).alias("conv_id"), tokens_col(text).alias("toks")
    )
    spine = t.select("conv_id").distinct()
    uni = (
        t.select("conv_id", F.explode("toks").alias("g"))
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_unigrams"),
            F.countDistinct("g").alias("distinct_unigrams"),
        )
    )
    big = (
        t.select(
            "conv_id",
            F.explode(
                F.expr(
                    "case when size(toks) >= 2 then "
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i], toks[i+1])) "
                    "else array() end"
                )
            ).alias("g"),
        )
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.countDistinct("g").alias("distinct_bigrams"),
        )
    )
    return (
        spine.join(uni, "conv_id", "left")
        .join(big, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("n_unigrams", F.lit(0).cast("long")).alias(
                "n_unigrams"
            ),
            F.coalesce(
                "distinct_unigrams", F.lit(0).cast("long")
            ).alias("distinct_unigrams"),
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.coalesce(
                "distinct_bigrams", F.lit(0).cast("long")
            ).alias("distinct_bigrams"),
        )
        .select(
            "conv_id",
            "n_unigrams",
            "distinct_unigrams",
            "n_bigrams",
            "distinct_bigrams",
            F.expr(
                "case when n_unigrams = 0 then null else"
                " round(distinct_unigrams * 1e0 / n_unigrams, 6) end"
            ).alias("distinct_1"),
            F.expr(
                "case when n_bigrams = 0 then null else"
                " round(distinct_bigrams * 1e0 / n_bigrams, 6) end"
            ).alias("distinct_2"),
        )
    )


def instruction_grounding(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """Per assistant turn: distinct-token overlap with the most recent
    STRICTLY earlier user turn of the same conversation — the
    is-the-assistant-answering-the-question complement of
    tool_grounding (which checks the tool side). Zero overlap with the
    instruction is the off-topic/derailment smell SFT curation drops;
    an assistant turn with NO prior user turn is a dangling defect row
    (NULL overlap), emitted rather than silently filtered — the same
    inside-the-pairing lesson tool_grounding learned.

    Pairing: one per-conversation window computes the last user
    turn_idx strictly before each turn (bounded partitions, the
    resolver's ordering contract), then assistant turns left-join the
    user turns' token arrays on that index. Overlap counts DISTINCT
    shared tokens on the house lattice (array_intersect dedups).

    Output: one row per assistant turn — (conv_id, turn_idx,
    prev_user_turn, overlap_tokens, grounded).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("ti")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.col(role).alias("r"),
    ).withColumn(
        "prev_user_turn",
        F.last(
            F.when(F.col("r") == "user", F.col("ti")), ignorenulls=True
        ).over(w),
    )
    asst = base.filter(F.col("r") == "assistant").select(
        "conv_id", "ti", "prev_user_turn"
    )
    atoks = transcripts.filter(F.col(role) == "assistant").select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        tokens_col(text).alias("a_toks"),
    )
    utoks = transcripts.filter(F.col(role) == "user").select(
        F.col(conv).alias("u_conv"),
        F.col(turn).alias("uti"),
        tokens_col(text).alias("u_toks"),
    )
    j = asst.join(atoks, ["conv_id", "ti"]).join(
        utoks,
        (F.col("conv_id") == F.col("u_conv"))
        & (F.col("prev_user_turn") == F.col("uti")),
        "left",
    )
    return j.select(
        "conv_id",
        F.col("ti").alias("turn_idx"),
        "prev_user_turn",
        F.when(
            F.col("prev_user_turn").isNull(), F.lit(None).cast("long")
        )
        .otherwise(
            F.size(F.array_intersect("a_toks", "u_toks")).cast("long")
        )
        .alias("overlap_tokens"),
        F.when(F.col("prev_user_turn").isNull(), F.lit(None))
        .otherwise(
            F.size(F.array_intersect("a_toks", "u_toks")) >= 1
        )
        .alias("grounded"),
    )


def turn_cohesion(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 5,
) -> DataFrame:
    """Adjacent-turn lexical cohesion — the TextTiling signal (Hearst
    1997) on the conversation's own turn lattice: Jaccard similarity
    of the distinct token sets of each consecutive turn pair, with a
    topic-shift boundary flagged where cohesion drops below
    threshold_num/threshold_den. Long multi-topic conversations are
    what context-budget truncation should cut at a boundary, not mid-
    topic — this emits the cut points.

    Exactness: the boundary decision is the cross-multiplied integer
    comparison |inter| * den < |union| * num — float-free; the
    reported jaccard is one rounded division of the same integers.
    Empty-union pairs (both turns tokenless) surface NULL jaccard and
    NULL boundary rather than a default.

    Shape at scale: one equi-self-join on (conv_id, turn_idx + 1) —
    shuffle on the conversation key, per-row work bounded by turn
    length; no window, no sort.

    Output: one row per adjacent pair — (conv_id, turn_idx,
    next_turn_idx, inter_tokens, union_tokens, jaccard, is_boundary).
    """
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        tokens_col(text).alias("toks"),
    )
    a = t.select(
        "conv_id", F.col("ti").alias("turn_idx"), F.col("toks").alias("a_toks")
    )
    b = t.select(
        F.col("conv_id").alias("b_conv"),
        F.col("ti").alias("next_turn_idx"),
        F.col("toks").alias("b_toks"),
    )
    j = a.join(
        b,
        (F.col("conv_id") == F.col("b_conv"))
        & (F.col("next_turn_idx") == F.col("turn_idx") + 1),
    )
    num, den = int(threshold_num), int(threshold_den)
    return j.select(
        "conv_id",
        "turn_idx",
        "next_turn_idx",
        F.size(F.array_intersect("a_toks", "b_toks"))
        .cast("long")
        .alias("inter_tokens"),
        F.size(F.array_union("a_toks", "b_toks"))
        .cast("long")
        .alias("union_tokens"),
    ).select(
        "conv_id",
        "turn_idx",
        "next_turn_idx",
        "inter_tokens",
        "union_tokens",
        F.expr(
            "case when union_tokens = 0 then null else"
            " round(inter_tokens * 1e0 / union_tokens, 6) end"
        ).alias("jaccard"),
        F.expr(
            "case when union_tokens = 0 then null else"
            f" inter_tokens * {den} < union_tokens * {num} end"
        ).alias("is_boundary"),
    )


def tool_usage_profile(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    tool: str = "tool",
) -> DataFrame:
    """Per-tool usage rollup of the tool_grounding evidence rows — the
    which-tools-does-the-agent-actually-use (and which does it then
    ignore) table: calls, conversations reached, grounded vs dangling
    counts, grounding rate. A tool with many calls and a low grounded
    rate is either broken or its output format is unreadable to the
    model — either way a curation finding.

    Pure composition: tool_grounding's per-call rows (already exact)
    closed by one dimension-sized groupBy(tool_name); grounded_rate is
    a single division over non-dangling calls (NULL when every call
    dangles).

    Output: (tool_name, n_calls, n_convs, n_grounded, n_dangling,
    grounded_rate).
    """
    g = tool_grounding(
        transcripts, conv=conv, turn=turn, role=role, text=text, tool=tool
    )
    return (
        g.groupBy("tool_name")
        .agg(
            F.count("*").alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.sum(
                F.when(
                    F.col("assistant_turn").isNotNull()
                    & F.col("grounded"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_grounded"),
            F.sum(
                F.when(F.col("assistant_turn").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_dangling"),
        )
        .select(
            "tool_name",
            "n_calls",
            "n_convs",
            "n_grounded",
            "n_dangling",
            F.expr(
                "case when n_calls - n_dangling = 0 then null else"
                " round(n_grounded * 1e0 / (n_calls - n_dangling), 6)"
                " end"
            ).alias("grounded_rate"),
        )
    )


def conversation_near_dups(
    transcripts: DataFrame,
    conv: str = "conv_id",
    text: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Conversation-grain near-duplicate pairs — the SFT-level dedup
    the document operators cannot see: two conversations that retell
    the same exchange (template rollouts, retried sessions, shared
    boilerplate) carry near-identical training signal even when no
    single turn is a verbatim duplicate. Similarity is exact Jaccard
    over the conversation's pooled DISTINCT word n-gram shingles
    (shingles stay within a turn — the bigram_doc_freq lattice),
    kept at jaccard >= threshold_num/threshold_den.

    Candidate generation is the shared-shingle equi-join (the
    ngram_jaccard_pairs shape, conversation grain): complete by
    construction for any positive threshold, since jaccard > 0
    requires at least one shared shingle — never an all-pairs step.
    The keep decision is the cross-multiplied integer comparison
    inter * den >= (n_a + n_b - inter) * num — float-free; the
    reported jaccard is one rounded division of the same integers.

    Output: (conv_a, conv_b, inter_shingles, n_sh_a, n_sh_b, jaccard),
    conv_a < conv_b canonically.
    """
    from careers_spark.operators.dedup import shingles_expr

    t = transcripts.select(
        F.col(conv).alias("conv_id"), tokens_col(text).alias("toks")
    )
    sh = (
        t.select(
            "conv_id",
            F.explode(F.expr(shingles_expr(n))).alias("s"),
        )
        .distinct()
    )
    sz = sh.groupBy("conv_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("conv_id").alias("conv_a"), "s")
    b = sh.select(F.col("conv_id").alias("conv_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("conv_a") < F.col("conv_b"))
        .groupBy("conv_a", "conv_b")
        .agg(F.count("*").cast("long").alias("inter_shingles"))
    )
    num, den = int(threshold_num), int(threshold_den)
    return (
        inter.join(
            sz.select(
                F.col("conv_id").alias("conv_a"),
                F.col("n_sh").alias("n_sh_a"),
            ),
            "conv_a",
        )
        .join(
            sz.select(
                F.col("conv_id").alias("conv_b"),
                F.col("n_sh").alias("n_sh_b"),
            ),
            "conv_b",
        )
        .filter(
            F.expr(
                f"inter_shingles * {den}"
                f" >= (n_sh_a + n_sh_b - inter_shingles) * {num}"
            )
        )
        .select(
            "conv_a",
            "conv_b",
            "inter_shingles",
            "n_sh_a",
            "n_sh_b",
            F.expr(
                "round(inter_shingles * 1e0"
                " / (n_sh_a + n_sh_b - inter_shingles), 6)"
            ).alias("jaccard"),
        )
    )


def conversation_dedup_canonical(
    transcripts: DataFrame,
    conv: str = "conv_id",
    text: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Keep-one-representative conversation dedup: the near-dup pairs
    as edges -> salted min-label connected components (transitive
    clusters: a~b, b~c merge even when a,c never pair directly) ->
    the minimum conv_id kept per cluster — near_dup_canonical's exact
    recipe lifted to the conversation grain, composing two existing
    scale paths (shared-shingle blocking + O(diameter) CC) with no
    new shuffle shapes.

    Output: (conv_id, canonical_id, is_kept) — one row per
    conversation; singletons are their own canonical.
    """
    from careers_spark.operators.canonicalize import (
        connected_components,
    )

    pairs = conversation_near_dups(
        transcripts,
        conv=conv,
        text=text,
        n=n,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
    )
    cc = connected_components(
        pairs.select(
            F.col("conv_a").alias("src"), F.col("conv_b").alias("dst")
        )
    )
    spine = transcripts.select(
        F.col(conv).alias("conv_id")
    ).distinct()
    return (
        spine.join(
            cc.withColumnRenamed("node", "conv_id"), "conv_id", "left"
        )
        .select(
            "conv_id",
            F.coalesce("component", F.col("conv_id")).alias(
                "canonical_id"
            ),
        )
        .withColumn(
            "is_kept", F.col("conv_id") == F.col("canonical_id")
        )
    )


def role_transitions(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """Corpus-level role-transition matrix — the Markov chain of the
    conversation protocol (user -> assistant -> tool -> ...), with
    virtual <start> and <end> states so entry and exit behavior is
    part of the matrix: which role opens conversations, which role is
    allowed to close them. A mass on assistant -> assistant or
    user -> user is the alternation defect conversation_shape counts,
    now attributed by direction; tool -> <end> is the dangling-tool
    smell tool_grounding surfaces per turn.

    One lag/lead pass over per-conversation turn order (bounded
    partitions), one dimension-sized groupBy; shares are one division
    per row of exact counts, per SOURCE role (each from_role's row
    sums to 1).

    Output: (from_role, to_role, n, share).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ti")
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.col(role).alias("r"),
    ).withColumn("next_r", F.lead("r").over(w)).withColumn(
        "rk", F.row_number().over(w)
    )
    trans = t.select(
        F.col("r").alias("from_role"),
        F.coalesce("next_r", F.lit("<end>")).alias("to_role"),
    ).union(
        t.filter(F.col("rk") == 1).select(
            F.lit("<start>").alias("from_role"),
            F.col("r").alias("to_role"),
        )
    )
    counts = trans.groupBy("from_role", "to_role").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = counts.groupBy("from_role").agg(
        F.sum("n").alias("n_from")
    )
    return counts.join(tot, "from_role").select(
        "from_role",
        "to_role",
        "n",
        F.expr("round(n * 1e0 / n_from, 6)").alias("share"),
    )


def conversation_language_mix(
    transcripts: DataFrame,
    conv: str = "conv_id",
    text: str = "text",
) -> DataFrame:
    """Code-switching audit: per-turn language identification (the
    textstats.lang_id function-word heuristic, verbatim — same lists,
    same tie->'und' rule) rolled up per conversation — conversations
    whose turns flip language mid-stream need either a multilingual
    training bucket or exclusion from a monolingual one, and a high
    und share marks transcripts the heuristic cannot place at all.

    main_lang is the modal per-turn prediction with the deterministic
    (count desc, lang asc) tie-break via one per-conversation
    row_number (bounded partitions); n_langs counts distinct non-und
    predictions; every other value is an integer count or one rounded
    division.

    Output: (conv_id, n_turns, n_und_turns, n_langs, main_lang,
    main_share, is_mixed).
    """
    from pyspark.sql import Window

    from careers_spark.operators.textstats import LANG_WORDS

    toks = tokens_col(text)

    def hits(words):
        # single-param lambda: pyspark's higher-order-function wrapper
        # binds a Column to EVERY parameter, defaults included
        wl = list(words)
        return lambda t: t.isin(*wl)

    cols = [
        F.size(F.filter(toks, hits(words))).alias(f"n_{lang}")
        for lang, words in LANG_WORDS.items()
    ]
    d = transcripts.select(F.col(conv).alias("conv_id"), *cols)
    best = F.greatest(*[F.col(f"n_{lg}") for lg in LANG_WORDS])
    winners = F.filter(
        F.array(*[
            F.when(F.col(f"n_{lg}") == best, F.lit(lg)).otherwise(
                F.lit(None)
            )
            for lg in LANG_WORDS
        ]),
        lambda x: x.isNotNull(),
    )
    per_turn = d.select(
        "conv_id",
        F.when((best > 0) & (F.size(winners) == 1), winners[0])
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
    )
    counts = per_turn.groupBy("conv_id", "pred_lang").agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("c"), F.asc("pred_lang")
    )
    main = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "conv_id",
            F.col("pred_lang").alias("main_lang"),
            F.col("c").alias("n_main"),
        )
    )
    per_conv = counts.groupBy("conv_id").agg(
        F.sum("c").alias("n_turns"),
        F.coalesce(
            F.sum(F.when(F.col("pred_lang") == "und", F.col("c"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_und_turns"),
        F.sum(
            F.when(F.col("pred_lang") != "und", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_langs"),
    )
    return per_conv.join(main, "conv_id").select(
        "conv_id",
        "n_turns",
        "n_und_turns",
        "n_langs",
        "main_lang",
        F.expr("round(n_main * 1e0 / n_turns, 6)").alias(
            "main_share"
        ),
        (F.col("n_langs") >= 2).alias("is_mixed"),
    )


def conversation_forks(
    transcripts: DataFrame,
    k: int = 2,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text: str = "text",
) -> DataFrame:
    """Fork detection: conversations sharing an identical normalized
    opening (first `k` turns) are branches of one rollout tree —
    resampled continuations, retried sessions, A/B'd system prompts.
    Training on every branch multiplies the shared prefix's gradient
    weight exactly like duplicate documents do; curation wants the
    fork groups so it can cap or reweight them.

    The group key is md5 over the first k turns' normalized texts in
    turn order (the assistant_repetition normalization, '||'-joined);
    member lists ride the sorted '|'-joined string convention
    (array-free, hash-exact). Conversations shorter than k hash over
    the turns they have — "same complete opening" still groups them.

    One bounded per-conversation rollup + one hash-keyed rollup;
    no windows, no sorts beyond the degree-bounded member join.

    Output: (prefix_hash, n_convs, conv_ids) — groups with >= 2
    members only.
    """
    norm = F.expr(
        f"md5(regexp_replace(lower(trim({text})), '\\\\s+', ' '))"
    )
    first = (
        transcripts.filter(F.col(turn) < int(k))
        .select(
            F.col(conv).alias("conv_id"),
            F.col(turn).alias("ti"),
            norm.alias("h"),
        )
        .groupBy("conv_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("ti", "h"))
                        ),
                        lambda s: s["h"],
                    ),
                    "||",
                )
            ).alias("prefix_hash")
        )
    )
    return (
        first.groupBy("prefix_hash")
        .agg(
            F.count("*").cast("long").alias("n_convs"),
            F.array_join(
                F.sort_array(F.collect_list("conv_id")), "|"
            ).alias("conv_ids"),
        )
        .filter(F.col("n_convs") >= 2)
    )


def assistant_length_trend(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """Per-conversation trend of assistant verbosity over turn index —
    the within-conversation degradation signal: a strongly negative
    slope means the assistant gets terser as the conversation runs
    (fatigue / collapse into stub answers), a strongly positive one
    often marks padding loops; both are curation flags the corpus-
    level verbosity ratio cannot see.

    Exact OLS on integers: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    with x = turn_idx and y = the house-lattice token count — every
    moment is a BIGINT from one partial-agg groupBy(conv_id), the
    slope one rounded division (NULL when fewer than 2 assistant
    turns; the denominator cannot vanish otherwise since turn indices
    are distinct).

    Output: (conv_id, n_assistant, mean_tokens, slope).
    """
    a = transcripts.filter(F.col(role) == "assistant").select(
        F.col(conv).alias("conv_id"),
        F.col(turn).cast("long").alias("x"),
        F.size(tokens_col(text)).cast("long").alias("y"),
    )
    m = a.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        "conv_id",
        F.col("n").alias("n_assistant"),
        F.expr("round(sy * 1e0 / n, 6)").alias("mean_tokens"),
        F.expr(
            "case when n < 2 or n * sxx - sx * sx = 0 then null else"
            " round((n * 1e0 * sxy - sx * 1e0 * sy)"
            " / (n * 1e0 * sxx - sx * 1e0 * sx), 6) end"
        ).alias("slope"),
    )


def sft_pairs(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """The SFT pair-extraction step itself: one row per user turn,
    paired with the FIRST later assistant turn of the conversation
    (intervening tool turns allowed — the response_latency pairing,
    reused verbatim) — i.e. the (prompt, response) examples a
    fine-tune actually trains on, with the bookkeeping curation
    filters key on: token counts on the house lattice, the response's
    normalized hash (so the canned-response multiplicity cap joins
    straight in), and unanswered prompts kept as NULL-response defect
    rows rather than silently dropped.

    One inside-the-join pairing + a per-pair row_number over bounded
    (conv, user-turn) partitions; token counts are integers, no other
    arithmetic.

    Output: (conv_id, user_turn, assistant_turn, prompt_tokens,
    response_tokens, response_hash) — response fields NULL when no
    assistant ever follows.
    """
    from pyspark.sql import Window

    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.col(role).alias("r"),
        F.col(text).alias("tx"),
    )
    users = t.filter(F.col("r") == "user").select(
        "conv_id",
        F.col("ti").alias("user_turn"),
        F.size(tokens_col("tx")).cast("long").alias("prompt_tokens"),
    )
    assist = t.filter(F.col("r") == "assistant").select(
        F.col("conv_id").alias("_ac"),
        F.col("ti").alias("a_ti"),
        F.size(tokens_col("tx")).cast("long").alias("a_ntok"),
        F.expr(
            "md5(regexp_replace(lower(trim(tx)), '\\\\s+', ' '))"
        ).alias("a_hash"),
    )
    paired = (
        users.join(
            assist,
            (F.col("conv_id") == F.col("_ac"))
            & (F.col("a_ti") > F.col("user_turn")),
            "left",
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("conv_id", "user_turn").orderBy(
                    F.col("a_ti").asc_nulls_last()
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return paired.select(
        "conv_id",
        "user_turn",
        F.col("a_ti").alias("assistant_turn"),
        "prompt_tokens",
        F.col("a_ntok").alias("response_tokens"),
        F.col("a_hash").alias("response_hash"),
    )


def turn_novelty(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text: str = "text",
) -> DataFrame:
    """Per-turn information-accumulation curve: what fraction of a
    turn's distinct tokens are NEW to the conversation (first
    occurrence). A conversation whose later turns contribute nothing
    new is circling (the repetition family's lexical complement); a
    flat-high curve is a topic parade with no follow-up depth —
    both shape signals for SFT curation and for choosing truncation
    points together with turn_cohesion's boundaries.

    Order-free exactness: "new at turn t" is a function of each
    token's MIN turn index within the conversation (one partial-agg
    groupBy), never of scan order — the vocab_growth recipe at
    conversation grain. Tokenless turns keep their row with NULL
    novelty via the turn spine.

    Output: (conv_id, turn_idx, n_distinct_tokens, n_new_tokens,
    novelty).
    """
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        tokens_col(text).alias("toks"),
    )
    spine = t.select("conv_id", F.col("ti").alias("turn_idx"))
    tok = t.select(
        "conv_id", "ti", F.explode(F.array_distinct("toks")).alias("g")
    )
    per_turn = tok.groupBy("conv_id", F.col("ti").alias("turn_idx")).agg(
        F.count("*").cast("long").alias("n_distinct_tokens")
    )
    first = tok.groupBy("conv_id", "g").agg(
        F.min("ti").alias("first_ti")
    )
    news = first.groupBy(
        "conv_id", F.col("first_ti").alias("turn_idx")
    ).agg(F.count("*").cast("long").alias("n_new_tokens"))
    return (
        spine.join(per_turn, ["conv_id", "turn_idx"], "left")
        .join(news, ["conv_id", "turn_idx"], "left")
        .select(
            "conv_id",
            "turn_idx",
            F.coalesce("n_distinct_tokens", F.lit(0).cast("long")).alias(
                "n_distinct_tokens"
            ),
            F.coalesce("n_new_tokens", F.lit(0).cast("long")).alias(
                "n_new_tokens"
            ),
        )
        .select(
            "conv_id",
            "turn_idx",
            "n_distinct_tokens",
            "n_new_tokens",
            F.expr(
                "case when n_distinct_tokens = 0 then null else"
                " round(n_new_tokens * 1e0 / n_distinct_tokens, 6)"
                " end"
            ).alias("novelty"),
        )
    )


def curated_sft_pairs(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    ts: str = "ts",
) -> DataFrame:
    """The transcripts capstone — curated_corpus at the SFT-pair
    grain: every (prompt, response) pair from sft_pairs carrying four
    independent curation legs and their conjunction, so "what actually
    enters training" is one machine-checkable view:

      has_response  — the pair is trainable at all (no dangling user)
      conv_kept     — the conversation survived near-dup dedup
                      (conversation_dedup_canonical representative)
      conv_clean    — the ordering contract holds
                      (turn_order_audit's dup/gap/inversion zeros)
      not_canned    — the response is not a cross-conversation
                      template (canned_responses at min_convs=2);
                      NULL-response rows are false here, not NULL —
                      an untrainable pair can never be selected

    Rejected pairs stay in the output with their failing legs visible
    (the curated_corpus convention): curation decisions must be
    auditable, not silently applied. Pure composition of four
    existing exact operators; the only new work is three left joins
    on conversation / hash keys.

    Output: sft_pairs' columns + (has_response, conv_kept,
    conv_clean, not_canned, selected).
    """
    pairs = sft_pairs(
        transcripts, conv=conv, turn=turn, role=role, text=text
    )
    kept = conversation_dedup_canonical(
        transcripts, conv=conv, text=text
    ).select("conv_id", F.col("is_kept").alias("conv_kept"))
    clean = turn_order_audit(
        transcripts, conv=conv, turn=turn, ts=ts
    ).select("conv_id", F.col("clean").alias("conv_clean"))
    canned = canned_responses(
        transcripts, min_convs=2, conv=conv, role=role, text=text
    ).select(F.col("text_hash").alias("response_hash"))
    return (
        pairs.join(kept, "conv_id")
        .join(clean, "conv_id")
        .join(
            canned.withColumn("is_canned", F.lit(True)),
            "response_hash",
            "left",
        )
        .select(
            "conv_id",
            "user_turn",
            "assistant_turn",
            "prompt_tokens",
            "response_tokens",
            "response_hash",
            F.col("assistant_turn").isNotNull().alias("has_response"),
            "conv_kept",
            "conv_clean",
            (
                F.col("response_hash").isNotNull()
                & F.col("is_canned").isNull()
            ).alias("not_canned"),
        )
        .withColumn(
            "selected",
            F.col("has_response")
            & F.col("conv_kept")
            & F.col("conv_clean")
            & F.col("not_canned"),
        )
    )


def prompt_contamination(
    transcripts: DataFrame,
    mod: int = 5,
    eval_bucket: int = 0,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """Eval-split prompt contamination — the transcript-grain analogue
    of benchmark decontamination: after the deterministic md5
    conversation split (bucket(conv) == eval_bucket mod `mod`), which
    EVAL user prompts also appear verbatim (normalized) in TRAIN
    conversations? An eval set whose prompts leak into training
    measures memorization, not capability; these are the prompts to
    drop from eval or quarantine from training.

    Membership is a pure function of conv_id (the train_val_test_split
    convention — never migrates as the corpus grows); prompts compare
    on the canned-response normalization. One groupBy per split side +
    one hash equi-join, all counts exact.

    Output: one row per CONTAMINATED eval prompt — (prompt_hash,
    n_eval_convs, n_train_convs, example_text).
    """
    u = transcripts.filter(F.col(role) == "user").select(
        F.col(conv).alias("conv_id"),
        F.col(text).alias("raw"),
        F.expr(
            f"md5(regexp_replace(lower(trim({text})), '\\\\s+', ' '))"
        ).alias("prompt_hash"),
        F.expr(
            f"cast(conv(substr(md5({conv}), 1, 8), 16, 10) as bigint)"
            f" % {int(mod)} = {int(eval_bucket)}"
        ).alias("is_eval"),
    )
    ev = (
        u.filter(F.col("is_eval"))
        .groupBy("prompt_hash")
        .agg(
            F.countDistinct("conv_id").cast("long").alias(
                "n_eval_convs"
            ),
            F.min("raw").alias("example_text"),
        )
    )
    tr = (
        u.filter(~F.col("is_eval"))
        .groupBy("prompt_hash")
        .agg(
            F.countDistinct("conv_id").cast("long").alias(
                "n_train_convs"
            )
        )
    )
    return ev.join(tr, "prompt_hash").select(
        "prompt_hash", "n_eval_convs", "n_train_convs", "example_text"
    )


def split_balance_report(
    transcripts: DataFrame,
    mod: int = 5,
    eval_bucket: int = 0,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """Balance audit of the md5 conversation split: per side,
    conversation / turn / token counts and role shares — a split whose
    eval side is systematically longer or more tool-heavy than train
    biases every evaluation run on it. All exact integers plus one
    rounded share per column; the split predicate is the same pure
    conv_id function prompt_contamination keys on.

    Output: one row per side — (split, n_convs, n_turns, n_tokens,
    assistant_share, tool_turn_share, mean_turns_per_conv).
    """
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(role).alias("r"),
        F.size(tokens_col(text)).cast("long").alias("ntok"),
        F.expr(
            f"case when cast(conv(substr(md5({conv}), 1, 8), 16, 10)"
            f" as bigint) % {int(mod)} = {int(eval_bucket)}"
            " then 'eval' else 'train' end"
        ).alias("split"),
    )
    return (
        t.groupBy("split")
        .agg(
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.count("*").cast("long").alias("n_turns"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("r") == "assistant", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_assistant"),
            F.sum(F.when(F.col("r") == "tool", 1).otherwise(0))
            .cast("long")
            .alias("n_tool"),
        )
        .select(
            "split",
            "n_convs",
            "n_turns",
            "n_tokens",
            F.expr("round(n_assistant * 1e0 / n_turns, 6)").alias(
                "assistant_share"
            ),
            F.expr("round(n_tool * 1e0 / n_turns, 6)").alias(
                "tool_turn_share"
            ),
            F.expr("round(n_turns * 1e0 / n_convs, 6)").alias(
                "mean_turns_per_conv"
            ),
        )
    )


def prompt_templates(
    transcripts: DataFrame,
    target_role: str = "user",
    min_uses: int = 2,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
) -> DataFrame:
    """Template mining — the synthetic-data forensics step one level
    above canned_responses: masking digit runs ('#') in the
    normalized text collapses parameterized generations ("tell me
    about org5" / "about org12") into their TEMPLATE, so template
    families with many distinct fillings surface even when no two
    turns are verbatim equal. `n_variants` separates true templates
    (many fillings) from plain canned repeats (one filling) — the
    former need slot-aware dedup caps, the latter the canned cap.

    One normalize-and-mask projection + one template rollup, all
    counts exact; the example is the deterministic min raw text.

    Output: (template, n_uses, n_convs, n_variants, example_text)
    for templates used >= min_uses times.
    """
    a = transcripts.filter(F.col(role) == target_role).select(
        F.col(conv).alias("conv_id"),
        F.col(text).alias("raw"),
        F.expr(
            f"regexp_replace(regexp_replace(lower(trim({text})),"
            " '\\\\s+', ' '), '[0-9]+', '#')"
        ).alias("template"),
        F.expr(
            f"md5(regexp_replace(lower(trim({text})), '\\\\s+', ' '))"
        ).alias("variant_hash"),
    )
    return (
        a.groupBy("template")
        .agg(
            F.count("*").cast("long").alias("n_uses"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.countDistinct("variant_hash")
            .cast("long")
            .alias("n_variants"),
            F.min("raw").alias("example_text"),
        )
        .filter(F.col("n_uses") >= int(min_uses))
    )


def context_budget_sweep(
    transcripts: DataFrame,
    budgets=(1024, 2048, 4096, 8192),
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text: str = "text",
) -> DataFrame:
    """Corpus-level context-policy sweep — the decision table behind
    choosing a max sequence length: for each candidate budget, how
    many conversations overflow it at all, how many TURNS sit past
    the overflow point (the tokens a hard truncation throws away),
    and the share of conversations that fit. One cumulative pass over
    per-conversation turn order (bounded partitions, shared with
    context_budget), every candidate evaluated simultaneously in one
    aggregate, stacked to rows (the watermark_drop_rates pattern).

    Output: (budget_tokens, n_convs, n_convs_over, n_turns_lost,
    fit_rate) — one row per candidate.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("ti")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = transcripts.select(
        F.col(conv).alias("conv_id"),
        F.col(turn).alias("ti"),
        F.size(tokens_col(text)).cast("long").alias("ntok"),
    ).withColumn("ctx", F.sum("ntok").over(w))
    aggs = [F.countDistinct("conv_id").cast("long").alias("n_convs")]
    for i, b in enumerate(budgets):
        b = int(b)
        aggs.append(
            F.countDistinct(
                F.when(F.col("ctx") > b, F.col("conv_id"))
            )
            .cast("long")
            .alias(f"c{i}")
        )
        aggs.append(
            F.sum(F.when(F.col("ctx") > b, 1).otherwise(0))
            .cast("long")
            .alias(f"t{i}")
        )
    wide = t.agg(*aggs)
    pairs = ", ".join(
        f"{int(b)}, c{i}, t{i}" for i, b in enumerate(budgets)
    )
    return wide.selectExpr(
        f"stack({len(budgets)}, {pairs})"
        " as (budget_tokens, n_convs_over, n_turns_lost)",
        "n_convs",
    ).select(
        "budget_tokens",
        "n_convs",
        "n_convs_over",
        "n_turns_lost",
        F.expr(
            "round((n_convs - n_convs_over) * 1e0 / n_convs, 6)"
        ).alias("fit_rate"),
    )


def transcripts_datasheet(
    transcripts: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    tool: str = "tool",
    ts: str = "ts",
) -> DataFrame:
    """The conversation-corpus dataset card — corpus_datasheet's
    transcript sibling, one row composing the conversation-QA legs
    this module ships (each individually oracle-gated):

      n_convs / n_turns / n_tokens      inventory
      mean_turns_per_conv               shape center
      clean_frac                        turn_order_audit pass rate
      alternation_violation_rate        violations per turn boundary
      near_dup_kept_frac                conversation_dedup survivors
      mixed_lang_frac                   code-switching share
      canned_assistant_frac             assistant turns whose text is
                                        a cross-conv template

    All counts exact; each fraction one division. Pure composition —
    five leg operators plus one inventory pass.

    Output: one row.
    """
    inv = transcripts.agg(
        F.countDistinct(F.col(conv)).cast("long").alias("n_convs"),
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.size(tokens_col(text))).cast("long").alias("n_tokens"),
    )
    cs = conversation_shape(
        transcripts, conv=conv, turn=turn, role=role, text=text,
        tool=tool, ts=ts,
    ).agg(
        F.sum("alternation_violations").cast("long").alias("n_viol"),
        F.sum(F.col("n_turns") - 1).cast("long").alias("n_bounds"),
    )
    toa = turn_order_audit(
        transcripts, conv=conv, turn=turn, ts=ts
    ).agg(
        F.sum(F.when(F.col("clean"), 1).otherwise(0))
        .cast("long")
        .alias("n_clean")
    )
    nd = conversation_dedup_canonical(
        transcripts, conv=conv, text=text
    ).agg(
        F.sum(F.when(F.col("is_kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept")
    )
    lm = conversation_language_mix(
        transcripts, conv=conv, text=text
    ).agg(
        F.sum(F.when(F.col("is_mixed"), 1).otherwise(0))
        .cast("long")
        .alias("n_mixed")
    )
    canned_hashes = canned_responses(
        transcripts, min_convs=2, conv=conv, role=role, text=text
    ).select("text_hash")
    a_turns = transcripts.filter(F.col(role) == "assistant").select(
        F.expr(
            f"md5(regexp_replace(lower(trim({text})), '\\\\s+', ' '))"
        ).alias("text_hash")
    )
    ca = (
        a_turns.join(canned_hashes, "text_hash", "left_semi")
        .agg(F.count("*").cast("long").alias("n_canned_turns"))
    )
    na = transcripts.filter(F.col(role) == "assistant").agg(
        F.count("*").cast("long").alias("n_assistant")
    )
    row = (
        inv.crossJoin(F.broadcast(cs))
        .crossJoin(F.broadcast(toa))
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(lm))
        .crossJoin(F.broadcast(ca))
        .crossJoin(F.broadcast(na))
    )
    return row.select(
        "n_convs",
        "n_turns",
        "n_tokens",
        F.expr("round(n_turns * 1e0 / n_convs, 6)").alias(
            "mean_turns_per_conv"
        ),
        F.expr("round(n_clean * 1e0 / n_convs, 6)").alias(
            "clean_frac"
        ),
        F.expr(
            "case when n_bounds = 0 then null else"
            " round(n_viol * 1e0 / n_bounds, 6) end"
        ).alias("alternation_violation_rate"),
        F.expr("round(n_kept * 1e0 / n_convs, 6)").alias(
            "near_dup_kept_frac"
        ),
        F.expr("round(n_mixed * 1e0 / n_convs, 6)").alias(
            "mixed_lang_frac"
        ),
        F.expr(
            "case when n_assistant = 0 then null else"
            " round(n_canned_turns * 1e0 / n_assistant, 6) end"
        ).alias("canned_assistant_frac"),
    )
