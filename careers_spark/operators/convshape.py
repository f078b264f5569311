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
