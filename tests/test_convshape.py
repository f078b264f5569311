"""conversation_shape — constructed-transcript goldens."""

import datetime

import pytest


def _tr(spark, rows):
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    data = [
        (c, i, r, t, tool, base + datetime.timedelta(minutes=i))
        for (c, i, r, t, tool) in rows
    ]
    return spark.createDataFrame(
        data,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def test_shape_well_formed_conversation(spark):
    from careers_spark.operators.convshape import conversation_shape

    rows = [
        ("c1", 0, "user", "hello there my friend", ""),
        ("c1", 1, "assistant", "hi", ""),
        ("c1", 2, "user", "tell me about spark joins", ""),
        ("c1", 3, "tool", "search results follow", "search"),
        ("c1", 4, "assistant", "spark supports broadcast joins", ""),
    ]
    out = conversation_shape(_tr(spark, rows)).collect()[0]
    assert out["n_turns"] == 5
    assert out["n_user"] == 2 and out["n_assistant"] == 2
    assert out["n_tool"] == 1 and out["tool_rate"] == 0.2
    assert out["alternation_violations"] == 0
    assert out["user_tokens"] == 4 + 5
    assert out["assistant_tokens"] == 1 + 4
    assert out["verbosity_ratio"] == round(9 / 5, 6)
    assert out["duration_s"] == 4 * 60


def test_shape_alternation_violations_counted(spark):
    """Three consecutive assistant turns = two violating boundaries;
    first turn never violates (no predecessor)."""
    from careers_spark.operators.convshape import conversation_shape

    rows = [
        ("c2", 0, "assistant", "a", ""),
        ("c2", 1, "assistant", "b", ""),
        ("c2", 2, "assistant", "c", ""),
        ("c2", 3, "user", "d", ""),
        ("c2", 4, "user", "e", ""),
    ]
    out = conversation_shape(_tr(spark, rows)).collect()[0]
    assert out["alternation_violations"] == 3


def test_shape_no_assistant_null_ratio(spark):
    """A user monologue has no assistant tokens: the verbosity ratio
    is NULL (a surfaced defect), not a default."""
    from careers_spark.operators.convshape import conversation_shape

    rows = [("c3", 0, "user", "talking to myself", "")]
    out = conversation_shape(_tr(spark, rows)).collect()[0]
    assert out["verbosity_ratio"] is None
    assert out["n_assistant"] == 0 and out["duration_s"] == 0


def test_shape_per_conversation_isolation(spark):
    """Violations never leak across conversations even when global
    turn order interleaves them."""
    from careers_spark.operators.convshape import conversation_shape

    rows = [
        ("a", 0, "user", "x", ""),
        ("b", 0, "user", "y", ""),
        ("a", 1, "assistant", "x", ""),
        ("b", 1, "user", "y", ""),  # the only violation, in b
    ]
    out = {
        r["conv_id"]: r
        for r in conversation_shape(_tr(spark, rows)).collect()
    }
    assert out["a"]["alternation_violations"] == 0
    assert out["b"]["alternation_violations"] == 1


def test_tool_grounding_golden(spark):
    from careers_spark.operators.convshape import tool_grounding

    rows = [
        # grounded: assistant reuses 'broadcast' and 'joins'
        ("g", 0, "user", "how fast are joins", ""),
        ("g", 1, "tool", "broadcast joins beat shuffle joins", "search"),
        ("g", 2, "assistant", "use broadcast joins here", ""),
        # ungrounded: assistant ignores the tool output entirely
        ("u", 0, "tool", "quantum flux capacitor readings", "probe"),
        ("u", 1, "assistant", "the weather is nice today", ""),
        # dangling: tool turn never followed by an assistant
        ("d", 0, "tool", "orphan output", "search"),
        ("d", 1, "user", "hello?", ""),
        # assistant BEFORE the tool must not count as its follower
        ("p", 0, "assistant", "early reply", ""),
        ("p", 1, "tool", "late output", "search"),
    ]
    out = {
        r["conv_id"]: r
        for r in tool_grounding(_tr(spark, rows)).collect()
    }
    assert out["g"]["grounded"] is True and out["g"]["n_overlap"] == 2
    assert out["g"]["assistant_turn"] == 2
    assert out["u"]["grounded"] is False and out["u"]["n_overlap"] == 0
    assert out["d"]["assistant_turn"] is None
    assert out["d"]["grounded"] is False
    assert out["p"]["assistant_turn"] is None  # only earlier assistant


def test_response_latency_golden(spark):
    """Two answered user turns (60 s and 120 s waits — the assistant
    two minutes later skips an intervening tool turn) and one dangling
    user turn; p50 = 60, p90 = max = 120."""
    from careers_spark.operators.convshape import response_latency

    rows = [
        ("c", 0, "user", "q1", ""),
        ("c", 1, "assistant", "a1", ""),
        ("c", 2, "user", "q2", ""),
        ("c", 3, "tool", "t", "search"),
        ("c", 4, "assistant", "a2", ""),
        ("c", 5, "user", "q3 never answered", ""),
    ]
    out = response_latency(_tr(spark, rows)).collect()[0]
    assert out["n_user_turns"] == 3
    assert out["n_answered"] == 2 and out["n_dangling"] == 1
    assert out["p50_s"] == 60
    assert out["p90_s"] == 120 and out["max_s"] == 120


def test_context_budget_golden(spark):
    """Turn tokens 4/3/5: contexts 4, 7, 12. Budget 6 -> first over at
    turn 1, two turns over, attention cost 4+7+12 = 23."""
    from careers_spark.operators.convshape import context_budget

    rows = [
        ("c", 0, "user", "one two three four", ""),
        ("c", 1, "assistant", "five six seven", ""),
        ("c", 2, "user", "eight nine ten eleven twelve", ""),
    ]
    out = context_budget(_tr(spark, rows), budget_tokens=6).collect()[0]
    assert out["total_tokens"] == 12
    assert out["first_turn_over"] == 1
    assert out["n_turns_over"] == 2
    assert out["attention_cost"] == 4 + 7 + 12
    # a generous budget never triggers
    out2 = context_budget(_tr(spark, rows), budget_tokens=100).collect()[0]
    assert out2["first_turn_over"] is None and out2["n_turns_over"] == 0


def test_assistant_repetition_golden(spark):
    """A loop conversation repeats one reply three times (max_burst 3,
    2 repeated turns); whitespace/case variants normalize together;
    an assistant-free conversation emits zeros."""
    from careers_spark.operators.convshape import assistant_repetition

    rows = [
        ("loop", 0, "user", "q", ""),
        ("loop", 1, "assistant", "I cannot do that", ""),
        ("loop", 2, "assistant", "i cannot   do that", ""),
        ("loop", 3, "assistant", " I CANNOT DO THAT ", ""),
        ("loop", 4, "assistant", "something new", ""),
        ("mono", 0, "user", "anyone there", ""),
    ]
    out = {
        r["conv_id"]: r
        for r in assistant_repetition(_tr(spark, rows)).collect()
    }
    lp = out["loop"]
    assert lp["n_assistant"] == 4 and lp["n_distinct"] == 2
    assert lp["n_repeated_turns"] == 2 and lp["max_burst"] == 3
    mo = out["mono"]
    assert mo["n_assistant"] == 0 and mo["max_burst"] == 0


def test_turn_order_audit_golden(spark):
    """One clean conversation; one with a duplicated index, a gap, and
    a timestamp inversion — each counter fires independently."""
    import datetime

    from careers_spark.operators.convshape import turn_order_audit

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def at(m):
        return base + datetime.timedelta(minutes=m)

    rows = [
        ("ok", 0, "user", "a", "", at(0)),
        ("ok", 1, "assistant", "b", "", at(1)),
        # bad: idx 0, 0 (dup), 3 (gap of 1->2), ts goes BACKWARD at 3
        ("bad", 0, "user", "a", "", at(0)),
        ("bad", 0, "user", "a2", "", at(1)),
        ("bad", 3, "assistant", "b", "", at(0)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in turn_order_audit(df).collect()}
    assert out["ok"]["clean"] is True
    bad = out["bad"]
    assert bad["n_dup_idx"] == 1
    assert bad["n_gaps"] == 2  # indices {0, 3}: 1 and 2 missing
    assert bad["n_ts_inversions"] == 1
    assert bad["clean"] is False


def test_canned_responses_golden(spark):
    """A reply appearing in 3 conversations is flagged; the
    within-conversation repeat alone (1 conv) is not."""
    from careers_spark.operators.convshape import canned_responses

    rows = [
        ("a", 0, "assistant", "I cannot help with that", ""),
        ("b", 0, "assistant", "i cannot   help with that", ""),
        ("c", 0, "assistant", "I CANNOT HELP WITH THAT", ""),
        ("d", 0, "assistant", "unique reply", ""),
        ("d", 1, "assistant", "unique reply", ""),  # 1 conv only
    ]
    out = canned_responses(_tr(spark, rows), min_convs=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_convs"] == 3 and r["n_turns"] == 3
    assert r["example_text"] == "I CANNOT HELP WITH THAT"  # min by raw


# ---------------------------------------------------------------------------
def test_turn_cohesion_golden(spark):
    from careers_spark.operators.convshape import turn_cohesion

    df = spark.createDataFrame(
        [
            ("c", 0, "user", "spark engine question"),
            ("c", 1, "assistant", "spark engine answer"),
            ("c", 2, "user", "totally different topic"),
            ("d", 0, "user", "lonely"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        (r.conv_id, r.turn_idx): r for r in turn_cohesion(df).collect()
    }
    # pairs never cross conversations; a single-turn conv emits none
    assert set(out) == {("c", 0), ("c", 1)}
    r0 = out[("c", 0)]
    # {spark,engine,question} vs {spark,engine,answer}: 2/4
    assert (r0.inter_tokens, r0.union_tokens) == (2, 4)
    assert r0.jaccard == 0.5 and r0.is_boundary is False
    r1 = out[("c", 1)]
    # zero overlap -> boundary
    assert r1.inter_tokens == 0 and r1.is_boundary is True


def test_turn_cohesion_threshold_is_strict(spark):
    from careers_spark.operators.convshape import turn_cohesion

    df = spark.createDataFrame(
        [("c", 0, "u", "a b c d e"), ("c", 1, "a", "a f g h")],
        "conv_id string, turn_idx int, role string, text string",
    )
    # inter=1 union=8 -> jaccard=0.125; at 1/8 the cross-multiplied
    # comparison 1*8 < 8*1 is FALSE (strict) -> not a boundary
    (r,) = turn_cohesion(
        df, threshold_num=1, threshold_den=8
    ).collect()
    assert (r.inter_tokens, r.union_tokens) == (1, 8)
    assert r.is_boundary is False
    (r,) = turn_cohesion(
        df, threshold_num=1, threshold_den=5
    ).collect()
    assert r.is_boundary is True


def test_turn_cohesion_empty_union_null(spark):
    from careers_spark.operators.convshape import turn_cohesion

    df = spark.createDataFrame(
        [("c", 0, "u", "..."), ("c", 1, "a", "!!!")],
        "conv_id string, turn_idx int, role string, text string",
    )
    (r,) = turn_cohesion(df).collect()
    assert r.union_tokens == 0
    assert r.jaccard is None and r.is_boundary is None


def test_tool_usage_profile_rollup(spark):
    from careers_spark.operators.convshape import tool_usage_profile

    df = spark.createDataFrame(
        [
            # search: grounded call in c1, ignored call in c2
            ("c1", 0, "user", "find spark docs", ""),
            ("c1", 1, "tool", "spark docs url result", "search"),
            ("c1", 2, "assistant", "the spark docs say", ""),
            ("c2", 0, "tool", "alpha beta", "search"),
            ("c2", 1, "assistant", "unrelated reply", ""),
            # calc: dangling call (no assistant after)
            ("c3", 0, "user", "compute", ""),
            ("c3", 1, "tool", "42", "calc"),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string",
    )
    out = {r.tool_name: r for r in tool_usage_profile(df).collect()}
    s = out["search"]
    assert (s.n_calls, s.n_convs) == (2, 2)
    assert (s.n_grounded, s.n_dangling) == (1, 0)
    assert s.grounded_rate == 0.5
    c = out["calc"]
    assert (c.n_calls, c.n_grounded, c.n_dangling) == (1, 0, 1)
    assert c.grounded_rate is None


# ---------------------------------------------------------------------------
def _conv_rows(texts_by_conv):
    rows = []
    for cid, texts in texts_by_conv.items():
        for i, tx in enumerate(texts):
            rows.append((cid, i, "user" if i % 2 == 0 else "assistant", tx))
    return rows


def test_conv_near_dups_golden_and_threshold(spark):
    from careers_spark.operators.convshape import conversation_near_dups

    df = spark.createDataFrame(
        _conv_rows(
            {
                # c1/c2 share 2 of 3 distinct trigram shingles
                "c1": ["alpha beta gamma delta"],
                "c2": ["alpha beta gamma epsilon"],
                "c3": ["totally different words here"],
            }
        ),
        "conv_id string, turn_idx int, role string, text string",
    )
    # c1 shingles: {abg, bgd}; c2: {abg, bge}; inter=1, union=3 -> 1/3
    out = conversation_near_dups(
        df, threshold_num=1, threshold_den=3
    ).collect()
    assert len(out) == 1
    (r,) = out
    assert (r.conv_a, r.conv_b) == ("c1", "c2")
    assert (r.inter_shingles, r.n_sh_a, r.n_sh_b) == (1, 2, 2)
    assert r.jaccard == round(1 / 3, 6)
    # inclusive threshold: exactly 1/3 kept; 1/2 drops it
    assert (
        conversation_near_dups(
            df, threshold_num=1, threshold_den=2
        ).count()
        == 0
    )


def test_conv_near_dups_shingles_stay_within_turns(spark):
    from careers_spark.operators.convshape import conversation_near_dups

    # same words, but split so no turn has 3 tokens -> no shingles at
    # all -> no pairs
    df = spark.createDataFrame(
        _conv_rows(
            {
                "c1": ["alpha beta", "gamma delta"],
                "c2": ["alpha beta", "gamma delta"],
            }
        ),
        "conv_id string, turn_idx int, role string, text string",
    )
    assert conversation_near_dups(df).count() == 0


def test_conv_dedup_canonical_transitive_chain(spark):
    from careers_spark.operators.convshape import (
        conversation_dedup_canonical,
    )

    # a~b and b~c at >= 1/2, but a~c only ~1/3: the cluster must merge
    # through the chain.  Shingle sets:
    #   a: {w x y, x y z}        b: {w x y, x y z, p q r}
    #   c: {p q r, x y z}  -> j(a,b)=2/3, j(b,c)=2/3, j(a,c)=1/3
    df = spark.createDataFrame(
        _conv_rows(
            {
                "a": ["w x y z"],
                "b": ["w x y z", "p q r"],
                "c": ["p q r", "x y z"],
                "lone": ["nothing shared at all"],
            }
        ),
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        r.conv_id: r
        for r in conversation_dedup_canonical(
            df, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert out["a"].canonical_id == "a" and out["a"].is_kept
    assert out["b"].canonical_id == "a" and not out["b"].is_kept
    assert out["c"].canonical_id == "a" and not out["c"].is_kept
    assert out["lone"].canonical_id == "lone" and out["lone"].is_kept


def test_role_transitions_golden(spark):
    from careers_spark.operators.convshape import role_transitions

    df = spark.createDataFrame(
        [
            ("c1", 0, "user"), ("c1", 1, "assistant"),
            ("c1", 2, "user"), ("c1", 3, "assistant"),
            ("c2", 0, "user"), ("c2", 1, "tool"),
            ("c2", 2, "assistant"),
        ],
        "conv_id string, turn_idx int, role string",
    )
    out = {
        (r.from_role, r.to_role): r
        for r in role_transitions(df).collect()
    }
    assert out[("<start>", "user")].n == 2
    assert out[("user", "assistant")].n == 2
    assert out[("user", "tool")].n == 1
    assert out[("tool", "assistant")].n == 1
    assert out[("assistant", "<end>")].n == 2
    assert out[("assistant", "user")].n == 1
    # per-source normalization: user rows 2/3 and 1/3
    assert out[("user", "assistant")].share == round(2 / 3, 6)
    assert out[("user", "tool")].share == round(1 / 3, 6)
    # every from_role's shares sum to ~1
    from collections import defaultdict

    sums = defaultdict(float)
    for (fr, _), r in out.items():
        sums[fr] += r.share
    for v in sums.values():
        assert abs(v - 1.0) < 1e-5


def test_conversation_language_mix(spark):
    from careers_spark.operators.convshape import (
        conversation_language_mix,
    )

    df = spark.createDataFrame(
        [
            # c1: two en turns, one es turn -> mixed, main en
            ("c1", 0, "user", "the and of this that"),
            ("c1", 1, "assistant", "the with for are was"),
            ("c1", 2, "user", "el la los una para"),
            # c2: all und (no function words)
            ("c2", 0, "user", "zzz qqq xxx"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        r.conv_id: r
        for r in conversation_language_mix(df).collect()
    }
    r1 = out["c1"]
    assert (r1.n_turns, r1.n_und_turns, r1.n_langs) == (3, 0, 2)
    assert r1.main_lang == "en" and r1.is_mixed is True
    assert r1.main_share == round(2 / 3, 6)
    r2 = out["c2"]
    assert (r2.n_langs, r2.main_lang) == (0, "und")
    assert r2.is_mixed is False and r2.main_share == 1.0


def test_language_mix_tie_break_deterministic(spark):
    from careers_spark.operators.convshape import (
        conversation_language_mix,
    )

    # one de turn, one en turn: tie on count -> lexicographically
    # smaller lang wins ('de' < 'en')
    df = spark.createDataFrame(
        [
            ("c", 0, "user", "der und die das ist"),
            ("c", 1, "assistant", "the with for are was"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    (r,) = conversation_language_mix(df).collect()
    assert r.main_lang == "de" and r.n_langs == 2


def test_canned_user_prompts_role_param(spark):
    from careers_spark.operators.convshape import canned_responses

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "tell me about X"),
            ("c2", 0, "user", "Tell  me about x"),
            ("c1", 1, "assistant", "X is a thing"),
            ("c2", 1, "assistant", "X is a thing"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    u = canned_responses(df, target_role="user").collect()
    assert len(u) == 1 and u[0].n_convs == 2
    # normalization folds case/whitespace
    a = canned_responses(df).collect()
    assert len(a) == 1 and a[0].example_text == "X is a thing"


def test_conversation_forks_golden(spark):
    from careers_spark.operators.convshape import conversation_forks

    df = spark.createDataFrame(
        [
            # c1/c2 share the first two normalized turns (case and
            # spacing differ); c3 diverges at turn 1; c4 is short
            ("c1", 0, "user", "hello there"),
            ("c1", 1, "assistant", "hi how can I help"),
            ("c1", 2, "user", "branch one"),
            ("c2", 0, "user", "Hello   THERE"),
            ("c2", 1, "assistant", "hi how can i help"),
            ("c2", 2, "user", "branch two"),
            ("c3", 0, "user", "hello there"),
            ("c3", 1, "assistant", "different opening"),
            ("c4", 0, "user", "lonely start"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = conversation_forks(df, k=2).collect()
    assert len(out) == 1
    (g,) = out
    assert g.n_convs == 2 and g.conv_ids == "c1|c2"


def test_conversation_forks_k_sensitivity(spark):
    from careers_spark.operators.convshape import conversation_forks

    df = spark.createDataFrame(
        [
            ("a", 0, "user", "same start"),
            ("a", 1, "assistant", "diverges here"),
            ("b", 0, "user", "same start"),
            ("b", 1, "assistant", "elsewhere"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    assert conversation_forks(df, k=1).count() == 1
    assert conversation_forks(df, k=2).count() == 0


def test_assistant_length_trend(spark):
    from careers_spark.operators.convshape import assistant_length_trend

    df = spark.createDataFrame(
        [
            # c1: tokens 6, 4, 2 at turns 1, 3, 5 -> slope = -1
            ("c1", 1, "assistant", "a b c d e f"),
            ("c1", 2, "user", "ignored entirely"),
            ("c1", 3, "assistant", "a b c d"),
            ("c1", 5, "assistant", "a b"),
            # c2: single assistant turn -> NULL slope
            ("c2", 0, "assistant", "one turn"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        r.conv_id: r for r in assistant_length_trend(df).collect()
    }
    r1 = out["c1"]
    assert r1.n_assistant == 3
    assert r1.mean_tokens == 4.0
    assert r1.slope == -1.0
    r2 = out["c2"]
    assert r2.n_assistant == 1 and r2.slope is None


def test_sft_pairs_extraction(spark):
    from careers_spark.operators.convshape import sft_pairs

    df = spark.createDataFrame(
        [
            ("c", 0, "user", "what is spark"),
            ("c", 1, "tool", "tool output here", ),
            ("c", 2, "assistant", "spark is an engine"),
            ("c", 3, "user", "thanks bye"),
            # no assistant after turn 3 -> dangling pair
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        (r.conv_id, r.user_turn): r for r in sft_pairs(df).collect()
    }
    p0 = out[("c", 0)]
    # pairs past the tool turn to the first assistant
    assert p0.assistant_turn == 2
    assert (p0.prompt_tokens, p0.response_tokens) == (3, 4)
    assert p0.response_hash is not None
    p3 = out[("c", 3)]
    assert p3.assistant_turn is None
    assert p3.response_tokens is None and p3.response_hash is None


def test_sft_pairs_each_user_gets_nearest_assistant(spark):
    from careers_spark.operators.convshape import sft_pairs

    df = spark.createDataFrame(
        [
            ("c", 0, "user", "q one"),
            ("c", 1, "assistant", "a one"),
            ("c", 2, "user", "q two"),
            ("c", 3, "assistant", "a two"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        (r.conv_id, r.user_turn): r.assistant_turn
        for r in sft_pairs(df).collect()
    }
    assert out == {("c", 0): 1, ("c", 2): 3}


def test_turn_novelty_curve(spark):
    from careers_spark.operators.convshape import turn_novelty

    df = spark.createDataFrame(
        [
            ("c", 0, "user", "alpha beta alpha"),
            ("c", 1, "assistant", "beta gamma"),
            ("c", 2, "user", "alpha beta gamma"),
            ("c", 3, "user", "..."),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        (r.conv_id, r.turn_idx): r for r in turn_novelty(df).collect()
    }
    r0 = out[("c", 0)]
    assert (r0.n_distinct_tokens, r0.n_new_tokens) == (2, 2)
    assert r0.novelty == 1.0
    r1 = out[("c", 1)]  # beta seen, gamma new
    assert (r1.n_distinct_tokens, r1.n_new_tokens) == (2, 1)
    assert r1.novelty == 0.5
    r2 = out[("c", 2)]  # nothing new
    assert (r2.n_new_tokens, r2.novelty) == (0, 0.0)
    r3 = out[("c", 3)]  # tokenless turn surfaces NULL
    assert r3.n_distinct_tokens == 0 and r3.novelty is None


def test_curated_sft_pairs_composition(spark):
    from datetime import datetime

    from careers_spark.operators.convshape import (
        canned_responses,
        conversation_dedup_canonical,
        curated_sft_pairs,
        sft_pairs,
        turn_order_audit,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def turn(c, i, r, tx, ts_off=0):
        from datetime import timedelta

        return (c, i, r, tx, "", t0 + timedelta(seconds=i * 10 + ts_off))

    rows = [
        # good conversation: trainable, clean, unique
        turn("good", 0, "user", "alpha beta gamma question here"),
        turn("good", 1, "assistant", "a unique detailed answer body"),
        # near-dup twins: same trigram content -> one kept
        turn("dupA", 0, "user", "one two three four five six"),
        turn("dupA", 1, "assistant", "seven eight nine ten eleven"),
        turn("dupB", 0, "user", "one two three four five six"),
        turn("dupB", 1, "assistant", "seven eight nine ten twelve"),
        # dirty conversation: duplicated turn index
        turn("dirty", 0, "user", "dup idx question words here"),
        turn("dirty", 0, "assistant", "some answer to that words"),
        # canned: same assistant text in two conversations
        turn("cA", 0, "user", "unrelated question text one"),
        turn("cA", 1, "assistant", "i can help with that"),
        turn("cB", 0, "user", "unrelated question text two"),
        turn("cB", 1, "assistant", "I  can help with THAT"),
        # dangling user turn
        turn("dang", 0, "user", "never answered prompt words"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = curated_sft_pairs(df).collect()
    by = {(r.conv_id, r.user_turn): r for r in out}

    g = by[("good", 0)]
    assert g.selected is True

    # exactly one of the dup twins is selected (the kept one)
    dup_sel = [
        r.selected for k, r in by.items() if k[0] in ("dupA", "dupB")
    ]
    assert sorted(dup_sel) == [False, True]

    d = by[("dirty", 0)]
    assert d.conv_clean is False and d.selected is False

    for c in ("cA", "cB"):
        r = by[(c, 0)]
        assert r.not_canned is False and r.selected is False

    dg = by[("dang", 0)]
    assert dg.has_response is False
    assert dg.not_canned is False and dg.selected is False

    # the conjunction equals the independently computed legs
    pairs = {
        (r.conv_id, r.user_turn): r for r in sft_pairs(df).collect()
    }
    kept = {
        r.conv_id: r.is_kept
        for r in conversation_dedup_canonical(df).collect()
    }
    clean = {
        r.conv_id: r.clean for r in turn_order_audit(df).collect()
    }
    canned_hashes = {
        r.text_hash for r in canned_responses(df).collect()
    }
    for k, r in by.items():
        p = pairs[k]
        want = (
            p.assistant_turn is not None
            and kept[k[0]]
            and clean[k[0]]
            and p.response_hash is not None
            and p.response_hash not in canned_hashes
        )
        assert r.selected is want, k


def test_prompt_contamination_and_split_stability(spark):
    from careers_spark.operators.convshape import prompt_contamination

    # force the split with known conv ids by scanning buckets
    import hashlib

    def bucket(cid, mod=5):
        return int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % mod

    ev = next(c for c in (f"c{i}" for i in range(50)) if bucket(c) == 0)
    tr1 = next(c for c in (f"c{i}" for i in range(50)) if bucket(c) != 0)
    tr2 = next(
        c
        for c in (f"c{i}" for i in range(50))
        if bucket(c) != 0 and c != tr1
    )
    rows = [
        (ev, 0, "user", "shared leaked prompt"),
        (tr1, 0, "user", "Shared   LEAKED prompt"),
        (tr2, 0, "user", "shared leaked prompt"),
        (ev, 2, "user", "eval only question"),
        (tr1, 2, "user", "train only question"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = prompt_contamination(df).collect()
    assert len(out) == 1
    (r,) = out
    assert r.n_eval_convs == 1 and r.n_train_convs == 2
    # growing the corpus never flips membership of existing convs
    out2 = prompt_contamination(
        df.union(
            spark.createDataFrame(
                [("zz_new", 0, "user", "whatever text")],
                df.schema,
            )
        )
    ).collect()
    assert len(out2) == 1 and out2[0].prompt_hash == r.prompt_hash


def test_split_balance_report(spark):
    from careers_spark.operators.convshape import split_balance_report

    rows = []
    for i in range(40):
        c = f"k{i}"
        rows += [
            (c, 0, "user", "one two three"),
            (c, 1, "assistant", "four five"),
        ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {r.split: r for r in split_balance_report(df).collect()}
    assert set(out) == {"eval", "train"}
    tot_convs = out["eval"].n_convs + out["train"].n_convs
    assert tot_convs == 40
    for side in out.values():
        assert side.n_turns == 2 * side.n_convs
        assert side.assistant_share == 0.5
        assert side.mean_turns_per_conv == 2.0
        assert side.n_tokens == 5 * side.n_convs


def test_prompt_templates_mining(spark):
    from careers_spark.operators.convshape import prompt_templates

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "tell me about org5 please"),
            ("c2", 0, "user", "Tell me about org12   please"),
            ("c3", 0, "user", "tell me about org5 please"),
            ("c4", 0, "user", "completely unique prompt"),
            ("c5", 0, "assistant", "tell me about org9 please"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = prompt_templates(df).collect()
    assert len(out) == 1
    (r,) = out
    assert r.template == "tell me about org# please"
    # 3 uses across 3 convs, but only 2 distinct fillings
    assert (r.n_uses, r.n_convs, r.n_variants) == (3, 3, 2)
    # assistant turns never leak into the user mining
    assert "org9" not in r.example_text


def test_context_budget_sweep(spark):
    from careers_spark.operators.convshape import context_budget_sweep

    df = spark.createDataFrame(
        [
            # conv a: cumulative 3, 6, 9 tokens
            ("a", 0, "u", "x y z"), ("a", 1, "b", "x y z"),
            ("a", 2, "u", "x y z"),
            # conv b: cumulative 2, 4
            ("b", 0, "u", "x y"), ("b", 1, "b", "x y"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        r.budget_tokens: r
        for r in context_budget_sweep(df, budgets=(4, 8, 20)).collect()
    }
    r4 = out[4]
    # a overflows at turn 1 (ctx 6) and 2 (ctx 9): 2 turns lost;
    # b never overflows 4 (max ctx 4 is NOT > 4)
    assert (r4.n_convs, r4.n_convs_over, r4.n_turns_lost) == (2, 1, 2)
    assert r4.fit_rate == 0.5
    r8 = out[8]
    assert (r8.n_convs_over, r8.n_turns_lost) == (1, 1)
    r20 = out[20]
    assert (r20.n_convs_over, r20.n_turns_lost) == (0, 0)
    assert r20.fit_rate == 1.0


def test_frame_budget_allocation(spark):
    from careers_spark.operators.multimodal import (
        frame_budget_allocation,
    )

    rows = [
        ("v1", "video", {"duration_ms": 5000}),
        ("v2", "video", {"duration_ms": 3000}),
        ("v3", "video", {"duration_ms": 2001}),
        ("img", "image", {"duration_ms": 0}),
    ]
    df = spark.createDataFrame(
        rows,
        "asset_id string, kind string,"
        " meta struct<duration_ms: long>",
    )
    out = {
        r.asset_id: r
        for r in frame_budget_allocation(df, total_frames=100).collect()
    }
    assert "img" not in out  # images take no frame budget
    assert sum(r.n_frames for r in out.values()) == 100
    # python Hamilton recompute
    durs = {"v1": 5000, "v2": 3000, "v3": 2001}
    tot = sum(durs.values())
    base = {k: (100 * d) // tot for k, d in durs.items()}
    rem = {k: (100 * d) % tot for k, d in durs.items()}
    left = 100 - sum(base.values())
    order = sorted(durs, key=lambda k: (-rem[k], k))
    want = {
        k: base[k] + (1 if i < left else 0)
        for i, k in enumerate(order)
    }
    for k in durs:
        assert out[k].n_frames == want[k], k
    # longer videos never get fewer frames
    assert out["v1"].n_frames >= out["v2"].n_frames >= out["v3"].n_frames


def test_corpus_datasheet_legs_agree(spark):
    from careers_spark.operators.dedup import (
        dedup_exact,
        near_dup_canonical,
    )
    from careers_spark.operators.profiling import corpus_datasheet

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (r,) = corpus_datasheet(df).collect()
    n = df.count()
    assert r.n_docs == n
    # leg-wise recomputation of two fractions
    n_hashes = dedup_exact(df).count()
    assert r.exact_dup_frac == round((n - n_hashes) / n, 6)
    n_kept = near_dup_canonical(df).filter("is_kept").count()
    assert r.near_dup_kept_frac == round(n_kept / n, 6)
    # fractions are fractions
    for c in (
        "exact_dup_frac",
        "near_dup_kept_frac",
        "gopher_keep_frac",
        "contaminated_frac",
        "pii_clean_frac",
    ):
        assert 0.0 <= getattr(r, c) <= 1.0
    assert 0.0 <= r.mean_quality <= 1.0


def test_transcripts_datasheet_legs_agree(spark):
    from datetime import datetime, timedelta

    from careers_spark.operators.convshape import (
        conversation_dedup_canonical,
        transcripts_datasheet,
        turn_order_audit,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    # clean well-formed conversation
    rows += [
        ("c1", 0, "user", "alpha beta gamma delta", "", t0),
        ("c1", 1, "assistant", "unique reply one here", "",
         t0 + timedelta(seconds=5)),
    ]
    # dirty conversation (duplicate turn index) + alternation violation
    rows += [
        ("c2", 0, "user", "one two three four", "", t0),
        ("c2", 0, "user", "five six seven eight", "", t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    (r,) = transcripts_datasheet(df).collect()
    assert (r.n_convs, r.n_turns) == (2, 4)
    assert r.mean_turns_per_conv == 2.0
    n_clean = turn_order_audit(df).filter("clean").count()
    assert r.clean_frac == round(n_clean / 2, 6)
    n_kept = conversation_dedup_canonical(df).filter("is_kept").count()
    assert r.near_dup_kept_frac == round(n_kept / 2, 6)
    # c2's same-role boundary is the 1 violation over 2 boundaries
    assert r.alternation_violation_rate == 0.5
    assert r.mixed_lang_frac in (0.0, 0.5, 1.0)
