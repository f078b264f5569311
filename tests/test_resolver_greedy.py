"""Adversarial resolver cases where greedy elimination and fixed-round
rescoring genuinely disagree — the reference's pruneOutAlternatives loop
(AmbiguityForest.scala:912-981) is the spec, and these cases pin its
dynamics beyond the hand-mirrored shortPhrases KB:

  - elimination ORDER: a weakly-supported candidate is pruned while its
    competitor's support (from a peer that itself later dies) is still
    live — two-round rescoring, which re-scores only against round-1
    winners, picks the other topic;
  - chained down-weighting: anchor evidence at the end of an A-B-C
    ambiguity chain cascades through peer down-weighting
    (downWeightPeers, :220-250) until the whole right chain survives.

Pure-python: drives _resolve_conv directly (no SparkSession), the same
code the cogrouped stage executes per conversation.
"""

from careers_spark.operators.coherence import InternedContexts, _resolve_conv


def _run_case(ctx_map, mentions):
    """mentions: list of (turn, start, end, [(topic, prior), ...]).
    Returns the set of resolved topic names (link rows)."""
    ctx = InternedContexts(ctx_map)
    topics = sorted({t for m in mentions for t, _ in m[3]})
    tcode = {t: i for i, t in enumerate(topics)}
    rows = []
    for turn, s, e, cands in mentions:
        for t, p in cands:
            rows.append((turn, s, e, tcode[t], p))
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    turn_l = [r[0] for r in rows]
    start_l = [r[1] for r in rows]
    end_l = [r[2] for r in rows]
    topic_l = [r[3] for r in rows]
    prior_l = [float(r[4]) for r in rows]
    surf_l = [0] * len(rows)
    gid_l = [ctx.tid.get(topics[c], -1) for c in topic_l]

    out: list[tuple] = []
    _resolve_conv(
        "c", 0, len(rows), turn_l, start_l, end_l,
        surf_l, topic_l, gid_l, prior_l, {}, ctx, out,
    )
    return {topics[r[6]] for r in out if r[2] == "link"}


def test_elimination_order_beats_round_scoring():
    """b1 is globally weakest and is pruned while a2 (b2's supporter) is
    still alive, so B resolves to b2 — round-based rescoring against
    round-1 winners would resolve B to b1 because a2 loses round 1."""
    ctx_map = {
        "T:a1": {"T:e": 2.0, "T:b1": 0.1},
        "T:b2": {"T:a2": 1.0},
    }
    mentions = [
        (0, 0, 0, [("T:a1", 0.5), ("T:a2", 0.5)]),
        (0, 2, 2, [("T:b1", 0.5), ("T:b2", 0.5)]),
        (0, 4, 4, [("T:e", 1.0)]),  # anchor: a1's strong evidence
    ]
    # greedy (reference) trace: scores a1=1.025 a2=0.25 b1=0.025 b2=0.25
    # -> remove b1 -> B is b2; -> remove a2 -> A is a1
    assert _run_case(ctx_map, mentions) == {"T:a1", "T:b2", "T:e"}


def test_chain_cascade_downweighting():
    """A-B-C chained ambiguity with anchor evidence only at C: removing
    wrong-chain c2 collapses b2's support, removing b2 collapses a2's —
    the cascade resolves the WHOLE right chain. Topic names are chosen
    so the deterministic tie-break (remove the larger code) prunes the
    wrong chain end-first."""
    ctx_map = {
        "T:c-c1": {"T:d": 3.0},
        "T:b-b1": {"T:c-c1": 1.0},
        "T:a-a1": {"T:b-b1": 1.0},
        "T:y-b2": {"T:z-c2": 1.0},
        "T:x-a2": {"T:y-b2": 1.0},
    }
    mentions = [
        (0, 0, 0, [("T:a-a1", 0.5), ("T:x-a2", 0.5)]),
        (0, 2, 2, [("T:b-b1", 0.5), ("T:y-b2", 0.5)]),
        (0, 4, 4, [("T:c-c1", 0.5), ("T:z-c2", 0.5)]),
        (0, 6, 6, [("T:d", 1.0)]),  # anchor pulls c1
    ]
    assert _run_case(ctx_map, mentions) == {
        "T:a-a1", "T:b-b1", "T:c-c1", "T:d"
    }


def test_last_candidate_guard():
    """removeTopic's last-candidate guard (AmbiguityForest.scala:207-217):
    a mention's only candidate survives no matter how low its score."""
    ctx_map = {"T:strong": {"T:anchor": 5.0}}
    mentions = [
        (0, 0, 0, [("T:lonely", 0.01)]),  # zero support, sole candidate
        (0, 2, 2, [("T:strong", 0.9), ("T:weak", 0.1)]),
        (0, 4, 4, [("T:anchor", 1.0)]),
    ]
    assert _run_case(ctx_map, mentions) == {"T:lonely", "T:strong", "T:anchor"}
