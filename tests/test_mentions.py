"""Automaton + mention-scan goldens (reference: phrase-trie round-trip
fixtures testDisambiguator.scala:276-314 and the sliding matcher
PhraseCount.scala:74-104)."""

import pandas as pd

from careers_spark import schema as S
from careers_spark.operators.mentions import TokenAhoCorasick, detect_mentions


def _ac(*surfaces):
    ac = TokenAhoCorasick()
    for s in surfaces:
        ac.add(s)
    return ac.build()


def test_single_word():
    ac = _ac("rice")
    assert ac.scan("i like rice a lot".split()) == [(2, 2, "rice")]


def test_multi_word_and_overlap():
    ac = _ac("covent garden", "garden party")
    toks = "at covent garden party tonight".split()
    assert sorted(ac.scan(toks)) == [(1, 2, "covent garden"), (2, 3, "garden party")]


def test_nested_phrases():
    ac = _ac("university of cambridge", "cambridge")
    toks = "she studied at university of cambridge".split()
    assert sorted(ac.scan(toks)) == [
        (3, 5, "university of cambridge"),
        (5, 5, "cambridge"),
    ]


def test_prefix_is_not_match():
    ac = _ac("new york city")
    assert ac.scan("i love new york".split()) == []


def test_repeated_hits():
    ac = _ac("rice")
    assert ac.scan("rice and more rice".split()) == [(0, 0, "rice"), (3, 3, "rice")]


def test_shared_suffix_via_fail_links():
    ac = _ac("barack hussein obama", "hussein obama", "obama")
    toks = "president barack hussein obama spoke".split()
    assert sorted(ac.scan(toks)) == [
        (1, 3, "barack hussein obama"),
        (2, 3, "hussein obama"),
        (3, 3, "obama"),
    ]


def test_detect_mentions_df(spark):
    transcripts = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1"],
                "turn_idx": pd.array([0, 1], dtype="int32"),
                "role": ["user", "assistant"],
                "text": ["tell me about Covent Garden", "no mentions here at all"],
                "tool": ["", ""],
                "ts": pd.to_datetime([0, 60], unit="s"),
            }
        ),
        schema=S.TRANSCRIPTS,
    )
    ac = _ac("covent garden")
    rows = detect_mentions(spark, transcripts, ac).collect()
    assert [(r.conv_id, r.turn_idx, r.start, r.end, r.surface) for r in rows] == [
        ("c1", 0, 3, 4, "covent garden")
    ]
