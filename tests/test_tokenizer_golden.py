"""Goldens for tokenizer.bpe_pair_counts and the dedup survivorship
operators (golden_records, cluster_size_histogram)."""

import pytest

from careers_spark.operators.dedup import (
    cluster_size_histogram,
    golden_records,
)
from careers_spark.operators.tokenizer import bpe_pair_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_pair_counts_hand_golden(spark):
    # vocabulary: aa (freq 2), b (freq 1), ab (freq 1)
    # syms: aa_  -> pairs aa, a_ ; b_ -> b_ ; ab_ -> ab, b_
    # counts: aa=2, a_=2, b_=1+1=2, ab=1
    df = _docs(spark, ["aa aa b", "ab"])
    got = {
        r["pair"]: (r["pair_count"], r["n_words"])
        for r in bpe_pair_counts(df, min_count=1).collect()
    }
    assert got == {
        "aa": (2, 1),
        "a_": (2, 1),
        "b_": (2, 2),
        "ab": (1, 1),
    }


def test_bpe_repeated_pair_counts_every_position(spark):
    # 'aaa' appears 3 times: sym aaa_ has pair 'aa' at positions 1 AND 2
    # -> pair_count 2 * 3 = 6, but n_words is still 1.
    df = _docs(spark, ["aaa aaa", "aaa"])
    got = {
        r["pair"]: (r["pair_count"], r["n_words"])
        for r in bpe_pair_counts(df, min_count=1).collect()
    }
    assert got["aa"] == (6, 1)
    assert got["a_"] == (3, 1)


def test_bpe_min_count_filters(spark):
    df = _docs(spark, ["aa aa b", "ab"])
    got = {r["pair"] for r in bpe_pair_counts(df, min_count=2).collect()}
    assert got == {"aa", "a_", "b_"}  # ab (count 1) dropped


@pytest.fixture()
def er_inputs(spark):
    docs = spark.createDataFrame(
        [
            # cluster 10: three members, two langs (en x2 beats de),
            # survivor = doc 11 (max n_chars 90); doc 12 ties nobody
            (10, "en", "web", 50),
            (11, "de", "web", 90),
            (12, "en", "book", 70),
            # cluster 20: two members, lang tie en/de -> 'de' (smaller
            # string); n_chars tie 40 -> survivor min doc_id 20
            (20, "en", "web", 40),
            (21, "de", "wiki", 40),
            # singleton
            (30, "fr", "web", 5),
        ],
        "doc_id long, lang string, source string, n_chars int",
    )
    clusters = spark.createDataFrame(
        [(10, 10), (11, 10), (12, 10), (20, 20), (21, 20), (30, 30)],
        "doc_id long, canonical_id long",
    )
    return docs, clusters


def test_golden_records_survivorship(spark, er_inputs):
    docs, clusters = er_inputs
    rows = {
        r["canonical_id"]: r.asDict()
        for r in golden_records(docs, clusters=clusters).collect()
    }
    assert rows[10]["n_members"] == 3
    assert rows[10]["survivor_doc"] == 11  # richest member
    assert rows[10]["lang_mode"] == "en"  # 2 en vs 1 de
    assert rows[10]["n_sources"] == 2
    assert rows[10]["total_chars"] == 210
    # ties: modal-lang tie breaks to the smaller string, survivor tie
    # to the smaller doc_id
    assert rows[20]["lang_mode"] == "de"
    assert rows[20]["survivor_doc"] == 20
    # singleton is its own golden record
    assert rows[30]["n_members"] == 1
    assert rows[30]["survivor_doc"] == 30
    assert rows[30]["lang_mode"] == "fr"


def test_cluster_size_histogram(spark, er_inputs):
    docs, clusters = er_inputs
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_histogram(docs, clusters=clusters).collect()
    }
    assert got == {3: (1, 3), 2: (1, 2), 1: (1, 1)}
