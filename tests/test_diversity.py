"""Assistant distinct-n generation diversity
(convshape.assistant_ngram_diversity)."""

from careers_spark.operators.convshape import assistant_ngram_diversity


def _div(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    return {
        r.conv_id: r
        for r in assistant_ngram_diversity(df).collect()
    }


def test_diversity_hand_golden(spark):
    out = _div(
        spark,
        [
            ("c1", 0, "user", "irrelevant user text"),
            ("c1", 1, "assistant", "a b a"),
            ("c1", 2, "assistant", "a b"),
        ],
    )
    r = out["c1"]
    # unigrams a,b,a + a,b -> 5 total, 2 distinct
    assert (r.n_unigrams, r.distinct_unigrams) == (5, 2)
    # bigrams "a b","b a" + "a b" -> 3 total, 2 distinct
    assert (r.n_bigrams, r.distinct_bigrams) == (3, 2)
    assert r.distinct_1 == 0.4
    assert r.distinct_2 == round(2 / 3, 6)


def test_diversity_bigrams_do_not_cross_turns(spark):
    out = _div(
        spark,
        [("c1", 0, "assistant", "a"), ("c1", 1, "assistant", "b")],
    )
    r = out["c1"]
    assert r.n_bigrams == 0 and r.distinct_2 is None
    assert r.n_unigrams == 2 and r.distinct_1 == 1.0


def test_diversity_user_only_conversation_absent(spark):
    out = _div(spark, [("c9", 0, "user", "hello world")])
    assert "c9" not in out


def test_diversity_empty_assistant_text_keeps_row(spark):
    out = _div(spark, [("c2", 0, "assistant", "   ")])
    r = out["c2"]
    assert (r.n_unigrams, r.n_bigrams) == (0, 0)
    assert r.distinct_1 is None and r.distinct_2 is None
