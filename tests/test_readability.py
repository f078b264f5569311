"""Readability scores (textstats.readability): hand-computed Flesch /
FK on a known sentence, the vowel-group syllable heuristic, empty-doc
NULLs, and a python lockstep recompute."""

import re

from careers_spark.operators.textstats import readability


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_scores(text):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    n_words = len(toks)
    n_sents = max(1, len(re.findall(r"[.!?]+", text)))
    n_syll = sum(max(1, len(re.findall(r"[aeiouy]+", t))) for t in toks)
    if n_words == 0:
        return n_words, n_sents, n_syll, None, None
    flesch = round(
        206.835 - 1.015 * (n_words / n_sents) - 84.6 * (n_syll / n_words), 6
    )
    fk = round(0.39 * (n_words / n_sents) + 11.8 * (n_syll / n_words) - 15.59, 6)
    return n_words, n_sents, n_syll, flesch, fk


def test_hand_golden(spark):
    # 6 one-syllable words, 2 sentence runs
    df = _docs(spark, [(1, "The cat sat. The dog ran!")])
    r = readability(df).collect()[0]
    assert (r["n_words"], r["n_sents"], r["n_syll"]) == (6, 2, 6)
    assert r["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 6)
    assert r["fk_grade"] == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 6)


def test_vowel_group_syllables(spark):
    # beautiful -> eau, i, u = 3 groups; queue -> ueue = 1; rhythm ->
    # y = 1 (y counts as a vowel); xkcd -> no vowels, floor of 1
    df = _docs(spark, [(1, "beautiful queue rhythm xkcd")])
    r = readability(df).collect()[0]
    assert r["n_syll"] == 3 + 1 + 1 + 1


def test_empty_doc_nulls(spark):
    df = _docs(spark, [(1, ""), (2, "...")])
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    for i in (1, 2):
        assert rows[i]["n_words"] == 0
        assert rows[i]["flesch"] is None and rows[i]["fk_grade"] is None
    assert rows[1]["n_sents"] == 1  # greatest(1, 0)
    assert rows[2]["n_sents"] == 1


def test_python_lockstep(spark):
    texts = [
        "One fish, two fish. Red fish? Blue fish!",
        "An extraordinarily sophisticated demonstration of polysyllabic verbosity.",
        "short",
        "a. b. c. d. e.",
    ]
    df = _docs(spark, list(enumerate(texts)))
    got = {r["doc_id"]: r for r in readability(df).collect()}
    for i, t in enumerate(texts):
        w, s, y, fl, fk = _py_scores(t)
        r = got[i]
        assert (r["n_words"], r["n_sents"], r["n_syll"]) == (w, s, y)
        assert r["flesch"] == fl and r["fk_grade"] == fk
