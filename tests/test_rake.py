"""Goldens for textstats.rake_keywords."""

from careers_spark.operators.textstats import rake_keywords


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_rake_hand_golden(spark):
    # stopwords 'the'/'and' split two phrases: [quick brown fox] and
    # [lazy dog]; every word freq=1, deg=phrase length, so the phrases
    # score 3+3+3=9 and 2+2=4
    rows = rake_keywords(
        _docs(spark, ["the quick brown fox and the lazy dog"])
    ).collect()
    got = [(r["phrase"], r["rake_score"], r["rk"]) for r in
           sorted(rows, key=lambda r: r["rk"])]
    assert got == [("quick brown fox", 9.0, 1), ("lazy dog", 4.0, 2)]


def test_rake_duplicate_phrases_merge(spark):
    # two occurrences of the same phrase: freq=2, deg=4 per word ->
    # word score 2.0, phrase 4.0, ONE output row
    rows = rake_keywords(_docs(spark, ["a lazy dog is a lazy dog"])).collect()
    assert [(r["phrase"], r["rake_score"], r["rk"]) for r in rows] == [
        ("lazy dog", 4.0, 1)
    ]


def test_rake_shared_word_raises_degree(spark):
    # 'deep' appears in both phrases: freq=2, deg=2+3=5 -> score 2.5;
    # the longer phrase outranks via the summed member scores
    rows = rake_keywords(
        _docs(spark, ["deep learning is deep neural networks"])
    ).collect()
    got = {r["phrase"]: r["rake_score"] for r in rows}
    # deep: 5/2 = 2.5; learning: 2/1 = 2; neural, networks: 3/1 = 3
    assert got["deep neural networks"] == 8.5
    assert got["deep learning"] == 4.5


def test_rake_tie_breaks_alphabetically(spark):
    rows = rake_keywords(_docs(spark, ["x1 y1 a x2 y2"])).collect()
    ordered = [r["phrase"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert ordered == ["x1 y1", "x2 y2"]  # equal scores, phrase asc
