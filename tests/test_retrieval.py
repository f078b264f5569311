"""BM25 top-k (retrieval.py): python lockstep, ranking semantics, and
the TakeOrdered plan shape."""

import math

from careers_spark.operators.retrieval import bm25_topk

K1, B = 1.2, 0.75


def _bm25_python(docs, terms, k=10):
    toked = {d: t.lower().split() for d, t in docs}
    n = len(toked)
    avgdl = sum(len(t) for t in toked.values()) / n
    dfreq = {
        t: sum(1 for toks in toked.values() if t in toks) for t in terms
    }
    scores = {}
    for d, toks in toked.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(toks) / avgdl))
        if s > 0:
            scores[d] = round(s, 6)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {d: (s, i + 1) for i, (d, s) in enumerate(ranked)}


def test_bm25_matches_python(spark):
    docs = [
        (1, "spark join join join window"),
        (2, "spark window"),
        (3, "the quick brown fox"),          # no query term -> absent
        (4, "join"),
        (5, "spark spark spark spark spark spark spark spark"),  # tf saturation
        (6, "window join spark extra words to lengthen the document a lot"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["spark", "join", "window"]
    got = {
        r.doc_id: (r.score, r.rank)
        for r in bm25_topk(df, terms, k=10).collect()
    }
    assert got == _bm25_python(docs, terms)
    assert 3 not in got


def test_bm25_tf_saturates_not_linear(spark):
    """k1 bounds the tf term: 8 repetitions must score far below 8x a
    single occurrence (the whole point of BM25 over raw tf)."""
    docs = [(1, "spark alpha beta"), (2, "spark " * 8 + "alpha beta")]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in docs], "doc_id long, text string"
    )
    got = {r.doc_id: r.score for r in bm25_topk(df, ["spark"], k=10).collect()}
    assert got[2] > got[1]                   # more matches still help
    assert got[2] < 8 * got[1] / 2           # but saturate hard


def test_bm25_plan_is_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject (partial
    per-partition top-k + driver merge), never a full sort shuffle."""
    docs = spark.createDataFrame(
        [(i, "spark join window") for i in range(50)],
        "doc_id long, text string",
    )
    df = bm25_topk(docs, ["spark", "join"], k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan, plan
