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


def _py_sq8(rows, k, qpred):
    """rows: (vec_id, [floats]). Replicates quantization + integer
    distance + (dist asc, id asc) ranking."""
    from decimal import ROUND_HALF_UP, Decimal

    def r0(x):
        return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

    dims = len(rows[0][1])
    mn = [min(float(v[d]) for _, v in rows) for d in range(dims)]
    mx = [max(float(v[d]) for _, v in rows) for d in range(dims)]
    code = {
        i: [
            0 if mx[d] == mn[d]
            else r0((float(v[d]) - mn[d]) / (mx[d] - mn[d]) * 255.0)
            for d in range(dims)
        ]
        for i, v in rows
    }
    out = {}
    for qi in (i for i, _ in rows if qpred(i)):
        ds = sorted(
            (sum((a - b) ** 2 for a, b in zip(code[qi], code[ni])), ni)
            for ni, _ in rows
            if ni != qi
        )
        for rk, (d, ni) in enumerate(ds[:k], 1):
            out[(qi, ni)] = (d, rk)
    return out


def test_sq8_identical_vector_is_rank_one_at_zero(spark):
    import pandas as pd

    from careers_spark.operators.similarity import sq8_topk

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (7, [1.0, 2.0, 3.0]),   # exact copy of the query
        (8, [1.0, 2.0, 4.0]),
        (9, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    got = {
        (r.query_id, r.neighbor_id): (r.qdist, r.rk)
        for r in sq8_topk(df, k=2, query_pred="vec_id = 0").collect()
    }
    assert got[(0, 7)] == (0, 1)
    assert got[(0, 8)][1] == 2


def test_sq8_matches_python_lockstep(spark):
    import random

    import pandas as pd

    from careers_spark.operators.similarity import sq8_topk

    rng = random.Random(23)
    rows = [
        (i, [round(rng.uniform(-2, 2), 3) for _ in range(6)])
        for i in range(30)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    got = {
        (r.query_id, r.neighbor_id): (r.qdist, r.rk)
        for r in sq8_topk(df, k=4, query_pred="vec_id % 10 = 0").collect()
    }
    assert got == _py_sq8(rows, 4, lambda i: i % 10 == 0)


def test_sq8_constant_dimension_is_ignored(spark):
    import pandas as pd

    from careers_spark.operators.similarity import sq8_topk

    # dim 1 is constant across the corpus: it must quantize to 0
    # everywhere and contribute nothing (no divide-by-zero)
    rows = [(0, [0.0, 5.0]), (1, [1.0, 5.0]), (2, [0.5, 5.0])]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    got = {
        (r.query_id, r.neighbor_id): r.qdist
        for r in sq8_topk(df, k=2, query_pred="vec_id = 0").collect()
    }
    assert got == {(0, 2): 128 * 128, (0, 1): 255 * 255}


def test_rocchio_expansion_hand_golden(spark):
    """Feedback docs share a distinctive co-occurring term that must
    rank first; original query terms never appear."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.retrieval import rocchio_expansion

    rows = [
        (1, "spark shuffle shuffle partition"),
        (2, "spark shuffle executor"),
        (3, "spark partition memory"),
        (4, "cooking recipes and gardening"),
        (5, "more cooking and more gardening"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = rocchio_expansion(df, ["spark"], fb_k=3, expand_n=3).collect()
    by = {r.term: r for r in sorted(got, key=lambda r: r.rank)}
    assert "spark" not in by
    # docs 1-3 are the feedback set (only they contain 'spark');
    # 'shuffle' appears 3x across them with df=2 -> top score
    n = 5

    def q9(x):
        return int(Decimal(repr(x * 1e9)).quantize(Decimal("1"), ROUND_HALF_UP))

    def score(tf_sum_pairs):
        fp = sum(tf * q9(math.log((n + 1) / (df + 1)) + 1) for tf, df in tf_sum_pairs)
        return float(Decimal(repr(fp / 1e9)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    assert by["shuffle"].rank == 1
    assert by["shuffle"].n_fb_docs == 2
    assert by["shuffle"].score == score([(2, 2), (1, 2)])
    assert by["partition"].score == score([(1, 2), (1, 2)])
    # nothing from the cooking docs can appear (not in feedback set)
    assert not ({"cooking", "gardening"} & set(by))


def test_rocchio_expansion_deterministic(spark):
    from careers_spark.operators.retrieval import rocchio_expansion

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = rocchio_expansion(docs, ["spark", "join", "window"]).collect()
    b = rocchio_expansion(
        docs.repartition(7), ["spark", "join", "window"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _ql_python(docs, terms, k=10, mu=2000):
    toked = {d: t.lower().split() for d, t in docs}
    total = sum(len(t) for t in toked.values())
    cf = {
        t: sum(toks.count(t) for toks in toked.values()) for t in terms
    }
    live = [t for t in terms if cf[t] > 0]
    scores = {}
    for d, toks in toked.items():
        if not any(t in toks for t in live):
            continue
        s = 0.0
        for t in live:
            s += math.log(
                (toks.count(t) + mu * cf[t] / total) / (len(toks) + mu)
            )
        scores[d] = round(s, 6)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {d: (s, i + 1) for i, (d, s) in enumerate(ranked)}


def test_ql_dirichlet_matches_python(spark):
    """Lockstep with an independent python unroll, including the
    smoothing-only contribution of absent terms (doc 4 has 'join' but
    no 'spark'/'window' — BM25 would score only the present term; QL
    must charge all three)."""
    from careers_spark.operators.retrieval import ql_dirichlet_topk

    docs = [
        (1, "spark join join join window"),
        (2, "spark window"),
        (3, "the quick brown fox"),  # no query term -> not a candidate
        (4, "join"),
        (5, "spark spark spark spark spark spark spark spark"),
        (6, "window join spark extra words to lengthen the document a lot"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["spark", "join", "window"]
    got = {
        r.doc_id: (r.score, r.rank)
        for r in ql_dirichlet_topk(df, terms, k=10, mu=100).collect()
    }
    assert got == _ql_python(docs, terms, k=10, mu=100)
    assert 3 not in got


def test_ql_dirichlet_drops_corpus_absent_terms(spark):
    """A query term with zero collection frequency is dropped instead
    of poisoning every score with ln(0)."""
    from careers_spark.operators.retrieval import ql_dirichlet_topk

    docs = [(1, "spark join"), (2, "join join")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.score, r.rank)
        for r in ql_dirichlet_topk(
            df, ["spark", "zzzmissing"], k=10, mu=100
        ).collect()
    }
    assert got == _ql_python(docs, ["spark", "zzzmissing"], k=10, mu=100)
    assert all(math.isfinite(s) for s, _ in got.values())


# ---------------------------------------------------------------------------
# phrase_search


def test_phrase_search_hand_golden(spark):
    from careers_spark.operators.retrieval import phrase_search

    rows = [
        (1, "the quick brown fox jumps"),       # match at 1
        (2, "quick brown, QUICK BROWN fox"),    # matches at 0 and 2
        (3, "brown quick nothing here"),        # reversed -> no match
        (4, "quick stop brown"),                # gap -> no match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, ["quick", "brown"]).collect()
    }
    assert got == {1: (1, 1), 2: (2, 0)}


def test_phrase_search_overlapping_repeated_term(spark):
    from careers_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b a")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, ["a", "a"]).collect()
    }
    # "a a a a" holds starts 0,1,2; "a b a" holds none
    assert got == {1: (3, 0)}


def test_phrase_search_lockstep_random(spark):
    import random

    from careers_spark.operators.retrieval import phrase_search

    rng = random.Random(5)
    vocab = ["x", "y", "z", "w"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(60)
    ]
    phrase = ["x", "y", "x"]
    expected = {}
    for i, txt in rows:
        toks = txt.split()
        starts = [
            p
            for p in range(len(toks) - len(phrase) + 1)
            if toks[p : p + len(phrase)] == phrase
        ]
        if starts:
            expected[i] = (len(starts), starts[0])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, phrase).collect()
    }
    assert got == expected
