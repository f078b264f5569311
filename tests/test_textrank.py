"""textrank_keywords — hand goldens and a python pagerank lockstep."""

import math


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_textrank_symmetric_pair_beats_peripheral(spark):
    """alpha/beta are structurally interchangeable (swap-symmetric
    graph) so their scores tie exactly and sort alphabetically;
    gamma's single weaker attachment ranks last."""
    from careers_spark.operators.textstats import textrank_keywords

    df = _docs(spark, ["alpha beta gamma alpha beta"])
    out = textrank_keywords(df, window=1, k=10).collect()
    assert [r["term"] for r in out] == ["alpha", "beta", "gamma"]
    assert out[0]["pr"] == out[1]["pr"] > out[2]["pr"]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_textrank_stopwords_never_endpoints(spark):
    """'the' occupies window positions but cannot be an endpoint: at
    window=1 every adjacency touches it, so the graph is empty; at
    window=2 cat--dog bridges across it."""
    from careers_spark.operators.textstats import textrank_keywords

    df = _docs(spark, ["the cat the dog"])
    assert textrank_keywords(df, window=1, k=10).count() == 0
    out = textrank_keywords(df, window=2, k=10).collect()
    assert sorted(r["term"] for r in out) == ["cat", "dog"]
    assert out[0]["pr"] == out[1]["pr"]


def test_textrank_python_pagerank_lockstep(spark):
    """Replay the whole pipeline in python — positional windows,
    stopword filter, undirected weights, 6 iterations of the 10-dp
    rounded weighted pagerank — and compare every score exactly."""
    from careers_spark.functions.text import STOP_WORDS
    from careers_spark.operators.textstats import textrank_keywords

    texts = [
        "spark shuffles the big join and the broadcast join",
        "broadcast the small side of a skewed join",
        "salting breaks the skewed shuffle key",
        "spark shuffle partitions size the join",
    ]
    df = _docs(spark, texts)
    out = {
        r["term"]: (r["rank"], r["pr"])
        for r in textrank_keywords(df, window=2, iterations=6, k=50).collect()
    }

    import re
    from collections import Counter

    w = Counter()
    for t in texts:
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        pos = [(i, x) for i, x in enumerate(toks) if x not in STOP_WORDS]
        bypos = dict(pos)
        for i, x in pos:
            for off in (1, 2):
                y = bypos.get(i + off)
                if y is not None and y != x:
                    w[(min(x, y), max(x, y))] += 1
    nodes = sorted({n for p in w for n in p})
    outw = Counter()
    for (x, y), c in w.items():
        outw[x] += c
        outw[y] += c
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(6):
        inflow = {v: 0.0 for v in nodes}
        for (x, y), c in w.items():
            inflow[y] += pr[x] * c / outw[x]
            inflow[x] += pr[y] * c / outw[y]
        pr = {
            v: round(0.15 / n + 0.85 * inflow[v], 10) for v in nodes
        }
    ranked = sorted(nodes, key=lambda v: (-pr[v], v))
    assert len(out) == n
    for i, v in enumerate(ranked):
        assert out[v][0] == i + 1, v
        assert math.isclose(out[v][1], pr[v], rel_tol=0, abs_tol=0), v
