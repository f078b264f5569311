"""Dictionary-build goldens (reference: testMRJobs.scala:168-323 style
exact expected tuples, and BuildPhraseQueryDb weight formulas)."""

import pandas as pd
from pyspark.sql import functions as F

from careers_spark.operators import dictionary as D


def test_redirect_fixpoint(spark):
    redirects = spark.createDataFrame(
        pd.DataFrame(
            {
                "from_topic": ["a", "b", "c", "x"],
                "to_topic": ["b", "final", "a", "y"],
            }
        )
    )
    for thresh in (2_000_000, 0):  # driver-side and distributed paths
        got = {
            r.from_topic: r.to_topic
            for r in D.resolve_redirects(redirects, driver_threshold=thresh).collect()
        }
        # a -> b -> final (2 hops), c -> a -> b -> final (3 hops), x -> y
        assert got == {"a": "final", "b": "final", "c": "final", "x": "y"}, thresh


def test_surface_forms_count_gt_1_and_redirects(spark):
    raw = spark.createDataFrame(
        pd.DataFrame(
            {
                "surface": ["acme", "acme", "acme corp", "rare"],
                "topic": ["Main:Acme Old", "Main:Acme", "Main:Acme", "Main:Rare"],
                "count": [3, 4, 2, 1],
            }
        )
    )
    redirects = spark.createDataFrame(
        pd.DataFrame({"from_topic": ["Main:Acme Old"], "to_topic": ["Main:Acme"]})
    )
    resolved = D.resolve_redirects(redirects)
    got = {
        (r.surface, r.topic): r["count"]
        for r in D.build_surface_forms(raw, resolved).collect()
    }
    # redirect-resolved counts merge (3+4); count==1 row dropped
    # (SurfaceForms.scala:118)
    assert got == {("acme", "Main:Acme"): 7, ("acme corp", "Main:Acme"): 2}


def test_allowed_filters(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "surface": ["1984", "rice", "42 7"],
                "topic": ["Main:1984 (novel)", "Main:Rice", "Category:Numbers"],
            }
        )
    )
    assert [r.surface for r in D.allowed_phrase(df).collect()] == ["rice"]
    assert [r.topic for r in D.allowed_topic(df).collect()] == ["Main:Rice"]


def test_allowed_topic_reference_goldens(spark):
    """Exact reference allowedTopic semantics (Disambiguator.scala:81-95):
    prefixes Main:List of / Main:Table of / Category:, case-sensitive
    contains (novel)/(song)/(band)/(album)/'TV series', endswith
    'postcode area' — including the cases VERDICT r1 flagged as leaking."""
    rejected = [
        "Main:List of rivers of Europe",
        "Main:Table of contents",
        "Category:Numbers",
        "Main:Lost (TV series)",  # contains 'TV series', no end anchor
        "Main:Lost (TV series) episodes",
        "Main:1984 (novel)",
        "Main:1984 (novel) adaptations",  # contains, not endswith
        "Main:Hey Jude (song)",
        "Main:Oasis (band)",
        "Main:Thriller (album)",
        "Main:SW postcode area",
    ]
    kept = [
        "Main:Rice",
        "Main:The Beatles",
        "Main:Lists of lists",  # 'List of' must be a Main:-prefix match
        "Main:A list of things",
        "Main:Novels",  # '(novel)' is a literal parenthesized match
        "Main:Tv series finales",  # case-sensitive: 'Tv' != 'TV'
        "Main:Postcode areas in the UK",  # endswith only
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"topic": rejected + kept})
    )
    got = sorted(r.topic for r in D.allowed_topic(df).collect())
    assert got == sorted(kept)


def test_surface_priors(spark):
    sf = spark.createDataFrame(
        pd.DataFrame(
            {
                "surface": ["rice", "rice", "bush"],
                "topic": ["Main:Rice", "Main:Condoleezza Rice", "Main:Bush"],
                "count": [300, 100, 50],
            }
        )
    )
    got = {(r.surface, r.topic): r.prior for r in D.surface_priors(sf).collect()}
    assert got[("rice", "Main:Rice")] == 0.75
    assert got[("rice", "Main:Condoleezza Rice")] == 0.25
    assert got[("bush", "Main:Bush")] == 1.0


def test_link_weights_golden(spark):
    """Hand-computed J5 golden on a 3-node graph.

    topic_contexts: t1->{c1, c2}, t2->{c1}
    bidirectional edge set: (t1,c1),(t1,c2),(t2,c1) + reversed.
    degrees: t1:2, t2:1, c1:2, c2:1.
    For edge (t1,c1): ctx(t1)={c1,c2,...} — intersection computed over the
    bidirectional neighbor sets: N(t1)={c1,c2}, N(c1)={t1,t2} -> ic=0,
    w1=(1+0)/(1+2)=1/3, w2=1/3.
    """
    tc = spark.createDataFrame(
        pd.DataFrame({"topic": ["t1", "t1", "t2"], "context": ["c1", "c2", "c1"]})
    )
    got = {
        (r.topic, r.context): (round(r.weight1, 6), round(r.weight2, 6))
        for r in D.link_weights(tc).collect()
    }
    third = round(1 / 3, 6)
    half = 0.5
    # N(t1)={c1,c2}, N(t2)={c1}, N(c1)={t1,t2}, N(c2)={t1}
    assert got[("t1", "c1")] == (third, third)  # ic=0
    assert got[("c1", "t1")] == (third, third)
    assert got[("t1", "c2")] == (third, half)  # ic=0, deg c2 = 1
    assert got[("t2", "c1")] == (half, third)  # N(t2)={c1} ∩ N(c1)={t1,t2} = {}
    # edge (c2, t1): N(c2)={t1} ∩ N(t1)={c1,c2} = {} -> (1/2, 1/3)
    assert got[("c2", "t1")] == (half, third)


def test_link_weights_shared_context(spark):
    """Two topics sharing a context produce positive intersection."""
    tc = spark.createDataFrame(
        pd.DataFrame(
            {
                "topic": ["t1", "t2", "t1"],
                "context": ["c1", "c1", "t2"],  # t2 is also a context of t1
            }
        )
    )
    got = {
        (r.topic, r.context): (round(r.weight1, 6), round(r.weight2, 6))
        for r in D.link_weights(tc).collect()
    }
    # N(t1)={c1,t2}, N(t2)={c1,t1}, shared = {c1} -> ic=1 on edge (t1,t2)
    assert got[("t1", "t2")] == (round(2 / 3, 6), round(2 / 3, 6))


def test_top_contexts_k(spark):
    lw = spark.createDataFrame(
        pd.DataFrame(
            {
                "topic": ["t"] * 5,
                "context": [f"c{i}" for i in range(5)],
                "weight1": [0.1, 0.5, 0.3, 0.9, 0.2],
                "weight2": [0.0] * 5,
            }
        )
    )
    got = [r.context for r in D.top_contexts(lw, k=2).orderBy(F.desc("weight1")).collect()]
    assert got == ["c3", "c1"]


def test_word_doc_freq_distinct_per_doc(spark):
    import pandas as pd

    from careers_spark import schema as S

    t = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c2"],
                "turn_idx": pd.array([0, 0], dtype="int32"),
                "role": ["user", "user"],
                "text": ["spark spark spark", "spark flink"],
                "tool": ["", ""],
                "ts": pd.to_datetime([0, 0], unit="s"),
            }
        ),
        schema=S.TRANSCRIPTS,
    )
    got = {r.word: r.doc_freq for r in D.word_doc_freq(t).collect()}
    assert got == {"spark": 2, "flink": 1}  # per-turn distinct, not raw count


def test_second_order_context_expansion(spark):
    """Sparse topics inherit contexts-of-contexts at x0.1
    (Disambiguator.scala:469-490); first-order weights win conflicts."""
    lw = spark.createDataFrame(
        pd.DataFrame(
            {
                "topic": ["t1", "c1"],
                "context": ["c1", "c2"],
                "weight1": [0.5, 0.4],
                "weight2": [0.5, 0.4],
            }
        )
    )
    got = {
        (r.topic, r.context): (round(r.weight1, 6), round(r.weight2, 6))
        for r in D.expand_second_order_contexts(lw).collect()
    }
    # first-order rows intact
    assert got[("t1", "c1")] == (0.5, 0.5)
    assert got[("c1", "c2")] == (0.4, 0.4)
    # t1 inherits c2 via c1 at 0.5 * 0.4 * 0.1 = 0.02
    assert got[("t1", "c2")] == (0.02, 0.02)
    assert len(got) == 3


def test_second_order_kickin_threshold(spark):
    """Topics at/above the kick-in degree get NO second-order rows."""
    rows = [("rich", f"c{i}", 0.5, 0.5) for i in range(D.SECOND_ORDER_KICKIN)]
    rows.append(("c0", "extra", 0.4, 0.4))
    lw = spark.createDataFrame(
        pd.DataFrame(rows, columns=["topic", "context", "weight1", "weight2"])
    )
    got = {(r.topic, r.context) for r in D.expand_second_order_contexts(lw).collect()}
    assert ("rich", "extra") not in got  # rich has >= kickin contexts
    assert ("c0", "extra") in got  # first-order preserved
