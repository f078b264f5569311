"""Digest / matching operators (TopicVector + WebCVProcess semantics)."""

import math

import pandas as pd
import pytest

from careers_spark.operators import digests as DG


@pytest.fixture(scope="module")
def links(spark):
    rows = [
        ("c1", "Main:Spark", 2.0),
        ("c1", "Main:Join", 1.0),
        ("c2", "Main:Spark", 1.0),
        ("c2", "Main:Join", 2.0),
        ("c3", "Main:Plants", 5.0),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "topic", "score"])
    )


def test_document_digests_normalized(spark, links):
    dv = {(r.conv_id, r.topic): r.weight for r in DG.document_digests(links).collect()}
    n = math.sqrt(4 + 1)
    assert abs(dv[("c1", "Main:Spark")] - 2 / n) < 1e-9
    assert abs(dv[("c1", "Main:Join")] - 1 / n) < 1e-9
    assert dv[("c3", "Main:Plants")] == 1.0
    # per-conv L2 norm == 1
    agg = {}
    for (c, _t), w in dv.items():
        agg[c] = agg.get(c, 0) + w * w
    assert all(abs(v - 1.0) < 1e-9 for v in agg.values())


def test_document_digests_topk(spark):
    rows = [("c1", f"t{i:02d}", float(i)) for i in range(10)]
    links = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "topic", "score"])
    )
    got = DG.document_digests(links, k=3).collect()
    assert sorted(r.topic for r in got) == ["t07", "t08", "t09"]


def test_digest_similarity(spark, links):
    sims = {
        (r.conv_a, r.conv_b): r.similarity
        for r in DG.digest_similarity(DG.document_digests(links), min_similarity=0.0).collect()
    }
    # c1·c2 = (2*1 + 1*2)/5 = 0.8; c3 shares no topic -> no pair at all
    assert abs(sims[("c1", "c2")] - 0.8) < 1e-6
    assert all("c3" not in k for k in sims)


def test_incremental_pairs(spark):
    left = spark.createDataFrame(pd.DataFrame({"id_a": [1, 2, 3, 4]}))
    right = spark.createDataFrame(pd.DataFrame({"id_b": [10, 20, 30]}))
    got = {
        (r.id_a, r.id_b)
        for r in DG.incremental_pairs(left, right, left_cursor=2, right_cursor=20).collect()
    }
    # new-left (3,4) x all-right  +  old-left (1,2) x new-right (30)
    expected = {(a, b) for a in (3, 4) for b in (10, 20, 30)} | {(1, 30), (2, 30)}
    assert got == expected


def test_dictionary_extras(spark):
    import pandas as pd

    from careers_spark import schema as S
    from careers_spark.operators import dictionary as D

    tc = spark.createDataFrame(
        pd.DataFrame(
            {
                "topic": ["t"] * 6,
                "context": [
                    "Category:Good",
                    "Category:1984 births",  # 4-digit date -> reject
                    "Category:Living people",  # blocklist -> reject
                    "Category:Soft redirects",  # contains 'redirect' -> reject
                    # reference contains('redirect') is CASE-SENSITIVE:
                    # capital-R 'Redirect' passes unless blocklisted
                    "Template:Redirect pages",
                    "Category:Acronyms",  # blocklist entry r1 lacked -> reject
                ],
            }
        )
    )
    got = sorted(r.context for r in D.allowed_context(tc).collect())
    assert got == ["Category:Good", "Template:Redirect pages"]
    # the full 28-entry reference blocklist is carried verbatim
    assert len(D.DISALLOWED_CONTEXTS) == 28
    full = spark.createDataFrame(
        pd.DataFrame({"topic": ["t"] * 28, "context": D.DISALLOWED_CONTEXTS})
    )
    assert D.allowed_context(full).count() == 0

    t = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1", "c2"],
                "turn_idx": pd.array([0, 1, 0], dtype="int32"),
                "role": ["user"] * 3,
                "text": ["a", "b", "c"],
                "tool": [""] * 3,
                "ts": pd.to_datetime([0, 1, 2], unit="s"),
            }
        ),
        schema=S.TRANSCRIPTS,
    )
    flags = {
        (r.conv_id, r.turn_idx): r.first_section
        for r in D.first_turn_flag(t).collect()
    }
    assert flags == {("c1", 0): True, ("c1", 1): False, ("c2", 0): True}


def test_normalize_topic_and_link(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from careers_spark.functions.text import normalize_link, normalize_topic_title

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "title": ["Plain Title", "Category:Things"],
                "ns": ["", "Category"],
                "target": ["Page#section", "Other"],
            }
        )
    )
    got = df.select(
        normalize_topic_title(F.col("title")).alias("t"),
        normalize_link(F.col("ns"), F.col("target")).alias("l"),
    ).collect()
    assert [r.t for r in got] == ["Main:Plain Title", "Category:Things"]
    assert [r.l for r in got] == ["Main:Page", "Category:Other"]


def test_document_digest_groups_strictness(spark):
    """Hand-computed agglomerative grouping golden (getDocumentDigest's
    AgglomClustering.run at strictness 0.7, AmbiguityForest.scala:
    300-530, 1157-1212). The (a,c) edge is where the quasi-clique
    criterion and single linkage DISAGREE: after {a,b} merges, only 1
    of the 2 cross-pairs {a,b}x{c} is linked (0.5 < 0.7), so c stays
    out — single linkage would have chained a-b-c together."""
    rows = [
        ("c1", "t_a", "t_b", 10.0),  # merge -> {a,b}
        ("c1", "t_a", "t_c", 9.0),   # REJECTED: 1/2 linked < 0.7
        ("c1", "t_c", "t_d", 8.0),   # merge -> {c,d}
        # c2: full triangle -> one cluster (2/2 linked on second merge)
        ("c2", "t_a", "t_b", 5.0),
        ("c2", "t_b", "t_c", 4.0),
        ("c2", "t_a", "t_c", 3.0),
        # c3: zero-weight pair merges but dissolves at minClusterCoherence
        ("c3", "t_x", "t_y", 0.0),
    ]
    pw = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "topic_a", "topic_b", "weight"])
    )
    got = {
        (r.conv_id, r.topic): r.group_id
        for r in DG.document_digest_groups(pw).collect()
    }
    assert got == {
        ("c1", "t_a"): "t_a",
        ("c1", "t_b"): "t_a",
        ("c1", "t_c"): "t_c",
        ("c1", "t_d"): "t_c",
        ("c2", "t_a"): "t_a",
        ("c2", "t_b"): "t_a",
        ("c2", "t_c"): "t_a",
        # c3 dissolved entirely (coherence 0 <= 1e-9)
    }


def test_ranked_and_grouped_per_document(spark):
    """Per-document groups (conv_id column present) join per (conv_id,
    topic): the same topic lands in different groups in different
    conversations — the reference's per-document groupId semantics."""
    digests = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1", "c2", "c2"],
                "topic": ["t_a", "t_b", "t_a", "t_b"],
                "weight": [0.9, 0.7, 0.9, 0.7],
            }
        )
    )
    groups = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1"],
                "topic": ["t_a", "t_b"],
                "group_id": ["g", "g"],
            }
        )
    )
    got = {
        (r.conv_id, r.topic): (r.group_id, r.group_order)
        for r in DG.ranked_and_grouped(digests, groups).collect()
    }
    # c1: both topics share group g; c2 has no groups -> singletons
    assert got[("c1", "t_a")] == ("g", 1)
    assert got[("c1", "t_b")] == ("g", 1)
    assert got[("c2", "t_a")] == ("t_a", 1)
    assert got[("c2", "t_b")] == ("t_b", 2)


def test_ranked_and_grouped_golden(spark):
    """TopicVector.rankedAndGrouped semantics (TopicVector.scala:86-108)
    on a hand-computed fixture: ranks are 0-based by weight desc, groups
    average their members' ranks, groups order by ascending avg rank."""
    digests = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1"] * 4 + ["c2"],
                "topic": ["t_a", "t_b", "t_c", "t_d", "t_a"],
                "weight": [0.9, 0.7, 0.5, 0.3, 1.0],
            }
        )
    )
    groups = spark.createDataFrame(
        pd.DataFrame(
            {"topic": ["t_a", "t_b", "t_c"], "group_id": ["g1", "g2", "g1"]}
        )
    )
    got = {
        (r.conv_id, r.topic): (r.rank, r.group_id, r.avg_rank, r.group_order)
        for r in DG.ranked_and_grouped(digests, groups).collect()
    }
    # c1 ranks: t_a=0, t_b=1, t_c=2, t_d=3
    # groups: g1={t_a,t_c} avg 1.0; g2={t_b} avg 1.0; t_d singleton avg 3.0
    # group order by (avg_rank, group_id): g1=1, g2=2, t_d=3
    assert got[("c1", "t_a")] == (0, "g1", 1.0, 1)
    assert got[("c1", "t_c")] == (2, "g1", 1.0, 1)
    assert got[("c1", "t_b")] == (1, "g2", 1.0, 2)
    assert got[("c1", "t_d")] == (3, "t_d", 3.0, 3)  # ungrouped -> singleton
    assert got[("c2", "t_a")] == (0, "g1", 0.0, 1)
