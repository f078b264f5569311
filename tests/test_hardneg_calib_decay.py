"""Hard-negative mining, MinHash calibration, time-decayed aggregate."""

import datetime as dt

from pyspark.sql import functions as F

from careers_spark.operators.dedup import jaccard_pairs, minhash_calibration
from careers_spark.operators.similarity import brute_force_topk, hard_negatives
from careers_spark.operators.temporal import time_decayed_agg


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.001]),   # near-dup of 0 (cos ~ 1.0)
        (2, [0.9, 0.5]),     # similar, not a dup
        (3, [0.0, 1.0]),     # orthogonal
        (4, [-1.0, 0.0]),    # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hard_negatives_excludes_near_dups(spark):
    got = {
        r.rk: (r.neighbor_id, r.sim)
        for r in hard_negatives(
            _vecs(spark), k=3, query_pred="vec_id = 0", dup_threshold=0.98
        ).collect()
    }
    # vec 1 (cos ~ 1.0) must be gone; ranking = 2, 3, 4
    assert [got[i][0] for i in (1, 2, 3)] == [2, 3, 4]
    assert all(s < 0.98 for _, s in got.values())


def test_hard_negatives_equals_topk_below_threshold(spark):
    # with a threshold above every non-self cosine, hard_negatives is
    # exactly brute_force_topk
    full = brute_force_topk(_vecs(spark), k=4, query_pred="vec_id = 3").collect()
    hn = hard_negatives(
        _vecs(spark), k=4, query_pred="vec_id = 3", dup_threshold=1.01
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, hn))


def test_minhash_calibration_tracks_exact_jaccard(spark):
    base = "one two three four five six seven eight nine ten " * 3
    docs = [(0, base), (1, base), (2, base.replace("ten", "zzz")),
            (3, "totally different words appear in this document here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = minhash_calibration(df, num_hashes=12).collect()
    by_pair = {(r.doc_a, r.doc_b): r for r in rows}
    # identical docs: every minhash agrees, est == jaccard == 1
    r01 = by_pair[(0, 1)]
    assert r01.n_agree == 12 and r01.est == 1.0 and r01.jaccard == 1.0
    assert r01.abs_err == 0.0
    # est is the agreement fraction and abs_err is consistent
    for r in rows:
        assert r.est == round(r.n_agree / 12, 6)
        assert abs(r.abs_err - abs(r.est - r.jaccard)) < 2e-6
    # exact jaccard column agrees with the standalone exact operator
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, threshold=0.0).collect()
    }
    for (a, b), r in by_pair.items():
        if (a, b) in exact:
            assert r.jaccard == exact[(a, b)]


def test_time_decayed_agg_hand_golden(spark):
    d0 = dt.datetime(2024, 3, 10, 12, 0)
    ev = spark.createDataFrame(
        [
            (1, d0, "buy", 10.0),                      # today: full weight
            (2, d0 - dt.timedelta(days=1), "buy", 10.0),   # 1/2
            (3, d0 - dt.timedelta(days=2), "buy", 10.0),   # 1/4
            (4, d0 - dt.timedelta(days=1), "view", 4.0),   # other key, 1/2
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    got = {r.event_type: r for r in time_decayed_agg(ev).collect()}
    # cents=1000; fp = 1000e6, 500e6, 250e6 -> 1750e6
    assert got["buy"].decayed_fp == 1_750_000_000
    assert got["buy"].decayed == 1750.0
    assert got["buy"].n_events == 3
    assert got["view"].decayed_fp == 200_000_000  # 400 cents / 2
    assert got["view"].n_events == 1


def test_time_decayed_agg_half_life_parameter(spark):
    d0 = dt.datetime(2024, 3, 10)
    ev = spark.createDataFrame(
        [(1, d0, "k", 8.0), (2, d0 - dt.timedelta(days=4), "k", 8.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    # half-life 2 days: age 4 -> weight 1/4
    got = time_decayed_agg(ev, half_life_days=2).collect()[0]
    assert got.decayed_fp == 800 * 1_000_000 + 200 * 1_000_000


def test_time_decayed_ancient_event_capped_not_overflowed(spark):
    d0 = dt.datetime(2024, 3, 10)
    ev = spark.createDataFrame(
        [(1, d0, "k", 1.0), (2, d0 - dt.timedelta(days=365 * 200), "k", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    got = time_decayed_agg(ev).collect()[0]
    # the ancient event contributes ~0 (capped shift), not an overflow
    assert got.decayed_fp == 100 * 1_000_000
    assert got.n_events == 2


def test_latest_state_cdc_compaction(spark):
    from careers_spark.operators.temporal import latest_state

    d0 = dt.datetime(2024, 5, 1, 10, 0)
    ev = spark.createDataFrame(
        [
            (1, d0, 7, "a", 1.0),
            (2, d0 + dt.timedelta(hours=1), 7, "b", 2.0),   # winner for 7
            (3, d0, 8, "c", 3.0),
            (4, d0, 8, "d", 4.0),                            # equal ts: id wins
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.user_id: r for r in latest_state(ev).collect()}
    assert got[7].event_id == 2 and got[7].event_type == "b"
    assert got[8].event_id == 4  # tiebreak toward larger event_id
    assert set(got) == {7, 8}
    assert latest_state(ev).columns == ev.columns


def test_personalized_pagerank_python_lockstep(spark):
    from careers_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (4, 1)], "src long, dst long"
    )
    got = {r.node: r.pr for r in
           pagerank(edges, iterations=6, personalize=1).collect()}

    # python unroll of the identical recurrence (round 10 per iteration)
    nodes = [1, 2, 3, 4]
    out = {1: [2, 3], 2: [1], 4: [1]}
    pr = {n: 1.0 if n == 1 else 0.0 for n in nodes}
    d = 0.85
    for _ in range(6):
        dang = sum(p for n, p in pr.items() if n not in out)
        inflow = {n: 0.0 for n in nodes}
        for u, vs in out.items():
            for v in vs:
                inflow[v] += pr[u] / len(vs)
        pr = {
            n: round((1.0 - d) * (1.0 if n == 1 else 0.0)
                     + d * (inflow[n] + dang * (1.0 if n == 1 else 0.0)), 10)
            for n in nodes
        }
    # python's addition order differs from Spark's aggregate order by
    # ~1e-16 pre-round; when that noise sits on a round-half boundary
    # the 10th decimal can differ by one ulp (the documented limit of
    # the round-per-iteration recipe) — assert within one rounded digit
    assert set(got) == set(pr)
    assert all(abs(got[n] - pr[n]) <= 5e-10 for n in pr), (got, pr)
    # teleport concentrates mass at/near the anchor; 2 and 3 are
    # symmetric receivers; 4 (never pointed at) gets nothing
    assert got[1] > got[2] == got[3] > got[4] == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_personalized_none_matches_global(spark):
    from careers_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    a = sorted(map(tuple, pagerank(edges, iterations=4).collect()))
    b = sorted(map(tuple, pagerank(edges, iterations=4, personalize=None).collect()))
    assert a == b


def test_association_rules_hand_golden(spark):
    from careers_spark.operators.basket import association_rules

    # baskets: {1:(a,b,c)}, {2:(a,b)}, {3:(a,b)}, {4:(c)}
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "a"), (3, "b"), (4, "c"), (3, "a")]  # dup line: distinct
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    got = {
        (r.item_a, r.item_b): r
        for r in association_rules(df, min_pair_orders=2).collect()
    }
    assert set(got) == {("a", "b")}  # (a,c)/(b,c) co-occur once only
    r = got[("a", "b")]
    # n_ab=3, n_a=3, n_b=3, N=4
    assert r.n_ab == 3
    assert r.support == round(3 / 4, 6)
    assert r.conf_a_to_b == 1.0 and r.conf_b_to_a == 1.0
    assert r.lift == round(3 * 4 / 9, 6)
    assert r.lift > 1.0  # co-occur more than independence predicts


def test_association_rules_independent_items_lift_one(spark):
    from careers_spark.operators.basket import association_rules

    # x and y appear in every basket -> P(x,y)=P(x)P(y) -> lift 1
    rows = [(i, v) for i in range(6) for v in ("x", "y")]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    r = association_rules(df, min_pair_orders=2).collect()[0]
    assert r.lift == 1.0 and r.support == 1.0


def test_item_cosine_hand_golden(spark):
    """cos = n_ab / sqrt(n_a * n_b) on hand baskets, both
    orientations emitted, per-item rank by (cos desc, neighbor)."""
    import math

    from careers_spark.operators.basket import item_cosine_topk

    # baskets: {1:(a,b,c)}, {2:(a,b)}, {3:(a,c)}, {4:(a)}
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "a"), (3, "c"), (4, "a")]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    got = {
        (r.item, r.neighbor): (r.n_ab, r.cos_sim, r.rk)
        for r in item_cosine_topk(df, min_pair_orders=1).collect()
    }
    # n_a=4, n_b=2, n_c=2; n_ab=2, n_ac=2, n_bc=1
    cab = round(2 / math.sqrt(8), 6)
    cbc = round(1 / math.sqrt(4), 6)
    assert got[("a", "b")] == (2, cab, 1)  # b before c on the id tie
    assert got[("a", "c")] == (2, cab, 2)
    # cos(b,c)=0.5 < cos(a,b)=0.7071 -> a is b's top neighbor
    assert got[("b", "a")] == (2, cab, 1)
    assert got[("b", "c")] == (1, cbc, 2)


def test_item_cosine_popularity_normalization(spark):
    """An item in every basket has lower cosine to a rare partner
    than two exclusive partners have to each other."""
    from careers_spark.operators.basket import item_cosine_topk

    rows = []
    for i in range(10):
        rows.append((i, "pop"))       # popular item everywhere
    rows += [(0, "x"), (0, "y"), (1, "x"), (1, "y")]  # exclusive pair
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    got = {
        (r.item, r.neighbor): r.cos_sim
        for r in item_cosine_topk(df, min_pair_orders=2).collect()
    }
    assert got[("x", "y")] == 1.0
    assert got[("x", "pop")] < got[("x", "y")]
