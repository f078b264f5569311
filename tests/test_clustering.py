"""K-means on the integer lattice: hand golden, python-lockstep unroll,
empty-cluster retention, and parallelism invariance."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from careers_spark.operators.clustering import kmeans_assign

SCHEMA = "vec_id long, embedding array<float>"


def _df(spark, vecs, parallelism=None):
    pdf = pd.DataFrame(
        {"vec_id": list(range(len(vecs))), "embedding": [list(map(float, v)) for v in vecs]}
    )
    df = spark.createDataFrame(pdf, schema=SCHEMA)
    return df.repartition(parallelism) if parallelism else df


def test_two_obvious_clusters(spark):
    # seeds are ids 0 and 1 — one in each blob, so one iteration suffices
    vecs = [
        [0.0, 0.0], [10.0, 10.0],          # seeds
        [0.1, -0.1], [0.2, 0.0],           # blob around origin
        [9.9, 10.1], [10.2, 9.8],          # blob around (10, 10)
    ]
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(_df(spark, vecs), k=2, iters=2).collect()
    }
    assert got == {0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}


def _py_lloyd(vecs, k, iters):
    """Independent python unroll of the lattice Lloyd loop (banker's
    rounding avoided the same way: round-half-away via the decimal
    trick on the exact integer/size division)."""
    import math

    def away(x):
        f = math.floor(x)
        r = x - f
        if r > 0.5:
            return f + 1
        if r < 0.5:
            return f
        return f + 1 if x >= 0 else f  # .5 away from zero (positive sums here)

    q = [[int(round_half(v)) for v in vec] for vec in vecs]
    cents = [list(q[i]) for i in range(k)]
    for _ in range(iters):
        assign = [
            min(
                range(k),
                key=lambda j: (sum((a - b) ** 2 for a, b in zip(x, cents[j])), j),
            )
            for x in q
        ]
        for j in range(k):
            members = [q[i] for i in range(len(q)) if assign[i] == j]
            if members:
                cents[j] = [
                    away(sum(col) / len(members)) for col in zip(*members)
                ]
    return [
        min(
            range(k),
            key=lambda j: (sum((a - b) ** 2 for a, b in zip(x, cents[j])), j),
        )
        for x in q
    ]


def round_half(v):
    # mirror cast(round(v * 1e6, 0) as bigint): away-from-zero ties
    import math

    x = float(v) * 1e6
    f = math.floor(abs(x))
    r = abs(x) - f
    m = f + 1 if r >= 0.5 else f
    return m if x >= 0 else -m


def test_python_lockstep(spark):
    # deterministic ragged points: three loose groups, ties possible
    vecs = [
        [((i * 37 + d * 11) % 29) / 7.0 + (i % 3) * 40 for d in range(5)]
        for i in range(40)
    ]
    k, iters = 3, 3
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(_df(spark, vecs), k=k, iters=iters).collect()
    }
    want = dict(enumerate(_py_lloyd(vecs, k, iters)))
    assert got == want


def test_empty_cluster_keeps_seed(spark):
    # seeds 0 and 1 are adjacent; every point is nearer seed 0's side,
    # so cluster 1 empties on iteration 1 — its centroid must persist
    # (not crash, not NaN) and the final assignment still references it
    vecs = [[0.0], [0.4], [0.1], [0.05], [0.2]]
    out = kmeans_assign(_df(spark, vecs), k=2, iters=2).collect()
    assert {r.cluster for r in out} <= {0, 1}
    assert len(out) == 5


def test_parallelism_invariance(spark):
    vecs = [[float((i * 13) % 17), float((i * 7) % 11)] for i in range(30)]
    a = kmeans_assign(_df(spark, vecs, parallelism=1), k=4, iters=3)
    b = kmeans_assign(_df(spark, vecs, parallelism=8), k=4, iters=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dist_is_exact_integer(spark):
    vecs = [[0.25, -0.5], [1.25, 0.5]]
    rows = {r.vec_id: r for r in kmeans_assign(_df(spark, vecs), k=2, iters=1).collect()}
    # each point is its own seed: dist 0, integer type
    assert rows[0].dist == 0 and rows[1].dist == 0
    assert isinstance(rows[0].dist, int)


def test_empty_input_returns_empty(spark):
    df = spark.createDataFrame([], schema=SCHEMA)
    out = kmeans_assign(df, k=4, iters=2)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster", "dist"]


def test_semantic_dedup_within_cluster_only(spark):
    from careers_spark.operators.clustering import semantic_dedup_pairs

    # two tight blobs far apart; seeds (ids 0, 1) one in each.
    # near-identical pairs exist in both blobs; the cross-blob pairs
    # have cosine ~0 and would fail the threshold anyway — also they
    # are never even CANDIDATES (different clusters)
    vecs = [
        [1.0, 0.0], [0.0, 1.0],            # seeds
        [0.99, 0.01], [0.98, 0.02],        # blob A dups
        [0.01, 0.99],                      # blob B dup
    ]
    out = semantic_dedup_pairs(
        _df(spark, vecs), k=2, iters=2, threshold=0.9
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert pairs == {(0, 2), (0, 3), (2, 3), (1, 4)}
    assert all(r.sim >= 0.9 for r in out)
    # cluster-local: every pair's members share the pair's cluster id
    clusters = {r.vec_id: r.cluster for r in
                __import__("careers_spark.operators.clustering",
                           fromlist=["kmeans_assign"]).kmeans_assign(
                    _df(spark, vecs), k=2, iters=2).collect()}
    for r in out:
        assert clusters[r.id_a] == clusters[r.id_b] == r.cluster


def test_semantic_dedup_threshold_rounds_first(spark):
    from careers_spark.operators.clustering import semantic_dedup_pairs

    # identical vectors: sim rounds to exactly 1.0 — kept at t=1.0
    vecs = [[0.6, 0.8], [0.6, 0.8]]
    out = semantic_dedup_pairs(_df(spark, vecs), k=1, iters=1, threshold=1.0)
    assert out.count() == 1


def _lp_df(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [[float(x) for x in r[1]] for r in rows],
                "label": [r[2] for r in rows],
            }
        )
    )


def test_label_propagation_two_clusters(spark):
    from careers_spark.operators.clustering import knn_label_propagation

    # two tight clusters on orthogonal axes; one seed each — every
    # member must adopt its cluster's seed label, seeds stay clamped
    rows = [
        (0, [1.0, 0.02, 0.0], 7),    # seed (vec_id % 5 == 0), label 7
        (1, [1.0, 0.01, 0.0], 99),   # unlabeled (label ignored)
        (2, [0.99, 0.03, 0.0], 99),
        (5, [0.0, 0.01, 1.0], 3),    # seed, label 3
        (6, [0.0, 0.02, 1.0], 99),
        (7, [0.02, 0.0, 0.98], 99),
    ]
    got = {
        r.vec_id: (r.label, r.is_seed)
        for r in knn_label_propagation(
            _lp_df(spark, rows), k=2, iterations=3
        ).collect()
    }
    assert got[0] == (7, True) and got[5] == (3, True)
    assert got[1][0] == 7 and got[2][0] == 7
    assert got[6][0] == 3 and got[7][0] == 3


def test_label_propagation_unreachable_stays_null(spark):
    from careers_spark.operators.clustering import knn_label_propagation

    # no seeds at all (no vec_id % 5 == 0): everything stays NULL
    rows = [(1, [1.0, 0.0], 9), (2, [0.9, 0.1], 9), (3, [0.0, 1.0], 9)]
    got = {
        r.vec_id: r.label
        for r in knn_label_propagation(
            _lp_df(spark, rows), k=1, iterations=2
        ).collect()
    }
    assert got == {1: None, 2: None, 3: None}


def test_label_propagation_majority_and_tiebreak(spark):
    from careers_spark.operators.clustering import knn_label_propagation

    # node 1's two nearest neighbors are seeds with labels 5 and 2 at
    # equal counts -> tie breaks to the SMALLER label id (2)
    rows = [
        (0, [1.0, 0.0, 0.0], 5),    # seed label 5
        (10, [0.0, 1.0, 0.0], 2),   # seed label 2
        (1, [0.7, 0.7, 0.0], 99),   # equidistant-ish; k=2 sees both
    ]
    got = {
        r.vec_id: r.label
        for r in knn_label_propagation(
            _lp_df(spark, rows), k=2, iterations=1
        ).collect()
    }
    assert got[1] == 2


def test_pq_codes_lockstep_with_per_subspace_kmeans(spark):
    """PQ codes == kmeans_assign run per slice, and recon_err == the
    sum of per-subspace distances (disjoint subspaces)."""
    import random

    import pandas as pd

    from careers_spark.operators.clustering import kmeans_assign, pq_codes

    rng = random.Random(31)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    got = {
        r.vec_id: (r.code_0, r.code_1, r.recon_err)
        for r in pq_codes(df, m=2, k=4, iters=2).collect()
    }
    want = {}
    for j in range(2):
        sl = df.select(
            "vec_id", F.slice("embedding", j * 4 + 1, 4).alias("embedding")
        )
        for r in kmeans_assign(sl, k=4, iters=2).collect():
            want.setdefault(r.vec_id, {})[j] = (r.cluster, r.dist)
    assert got == {
        i: (w[0][0], w[1][0], w[0][1] + w[1][1]) for i, w in want.items()
    }


def test_pq_codes_identical_subvectors_share_codes(spark):
    import pandas as pd

    from careers_spark.operators.clustering import pq_codes

    # vectors 1 and 2 share subspace 0 exactly but differ in subspace 1
    rows = [
        (1, [1.0, 0.0, 5.0, 5.0]),
        (2, [1.0, 0.0, -5.0, -5.0]),
        (3, [0.0, 1.0, 5.0, 5.0]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    got = {
        r.vec_id: (r.code_0, r.code_1)
        for r in pq_codes(df, m=2, k=3, iters=2).collect()
    }
    assert got[1][0] == got[2][0] and got[1][1] != got[2][1]
    assert got[1][1] == got[3][1]


def test_pq_codes_rejects_indivisible_dim(spark):
    import pandas as pd

    import pytest as _pt

    from careers_spark.operators.clustering import pq_codes

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 2.0, 3.0]]})
    )
    with _pt.raises(ValueError, match="divisible"):
        pq_codes(df, m=2)


def _lattice(vec):
    from decimal import ROUND_HALF_UP, Decimal

    return [
        int(
            Decimal(repr(float(v) * 1e6)).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
        for v in vec
    ]


def test_pq_adc_identity_when_every_vector_is_a_centroid(spark):
    """kcent == corpus size makes every corpus vector its own centroid
    (seeds are the points, self-assignment at distance 0, identity
    updates), so ADC == the exact lattice L2 ranking — the provable
    exactness property (the IVF nprobe==nlist analogue)."""
    import itertools

    from careers_spark.operators.clustering import pq_adc_topk

    vals = [0.1, -0.4, 0.25, 0.7]
    vecs = [
        list(p) * 2  # dim 8
        for p in itertools.islice(itertools.permutations(vals), 10)
    ]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = pq_adc_topk(
        df, k=3, m=2, kcent=9, iters=1, query_pred="vec_id = 0"
    ).collect()

    q = _lattice([float(x) for x in vecs[0]])
    exact = sorted(
        (
            sum((a - b) ** 2 for a, b in zip(q, _lattice(v))),
            i,
        )
        for i, v in enumerate(vecs[1:], start=1)
    )[:3]
    assert [(r.neighbor_id, r.adist) for r in sorted(got, key=lambda r: r.rk)] == [
        (i, d) for d, i in exact
    ]


def test_pq_adc_python_lockstep(spark):
    """Full python re-derivation of the m=2 k=2 iters=1 pipeline:
    lattice quantize -> seeded Lloyd -> corpus codes -> ADC ranking."""
    from careers_spark.operators.clustering import pq_adc_topk

    rows = [
        (0, [0.9, 0.8, 0.1, 0.0]),
        (1, [0.1, 0.2, 0.9, 1.0]),
        (2, [0.15, 0.25, 0.85, 0.9]),
        (3, [0.8, 0.9, 0.2, 0.1]),
        (4, [0.85, 0.75, 0.05, 0.15]),
        (5, [0.2, 0.1, 0.95, 0.8]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = pq_adc_topk(
        df, k=6, m=2, kcent=2, iters=1, query_pred="vec_id % 3 = 0"
    ).collect()

    lat = {i: _lattice(v) for i, v in rows}
    corpus = [i for i, _ in rows if i % 3 != 0]
    queries = [i for i, _ in rows if i % 3 == 0]

    def lloyd(sl):
        pts = {i: lat[i][sl] for i in corpus}
        cents = [pts[i] for i in sorted(pts)[:2]]
        for _ in range(1):  # iters=1
            groups = {0: [], 1: []}
            for i in sorted(pts):
                d = [
                    sum((a - b) ** 2 for a, b in zip(pts[i], c))
                    for c in cents
                ]
                groups[min(range(2), key=lambda j: (d[j], j))].append(i)
            new = []
            for j in (0, 1):
                if groups[j]:
                    from decimal import ROUND_HALF_UP, Decimal

                    comp = []
                    for dim in range(len(cents[j])):
                        s = sum(pts[i][dim] for i in groups[j])
                        n = len(groups[j])
                        comp.append(
                            int(
                                Decimal(repr(s / n)).quantize(
                                    Decimal("1"), ROUND_HALF_UP
                                )
                            )
                        )
                    new.append(comp)
                else:
                    new.append(cents[j])
            cents = new
        return cents

    cents = [lloyd(slice(0, 2)), lloyd(slice(2, 4))]
    codes = {}
    for i in corpus:
        cs = []
        for j, sl in enumerate((slice(0, 2), slice(2, 4))):
            d = [
                sum((a - b) ** 2 for a, b in zip(lat[i][sl], c))
                for c in cents[j]
            ]
            cs.append(min(range(2), key=lambda t: (d[t], t)))
        codes[i] = cs
    expect = {}
    for qid in queries:
        ds = []
        for i in corpus:
            ad = 0
            for j, sl in enumerate((slice(0, 2), slice(2, 4))):
                c = cents[j][codes[i][j]]
                ad += sum((a - b) ** 2 for a, b in zip(lat[qid][sl], c))
            ds.append((ad, i))
        for rk, (ad, i) in enumerate(sorted(ds), start=1):
            expect[(qid, i)] = (ad, rk)
    assert {(r.query_id, r.neighbor_id): (r.adist, r.rk) for r in got} == expect


def test_ivfadc_full_probe_equals_pq_adc(spark):
    """nprobe == nlist probes every inverted list, so the candidate
    set is the whole corpus and IVFADC == the all-pairs ADC ranking —
    the composed provable-exactness property the driver oracle rests
    on."""
    import random

    from careers_spark.operators.clustering import ivfadc_topk, pq_adc_topk

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(
        map(
            tuple,
            ivfadc_topk(
                df, k=4, nlist=4, nprobe=4, m=2, kcent=3, iters=2,
                query_pred="vec_id % 10 = 0",
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pq_adc_topk(
                df, k=4, m=2, kcent=3, iters=2, query_pred="vec_id % 10 = 0"
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_ivfadc_restricted_probe_subset_and_clustered_recall(spark):
    """nprobe < nlist returns only same-probed-list candidates (a
    subset of the full-probe candidate ranking), and on a clustered
    corpus probing the single nearest list still finds the true
    cluster-local neighbors (the IVF recall property)."""
    from careers_spark.operators.clustering import ivfadc_topk

    # 3 tight clusters far apart; queries are members of each cluster
    centers = [[5.0, 5.0, 0.0, 0.0], [-5.0, 0.0, 5.0, 0.0], [0.0, -5.0, -5.0, 5.0]]
    rows = []
    i = 0
    for ci, c in enumerate(centers):
        for j in range(8):
            rows.append(
                (i, [c[d] + 0.01 * ((i * 7 + d) % 5) for d in range(4)])
            )
            i += 1
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    full = ivfadc_topk(
        df, k=3, nlist=3, nprobe=3, m=2, kcent=4, iters=2,
        query_pred="vec_id % 8 = 0",
    ).collect()
    one = ivfadc_topk(
        df, k=3, nlist=3, nprobe=1, m=2, kcent=4, iters=2,
        query_pred="vec_id % 8 = 0",
    ).collect()
    fullset = {(r.query_id, r.neighbor_id, r.adist) for r in full}
    # with tight clusters the single nearest list contains the true
    # top-k, so nprobe=1 reproduces the full-probe result exactly
    assert {(r.query_id, r.neighbor_id, r.adist) for r in one} == fullset
    # determinism under physical repartitioning
    again = ivfadc_topk(
        df.repartition(7), k=3, nlist=3, nprobe=1, m=2, kcent=4, iters=2,
        query_pred="vec_id % 8 = 0",
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, one))


def test_ivfadc_refined_recovers_exact_with_full_shortlist(spark):
    """With refine covering the whole corpus (and every list probed),
    the exact re-rank sees every candidate, so the refined result IS
    the exact lattice-L2 top-k — the recall-recovery limit case."""
    import random

    from careers_spark.operators.clustering import ivfadc_refined_topk

    rng = random.Random(19)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = ivfadc_refined_topk(
        df, k=3, refine=10, nlist=3, nprobe=3, m=2, kcent=2, iters=1,
        query_pred="vec_id % 10 = 0",
    ).collect()

    lat = {i: _lattice(v) for i, v in rows}
    for qid in (0, 10, 20):
        exact = sorted(
            (
                sum((a - b) ** 2 for a, b in zip(lat[qid], lat[i])),
                i,
            )
            for i in lat
            if i % 10 != 0
        )[:3]
        mine = sorted(
            [(r.dist, r.neighbor_id) for r in got if r.query_id == qid]
        )
        assert mine == exact, qid


def test_ivfadc_refined_beats_plain_adc_recall(spark):
    """On a clustered corpus the exact re-rank recovers neighbors the
    coarse PQ codes confuse: refined recall vs exact L2 is >= plain
    ADC recall (and strictly better here)."""
    from careers_spark.operators.clustering import (
        ivfadc_refined_topk,
        ivfadc_topk,
    )

    # 3 clusters x 12 points, small deterministic offsets
    centers = [[8.0, 0.0, 0.0, 0.0], [0.0, 8.0, 0.0, 0.0], [0.0, 0.0, 8.0, 0.0]]
    rows = []
    i = 0
    for c in centers:
        for j in range(12):
            rows.append(
                (i, [c[d] + 0.03 * ((i * 13 + d * 5) % 7) for d in range(4)])
            )
            i += 1
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    lat = {i: _lattice(v) for i, v in rows}
    queries = [i for i, _ in rows if i % 12 == 0]

    def exact_top(qid, k=3):
        return {
            i
            for _, i in sorted(
                (
                    sum((a - b) ** 2 for a, b in zip(lat[qid], lat[i])),
                    i,
                )
                for i in lat
                if i % 12 != 0
            )[:k]
        }

    common = dict(
        nlist=3, nprobe=3, m=2, kcent=2, iters=1, query_pred="vec_id % 12 = 0"
    )
    plain = ivfadc_topk(df, k=3, **common).collect()
    refined = ivfadc_refined_topk(df, k=3, refine=6, **common).collect()

    def recall(res):
        hits = tot = 0
        for qid in queries:
            want = exact_top(qid)
            got = {r.neighbor_id for r in res if r.query_id == qid}
            hits += len(got & want)
            tot += len(want)
        return hits / tot

    assert recall(refined) >= recall(plain)
    assert recall(refined) == 1.0


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pt_id long, x long, y long")


def test_dbscan_hand_golden_core_border_noise(spark):
    """eps=2, min_pts=3 over a hand triangle: 1/2/3 are mutually
    within eps (core, one cluster labeled 1); 4 touches only core 2
    at exactly dist=eps (closed predicate) -> border; 5 is noise."""
    from careers_spark.operators.clustering import dbscan_clusters

    pts = _pts(
        spark,
        [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 3, 0), (5, 10, 10)],
    )
    got = {r.pt_id: (r.role, r.cluster) for r in dbscan_clusters(
        pts, eps=2, min_pts=3
    ).collect()}
    assert got[1] == ("core", 1)
    assert got[2] == ("core", 1)
    assert got[3] == ("core", 1)
    assert got[4] == ("border", 1)
    assert got[5] == ("noise", None)


def test_dbscan_border_between_two_clusters_takes_min(spark):
    """Two separated core quads; the midpoint touches one core of
    each but is itself non-core (min_pts=4) -> border, attached to
    the SMALLER cluster label (the deterministic rule)."""
    from careers_spark.operators.clustering import dbscan_clusters

    quad_a = [(1, 0, 0), (2, 0, 1), (3, 1, 0), (4, 1, 1)]
    quad_b = [(11, 5, 0), (12, 5, 1), (13, 6, 0), (14, 6, 1)]
    pts = _pts(spark, quad_a + quad_b + [(20, 3, 0), (30, 20, 20)])
    got = {r.pt_id: (r.role, r.cluster) for r in dbscan_clusters(
        pts, eps=2, min_pts=4
    ).collect()}
    for i in (1, 2, 3, 4):
        assert got[i] == ("core", 1)
    for i in (11, 12, 13, 14):
        assert got[i] == ("core", 11)
    # 20 is within eps of core 3 (dist 2) and core 11 (dist 2) but has
    # only those 2 neighbors (deg+1 = 3 < 4): border, min cluster = 1
    assert got[20] == ("border", 1)
    assert got[30] == ("noise", None)


def _dbscan_reference(rows, eps, min_pts):
    """Pure-python DBSCAN with the operator's exact conventions:
    closed eps, |N| includes self, min-label CC over cores, border =
    min core-neighbor cluster."""
    ids = [i for i, _, _ in rows]
    xy = {i: (x, y) for i, x, y in rows}
    nbr = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j:
                dx = xy[i][0] - xy[j][0]
                dy = xy[i][1] - xy[j][1]
                if dx * dx + dy * dy <= eps * eps:
                    nbr[i].add(j)
                    nbr[j].add(i)
    core = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    lab = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            m = min([lab[i]] + [lab[j] for j in nbr[i] if j in core])
            if m != lab[i]:
                lab[i] = m
                changed = True
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", lab[i])
        else:
            cl = [lab[j] for j in nbr[i] if j in core]
            out[i] = ("border", min(cl)) if cl else ("noise", None)
    return out


def test_dbscan_python_lockstep_random(spark):
    from careers_spark.operators.clustering import dbscan_clusters
    import random

    rng = random.Random(31)
    rows = [
        (i, rng.randrange(0, 60), rng.randrange(0, 60)) for i in range(120)
    ]
    pts = _pts(spark, rows)
    got = {
        r.pt_id: (r.role, r.cluster)
        for r in dbscan_clusters(pts, eps=5, min_pts=4).collect()
    }
    want = _dbscan_reference(rows, eps=5, min_pts=4)
    assert got == want
    # sanity: the random field actually produced all three roles
    roles = {v[0] for v in want.values()}
    assert roles == {"core", "border", "noise"}


def test_dbscan_isolated_core_pair_is_singleton_free(spark):
    """min_pts=2 makes a touching pair both core: they form one
    2-point cluster; a lone point is noise (never a phantom
    singleton cluster)."""
    from careers_spark.operators.clustering import dbscan_clusters

    pts = _pts(spark, [(1, 0, 0), (2, 0, 1), (9, 50, 50)])
    got = {r.pt_id: (r.role, r.cluster) for r in dbscan_clusters(
        pts, eps=2, min_pts=2
    ).collect()}
    assert got[1] == ("core", 1) and got[2] == ("core", 1)
    assert got[9] == ("noise", None)
