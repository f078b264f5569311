"""Similarity search + text stats + multimodal plumbing tests on the
driver's sf0.001 tables."""

import pytest
from pyspark.sql import functions as F

from careers_spark.operators import multimodal as MM
from careers_spark.operators import similarity as SIM
from careers_spark.operators import textstats as TS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_brute_force_topk_shape(spark, embeddings):
    got = SIM.brute_force_topk(embeddings, k=3, query_pred="vec_id % 100 = 0").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 3
        sims = [r.sim for r in sorted(rows, key=lambda r: r.rk)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != qid for r in rows)


def test_lsh_recall_vs_brute_force(spark, embeddings):
    """The LSH-bucketed path must recover a decent fraction of the true
    top-k (same-bucket near neighbors)."""
    k = 5
    exact = SIM.brute_force_topk(embeddings, k=k, query_pred="vec_id % 100 = 0")
    # 3 planes ≈ 62 docs/bucket at 500 docs — planes must track log2(N)
    approx = SIM.lsh_bucketed_topk(embeddings, k=k, n_planes=3, query_pred="vec_id % 100 = 0")
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"LSH recall {recall}"


def test_embedding_near_dups_symmetric_bound(spark, embeddings):
    got = SIM.embedding_near_dup_pairs(
        embeddings, threshold=0.3, sample_pred="vec_id % 10 = 0"
    ).collect()
    for r in got:
        assert r.id_a < r.id_b
        assert 0.3 <= r.sim <= 1.0


def test_token_counts(spark, documents):
    row = TS.token_counts(documents).filter("doc_id = 0").first()
    doc = documents.filter("doc_id = 0").first()
    assert row.word_tokens == len([t for t in doc.text.lower().split() if t])
    assert row.bpe_est == -(-len(doc.text) // 4)


def test_quality_score_bounds(spark, documents):
    rows = TS.quality_score(documents).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert all(0.0 <= r.stop_ratio <= 1.0 for r in rows)


def test_lang_id_values(spark, documents):
    rows = TS.lang_id(documents).collect()
    allowed = set(TS.LANG_WORDS) | {"und"}
    assert all(r.pred_lang in allowed for r in rows)


def test_doc_fingerprint_deterministic(spark, documents):
    a = sorted(map(tuple, TS.doc_fingerprint(documents).collect()))
    b = sorted(map(tuple, TS.doc_fingerprint(documents).collect()))
    assert a == b


def test_multimodal_plumbing(spark, documents):
    assets = MM.synth_assets(documents)
    feats = MM.extract_features(assets, decoder="fake")
    rows = feats.collect()
    assert len(rows) == documents.count()
    assert all(len(r.feature) == MM.FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)
    # deterministic across runs
    again = feats.collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_multimodal_real_decoder_is_stubbed(spark, documents):
    assets = MM.synth_assets(documents)
    with pytest.raises(Exception) as ei:
        MM.extract_features(assets, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_plan(spark, documents):
    assets = MM.synth_assets(documents)
    plan = MM.frame_sample_plan(assets, every_ms=1000)
    n_videos = assets.filter("kind = 'video'").count()
    assert plan.select("asset_id").distinct().count() == n_videos
    assert plan.filter("frame_ts_ms % 1000 != 0").count() == 0


def test_resize_plumbing(spark, documents):
    assets = MM.synth_assets(documents)
    resized = MM.resize_images(assets, width=64, height=48, decoder="fake")
    rows = resized.filter("kind = 'image'").collect()
    assert rows
    for r in rows:
        assert r.meta.width == 64 and r.meta.height == 48
        assert len(r.payload) == 18  # md5 digest + 2 size bytes
    # non-image assets pass through untouched
    vid = resized.filter("kind = 'video'").first()
    orig = assets.filter("kind = 'video'").first()
    assert vid.payload == orig.payload


def test_resize_real_is_stubbed(spark, documents):
    assets = MM.synth_assets(documents)
    import pytest as _pytest
    with _pytest.raises(Exception) as ei:
        MM.resize_images(assets, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


# --- IVF (r4) ---------------------------------------------------------------


def test_ivf_full_probe_equals_brute_force(spark, embeddings):
    """nprobe == nlist probes every inverted list, so IVF must equal the
    exact baseline row-for-row — this is the property the driver oracle
    checks, and it exercises train + assign + the bucket join."""
    k = 3
    exact = sorted(
        map(
            tuple,
            SIM.brute_force_topk(
                embeddings, k=k, query_pred="vec_id % 100 = 0"
            ).collect(),
        )
    )
    ivf = sorted(
        map(
            tuple,
            SIM.ivf_topk(
                embeddings, k=k, nlist=8, nprobe=8, iters=3,
                query_pred="vec_id % 100 = 0",
            ).collect(),
        )
    )
    assert ivf == exact


def test_ivf_recall_on_clustered_data(spark):
    """On genuinely clustered vectors the coarse quantizer finds the
    clusters and nprobe=1 already recovers the true neighbors (they
    share the query's list)."""
    import pandas as pd

    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(20):
            off = [((vid * 7 + d * 3 + j) % 5) * 0.1 for d in range(3)]
            rows.append((vid, [c[d] + off[d] for d in range(3)]))
            vid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    k = 3
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(
            df, k=k, query_pred="vec_id % 20 = 0"
        ).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(
            df, k=k, nlist=3, nprobe=1, iters=4, query_pred="vec_id % 20 = 0"
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.99


def test_ivf_driver_vs_distributed_training(spark, embeddings):
    """The driver-side numpy Lloyd loop (default for training sets
    <= driver_train_max) and the distributed loop (driver_train_max=0)
    implement the same algorithm: seeds identical, centroids equal to
    float rounding (summation order differs), and the resulting
    inverted-list search at nprobe=1 returns the same rows on this
    corpus (argmax margins far exceed a ulp)."""
    import numpy as np

    kw = dict(nlist=6, iters=3)
    drv = SIM.ivf_train_centroids(embeddings, **kw)
    dist = SIM.ivf_train_centroids(embeddings, driver_train_max=0, **kw)
    assert len(drv) == len(dist) == 6
    assert np.allclose(np.array(drv), np.array(dist), atol=1e-9)
    a = sorted(map(tuple, SIM.ivf_topk(
        embeddings, k=3, nlist=6, nprobe=1, iters=3,
        query_pred="vec_id % 100 = 0").collect()))
    b = sorted(map(tuple, SIM.ivf_topk(
        embeddings, k=3, nlist=6, nprobe=1, iters=3,
        query_pred="vec_id % 100 = 0", driver_train_max=0).collect()))
    assert a == b


def test_ivf_centroids_deterministic_and_padded(spark):
    """Training is RNG-free (two runs identical); nlist caps at the
    training-set size (Forgy cannot seed more centroids than points)."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, [float(i), 1.0]) for i in range(3)],
            columns=["vec_id", "embedding"],
        )
    )
    a = SIM.ivf_train_centroids(df, nlist=4, iters=2)
    b = SIM.ivf_train_centroids(df, nlist=4, iters=2)
    assert a == b
    assert len(a) == 3  # capped at the 3-point corpus
    for c in a:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9  # unit-normalized


def test_tfidf_top_terms_golden(spark):
    """Hand-computed smoothed TF-IDF on a 3-doc corpus.

    N=3; df(apple)=3, df(red)=2, df(pie)=1.
    idf = ln((N+1)/(df+1)) + 1 -> apple 1.0, red ln(4/3)+1, pie ln(2)+1.
    Doc 1 'apple apple red': apple tf=2 score=2.0, red 1.287682
    -> rank 1 apple, 2 red."""
    docs = spark.createDataFrame(
        [(1, "apple apple red"), (2, "apple red pie pie pie"), (3, "apple")],
        "doc_id int, text string",
    )
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.score)
        for r in TS.tfidf_top_terms(docs, k=2).collect()
    }
    assert got[(1, 1)] == ("apple", 2, 2.0)
    assert got[(1, 2)] == ("red", 1, 1.287682)
    assert got[(2, 1)] == ("pie", 3, 5.079442)
    assert got[(2, 2)] == ("red", 1, 1.287682)
    assert got[(3, 1)] == ("apple", 1, 1.0)
    assert (3, 2) not in got  # only one distinct term in doc 3


def test_tfidf_top_terms_tiebreak_and_shape(spark, documents):
    """On the driver corpus: ranks are dense 1..<=k per doc, scores
    non-increasing within a doc, and equal scores break ties by term
    ascending (the engine-identical ordering the oracle relies on)."""
    rows = TS.tfidf_top_terms(documents, k=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == documents.count()
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (
                a.score == b.score and a.term < b.term
            ), (doc, a, b)


def test_stratified_sample_deterministic_and_correct(spark, documents):
    """Same rows on every run; membership matches a per-row recompute of
    the md5 bucket rule; rates actually stratify."""
    from careers_spark.operators import sampling as SMP

    rates = {"en": 50, "zh": 20}
    kept1 = SMP.stratified_hash_sample(
        documents, rates=rates, default_pct=10, salt="r5"
    ).collect()
    kept2 = SMP.stratified_hash_sample(
        documents, rates=rates, default_pct=10, salt="r5"
    ).collect()
    assert sorted(r.doc_id for r in kept1) == sorted(r.doc_id for r in kept2)

    import hashlib

    def bucket(doc_id, salt):
        return int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16) % 100

    expect = {
        (r.doc_id, r.lang)
        for r in documents.select("doc_id", "lang").collect()
        if bucket(r.doc_id, "r5") < rates.get(r.lang, 10)
    }
    assert {(r.doc_id, r.lang) for r in kept1} == expect
    for r in kept1:
        assert r.bucket == bucket(r.doc_id, "r5")


def test_stratified_sample_salt_changes_composition(spark, documents):
    """Different salt -> different (re-seedable) sample; rate=100 keeps
    everything, rate=0 keeps nothing."""
    from careers_spark.operators import sampling as SMP

    a = {r.doc_id for r in SMP.stratified_hash_sample(documents, salt="a").collect()}
    b = {r.doc_id for r in SMP.stratified_hash_sample(documents, salt="b").collect()}
    assert a != b
    n = documents.count()
    full = SMP.stratified_hash_sample(documents, default_pct=100, salt="x")
    assert full.count() == n
    none = SMP.stratified_hash_sample(documents, default_pct=0, salt="x")
    assert none.count() == 0


# ---- gopher repetition ---------------------------------------------------
def test_gopher_repetition_golden(spark):
    """Hand-computed: 'a b a b a b c' has bigrams [ab, ba, ab, ba, bc]
    -> top 'a b' 2/6... recomputed below; trigrams [aba, bab, aba, bab,
    abc] -> 4 of 5 occurrences duplicated."""
    df = spark.createDataFrame(
        [(0, "a b a b a b c"), (1, "u v w x y z q r")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.top_bigram_frac, r.dup_trigram_frac, r.keep)
        for r in TS.gopher_repetition(df).collect()
    }
    # doc 0: 6 bigram occurrences [ab,ba,ab,ba,ab,bc] -> top 'a b' = 3/6;
    # 5 trigram occurrences [aba,bab,aba,bab,abc] -> dup = 4/5
    assert got[0] == (0.5, 0.8, False)
    # doc 1: all 7 bigrams distinct -> 1/7; all trigrams unique -> 0.0
    assert got[1] == (0.142857, 0.0, True)


def test_gopher_keep_thresholds(spark):
    """keep flips exactly at the paper thresholds (0.20 top-bigram)."""
    # 10 tokens: 'x y' appears twice among 9 bigram occurrences (0.222 > 0.2)
    over = "x y a b c d e f x y"
    # 'x y' twice among 10 occurrences of an 11-token doc (0.2 <= 0.2)
    at = "x y a b c d e f g x y"
    df = spark.createDataFrame(
        [(0, over), (1, at)], "doc_id long, text string"
    )
    got = {r.doc_id: r.keep for r in TS.gopher_repetition(df).collect()}
    assert got[0] is False and got[1] is True


def test_recall_at_k_counts_and_division(spark):
    from careers_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (3, 30)],
        "query_id long, neighbor_id long",
    )
    # q1: 2/3 found; q2: both found; q3: ANN missed it entirely (no rows)
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 20), (2, 21)],
        "query_id long, neighbor_id long",
    )
    got = {
        r.query_id: (r.n_exact, r.n_hits, r.recall)
        for r in recall_at_k(approx, exact).collect()
    }
    assert got == {
        1: (3, 2, round(2 / 3, 6)),
        2: (2, 2, 1.0),
        3: (1, 0, 0.0),
    }


def test_recall_at_k_lsh_vs_brute_force_real_corpus(spark):
    from careers_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        recall_at_k,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = brute_force_topk(emb, k=5, query_pred="vec_id % 100 = 0")
    approx = lsh_bucketed_topk(
        emb, k=5, n_planes=6, query_pred="vec_id % 100 = 0", dim=64
    )
    rows = recall_at_k(approx, exact).collect()
    # one row per exact-side query, recall == n_hits / n_exact, in [0,1]
    assert len(rows) == exact.select("query_id").distinct().count()
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert r.recall == round(r.n_hits / r.n_exact, 6)


def test_label_ranking_eval_hand_golden(spark):
    """MRR / p@k against hand-ranked 2-d vectors: relevant neighbors
    sit at ranks 2 and 3 of the k=3 cosine ranking."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),   # query
            (1, [0.9, 0.1], 2),   # rk 1, not relevant
            (2, [0.8, 0.6], 1),   # rk 2, relevant
            (3, [0.0, 1.0], 1),   # rk 3, relevant
            (4, [-1.0, 0.0], 2),  # below k
        ],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = SIM.label_ranking_eval(emb, k=3, query_pred="vec_id = 0").collect()
    assert (r.query_id, r.first_rel_rank, r.n_rel) == (0, 2, 2)
    assert r.p_at_k == round(2 / 3, 6)
    assert r.rr == 0.5


def test_label_ranking_eval_no_relevant_is_rr_zero(spark):
    """A query whose label never appears in the top-k reports the MRR
    convention values: NULL first_rel_rank, rr = 0, p_at_k = 0."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 9),
            (1, [0.9, 0.1], 2),
            (2, [0.8, 0.6], 1),
            (3, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = SIM.label_ranking_eval(emb, k=3, query_pred="vec_id = 0").collect()
    assert r.first_rel_rank is None
    assert (r.n_rel, r.p_at_k, r.rr) == (0, 0.0, 0.0)


def test_embedding_gramian_hand_and_psd(spark):
    """Hand lattice Gram on 3 tiny vectors, plus the PSD property of
    the reconstructed matrix on the real sf0.001 table."""
    import numpy as np

    from careers_spark.operators.similarity import embedding_gramian

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.5, -1.0]), (2, [0.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    got = {(r.i, r.j): int(r.g) for r in embedding_gramian(df).collect()}
    q = [[1000000, 2000000], [500000, -1000000], [0, 3000000]]
    want = {
        (i, j): sum(v[i] * v[j] for v in q)
        for i in range(2)
        for j in range(i, 2)
    }
    assert got == want

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    rows = embedding_gramian(emb).collect()
    d = max(r.j for r in rows) + 1
    assert len(rows) == d * (d + 1) // 2
    G = np.zeros((d, d))
    for r in rows:
        G[r.i, r.j] = G[r.j, r.i] = float(r.g)
    evals = np.linalg.eigvalsh(G)
    assert evals.min() > -1e-3 * abs(evals.max())  # PSD up to float noise
    assert all(r.n_vecs == 200 for r in rows)


def test_embedding_gramian_matches_numpy_lattice(spark):
    """Exact equality with a numpy int64 recompute of the quantized
    Gram on 50 real vectors."""
    import numpy as np

    from careers_spark.operators.similarity import embedding_gramian

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    pdf = emb.toPandas()
    Q = np.array(
        [
            [round(float(np.float64(v)) * 1e6) for v in row]
            for row in pdf["embedding"]
        ],
        dtype=np.int64,
    )
    W = Q.T @ Q
    got = {(r.i, r.j): int(r.g) for r in embedding_gramian(emb).collect()}
    for (i, j), g in got.items():
        assert g == W[i, j]


def test_ndcg_hand_golden(spark):
    """Relevant at ranks 2 and 3 of k=3, corpus holds 3 relevant
    partners -> ideal = top-3 prefix; hand lattice arithmetic."""
    import math

    from careers_spark.operators.similarity import ndcg_eval

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),   # query
            (1, [0.9, 0.1], 2),   # rk 1, not relevant
            (2, [0.8, 0.6], 1),   # rk 2, relevant
            (3, [0.0, 1.0], 1),   # rk 3, relevant
            (4, [-1.0, 0.0], 1),  # relevant but below k
        ],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = ndcg_eval(emb, k=3, query_pred="vec_id = 0").collect()
    w = [round(1e9 / math.log2(i + 1)) for i in range(1, 4)]
    dcg = w[1] + w[2]
    idcg = w[0] + w[1] + w[2]  # ideal_rel = min(4 - 1, 3) = 3
    assert (r.n_rel_at_k, r.ideal_rel, r.dcg_fp) == (2, 3, dcg)
    assert r.ndcg == round(dcg / idcg, 6)


def test_ndcg_perfect_and_absent_label(spark):
    """A query whose relevant docs occupy the top ranks scores 1.0;
    a label with no other member reports NULL."""
    from careers_spark.operators.similarity import ndcg_eval

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),
            (1, [0.99, 0.01], 1),  # rk 1, relevant
            (2, [0.9, 0.2], 1),    # rk 2, relevant
            (3, [0.0, 1.0], 2),
            (10, [0.5, 0.5], 9),   # lone label -> NULL ndcg
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r.query_id: r
        for r in ndcg_eval(emb, k=2, query_pred="vec_id in (0, 10)").collect()
    }
    assert got[0].ndcg == 1.0 and got[0].ideal_rel == 2
    assert got[10].ndcg is None and got[10].ideal_rel == 0


def test_average_precision_hand_golden(spark):
    """AP@3 against the same hand-ranked vectors as the MRR golden:
    relevants at ranks 2 and 3, R = 3 same-label vectors in the
    corpus, so AP = (1/2 + 2/3) / min(3, 3)."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),   # query
            (1, [0.9, 0.1], 2),   # rk 1, not relevant
            (2, [0.8, 0.6], 1),   # rk 2, relevant (tp=1 -> 1e9*1 div 2)
            (3, [0.0, 1.0], 1),   # rk 3, relevant (tp=2 -> 1e9*2 div 3)
            (4, [-1.0, 0.0], 1),  # below k but same label: R = 3
        ],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = SIM.average_precision_eval(
        emb, k=3, query_pred="vec_id = 0"
    ).collect()
    assert (r.query_id, r.n_rel_corpus, r.n_rel_topk) == (0, 3, 2)
    want_fp = (10**9 * 1) // 2 + (10**9 * 2) // 3
    assert r.ap_fp == want_fp
    assert r.ap == round(want_fp / (10**9 * 3.0), 6)


def test_average_precision_perfect_ranking_is_one(spark):
    """All R relevants at the top ranks with R <= k gives AP = 1
    exactly (every fixed-point term is (1e9*t) div t = 1e9)."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),
            (1, [0.99, 0.05], 1),
            (2, [0.9, 0.2], 1),
            (3, [0.0, 1.0], 2),
            (4, [-1.0, 0.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = SIM.average_precision_eval(
        emb, k=3, query_pred="vec_id = 0"
    ).collect()
    assert r.n_rel_corpus == 2 and r.n_rel_topk == 2
    assert r.ap == 1.0


def test_average_precision_singleton_label_null(spark):
    """A query whose label appears nowhere else (R = 0) reports NULL
    AP, never 0/0."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 9),
            (1, [0.9, 0.1], 1),
            (2, [0.8, 0.6], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = SIM.average_precision_eval(
        emb, k=3, query_pred="vec_id = 0"
    ).collect()
    assert r.n_rel_corpus == 0 and r.ap is None


def test_average_precision_python_lockstep(spark):
    """Seeded random corpus: the operator's per-query AP equals a
    python recompute of the fixed-point recipe over the exact
    brute-force ranking."""
    import random

    rng = random.Random(17)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(4)],
            rng.randrange(3),
        )
        for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    k = 5
    got = {
        r.query_id: (r.n_rel_corpus, r.ap_fp, r.ap)
        for r in SIM.average_precision_eval(
            emb, k=k, query_pred="vec_id % 10 = 0"
        ).collect()
    }
    ranked = SIM.brute_force_topk(
        emb, k=k, query_pred="vec_id % 10 = 0"
    ).collect()
    labels = {i: lab for i, _, lab in rows}
    by_q = {}
    for r in ranked:
        by_q.setdefault(r.query_id, []).append((r.rk, r.neighbor_id))
    for qid, neigh in by_q.items():
        qlab = labels[qid]
        big_r = sum(1 for i, lab in labels.items() if lab == qlab and i != qid)
        tp = 0
        ap_fp = 0
        for rk, nid in sorted(neigh):
            if labels[nid] == qlab:
                tp += 1
                ap_fp += (10**9 * tp) // rk
        want_ap = (
            None
            if big_r == 0
            else round(ap_fp / (10**9 * 1.0 * min(big_r, k)), 6)
        )
        assert got[qid] == (big_r, ap_fp, want_ap)
