"""Source-overlap matrix, incremental near-dups, random projection."""

import hashlib

from careers_spark.operators.dedup import (
    incremental_near_dups,
    jaccard_pairs,
    source_overlap_matrix,
)
from careers_spark.operators.similarity import random_projection


def _docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "feedA"),
        (1, base, "feedB"),                    # exact dup across feeds
        (2, base.replace("kappa", "mu"), "feedB"),  # near dup of 0/1
        (3, "one two three four five six seven eight nine ten", "feedA"),
        (4, "totally different words nothing shared here at all ok fine", "feedC"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_source_overlap_matrix_golden(spark):
    got = {
        (r.src_a, r.src_b): r.n_pairs
        for r in source_overlap_matrix(_docs(spark), threshold=0.5).collect()
    }
    # pairs at J>=0.5: (0,1) exact dup A-B, (0,2) A-B, (1,2) B-B
    assert got == {("feedA", "feedB"): 2, ("feedB", "feedB"): 1}


def test_incremental_near_dups_only_new_vs_old(spark):
    # new = doc_id >= 2; (0,1) is old x old and must NOT appear even
    # though it is an exact duplicate; new x new also excluded
    out = incremental_near_dups(
        _docs(spark), "doc_id >= 2", threshold=0.5
    ).collect()
    pairs = {(r.new_doc, r.old_doc) for r in out}
    assert pairs == {(2, 0), (2, 1)}
    assert all(r.jaccard >= 0.5 for r in out)


def test_incremental_matches_full_join_restriction(spark):
    # ground truth: the full exact-jaccard pair set restricted to
    # (new, old) pairs equals the incremental operator's output
    df = _docs(spark)
    full = {
        (max(r.doc_a, r.doc_b), min(r.doc_a, r.doc_b)): r.jaccard
        for r in jaccard_pairs(df, threshold=0.5).collect()
        if (r.doc_a >= 2) != (r.doc_b >= 2)
    }
    # normalize: new id is always >= 2 here and ids 0/1 are old
    got = {
        (r.new_doc, r.old_doc): r.jaccard
        for r in incremental_near_dups(df, "doc_id >= 2", 0.5).collect()
    }
    assert got == full


def _sign(i, j):
    h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16)
    return 1 - 2 * (h % 2)


def test_random_projection_python_lockstep(spark):
    vecs = [
        (0, [0.5, -1.25, 2.0]),
        (1, [0.0, 0.0, 0.0]),
        (2, [1e-7, -1e-7, 3.75]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r.vec_id, r.dim): r.proj_fp
        for r in random_projection(df, out_dims=4).collect()
    }
    import numpy as np

    for vid, v in vecs:
        q = [round(float(np.float32(x)) * 1e6) for x in v]
        for j in range(4):
            exp = sum(_sign(i, j) * q[i] for i in range(len(q)))
            assert got[(vid, j)] == exp, (vid, j)
    # zero vector projects to zero everywhere; nonzero ones don't
    assert all(got[(1, j)] == 0 for j in range(4))
    assert any(got[(0, j)] != 0 for j in range(4))


def test_random_projection_deterministic_and_identical_inputs_agree(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    rows = random_projection(df, out_dims=3).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.dim] = r.proj_fp
    assert by_vec[0] == by_vec[1]
    rows2 = random_projection(df, out_dims=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
