"""Goldens for clustering.label_noise_audit and graph.negative_samples."""

import hashlib

import pytest

from careers_spark.operators.clustering import label_noise_audit
from careers_spark.operators.graph import negative_samples


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )


def test_label_noise_flags_the_planted_mislabel(spark):
    a, b = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [
        (a, 0), (a, 0), (a, 0),
        (b, 1), (b, 1), (b, 1),
        (b, 0),  # vec 6: labeled 0 but sits exactly on label-1 mass
    ]
    got = {r["vec_id"]: r.asDict() for r in label_noise_audit(_emb(spark, rows)).collect()}
    assert got[6]["flagged"] is True
    assert got[6]["best_other_label"] == 1
    assert got[6]["margin"] > 0
    # the pure label-1 points are closer to their own centroid
    assert all(not got[i]["flagged"] for i in (3, 4, 5))
    # margins are exact integers on the lattice
    assert isinstance(got[6]["margin"], int)


def test_label_noise_tie_breaks_to_smaller_label(spark):
    # point P (label 0) exactly equidistant from label-1 and label-2
    # centroids -> best_other_label must be 1
    rows = [
        ([0.0, 0.0], 0), ([0.0, 0.0], 0),
        ([1.0, 1.0], 1), ([1.0, 1.0], 1),
        ([-1.0, -1.0], 2), ([-1.0, -1.0], 2),
    ]
    got = {r["vec_id"]: r.asDict() for r in label_noise_audit(_emb(spark, rows)).collect()}
    assert got[0]["best_other_label"] == 1
    assert got[0]["margin"] == got[0]["d_own"] - got[0]["d_other"]
    # equidistance: d to both other centroids equal, so margin is
    # d_own - d(label 1) and label 2 never surfaces
    assert all(r["best_other_label"] != 2 for r in got.values() if r["label"] == 0)


def test_label_noise_single_label_raises(spark):
    with pytest.raises(ValueError):
        label_noise_audit(_emb(spark, [([1.0, 0.0], 0), ([0.9, 0.1], 0)]))


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src string, dst string, n_obs int"
    )


PAIRS = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "e"), ("d", "e"), ("b", "c")]


def _python_negatives(pairs, m=2, salt="neg"):
    nodes = sorted({x for p in pairs for x in p})
    edge_set = {tuple(sorted(p)) for p in pairs}
    out = []
    for s, d in pairs:
        for j in range(m):
            key = f"{s}|{d}|{j}|{salt}".encode()
            idx = int(hashlib.md5(key).hexdigest()[:8], 16) % len(nodes)
            neg = nodes[idx]
            if neg in (s, d):
                continue
            if tuple(sorted((s, neg))) in edge_set:
                continue
            out.append((s, d, j, neg))
    return sorted(out)


def test_negative_samples_python_lockstep(spark):
    got = sorted(
        tuple(r) for r in negative_samples(_edges(spark, PAIRS), m=2).collect()
    )
    assert got == _python_negatives(PAIRS, m=2)
    # invariants: never an endpoint, never an existing edge
    edge_set = {tuple(sorted(p)) for p in PAIRS}
    for s, d, j, neg in got:
        assert neg not in (s, d)
        assert tuple(sorted((s, neg))) not in edge_set
        assert 0 <= j < 2


def test_negative_samples_salt_reseeds(spark):
    e = _edges(spark, PAIRS)
    a = sorted(tuple(r) for r in negative_samples(e, m=2, salt="neg").collect())
    b = sorted(tuple(r) for r in negative_samples(e, m=2, salt="other").collect())
    assert a == sorted(tuple(r) for r in negative_samples(e, m=2).collect())
    assert a != b
