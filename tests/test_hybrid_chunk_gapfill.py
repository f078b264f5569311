"""Round-5 batch: RRF hybrid fusion, sliding-window chunking, link
prediction, temperature sampling weights, hourly gap-fill, and the
per-stratum percentile quality gate."""

import datetime as dt
import hashlib
import math

from pyspark.sql import functions as F

from careers_spark.operators.graph import link_prediction
from careers_spark.operators.packing import chunk_tokens
from careers_spark.operators.retrieval import rrf_fuse
from careers_spark.operators.sampling import temperature_weights
from careers_spark.operators.temporal import gap_fill_hourly
from careers_spark.operators.textstats import (
    quality_percentile_filter,
    quality_score,
)


# ---------------------------------------------------------------- RRF

def test_rrf_hand_golden(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank int"
    )
    got = {
        r.doc_id: (r.score, r.rank)
        for r in rrf_fuse([lex, dense], k_const=60, k=10).collect()
    }
    exp_scores = {
        1: round(1 / 61, 9),
        2: round(1 / 62 + 1 / 61, 9),
        3: round(1 / 63, 9),
        4: round(1 / 62, 9),
    }
    order = sorted(exp_scores.items(), key=lambda kv: (-kv[1], kv[0]))
    exp = {d: (s, i + 1) for i, (d, s) in enumerate(order)}
    assert got == exp
    assert [d for d, (_, rk) in sorted(got.items(), key=lambda kv: kv[1][1])] \
        == [2, 1, 4, 3]


def test_rrf_k_truncation_and_tiebreak(spark):
    # two docs with the identical single-list rank -> identical score,
    # tie broken by doc_id; k=1 keeps only the smaller id
    a = spark.createDataFrame([(7, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(5, 1)], "doc_id long, rank int")
    rows = rrf_fuse([a, b], k_const=60, k=1).collect()
    assert len(rows) == 1 and rows[0].doc_id == 5 and rows[0].rank == 1


# ---------------------------------------------------- link prediction

def test_link_prediction_square_golden(spark):
    # 4-cycle 1-2-3-4-1: the two diagonals are the only candidates
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    got = {
        (r.src, r.dst): (r.common, r.jaccard, r.adamic_adar)
        for r in link_prediction(edges, min_common=2).collect()
    }
    aa = round(2 * round(1e9 / math.log(2)) / 1e9, 6)
    assert got == {(1, 3): (2, 1.0, aa), (2, 4): (2, 1.0, aa)}


def test_link_prediction_excludes_existing_edges(spark):
    # triangle: every pair is adjacent -> no candidates at all
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    assert link_prediction(edges, min_common=1).count() == 0


def test_link_prediction_direction_and_dup_invariant(spark):
    base = [(1, 2), (2, 3), (3, 4), (1, 4)]
    noisy = base + [(b, a) for a, b in base] + base  # reversed + dups
    e1 = spark.createDataFrame(base, "src long, dst long")
    e2 = spark.createDataFrame(noisy, "src long, dst long")
    r1 = sorted(map(tuple, link_prediction(e1, min_common=2).collect()))
    r2 = sorted(map(tuple, link_prediction(e2, min_common=2).collect()))
    assert r1 == r2 and len(r1) == 2


def test_link_prediction_path_min_common(spark):
    # path 1-2-3: (1,3) has exactly one common neighbor
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert link_prediction(edges, min_common=2).count() == 0
    rows = link_prediction(edges, min_common=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src, r.dst, r.common) == (1, 3, 1)
    assert r.jaccard == 1.0  # deg(1)=deg(3)=1, union = 1
    assert r.adamic_adar == round(round(1e9 / math.log(2)) / 1e9, 6)


# ----------------------------------------------------------- chunking

def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_chunk_tokens_hand_positions(spark):
    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_tokens(df, size=4, stride=3).collect(), key=lambda r: r.chunk_id
    )
    assert [(r.chunk_id, r.start_tok, r.chunk_len) for r in rows] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4),
    ]
    assert rows[0].chunk_hash == _md5(" ".join(toks[0:4]))
    assert rows[1].chunk_hash == _md5(" ".join(toks[3:7]))
    assert rows[2].chunk_hash == _md5(" ".join(toks[6:10]))


def test_chunk_tokens_tail_and_small_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.start_tok, r.chunk_len, r.chunk_hash)
        for r in chunk_tokens(df, size=4, stride=3).collect()
    }
    # n=5 > size -> 2 chunks, the tail one short (tokens d e)
    assert got[(1, 0)] == (0, 4, _md5("a b c d"))
    assert got[(1, 1)] == (3, 2, _md5("d e"))
    # n <= size -> one chunk
    assert got[(2, 0)] == (0, 2, _md5("x y"))
    # empty doc still yields one empty chunk
    assert got[(3, 0)] == (0, 0, _md5(""))
    assert len(got) == 4


def test_chunk_tokens_overlap_covers_every_token(spark):
    # consecutive chunks overlap by size - stride; union covers 0..n-1
    n, size, stride = 53, 16, 11
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(n)))], "doc_id long, text string"
    )
    rows = chunk_tokens(df, size=size, stride=stride).collect()
    covered = set()
    for r in rows:
        covered.update(range(r.start_tok, r.start_tok + r.chunk_len))
    assert covered == set(range(n))
    assert max(r.start_tok for r in rows) < n  # no empty trailing chunk


# ------------------------------------------------- temperature weights

def test_temperature_weights_python_lockstep(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 90 else "sw") for i in range(100)],
        "doc_id long, lang string",
    )
    got = {r.lang: r for r in temperature_weights(df, "lang").collect()}
    n = {"en": 90, "sw": 10}
    fp = {l: round(math.sqrt(c / 100) * 1e12) for l, c in n.items()}
    z = sum(fp.values())
    for l in n:
        assert got[l].n_docs == n[l]
        assert got[l].share == round(n[l] / 100, 6)
        assert got[l].weight == round(fp[l] / z, 6)
        assert got[l].boost == round(fp[l] / z * 100 / n[l], 6)
    # flattening: rare stratum upsampled, common downsampled
    assert got["sw"].boost > 1.0 > got["en"].boost
    assert abs(got["en"].weight + got["sw"].weight - 1.0) < 1e-5


# ------------------------------------------------------------ gap fill

def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gap_fill_hourly_golden(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0), "A"), (2, _ts(0, 30), "A"), (3, _ts(2), "A"),
            (4, _ts(1), "B"),
        ],
        "event_id long, ts timestamp, event_type string",
    )
    rows = gap_fill_hourly(ev).collect()
    h0 = next(r.hour for r in rows if r.event_type == "A" and r.cnt == 2)
    got = {
        (r.event_type, r.hour): (r.cnt, r.is_gap, r.last_active_hour)
        for r in rows
    }
    assert len(got) == 6  # 2 keys x 3 hours, gaps included
    assert got[("A", h0)] == (2, False, h0)
    assert got[("A", h0 + 1)] == (0, True, h0)
    assert got[("A", h0 + 2)] == (1, False, h0 + 2)
    assert got[("B", h0)] == (0, True, None)  # before first activity
    assert got[("B", h0 + 1)] == (1, False, h0 + 1)
    assert got[("B", h0 + 2)] == (0, True, h0 + 1)  # forward fill


# ---------------------------------------------- percentile quality gate

def test_quality_percentile_filter_lockstep(spark, sf_docs=None):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = quality_percentile_filter(docs, "lang", q=0.25).collect()
    qualities = {
        r.doc_id: r.quality for r in quality_score(docs).collect()
    }
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    # python recompute of the linear-interpolation quantile per lang
    by_lang = {}
    for d, q in qualities.items():
        by_lang.setdefault(langs[d], []).append(q)

    def quantile(vals, p):
        vals = sorted(vals)
        idx = (len(vals) - 1) * p
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        return round(vals[lo] + (vals[hi] - vals[lo]) * (idx - lo), 6)

    thr = {l: quantile(v, 0.25) for l, v in by_lang.items()}
    assert len(out) == len(qualities)
    for r in out:
        assert r.thr == thr[r.lang]
        assert r.keep == (qualities[r.doc_id] >= thr[r.lang])
    # the gate keeps roughly the top three quartiles of every stratum
    for lang, vals in by_lang.items():
        kept = sum(1 for r in out if r.lang == lang and r.keep)
        assert kept >= 0.70 * len(vals)


def test_chunk_tokens_plan_has_no_shuffle(spark):
    """The no-shuffle claim is the operator's scale story — pin it."""
    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(10)], "doc_id long, text string"
    )
    plan = chunk_tokens(df, size=4, stride=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_tokens_randomized_config_sweep(spark):
    """Coverage/position invariants over random (n, size, stride)."""
    import random

    rng = random.Random(3)
    for _ in range(8):
        n = rng.randint(0, 200)
        size = rng.randint(1, 40)
        stride = rng.randint(1, size)
        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(n)))],
            "doc_id long, text string",
        )
        rows = sorted(
            chunk_tokens(df, size=size, stride=stride).collect(),
            key=lambda r: r.chunk_id,
        )
        cfg = (n, size, stride)
        # starts are exactly 0, stride, 2*stride, ...
        assert [r.start_tok for r in rows] == [
            i * stride for i in range(len(rows))
        ], cfg
        # every token covered exactly by the union; no phantom tokens
        covered = set()
        for r in rows:
            assert r.chunk_len == min(size, n - r.start_tok), cfg
            covered.update(range(r.start_tok, r.start_tok + r.chunk_len))
        assert covered == set(range(n)), cfg
        # the final window reaches the tail; no chunk starts past it
        if n > 0:
            assert rows[-1].start_tok + rows[-1].chunk_len == n, cfg
            assert all(r.start_tok < n for r in rows), cfg
        else:
            assert len(rows) == 1 and rows[0].chunk_len == 0, cfg


def test_chunk_tokens_rejects_stride_above_size(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_tokens(df, size=4, stride=5)
