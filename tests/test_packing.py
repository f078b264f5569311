"""Sequence packing (packing.pack_sequences) + the curated_corpus
composition query."""

import pytest
from pyspark.sql import functions as F

from careers_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def stream_docs(spark):
    # one lang, shards=1 -> a single deterministic stream ordered by
    # doc_id; token counts 4, 3, 5, 2, 7
    rows = [
        (1, "a b c d", "en"),
        (2, "e f g", "en"),
        (3, "h i j k l", "en"),
        (4, "m n", "en"),
        (5, "o p q r s t u", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pack_golden_single_stream(spark, stream_docs):
    """window=8: positions 0,4,7,12,14 -> seq ids 0,0,0,1,1; doc 2
    (pos 4, 3 tokens) fits exactly to the boundary (4+3 <= 8? 7 < 8 ok);
    doc 3 starts at 7 and crosses into seq 1 -> straddles."""
    got = {
        r.doc_id: (r.seq_id, r.offset, r.straddles)
        for r in pack_sequences(stream_docs, window=8, shards=1).collect()
    }
    assert got[1] == (0, 0, False)
    assert got[2] == (0, 4, False)
    assert got[3] == (0, 7, True)   # 7 + 5 = 12 > 8
    assert got[4] == (1, 4, False)  # position 12
    assert got[5] == (1, 6, True)   # position 14, 6 + 7 = 13 > 8
    # exclusive cumsum: positions recoverable as seq_id*8 + offset
    pos = {d: s * 8 + o for d, (s, o, _) in got.items()}
    assert pos == {1: 0, 2: 4, 3: 7, 4: 12, 5: 14}


def test_pack_exact_fit_does_not_straddle(spark):
    """A doc ending exactly at the window boundary is NOT a straddle
    (offset + n_tokens == window)."""
    df = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "e f g h", "en")],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: (r.seq_id, r.offset, r.straddles)
           for r in pack_sequences(df, window=4, shards=1).collect()}
    assert got[1] == (0, 0, False)
    assert got[2] == (1, 0, False)


def test_pack_partitioning_invariant(spark, stream_docs):
    """The layout depends only on (lang, shard, doc_id) — never on the
    input's physical partitioning."""
    a = sorted(map(tuple, pack_sequences(stream_docs, window=8).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(stream_docs.repartition(7), window=8).collect(),
        )
    )
    assert a == b


def test_pack_streams_are_independent(spark):
    """Different langs (and different shards) pack independently: each
    stream starts at position 0."""
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e f", "de"), (3, "g h i", "en")],
        "doc_id long, text string, lang string",
    )
    got = pack_sequences(df, window=8, shards=1).collect()
    first_per_lang = {}
    for r in sorted(got, key=lambda r: r.doc_id):
        first_per_lang.setdefault(r.lang, (r.seq_id, r.offset))
    assert first_per_lang == {"en": (0, 0), "de": (0, 0)}


def test_curated_corpus_equals_leg_conjunction(spark):
    """The composed driver query equals the AND of its four legs
    computed independently on the sf0.001 documents table."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    qs = e.queries()
    cur = {r.doc_id: r for r in qs["curated_corpus"](spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    from careers_spark.operators import dedup as DD
    from careers_spark.operators import sampling as SMP
    from careers_spark.operators import textstats as TS

    g = {r.doc_id: r.keep for r in TS.gopher_repetition(docs).collect()}
    d = {
        r.doc_id: not r.contaminated
        for r in DD.contamination_flags(docs, "doc_id % 97 = 0", n=3).collect()
    }
    nd = {
        r.doc_id: r.is_kept
        for r in DD.near_dup_canonical(docs, threshold=0.2).collect()
    }
    s = {
        r.doc_id
        for r in SMP.stratified_hash_sample(
            docs, rates={"en": 50, "zh": 20}, default_pct=10, salt="r5"
        ).collect()
    }
    assert set(cur) == set(d) & set(g)
    for doc_id, row in cur.items():
        assert row.keep_repetition == g[doc_id]
        assert row.keep_decontam == d[doc_id]
        assert row.keep_dedup == nd[doc_id]
        assert row.keep_sample == (doc_id in s)
        assert row.selected == (
            g[doc_id] and d[doc_id] and nd[doc_id] and doc_id in s
        )
    assert any(r.selected for r in cur.values())
    assert any(not r.selected for r in cur.values())


def test_pack_matches_python_recompute_random(spark):
    """Full independent python recompute of the packing layout
    (tokenize, md5 shard, per-stream exclusive cumsum) on seeded
    pseudo-random corpora — broader than the hand goldens."""
    import hashlib
    import re

    def recompute(rows, window, shards):
        toks = {
            d: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
            for d, txt, _ in rows
        }
        shard = {
            d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % shards
            for d, _, _ in rows
        }
        out = {}
        streams = {}
        for d, txt, lang in sorted(rows):
            streams.setdefault((lang, shard[d]), []).append(d)
        for (lang, sh), ids in streams.items():
            pos = 0
            for d in ids:
                n = len(toks[d])
                out[d] = (lang, sh, n, pos // window, pos % window,
                          pos % window + n > window)
                pos += n
        return out

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    for seed in (0, 1):
        rows = []
        for d in range(40):
            h = int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8], 16)
            n = 1 + h % 9
            lang = ["en", "de", "fr"][h % 3]
            text = " ".join(words[(h + i) % len(words)] for i in range(n))
            rows.append((d, text, lang))
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        want = recompute(rows, window=16, shards=3)
        got = {
            r.doc_id: (r.lang, r.shard, r.n_tokens, r.seq_id, r.offset,
                       r.straddles)
            for r in pack_sequences(df, window=16, shards=3).collect()
        }
        assert got == want, seed


def test_training_manifest_packs_selected_only(spark):
    """The manifest contains exactly the curated-selected docs, and
    their packing positions are recomputed over the FILTERED stream
    (not inherited from the full-corpus layout)."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    qs = e.queries()
    selected = {
        r.doc_id
        for r in qs["curated_corpus"](spark, sf).collect()
        if r.selected
    }
    manifest = {r.doc_id: r for r in qs["training_manifest"](spark, sf).collect()}
    assert set(manifest) == selected and selected
    # within each (lang, shard) stream positions start at 0 and are a
    # gapless exclusive cumsum of the surviving docs
    streams = {}
    for r in sorted(manifest.values(), key=lambda r: r.doc_id):
        streams.setdefault((r.lang, r.shard), []).append(r)
    for rows in streams.values():
        pos = 0
        for r in rows:
            assert r.seq_id * 64 + r.offset == pos
            pos += r.n_tokens
