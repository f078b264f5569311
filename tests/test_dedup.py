"""Dedup-family goldens on hand-built corpora (exact expected pairs)."""

import pandas as pd
import pytest

from careers_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",  # near-dup of 1
        3: "completely different text about spark engines here",
        4: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
        5: "short",
    }
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )


def test_dedup_exact(spark, docs):
    got = {r.canonical_doc_id: r.n_dups for r in DD.dedup_exact(docs).collect()}
    assert got[1] == 2  # docs 1 and 4 collapse
    assert got[2] == 1 and got[3] == 1 and got[5] == 1
    assert 4 not in got


def test_shingles(spark, docs):
    sh = DD.doc_shingles(docs, n=3)
    by_doc = {
        r.doc_id: r.n for r in sh.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert by_doc[1] == 7  # 9 tokens -> 7 trigrams
    assert 5 not in by_doc  # too short for any trigram


def test_jaccard_pairs_golden(spark, docs):
    got = {(r.doc_a, r.doc_b): r.jaccard for r in DD.jaccard_pairs(docs, threshold=0.1).collect()}
    # docs 1 and 4 identical -> jaccard 1.0; 1-2 share 6 of 7 trigrams
    # (only "over the lazy"+tail differs) -> 6 / (7 + 7 - 6) = 0.75
    assert got[(1, 4)] == 1.0
    assert got[(1, 2)] == 0.75
    assert got[(2, 4)] == 0.75
    assert (1, 3) not in got


def test_lsh_finds_exact_and_near_dups(spark, docs):
    got = {(r.doc_a, r.doc_b): r.jaccard for r in
           DD.lsh_verified_pairs(docs, num_hashes=12, band_size=3, threshold=0.1).collect()}
    assert got[(1, 4)] == 1.0  # identical docs always share every band
    # near-dups may or may not collide in a band (probabilistic), but any
    # reported pair must carry the exact verified jaccard
    for (a, b), j in got.items():
        assert j >= 0.1


def test_lsh_subset_of_exact(spark, docs):
    """LSH-verified pairs are a subset of the exact all-pairs result."""
    exact = {(r.doc_a, r.doc_b) for r in DD.jaccard_pairs(docs, threshold=0.1).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in
           DD.lsh_verified_pairs(docs, threshold=0.1).collect()}
    assert lsh <= exact


def test_simhash_similarity(spark, docs):
    sims = {r.doc_id: r.simhash for r in DD.simhash(docs, bits=32).collect()}
    assert sims[1] == sims[4]  # identical text -> identical simhash

    def hamming(a, b):
        return bin(a ^ b).count("1")

    # near-dups differ in fewer bits than unrelated docs
    assert hamming(sims[1], sims[2]) < hamming(sims[1], sims[3])


def test_minhash_signature_stability(spark, docs):
    s1 = DD.minhash_signatures(docs, num_hashes=4).collect()
    s2 = DD.minhash_signatures(docs, num_hashes=4).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


def test_near_dup_canonical(spark, docs):
    """Docs 1/2/4 form one near-dup cluster (exact dup + one-word edit)
    -> canonical = min doc_id 1; 3 and 5 are their own canonicals."""
    got = {
        r.doc_id: (r.canonical_id, r.is_kept)
        for r in DD.near_dup_canonical(docs, threshold=0.5).collect()
    }
    assert len(got) == 5  # one row per input doc
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[4] == (1, False)
    assert got[3] == (3, True)
    assert got[5] == (5, True)
    # the dedup filter: exactly one kept doc per cluster
    kept = {cid for d, (cid, k) in got.items() if k}
    assert kept == {1, 3, 5}


def test_near_dup_canonical_chain(spark):
    """Transitive chain a~b, b~c (a never pairs with c directly) still
    collapses to ONE cluster via connected components."""
    import pandas as pd

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    texts = {
        10: base,
        11: base.replace("alpha", "omega"),
        12: base.replace("alpha", "omega").replace("upsilon", "phi"),
        13: "unrelated words entirely disjoint from the chain cluster",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    # trigram jaccard: 10~11 and 11~12 are one edit apart (15/21 = 0.71
    # >= 0.6) but 10~12 is two edits (12/24 = 0.5 < 0.6) — only CC
    # joins 10 and 12, through 11
    got = {
        r.doc_id: r.canonical_id
        for r in DD.near_dup_canonical(df, threshold=0.6).collect()
    }
    assert got[10] == got[11] == got[12] == 10
    assert got[13] == 13


def _all_pairs_hamming(bands_rows, n_bands=4):
    """Exact 64-bit hamming for every doc pair, from collected band rows."""
    sigs = {}
    for r in bands_rows:
        sigs.setdefault(r.doc_id, {})[r.band] = r.band_val
    ids = sorted(sigs)
    mask = (1 << 64) - 1  # band_val may be negative when bands == 1
    return {
        (a, b): sum(
            bin((sigs[a][j] ^ sigs[b][j]) & mask).count("1")
            for j in range(n_bands)
        )
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
    }


def test_simhash_bands_identical_docs(spark, docs):
    """Identical text -> identical 64-bit signature -> identical bands;
    every 16-bit band value stays inside [0, 2^16)."""
    bands = {(r.doc_id, r.band): r.band_val
             for r in DD.simhash_bands(docs, bands=4).collect()}
    for j in range(4):
        assert bands[(1, j)] == bands[(4, j)]
        assert 0 <= bands[(1, j)] < (1 << 16)


def test_simhash_near_dups_equals_bruteforce(spark, docs):
    """Pigeonhole banding is EXACT recall: for several thresholds the
    banded operator returns precisely the pairs whose true 64-bit
    hamming distance is <= k (hamming is band-partition-invariant, so
    the 4-band recompute is the ground truth for every k)."""
    exact = _all_pairs_hamming(DD.simhash_bands(docs, bands=4).collect())
    for k in (0, 3, 12):
        got = {(r.doc_a, r.doc_b): r.hamming
               for r in DD.simhash_near_dups(docs, max_hamming=k).collect()}
        assert got == {p: h for p, h in exact.items() if h <= k}, k


def test_simhash_near_dups_identical_pair(spark, docs):
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in DD.simhash_near_dups(docs, max_hamming=3).collect()}
    assert got[(1, 4)] == 0
    assert all(h <= 3 for h in got.values())


# ---- decontamination ----------------------------------------------------
def test_contamination_flags_golden(spark):
    """Hand-checked: eval doc 0 has trigrams {a b c, b c d}; train doc 1
    shares both of its 2 trigrams (frac 1.0 -> contaminated), doc 2
    shares 1 of 4 (0.25 -> contaminated at 0.05), doc 3 shares none."""
    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b c d",          # eval (pred doc_id = 0)
                "a b c",            # shares 'a b c'  (and only has 1)
                "x a b c d y",      # trigrams: x a b/a b c/b c d/c d y
                "p q r s",          # disjoint
            ],
        })
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_shared, r.overlap_frac, r.contaminated)
        for r in DD.contamination_flags(df, "doc_id = 0", n=3).collect()
    }
    assert 0 not in got  # eval docs are screened, not returned
    assert got[1] == (1, 1, 1.0, True)
    assert got[2] == (4, 2, 0.5, True)
    assert got[3] == (2, 0, 0.0, False)


def test_contamination_zero_eval_split(spark, docs):
    """An empty eval split flags nothing and keeps every train doc row
    (docs with >= n tokens)."""
    out = DD.contamination_flags(docs, "doc_id < 0", n=3).collect()
    assert all(r.n_shared == 0 and not r.contaminated for r in out)
    assert {r.doc_id for r in out} == {1, 2, 3, 4}  # doc 5 has 1 token


# ---- Bloom decontamination screen ----------------------------------------
def test_bloom_screen_no_false_negatives_and_exact_at_large_m(spark):
    """The Bloom theorem half: n_bloom >= n_exact on EVERY doc at any
    filter size (misses are impossible); and at a collision-free m the
    screen equals the exact one bit-for-bit."""
    from careers_spark.operators.sketches import bloom_contamination_screen

    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c d", "a b c", "x a b c d y", "p q r s"],
        })
    )
    exact = {
        r.doc_id: (r.n_shingles, r.n_shared, r.contaminated)
        for r in DD.contamination_flags(df, "doc_id = 0", n=3).collect()
    }
    for m in (4, 1 << 20):
        got = {
            r.doc_id: r
            for r in bloom_contamination_screen(
                df, "doc_id = 0", n=3, k=4, m=m
            ).collect()
        }
        assert set(got) == set(exact)
        for d, (n_sh, n_ex, contam) in exact.items():
            r = got[d]
            assert (r.n_shingles, r.n_exact) == (n_sh, n_ex)
            assert r.n_bloom >= r.n_exact          # no false negatives
            assert r.bloom_fp == r.n_bloom - r.n_exact >= 0
            if contam:
                assert r.contaminated              # conservative screen
    # collision-free regime: bloom == exact everywhere
    big = {
        r.doc_id: (r.n_shingles, r.n_bloom, r.contaminated)
        for r in bloom_contamination_screen(
            df, "doc_id = 0", n=3, k=4, m=1 << 20
        ).collect()
    }
    assert big == {d: (v[0], v[1], v[2]) for d, v in exact.items()}


def test_bloom_screen_forced_false_positive(spark):
    """m=1 collapses every position to bit 0: one inserted eval shingle
    sets the whole filter, so a fully DISJOINT train doc still screens
    contaminated — the overcount shows up in bloom_fp, never in a miss."""
    from careers_spark.operators.sketches import bloom_contamination_screen

    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 3],
            "text": ["a b c d", "p q r s"],
        })
    )
    r = bloom_contamination_screen(df, "doc_id = 0", n=3, k=1, m=1).collect()
    (row,) = [x for x in r if x.doc_id == 3]
    assert row.n_exact == 0
    assert row.n_bloom == row.n_shingles == 2
    assert row.bloom_fp == 2
    assert row.contaminated


# ---- duplicated-span fraction -------------------------------------------
def test_dup_span_fraction_golden(spark, docs):
    """docs 1 and 4 are exact dups -> every 4-gram shared (frac 1.0);
    doc 2 differs only in the last word -> shares all but its final
    4-gram (5 of 6); doc 3 is unique -> 0.0."""
    got = {
        r.doc_id: (r.n_shingles, r.n_dup, r.dup_frac)
        for r in DD.dup_span_fraction(docs, n=4).collect()
    }
    assert got[1] == (6, 6, 1.0)
    assert got[4] == (6, 6, 1.0)
    assert got[3][1] == 0 and got[3][2] == 0.0
    assert got[2] == (6, 5, 0.833333)
    assert 5 not in got  # below n tokens -> no row


def test_reciprocal_best_pairs_mutual_only(spark):
    """1<->4 exact dups are mutual bests; 2 (near-dup of 1) points at
    1 but 1's best is 4 -> 2 never pairs, whether or not LSH surfaces
    the probabilistic 0.75 candidate."""
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",
        3: "completely different text about spark engines here",
        4: "the quick brown fox jumps over the lazy dog",
    }
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.reciprocal_best_pairs(docs).collect()
    }
    assert got == {(1, 4): 1.0}


def test_reciprocal_best_pairs_tie_break_smaller_id(spark):
    """Three identical docs: every best-match is a jaccard-1.0 tie, so
    the smaller-id rule decides — 9's best is 10, 10's and 11's best is
    9 -> the single mutual pair is (9, 10); 11 is excluded."""
    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9, 10, 11], "text": [t, t, t]})
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.reciprocal_best_pairs(docs).collect()
    }
    assert got == {(9, 10): 1.0}


def test_reciprocal_best_pairs_two_islands(spark):
    """Two disjoint exact-dup pairs both survive as mutual bests."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [5, 6, 7, 8],
                "text": [
                    "red orange yellow green blue indigo violet",
                    "red orange yellow green blue indigo violet",
                    "one two three four five six seven eight nine",
                    "one two three four five six seven eight nine",
                ],
            }
        )
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.reciprocal_best_pairs(docs).collect()
    }
    assert got == {(5, 6): 1.0, (7, 8): 1.0}


def test_winnowing_hand_selection(spark):
    """The window-min selection on a tiny doc, checked against an
    independent python winnow of the same md5-32 k-gram hashes."""
    import hashlib

    from careers_spark.operators.dedup import winnowing_fingerprints

    text = "a b c d e f g h i j"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {(r.pos, r.fp) for r in
           winnowing_fingerprints(df, kgram=3, window=2).collect()}

    toks = text.split()
    grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    want = set()
    for s in range(len(hs) - 1):  # window=2, full windows only
        w = [(hs[s + i], -(s + i)) for i in range(2)]
        h, np = min(w)
        want.add((-np, h))
    assert got == want


def test_winnowing_locality_guarantee(spark):
    """Two docs sharing a run of window + kgram - 1 = 8 tokens MUST
    share at least one fingerprint (the winnowing theorem)."""
    from careers_spark.operators.dedup import winnowing_overlap_pairs, winnowing_fingerprints

    shared = "quick brown fox jumps over the lazy dog"  # 8 tokens
    rows = [
        (1, "alpha beta " + shared + " gamma delta epsilon zeta"),
        (2, "one two three four " + shared + " five six"),
        (3, "totally different content with no overlap at all here friend"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowing_fingerprints(df, kgram=5, window=4)
    f1 = {r.fp for r in fps.filter("doc_id = 1").collect()}
    f2 = {r.fp for r in fps.filter("doc_id = 2").collect()}
    f3 = {r.fp for r in fps.filter("doc_id = 3").collect()}
    assert f1 & f2, "shared 8-token run must share a fingerprint"
    assert not (f1 & f3) and not (f2 & f3)
    pairs = winnowing_overlap_pairs(df, kgram=5, window=4, min_shared=1).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in pairs} == {(1, 2)}


def test_winnowing_short_doc_keeps_global_min(spark):
    """A doc with fewer k-grams than one window still fingerprints:
    exactly its global minimum."""
    import hashlib

    from careers_spark.operators.dedup import winnowing_fingerprints

    text = "a b c d"  # 2 3-grams < window 4
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    got = winnowing_fingerprints(df, kgram=3, window=4).collect()
    toks = text.split()
    grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    h, np = min((h, -p) for p, h in enumerate(hs))
    assert [(r.doc_id, r.pos, r.fp) for r in got] == [(7, -np, h)]


def test_winnowing_rightmost_tie_and_determinism(spark):
    """Repeated identical k-grams tie on hash; selection takes the
    RIGHTMOST (max pos) — and the result is partitioning-invariant."""
    from careers_spark.operators.dedup import winnowing_fingerprints

    # 'x y z' repeats: positions 0 and 2 share a hash
    text = "x y z x y z x"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    a = sorted(map(tuple, winnowing_fingerprints(df, kgram=3, window=3).collect()))
    b = sorted(
        map(
            tuple,
            winnowing_fingerprints(
                df.repartition(5), kgram=3, window=3
            ).collect(),
        )
    )
    assert a == b and len(a) >= 1
    # every selected position's window contains no smaller (h, -pos)
    # is covered by the hand test; here assert ties resolve rightmost:
    # position 0 and 3 have identical k-grams ('x y z'); if that hash
    # is a window min anywhere, the selected pos must be the larger
    # in-window occurrence
    import hashlib

    toks = text.split()
    grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    dup = {h for h in hs if hs.count(h) > 1}
    for _, pos, fp in a:
        if fp in dup:
            # rightmost rule: within its window [start, start+2], no
            # LATER position carries the same hash
            later_same = [
                p for p in range(pos + 1, min(pos + 3, len(hs)))
                if hs[p] == fp
            ]
            assert not later_same


def test_pair_screen_eval_hand_golden(spark):
    from careers_spark.operators.dedup import pair_screen_eval

    screen = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    exact = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "doc_a long, doc_b long"
    )
    r = pair_screen_eval(screen, exact).collect()[0]
    assert (r.n_exact, r.n_screen, r.n_hit) == (4, 2, 2)
    assert r.precision == 1.0 and r.recall == 0.5


def test_pair_screen_eval_empty_sides_null(spark):
    from careers_spark.operators.dedup import pair_screen_eval

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    some = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = pair_screen_eval(empty, some).collect()[0]
    assert r.precision is None and r.recall == 0.0
    r2 = pair_screen_eval(some, empty).collect()[0]
    assert r2.recall is None and r2.precision == 0.0


def test_lsh_screen_precision_is_one_on_real_docs(spark):
    """The verify-after-block invariant on real data: every screened
    pair is an exact pair, so precision is exactly 1.0."""
    from careers_spark.operators.dedup import (
        jaccard_pairs,
        lsh_verified_pairs,
        pair_screen_eval,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = pair_screen_eval(
        lsh_verified_pairs(docs, num_hashes=12, band_size=3, threshold=0.2),
        jaccard_pairs(docs, threshold=0.2),
    ).collect()[0]
    assert r.precision in (1.0, None)
    assert r.recall is not None and 0.0 <= r.recall <= 1.0
