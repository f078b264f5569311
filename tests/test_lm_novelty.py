"""Reference-trained bigram LM filter + n-gram novelty curve."""

import math

import pytest

from careers_spark.operators.textstats import bigram_ref_nll, ngram_novelty


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------- bigram LM

def _py_bigram_nll(rows, ref_ids):
    """Independent python unroll of the add-one bigram model."""
    toks = {i: t.lower().split() for i, t in rows}
    bg = {i: list(zip(ts, ts[1:])) for i, ts in toks.items() if len(ts) >= 2}
    ref = [p for i in ref_ids if i in bg for p in bg[i]]
    vocab = {w for p in ref for w in p}
    v = len(vocab)
    cab, ca = {}, {}
    for a, b in ref:
        cab[(a, b)] = cab.get((a, b), 0) + 1
        ca[a] = ca.get(a, 0) + 1
    out = {}
    for i, pairs in bg.items():
        fp_sum, n = 0, 0
        for a, b in pairs:
            a = a if a in vocab else "<unk>"
            b = b if b in vocab else "<unk>"
            num = cab.get((a, b), 0) + 1
            den = ca.get(a, 0) + v + 1
            fp_sum += round(math.log(num / den) * 1e9)
            n += 1
        out[i] = (n, round(-fp_sum / (n * 1e9), 6))
    return out


def test_bigram_nll_hand_golden(spark):
    # ref doc 0: "a b a b a" -> bigrams ab, ba, ab, ba
    # vocab {a, b}, V=2; C(a,b)=2 C(b,a)=2 C(a.)=2 C(b.)=2
    # scored doc 3: "a b c" -> (a,b): (2+1)/(2+3)=0.6 ; (b,<unk>): (0+1)/(2+3)=0.2
    rows = [(0, "a b a b a"), (3, "a b c")]
    got = {
        r.doc_id: r
        for r in bigram_ref_nll(
            _docs(spark, rows), ref_pred="doc_id = 0"
        ).collect()
    }
    expect = round(-(round(math.log(0.6) * 1e9) + round(math.log(0.2) * 1e9)) / (2 * 1e9), 6)
    assert got[3].n_bigrams == 2
    assert got[3].avg_nll == pytest.approx(expect, abs=0)
    # the reference doc scores itself: all 4 bigrams at 0.6 -> -ln(0.6)
    assert got[0].avg_nll == pytest.approx(round(-math.log(0.6), 6), abs=1e-6)


def test_bigram_nll_oov_doc_uniform(spark):
    # doc 5 is entirely out-of-vocabulary: every bigram maps to
    # (<unk>, <unk>) -> P = 1/(V+1), avg_nll = ln(V+1) exactly
    rows = [(0, "a b a b"), (5, "x y z")]
    got = {
        r.doc_id: r
        for r in bigram_ref_nll(_docs(spark, rows), ref_pred="doc_id = 0").collect()
    }
    assert got[5].avg_nll == pytest.approx(round(math.log(3), 6), abs=0)


def test_bigram_nll_python_lockstep(spark):
    # derandomized corpus: ref slice trains, everything scores
    import random

    rng = random.Random(7)
    words = ["red", "blue", "green", "cat", "dog", "runs", "sits"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(2, 12))))
        for i in range(40)
    ]
    ref_ids = [i for i in range(40) if i % 5 == 0]
    expect = _py_bigram_nll(rows, ref_ids)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in bigram_ref_nll(_docs(spark, rows), ref_pred="doc_id % 5 = 0").collect()
    }
    assert got == expect


def test_bigram_nll_short_docs_absent(spark):
    rows = [(0, "a b a b"), (1, "solo"), (2, "")]
    ids = {
        r.doc_id
        for r in bigram_ref_nll(_docs(spark, rows), ref_pred="doc_id = 0").collect()
    }
    assert ids == {0}


def test_bigram_nll_keep_threshold(spark):
    rows = [(0, "a b a b a b"), (1, "a b a b"), (2, "x y x y")]
    got = {
        r.doc_id: r.keep
        for r in bigram_ref_nll(
            _docs(spark, rows), ref_pred="doc_id = 0", nll_keep_max=1.0
        ).collect()
    }
    # in-distribution doc keeps, the OOV doc's ln(3)=1.0986 > 1.0 drops
    assert got[1] is True and got[2] is False


# ------------------------------------------------------- novelty

def test_ngram_novelty_golden(spark):
    rows = [
        (0, "a b c d e"),          # 3 trigrams, all first -> 1.0
        (1, "a b c d e"),          # exact dup of 0 -> 0.0
        (2, "a b c x y z"),        # abc seen; bcx, cxy, xyz novel -> 3/4
    ]
    got = {r.doc_id: r for r in ngram_novelty(_docs(spark, rows)).collect()}
    assert (got[0].n_shingles, got[0].novel_frac) == (3, 1.0)
    assert (got[1].n_novel, got[1].novel_frac) == (0, 0.0)
    assert (got[2].n_shingles, got[2].n_novel, got[2].novel_frac) == (4, 3, 0.75)


def test_ngram_novelty_first_doc_always_novel(spark):
    rows = [(10, "p q r s"), (20, "p q r s"), (30, "p q r s")]
    got = {r.doc_id: r.novel_frac for r in ngram_novelty(_docs(spark, rows)).collect()}
    # min doc_id owns every shingle, later copies score 0
    assert got == {10: 1.0, 20: 0.0, 30: 0.0}
