"""PMI, length histogram, and exact quantiles (textstats.py additions)."""

import math

import pandas as pd
import pytest

from careers_spark.operators.textstats import (
    length_histogram,
    length_quantiles,
    token_pmi,
)


def test_token_pmi_golden(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "b c")],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): (r.n_ab, r.pmi) for r in token_pmi(docs, min_pairs=2).collect()}
    # only (a,b) survives min_pairs=2: n_ab=2, n_a=3, n_b=3, N=4
    assert got == {("a", "b"): (2, round(math.log(2 * 4 / (3 * 3)), 6))}


def test_token_pmi_repeated_token_counts_once_per_doc(spark):
    # doc-level counting: "a a b" contributes ONE (a,b) observation
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {(r.a, r.b): r.n_ab for r in token_pmi(docs, min_pairs=1).collect()}
    assert got == {("a", "b"): 2}


def test_length_histogram_golden(spark):
    docs = spark.createDataFrame(
        [(1, "en", 50), (2, "en", 99), (3, "en", 100), (4, "zh", 250)],
        "doc_id long, lang string, n_chars long",
    )
    got = {(r.lang, r.bucket_lo): (r.n, r.share) for r in length_histogram(docs).collect()}
    assert got == {
        ("en", 0): (2, round(2 / 3, 6)),
        ("en", 100): (1, round(1 / 3, 6)),
        ("zh", 200): (1, 1.0),
    }


def test_length_quantiles_linear_interpolation(spark):
    vals = [10, 20, 30, 40, 50]
    docs = spark.createDataFrame(
        [(i, "en", v) for i, v in enumerate(vals)],
        "doc_id long, lang string, n_chars long",
    )
    got = {r.q: r.value for r in length_quantiles(docs).collect()}

    def interp(q):
        pos = q * (len(vals) - 1)
        lo, frac = int(pos), pos - int(pos)
        hi = min(lo + 1, len(vals) - 1)
        return round(vals[lo] + (vals[hi] - vals[lo]) * frac, 6)

    assert got == {q: interp(q) for q in (0.25, 0.5, 0.75, 0.9)}


def test_length_quantiles_approx_path_runs(spark):
    docs = spark.createDataFrame(
        [(i, "en", i * 7 % 100) for i in range(200)],
        "doc_id long, lang string, n_chars long",
    )
    exact = {r.q: r.value for r in length_quantiles(docs, exact=True).collect()}
    approx = {r.q: r.value for r in length_quantiles(docs, exact=False).collect()}
    assert set(approx) == set(exact)
    for q in exact:
        assert abs(approx[q] - exact[q]) <= 5  # GK sketch, loose band


def test_source_reputation_composition(spark):
    """source_reputation == an independent python recomputation from its
    three legs (quality_score, gopher_repetition, md5 dup counts) on a
    fixture with a cross-source duplicate pair and a repetitive doc."""
    from collections import Counter

    from careers_spark.operators.textstats import (
        gopher_repetition,
        quality_score,
        source_reputation,
    )

    rows = [
        (1, "srcA", "the quick brown fox jumps over the lazy dog"),
        (2, "srcA", "copy copy copy copy copy copy copy copy"),   # repetitive
        (3, "srcA", "shared text between two sources here"),
        (4, "srcB", "shared text between two sources here"),      # dup of 3
        (5, "srcB", "another perfectly ordinary document with words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    qual = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    keep = {r.doc_id: r.keep for r in gopher_repetition(docs).collect()}
    texts = Counter(t for *_, t in rows)

    want = {}
    for src in ("srcA", "srcB"):
        ds = [r for r in rows if r[1] == src]
        n = len(ds)
        n_dup = sum(1 for r in ds if texts[r[2]] > 1)
        n_keep = sum(1 for r in ds if keep.get(r[0], False))
        q_sum = sum(round(qual[r[0]] * 1_000_000) for r in ds)
        want[src] = (
            n, n_dup, n_keep,
            round(q_sum / (n * 1_000_000), 6),
            round(n_dup / n, 6), round(n_keep / n, 6),
        )

    got = {
        r.source: (r.n_docs, r.n_dup_docs, r.n_gopher_keep,
                   r.mean_quality, r.dup_frac, r.keep_frac)
        for r in source_reputation(docs).collect()
    }
    assert got == want
    # the hand-checkable bits: the dup pair spans both sources, and the
    # repetitive doc fails the Gopher keep
    assert got["srcA"][1] == 1 and got["srcB"][1] == 1
    assert not keep[2]


def test_unigram_logloss_python_lockstep(spark):
    """Exact fixed-point lockstep with a pure-python recompute, and the
    semantic property: a doc of rare tokens is more surprising than a
    doc of the corpus's common tokens."""
    import math
    from collections import Counter

    from careers_spark.operators.textstats import unigram_logloss

    rows = [
        (1, "the the the cat"),
        (2, "the cat sat"),
        (3, "zyx qwv"),           # rare tokens -> highest avg_nll
        (4, "the the the the"),   # the most common token -> lowest
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toked = {d: t.split() for d, t in rows}
    counts = Counter(t for toks in toked.values() for t in toks)
    n_total = sum(counts.values())

    want = {}
    for d, toks in toked.items():
        tf = Counter(toks)
        fp = sum(
            c * round(math.log(counts[t] / n_total) * 1e9)
            for t, c in tf.items()
        )
        want[d] = (len(toks), round(-fp / (len(toks) * 1e9), 6))

    got = {
        r.doc_id: (r.n_tokens, r.avg_nll)
        for r in unigram_logloss(docs).collect()
    }
    assert got == want
    assert got[3][1] == max(v[1] for v in got.values())
    assert got[4][1] == min(v[1] for v in got.values())


def _py_source_kl(docs):
    import math
    import re
    from decimal import ROUND_HALF_UP, Decimal

    def r(x, nd):
        return float(
            Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP)
        )

    per = {}
    for src, text in docs:
        for t in re.findall(r"[a-z0-9]+", text.lower()):
            per[(src, t)] = per.get((src, t), 0) + 1
    n_s, n_terms, c_all = {}, {}, {}
    for (s, t), c in per.items():
        n_s[s] = n_s.get(s, 0) + c
        n_terms[s] = n_terms.get(s, 0) + 1
        c_all[t] = c_all.get(t, 0) + c
    n_all = sum(c_all.values())
    out = {}
    for s in n_s:
        fp = sum(
            c * int(r(r(math.log(c * n_all / (n_s[s] * c_all[t])), 6) * 1e6, 0))
            for (s2, t), c in per.items()
            if s2 == s
        )
        out[s] = (n_s[s], n_terms[s], r(fp / (n_s[s] * 1e6), 6))
    return out


def test_source_kl_identical_distribution_is_zero(spark):
    from careers_spark.operators.textstats import source_kl

    # both sources emit the same multiset of tokens -> p == q -> KL 0
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "source": ["a", "b"],
                "text": ["x x y z", "x x y z"],
            }
        )
    )
    got = {r.source: r.kl for r in source_kl(docs).collect()}
    assert got == {"a": 0.0, "b": 0.0}


def test_source_kl_matches_python_lockstep(spark):
    from careers_spark.operators.textstats import source_kl

    rows = [
        ("a", "x x x y"),
        ("a", "y z"),
        ("b", "z z z w w q"),
        ("c", "x y z w"),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "source": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        )
    )
    got = {
        r.source: (r.n_tokens, r.n_terms, r.kl)
        for r in source_kl(docs).collect()
    }
    assert got == _py_source_kl(rows)
    # the skewed source diverges more than the near-uniform one
    assert got["b"][2] > got["c"][2] >= 0.0


def test_zipf_alpha_hand_value(spark):
    from careers_spark.operators.textstats import zipf_alpha

    # counts: a=8, b=4, c=2 with min_count=2 -> n=3,
    # sum ln(c/2) = ln4 + ln2 + ln1; alpha = 1 + 3/sum
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "text": [" ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2)]}
        )
    )
    r = zipf_alpha(docs, min_count=2).collect()[0]
    fp = lambda x: int(
        __import__("decimal").Decimal(
            repr(round(math.log(x), 6))
        ).scaleb(6).to_integral_value(rounding="ROUND_HALF_UP")
    )
    want = round(1.0 + 3.0 / ((fp(4) + fp(2) + fp(1)) / 1e6), 6)
    assert (r.n_terms, r.n_tail_terms, r.alpha) == (3, 3, want)


def test_zipf_alpha_degenerate_is_null(spark):
    from careers_spark.operators.textstats import zipf_alpha

    # every surviving term at exactly the floor: sum ln = 0 -> NULL
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a a b b"]})
    )
    r = zipf_alpha(docs, min_count=2).collect()[0]
    assert r.alpha is None and r.n_tail_terms == 2


def test_char_entropy_hand_values(spark):
    """H=0 for a constant string, ln2 for a 50/50 mix, ln4 for
    uniform-4; quantized exactly like the operator."""
    import math

    from careers_spark.operators.textstats import char_entropy

    docs = [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars_counted, r.distinct_chars, r.entropy_nats)
        for r in char_entropy(df).collect()
    }

    def h(counts):
        n = sum(counts)
        fp = sum(c * round(math.log(c / n) * 1e9) for c in counts)
        return round(-fp / (n * 1e9), 6)

    assert got[0] == (4, 1, h([4]))
    assert got[0][2] == 0.0
    assert got[1] == (4, 2, h([2, 2]))
    assert abs(got[1][2] - math.log(2)) < 1e-6
    assert got[2] == (4, 4, h([1, 1, 1, 1]))
    assert abs(got[2][2] - math.log(4)) < 1e-6
    assert 3 not in got  # empty text contributes no row


def test_char_entropy_boilerplate_below_natural_text(spark):
    """The quality-signal reading: padded boilerplate scores below
    ordinary prose."""
    from careers_spark.operators.textstats import char_entropy

    docs = [
        (0, "click here click here click here " * 10),
        (1, "The quarterly results exceeded expectations across most "
            "regions, though supply constraints remain a watch item."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.entropy_nats for r in char_entropy(df).collect()}
    assert got[0] < got[1]


def test_lexical_richness_hand_golden(spark):
    import math

    from careers_spark.operators.textstats import lexical_richness

    docs = [
        (0, "a b a c"),       # N=4, V=3, hapax={b,c}=2
        (1, "x x x x"),       # N=4, V=1, hapax=0
        (2, "solo"),          # N=1 -> herdan NULL
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.n_hapax, r.ttr,
                   r.hapax_share, r.herdan_c)
        for r in lexical_richness(df).collect()
    }
    assert got[0] == (4, 3, 2, 0.75, round(2 / 3, 6),
                      round(math.log(3) / math.log(4), 6))
    assert got[1] == (4, 1, 0, 0.25, 0.0, 0.0)
    assert got[2] == (1, 1, 1, 1.0, 1.0, None)


def test_lexical_richness_template_below_prose(spark):
    from careers_spark.operators.textstats import lexical_richness

    docs = [
        (0, "buy now buy now buy now buy now buy now"),
        (1, "the committee reviewed seven proposals before choosing two"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.ttr for r in lexical_richness(df).collect()}
    assert got[0] < got[1]


def _w1_py(xs, corpus):
    """Exact grid-formula W1 between sample and corpus empiricals."""
    grid = sorted(set(corpus))
    n_s, n = len(xs), len(corpus)
    num = 0
    for g, nxt in zip(grid, grid[1:] + [grid[-1]]):
        cs = sum(1 for x in xs if x <= g)
        c = sum(1 for x in corpus if x <= g)
        num += abs(cs * n - c * n_s) * (nxt - g)
    return num, num / (n_s * n)


def test_wasserstein_hand_golden(spark):
    """Stratum 'a' = {0,0}, 'b' = {10,10}: corpus CDF is 0.5 on the
    whole gap, so each stratum is exactly 5.0 away."""
    from careers_spark.operators.textstats import source_wasserstein

    rows = [(1, "a", 0), (2, "a", 0), (3, "b", 10), (4, "b", 10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r.source: r for r in source_wasserstein(df).collect()}
    assert got["a"].w1 == 5.0 and got["b"].w1 == 5.0
    assert got["a"].w1_num == got["a"].n_s * 4 * 5


def test_wasserstein_identical_distribution_zero(spark):
    from careers_spark.operators.textstats import source_wasserstein

    rows = [(i, s, (i * 13) % 7) for i, s in enumerate(["a", "b"] * 20)]
    # make b an exact copy of a's value multiset
    vals = sorted(v for _, s, v in rows if s == "a")
    rows = [(i, "a", v) for i, v in enumerate(vals)] + [
        (100 + i, "b", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r.source: r for r in source_wasserstein(df).collect()}
    assert got["a"].w1 == got["b"].w1
    assert got["a"].w1_num == got["b"].w1_num


def test_wasserstein_python_lockstep(spark):
    import random

    from careers_spark.operators.textstats import source_wasserstein

    rng = random.Random(3)
    rows = [
        (i, rng.choice("xyz"), rng.randrange(0, 40)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r.source: r for r in source_wasserstein(df).collect()}
    corpus = [v for _, _, v in rows]
    for s in "xyz":
        xs = [v for _, src, v in rows if src == s]
        num, w1 = _w1_py(xs, corpus)
        assert got[s].w1_num == num
        assert got[s].n_s == len(xs)
        assert abs(got[s].w1 - w1) < 1e-6


def test_vocab_growth_hand_golden(spark):
    """Four docs in two checkpoints: V counts tokens by FIRST
    occurrence, N sums token occurrences, beta is the ln-ln OLS."""
    from careers_spark.operators.textstats import vocab_growth

    rows = [
        (0, "a b"),          # ck 0: new {a,b}
        (1, "a c"),          # ck 0: new {c}
        (2, "a b c"),        # ck 1: nothing new
        (3, "d d"),          # ck 1: new {d}
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.ck, r.n_cum, r.v_cum) for r in vocab_growth(df, n_points=2).collect()
    )
    assert got == [(0, 4, 3), (1, 9, 4)]


def test_vocab_growth_python_lockstep(spark):
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.textstats import vocab_growth

    rng = random.Random(5)
    vocab = [f"w{j}" for j in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 12))))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.ck: r for r in vocab_growth(df, n_points=10).collect()}
    # python replay
    mn, mx = 0, 99
    buckets = {}
    first = {}
    for i, text in rows:
        ck = ((i - mn) * 10) // (mx - mn + 1)
        toks = text.split()
        buckets.setdefault(ck, [0, 0])
        buckets[ck][0] += len(toks)
        for t in toks:
            if t not in first:
                first[t] = ck
                buckets[ck][1] += 1
    n_cum = v_cum = 0
    pts = []
    for ck in sorted(buckets):
        n_cum += buckets[ck][0]
        v_cum += buckets[ck][1]
        pts.append((ck, n_cum, v_cum))
        assert (got[ck].n_cum, got[ck].v_cum) == (n_cum, v_cum)

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )

    lx = [round(r6(math.log(n)) * 1e6) for _, n, _ in pts]
    ly = [round(r6(math.log(v)) * 1e6) for _, _, v in pts]
    k = len(pts)
    sx, sy = sum(lx), sum(ly)
    sxx = sum(a * a for a in lx)
    sxy = sum(a * b for a, b in zip(lx, ly))
    want = r6((k * sxy - sx * sy) / (k * sxx - sx * sx))
    for r in got.values():
        assert r.beta == want
    assert 0 < want < 1  # Heaps regime
