"""bpe_learn: python lockstep vs a reference Sennrich-style learner,
greedy-overlap semantics, and the vocabulary-exhaustion raise."""

import pytest


def _ref_bpe(word_freqs, n_merges):
    """Reference learner: zip pair counts, (cnt desc, l, r) argmax,
    greedy left-to-right non-overlapping merge (Sennrich learn_bpe)."""
    from collections import Counter

    enc = {w: [*w, "_"] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, f in word_freqs.items():
            s = enc[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += f
        if not stats:
            return merges, None
        (l, r), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, cnt))
        for w in enc:
            s, out, i = enc[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            enc[w] = out
    return merges, enc


def test_bpe_learn_lockstep_small_corpus(spark):
    from careers_spark.operators.tokenizer import bpe_learn

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide lower",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in sorted(bpe_learn(df, n_merges=6).collect(), key=lambda r: r.rk)
    ]
    from collections import Counter

    freqs = Counter(w for t in texts for w in t.split())
    want, _ = _ref_bpe(dict(freqs), 6)
    assert got == want


def test_bpe_learn_greedy_overlap(spark):
    """'aaa' contributes two (a,a) zip-counts but merges only once
    greedily: after merge 1 its encoding is (aa, a, _), so round 2's
    top pair reflects that."""
    from careers_spark.operators.tokenizer import bpe_learn

    df = spark.createDataFrame(
        [(1, "aaa aaa aaa")], "doc_id long, text string"
    )
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in sorted(bpe_learn(df, n_merges=3).collect(), key=lambda r: r.rk)
    ]
    want, enc = _ref_bpe({"aaa": 3}, 3)
    assert got == want
    # sanity on the reference itself: round 1 counts the overlap (2*3)
    assert want[0] == ("a", "a", 6)


def test_bpe_learn_exhaustion_raises(spark):
    from careers_spark.operators.tokenizer import bpe_learn

    # single 1-char word: 'a_' -> one pair -> exhausted after 1 merge
    df = spark.createDataFrame([(1, "a a")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="exhausted"):
        bpe_learn(df, n_merges=3)


def test_bpe_learn_parallelism_invariant(spark):
    from careers_spark.operators.tokenizer import bpe_learn

    rows = [(i, f"alpha beta gamma delta{i % 4} alpha beta") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = bpe_learn(df, n_merges=5).collect()
    b = bpe_learn(df.repartition(11), n_merges=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_fertility_hand_golden(spark):
    """One merge on a two-word corpus: 'aa' merges, so 'aab' encodes
    to [aa, b, _] (3 symbols) and 'cd' stays [c, d, _] (3 symbols);
    with n_merges=1 fertility is hand-computable."""
    from careers_spark.operators.tokenizer import bpe_fertility

    docs = [
        (0, "aab aab cd"),   # 3 tokens
        (1, "cd"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_subwords, r.fertility)
        for r in bpe_fertility(df, n_merges=1).collect()
    }
    # merge 1 is ('a','a') (freq 2, beats any other pair on the
    # (cnt desc, l, r) tie-break): 'aab_' -> aa|b|_ (3), 'cd_' -> c|d|_ (3)
    assert got[0] == (3, 9, 3.0)
    assert got[1] == (1, 3, 3.0)


def test_bpe_fertility_decreases_with_merges(spark):
    """More merges can only shorten encodings (monotone
    non-increasing total subwords)."""
    from careers_spark.operators.tokenizer import bpe_fertility

    docs = [(i, "alpha beta alpha beta gamma") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    f1 = {r.doc_id: r.n_subwords for r in bpe_fertility(df, 1).collect()}
    f6 = {r.doc_id: r.n_subwords for r in bpe_fertility(df, 6).collect()}
    assert all(f6[d] <= f1[d] for d in f1)
    assert any(f6[d] < f1[d] for d in f1)
