"""entropy_l_diversity + moore_lewis_selection — hand goldens and
python fixed-point lockstep."""

import math

import pytest


# ---------------------------------------------------------------- l-div


def test_entropy_ldiv_uniform_meets_skew_does_not(spark):
    """The case distinct-l cannot see: both classes hold 2 distinct
    sensitive values, but the skewed one carries less than ln(2) nats
    and fails entropy-2-diversity while the uniform one passes."""
    from careers_spark.operators.privacy import entropy_l_diversity

    rows = (
        [("u", "s1")] * 1 + [("u", "s2")] * 1  # uniform 1-1
        + [("w", "s1")] * 2 + [("w", "s2")] * 1  # skew 2-1
    )
    df = spark.createDataFrame(rows, "qi string, sv string")
    out = {
        r["qi"]: r
        for r in entropy_l_diversity(
            df, quasi_identifiers=["qi"], sensitive="sv", l=2
        ).collect()
    }
    assert out["u"]["l_distinct"] == 2 and out["w"]["l_distinct"] == 2
    assert out["u"]["meets_entropy_l"] is True
    assert out["w"]["meets_entropy_l"] is False
    assert out["u"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    skew = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert out["w"]["entropy"] == pytest.approx(skew, abs=1e-6)


def test_entropy_ldiv_constant_class(spark):
    """A single-sensitive-value class has entropy exactly 0: it meets
    l=1 (ln 1 = 0, >= holds) and fails any l >= 2."""
    from careers_spark.operators.privacy import entropy_l_diversity

    df = spark.createDataFrame([("c", "only")] * 5, "qi string, sv string")
    r1 = entropy_l_diversity(df, ["qi"], "sv", l=1).collect()[0]
    r2 = entropy_l_diversity(df, ["qi"], "sv", l=2).collect()[0]
    assert r1["entropy"] == 0.0 and r1["meets_entropy_l"] is True
    assert r2["meets_entropy_l"] is False


def test_entropy_ldiv_python_lockstep(spark):
    """Replay the exact fixed-point recipe in python on a multi-class
    corpus; entropies and predicates must match bit-for-bit."""
    from careers_spark.operators.privacy import entropy_l_diversity

    rows = []
    for i in range(300):
        qi = f"q{i % 7}"
        sv = f"v{(i * i) % (1 + i % 5)}"
        rows.append((qi, sv))
    df = spark.createDataFrame(rows, "qi string, sv string")
    out = {
        r["qi"]: r
        for r in entropy_l_diversity(df, ["qi"], "sv", l=3).collect()
    }

    from collections import Counter, defaultdict

    cells = Counter(rows)
    classes = defaultdict(list)
    for (qi, _sv), c in cells.items():
        classes[qi].append(c)
    lnl_fp = int(round(math.log(3) * 1e9))
    for qi, cs in classes.items():
        n = sum(cs)
        ent_fp = sum(
            -c * int(round(math.log(c / n) * 1e9)) for c in cs
        )
        r = out[qi]
        assert r["class_size"] == n and r["l_distinct"] == len(cs)
        assert r["entropy"] == round(ent_fp / (n * 1e9), 6)
        assert r["meets_entropy_l"] == (ent_fp >= n * lnl_fp)


def test_entropy_ldiv_arg_validation(spark):
    from careers_spark.operators.privacy import entropy_l_diversity

    df = spark.createDataFrame([("a", "b")], "qi string, sv string")
    with pytest.raises(ValueError):
        entropy_l_diversity(df, [], "sv")
    with pytest.raises(ValueError):
        entropy_l_diversity(df, ["qi"], "sv", l=0)


# ---------------------------------------------------------- Moore-Lewis


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, d) for i, (t, d) in enumerate(rows)],
        "doc_id long, text string, in_domain boolean",
    )


def test_moore_lewis_separates_domains(spark):
    """In-domain-looking docs score negative (selected), docs made of
    tokens the seed never uses score positive (rejected)."""
    from careers_spark.operators.textstats import moore_lewis_selection

    rows = (
        [("alpha beta alpha", True)] * 3
        + [("gamma delta gamma delta", False)] * 3
        + [("alpha beta", False), ("gamma delta", False)]
    )
    df = _docs(spark, rows)
    out = {r["doc_id"]: r for r in moore_lewis_selection(df).collect()}
    # the alpha-beta probe (doc 6) looks like the seed: ce_in < ce_gen
    assert out[6]["ml_score"] < 0 and out[6]["selected"] is True
    # the gamma-delta probe (doc 7) is OOV under the seed model
    assert out[7]["ml_score"] > 0 and out[7]["selected"] is False
    assert out[6]["ce_in"] < out[6]["ce_gen"]
    assert out[7]["ce_in"] > out[7]["ce_gen"]


def test_moore_lewis_all_in_domain_zero_score(spark):
    """If the seed IS the pool, both models coincide and every score
    is exactly 0 (integer-sign predicate: nothing selected)."""
    from careers_spark.operators.textstats import moore_lewis_selection

    rows = [("red green blue", True), ("red red green", True)]
    out = moore_lewis_selection(_docs(spark, rows)).collect()
    assert all(r["ml_score"] == 0.0 for r in out)
    assert all(r["selected"] is False for r in out)
    assert all(r["ce_in"] == r["ce_gen"] for r in out)


def test_moore_lewis_python_lockstep(spark):
    """Replay the two-model Laplace fixed-point recipe in python on a
    mixed corpus; all five output columns must match exactly."""
    from careers_spark.operators.textstats import moore_lewis_selection

    vocab_in = ["data", "spark", "join", "shuffle"]
    vocab_out = ["cat", "dog", "fish"]
    rows = []
    for i in range(40):
        dom = i % 3 == 0
        words = [
            (vocab_in if (i + j) % 2 == 0 or dom else vocab_out)[
                (i * 7 + j) % 3
            ]
            for j in range(5 + i % 4)
        ]
        rows.append((" ".join(words), dom))
    df = _docs(spark, rows)
    out = {r["doc_id"]: r for r in moore_lewis_selection(df).collect()}

    from collections import Counter

    toks = {i: t.split() for i, (t, _d) in enumerate(rows)}
    gen = Counter()
    ind = Counter()
    for i, (t, d) in enumerate(rows):
        gen.update(toks[i])
        if d:
            ind.update(toks[i])
    tg, ti, v = sum(gen.values()), sum(ind.values()), len(gen)

    def lnfp(c, t):
        return int(round(math.log((c + 1.0) / (t + v)) * 1e9))

    for i in toks:
        tf = Counter(toks[i])
        n = sum(tf.values())
        in_fp = sum(c * lnfp(ind.get(w, 0), ti) for w, c in tf.items())
        gen_fp = sum(c * lnfp(gen[w], tg) for w, c in tf.items())
        score_fp = gen_fp - in_fp
        r = out[i]
        assert r["n_tokens"] == n
        assert r["ce_in"] == round(-in_fp / (n * 1e9), 6)
        assert r["ce_gen"] == round(-gen_fp / (n * 1e9), 6)
        assert r["ml_score"] == round(score_fp / (n * 1e9), 6)
        assert r["selected"] == (score_fp < 0)
