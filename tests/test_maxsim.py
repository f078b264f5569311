"""late_interaction_maxsim — facet-coverage goldens and python replay."""

import hashlib

import pytest


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _mask(tok, salt="li0", dims=16):
    h = int(hashlib.md5(f"{tok}|{salt}".encode()).hexdigest()[:8], 16)
    return h & ((1 << dims) - 1)


def _dot(a, b, dims=16):
    return dims - 2 * bin(a ^ b).count("1")


def test_maxsim_exact_term_hits_dominate(spark):
    """A doc containing every query term verbatim gets the maximum
    possible score len(Q)*dims (each term MaxSims with itself at
    dot=dims) and ranks first."""
    from careers_spark.operators.retrieval import late_interaction_maxsim

    texts = [
        "alpha beta gamma",          # all three query terms
        "alpha beta zzz qqq",        # two of three
        "unrelated words only here",  # none
    ]
    out = late_interaction_maxsim(
        _docs(spark, texts), ["alpha", "beta", "gamma"], k=3
    ).collect()
    assert out[0]["doc_id"] == 0 and out[0]["score"] == 3 * 16
    assert out[0]["rank"] == 1
    assert out[1]["doc_id"] == 1
    assert out[1]["score"] < 48


def test_maxsim_covers_all_facets_vs_repeats(spark):
    """MaxSim's point: repeating one query term adds nothing (max is
    idempotent), while covering a second facet does — a doc matching
    both terms outranks a doc spamming one of them."""
    from careers_spark.operators.retrieval import late_interaction_maxsim

    texts = [
        "alpha alpha alpha alpha alpha",  # one facet, many times
        "alpha beta",                     # both facets once
    ]
    out = {
        r["doc_id"]: r["score"]
        for r in late_interaction_maxsim(
            _docs(spark, texts), ["alpha", "beta"], k=2
        ).collect()
    }
    assert out[1] > out[0]
    # the spam doc's alpha facet is still perfect: 16 + best-effort beta
    assert out[0] == 16 + _dot(_mask("beta"), _mask("alpha"))


def test_maxsim_python_replay(spark):
    """Full replay: per-term max over distinct doc-token hash dots,
    summed, ranked (score desc, doc_id asc)."""
    from careers_spark.operators.retrieval import late_interaction_maxsim

    texts = [
        "the quick brown fox jumps",
        "pack my box with five dozen jugs",
        "sphinx of black quartz judge my vow",
        "quick zephyrs blow vexing daft jim",
    ]
    q = ["quick", "judge", "box"]
    got = [
        (r["rank"], r["doc_id"], r["score"])
        for r in late_interaction_maxsim(_docs(spark, texts), q, k=4).collect()
    ]

    import re

    scores = {}
    for i, t in enumerate(texts):
        toks = {x for x in re.split(r"[^a-z0-9]+", t.lower()) if x}
        scores[i] = sum(
            max(_dot(_mask(term), _mask(x)) for x in toks) for term in q
        )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == [(i + 1, d, s) for i, (d, s) in enumerate(want)]


def test_maxsim_validation(spark):
    from careers_spark.operators.retrieval import late_interaction_maxsim

    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError):
        late_interaction_maxsim(df, [])
    with pytest.raises(ValueError):
        late_interaction_maxsim(df, ["a"], dims=64)
