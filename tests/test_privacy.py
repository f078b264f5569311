"""PII scrub goldens: hand-placed spans, overlap semantics, clean-doc
identity, and python-re lockstep of the redaction chain."""

import hashlib
import re

import pandas as pd
import pytest

from careers_spark.operators.privacy import (
    PII_PATTERNS,
    PII_TOKENS,
    _REDACT_ORDER,
    pii_scrub,
)


def _py_redact(text):
    for k in _REDACT_ORDER:
        text = re.sub(PII_PATTERNS[k], PII_TOKENS[k], text)
    return text


@pytest.fixture(scope="module")
def docs(spark):
    texts = {
        1: "write to alice.smith+x@mail.example.co.uk for details",
        2: "server at 192.168.0.17 answered, backup 10.0.0.1 did not",
        3: "call 555-012-3456 or 555 987 6543 after hours",
        4: "no personal data in this row at all",
        5: "bob@ex.com pinged 8.8.8.8 then dialed 555-000-1111",
        6: "",
    }
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )


def test_counts_golden(spark, docs):
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (1, 0, 0)
    assert (got[2].n_emails, got[2].n_ips, got[2].n_phones) == (0, 2, 0)
    assert (got[3].n_emails, got[3].n_ips, got[3].n_phones) == (0, 0, 2)
    assert got[4].n_pii == 0 and got[4].is_clean
    assert (got[5].n_emails, got[5].n_ips, got[5].n_phones) == (1, 1, 1)
    assert got[5].n_pii == 3 and not got[5].is_clean
    assert got[6].n_pii == 0 and got[6].is_clean


def test_redaction_matches_python_re(spark, docs):
    """Spark's Java-regex redaction chain equals python re on the same
    patterns — the cross-dialect-safe subset claim, checked."""
    rows = {r.doc_id: r.redacted_fp for r in pii_scrub(docs).collect()}
    for r in docs.collect():
        want = hashlib.md5(_py_redact(r.text).encode()).hexdigest()
        assert rows[r.doc_id] == want, r.doc_id


def test_clean_doc_fingerprint_is_identity(spark, docs):
    got = {r.doc_id: r.redacted_fp for r in pii_scrub(docs).collect()}
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert got[4] == hashlib.md5(raw[4].encode()).hexdigest()
    # and a redacted doc's fp differs from its raw fp
    assert got[5] != hashlib.md5(raw[5].encode()).hexdigest()


def test_phone_not_counted_inside_ip(spark):
    """The \\b guards keep an IP's octets from reading as a phone, and
    a full redact leaves no digits behind."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["octets 123.456.789.012 end"]})
    )
    r = pii_scrub(docs).collect()[0]
    assert (r.n_ips, r.n_phones) == (1, 0)
    assert r.redacted_fp == hashlib.md5(b"octets <IP> end").hexdigest()


def test_k_anonymity_hand_golden(spark):
    """Class sizes, l-diversity, and threshold flags on a hand table:
    the (en, web) class has 3 members but only 1 distinct sensitive
    value -> k ok at 3, l VIOLATED."""
    from careers_spark.operators.privacy import k_anonymity_audit

    rows = [
        ("en", "web", "a"), ("en", "web", "a"), ("en", "web", "a"),
        ("en", "book", "a"), ("en", "book", "b"),
        ("zh", "web", "c"),
    ]
    df = spark.createDataFrame(rows, "lang string, source string, s string")
    got = {
        (r.lang, r.source): (r.class_size, r.l_distinct, r.meets_k, r.meets_l)
        for r in k_anonymity_audit(
            df, ["lang", "source"], sensitive="s", k=3, l=2
        ).collect()
    }
    assert got[("en", "web")] == (3, 1, True, False)
    assert got[("en", "book")] == (2, 2, False, True)
    assert got[("zh", "web")] == (1, 1, False, False)


def test_k_anonymity_no_sensitive_column(spark):
    from careers_spark.operators.privacy import k_anonymity_audit

    df = spark.createDataFrame([("en",), ("en",)], "lang string")
    (r,) = k_anonymity_audit(df, ["lang"], k=2).collect()
    assert (r.class_size, r.meets_k) == (2, True)
    assert "l_distinct" not in r.asDict()

    import pytest

    with pytest.raises(ValueError):
        k_anonymity_audit(df, [])


def test_dp_noisy_counts_python_lockstep(spark):
    """md5 inverse-CDF Laplace replay: noise, rounding, and the
    clamp-at-zero post-processing all pinned."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.privacy import dp_noisy_counts

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )

    rows = [(f"g{i % 3}", i) for i in range(50)] + [("rare", 0)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        r.grp: r
        for r in dp_noisy_counts(df, ["grp"], eps_mille=500).collect()
    }
    for grp, n_true in [("g0", 17), ("g1", 17), ("g2", 16), ("rare", 1)]:
        h = int(
            hashlib.md5(f"{grp}|dp0".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        b = 1000.0 / 500
        noise = r6(-b * math.copysign(1, u - 0.5) * r6(math.log(1 - 2 * abs(u - 0.5))))
        r = got[grp]
        assert r.n_true == n_true
        assert r.noise == noise
        want = max(
            int(
                Decimal(repr(n_true + noise)).quantize(
                    Decimal("1"), ROUND_HALF_UP
                )
            ),
            0,
        )
        assert r.noisy_n == want
        assert r.noisy_n >= 0


def test_dp_noise_scales_with_epsilon(spark):
    """Same md5 draw, half the epsilon -> exactly double the noise
    magnitude (b = 1/eps linearity of the inverse CDF)."""
    from careers_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("a", 1)] * 10, "grp string, v long")
    (n1,) = dp_noisy_counts(df, ["grp"], eps_mille=1000).collect()
    (n2,) = dp_noisy_counts(df, ["grp"], eps_mille=500).collect()
    assert abs(n2.noise) == round(2 * abs(n1.noise), 6)
