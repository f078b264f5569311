"""PII detection and redaction over a document corpus.

The pre-training hygiene step every published pipeline applies before
the text reaches a model (C4 removes pages on a blocklist, CCNet and
The Pile scrub emails/IPs, Llama's data card documents PII filtering):
find personally-identifying spans with conservative patterns and
replace them with typed placeholder tokens, reporting per-document
counts so the curation layer can gate on them.

Everything is JVM-side `regexp_count` / `regexp_replace` — zero Python
in the data path, pure map work (no shuffle at any scale; the plan is
a single project over the scan). The patterns are deliberately written
in the common subset of Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, `\\b` — with no constructs where
leftmost-first (backtracking) and leftmost-longest (RE2) semantics can
disagree, so the redacted text is byte-identical across engines and an
md5 of it is an exact oracle.

Reference anchors: the dictionary-gating predicates this engine
already mirrors (allowedPhrase / allowedContext,
PhraseMapLookup.scala) are the same shape — corpus-wide text
normalization by rule — applied here to the privacy axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Conservative, cross-engine-safe patterns. Order of REDACTION is
# email -> ip -> phone: the replacement tokens contain no digits or
# '@', so earlier passes can never create or destroy later matches.
# COUNTS are computed per-pattern on the ORIGINAL text, independently
# (a span matching two patterns counts in both — documented behavior;
# the gate cares about "any PII", not a partition of spans).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}
PII_TOKENS = {"email": "<EMAIL>", "ip": "<IP>", "phone": "<PHONE>"}
_REDACT_ORDER = ("email", "ip", "phone")


def pii_scrub(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + the redacted text's fingerprint.

    Output: (doc_id, n_emails, n_ips, n_phones, n_pii, is_clean,
    redacted_fp) — the fingerprint (md5 of the fully-redacted text)
    rather than the text itself, so the result table stays narrow
    enough to join back as a curation gate at 100 TB; the redaction
    expression is deterministic, so any consumer can re-materialize
    the cleaned text with `redact_text` and verify against the fp.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[k]))
        .cast("long")
        .alias(f"n_{k}s")
        for k in _REDACT_ORDER
    ]
    red = redact_text(F.col(text_col))
    total = F.expr("n_emails + n_ips + n_phones")
    return (
        documents.select(id_col, *counts, F.md5(red).alias("redacted_fp"))
        .withColumn("n_pii", total.cast("long"))
        .withColumn("is_clean", F.col("n_pii") == 0)
        .select(
            id_col,
            "n_emails",
            "n_ips",
            "n_phones",
            "n_pii",
            "is_clean",
            "redacted_fp",
        )
    )


def redact_text(col):
    """The redaction expression itself (email -> ip -> phone), exposed
    so callers can materialize cleaned text with the exact semantics
    the fingerprint in `pii_scrub` commits to."""
    out = col
    for k in _REDACT_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[k], PII_TOKENS[k])
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive: str | None = None,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier tuple
    (Sweeney 2002; Machanavajjhala 2007): every row whose QI
    equivalence class holds fewer than k members is re-identifiable
    at confidence 1/class-size, and a class with few DISTINCT
    sensitive values leaks the attribute even when k is met. This is
    the release-gate audit a dataset publisher runs before sharing —
    the output is per-class, so the caller both reads the headline
    (min class size = the dataset's k) and joins classes back to rows
    to suppress or generalize the offenders.

    One groupBy over the QI columns (partial-agg friendly — class
    counts and the exact distinct both combine map-side; the distinct
    is over the class's OWN sensitive values, bounded by class size).
    All outputs are integers — trivially oracle-exact.

    Output: one row per equivalence class — (*quasi_identifiers,
    class_size, l_distinct, meets_k, meets_l) where l_distinct is the
    sensitive attribute's distinct count within the class and the two
    flags evaluate the release thresholds (class_size >= k,
    l_distinct >= l). No sensitive VALUES appear in the output, only
    counts — the audit itself is publishable.
    """
    if not quasi_identifiers:
        raise ValueError("quasi_identifiers must be non-empty")
    aggs = [F.count("*").alias("class_size")]
    if sensitive is not None:
        aggs.append(F.countDistinct(sensitive).alias("l_distinct"))
    out = df.groupBy(*quasi_identifiers).agg(*aggs)
    out = out.withColumn("meets_k", F.col("class_size") >= int(k))
    if sensitive is not None:
        out = out.withColumn("meets_l", F.col("l_distinct") >= int(l))
    return out
