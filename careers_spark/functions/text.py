"""Text normalization + tokenization.

Re-expresses the reference's normalize/tokenizer semantics
(reference: libraries/utility/utility.scala:393-445):
  - normalize: lowercase, drop apostrophes, map '/' and '-' to space
  - tokenize: unicode->ASCII folding, word chars only, with the special
    cases ``c++ -> cplusplus``, ``.net -> dotnet``, ``c# -> csharp``,
    ``f# -> fsharp`` (utility.scala:411-437)

The Catalyst path (`normalize_col`) is pure built-in expressions so it
stays inside whole-stage codegen; the Python path (`tokenize_py`) is
only used inside Arrow-batched pandas UDFs (mention scan) and in tests.
Both are kept in lock-step by tests/test_text.py.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# special-cased programming-language tokens, applied before punctuation
# stripping (reference: utility.scala:415-419)
_SPECIALS = [
    (re.compile(r"c\+\+"), "cplusplus"),
    (re.compile(r"\.net\b"), "dotnet"),
    (re.compile(r"c#"), "csharp"),
    (re.compile(r"f#"), "fsharp"),
]

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# stop words (reference: libraries/utility/StopWords.scala:5-142 — a
# standard English list; we keep a compact subset with identical intent)
STOP_WORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more
    most my myself no nor not now of off on once only or other our ours
    ourselves out over own same she should so some such than that the their
    theirs them themselves then there these they this those through to too
    under until up very was we were what when where which while who whom why
    will with you your yours yourself yourselves""".split()
)


def normalize_py(s: str) -> str:
    """Driver/UDF-side normalize: lowercase, strip ', map / and - to space."""
    if s is None:
        return ""
    return s.lower().replace("'", "").replace("/", " ").replace("-", " ")


def _fold_ascii(s: str) -> str:
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")


def tokenize_py(s: str) -> list[str]:
    """Tokenize normalized text into lowercase ASCII word tokens."""
    if not s:
        return []
    t = normalize_py(s)
    for pat, rep in _SPECIALS:
        t = pat.sub(rep, t)
    t = _fold_ascii(t)
    return _TOKEN_RE.findall(t)


def normalize_sf_py(s: str) -> str:
    """normalize + tokenize + single-space re-join (utility.scala:439-445)."""
    return " ".join(tokenize_py(s))


def normalize_col(c: Column) -> Column:
    """Catalyst-only normalize — same semantics as normalize_py."""
    return F.lower(F.translate(F.regexp_replace(c, "'", ""), "/-", "  "))


def normalize_topic_title(c: Column) -> Column:
    """Prefix 'Main:' when the title carries no namespace
    (reference: utility.scala:399-402, normalizeTopicTitle)."""
    return F.when(c.contains(":"), c).otherwise(F.concat(F.lit("Main:"), c))


def normalize_link(ns: Column, title: Column) -> Column:
    """Namespace-qualified link target with '#anchor' stripped
    (reference: utility.scala:404-409, normalizeLink)."""
    clean = F.split(title, "#")[0]
    return F.concat_ws(
        ":", F.when(ns == "", F.lit("Main")).otherwise(ns), clean
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer for DataFrame pipelines."""
    return s.map(tokenize_py)


@F.pandas_udf(T.StringType())
def normalize_sf_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_sf_py)
