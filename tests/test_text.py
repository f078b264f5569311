"""Tokenizer goldens (reference: simpleUnitTests.scala:76-104 specials,
utility.scala:393-445 normalize/tokenize semantics)."""

from careers_spark.functions.text import (
    normalize_py,
    normalize_sf_py,
    tokenize_py,
)


def test_specials():
    assert tokenize_py("I know C++ and .NET") == ["i", "know", "cplusplus", "and", "dotnet"]
    assert tokenize_py("c# and f# devs") == ["csharp", "and", "fsharp", "devs"]


def test_normalize():
    assert normalize_py("Don't use A/B-tests") == "dont use a b tests"


def test_ascii_folding():
    assert tokenize_py("Beyoncé Café") == ["beyonce", "cafe"]


def test_normalize_sf():
    assert normalize_sf_py("  The   Quick/Brown-Fox's  ") == "the quick brown foxs"


def test_empty_and_none():
    assert tokenize_py("") == []
    assert tokenize_py(None) == []


def test_catalyst_python_lockstep(spark):
    """normalize_col (Catalyst) must equal normalize_py on a sample."""
    import pandas as pd
    from pyspark.sql import functions as F

    from careers_spark.functions.text import normalize_col

    samples = ["Don't A/B-test", "C++ rocks", "MiXeD CaSe", "", "a-b/c'd"]
    df = spark.createDataFrame(pd.DataFrame({"t": samples}))
    got = [r[0] for r in df.select(normalize_col(F.col("t"))).collect()]
    assert got == [normalize_py(s) for s in samples]
