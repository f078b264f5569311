"""Goldens for textstats.robust_length_stats and term_index_summary."""

import numpy as np

from careers_spark.operators.textstats import (
    robust_length_stats,
    term_index_summary,
)


def test_winsorized_mean_clamps_the_outlier(spark):
    # nine 100s and one 10000: the raw mean is dragged to 1090, the
    # winsorized mean clamps the outlier to the p95 bound
    vals = [100] * 9 + [10000]
    df = spark.createDataFrame(
        [(i, "en", v) for i, v in enumerate(vals)],
        "doc_id long, lang string, n_chars int",
    )
    r = robust_length_stats(df).collect()[0]
    assert r["n"] == 10
    assert r["mean_raw"] == 1090.0
    # numpy linear interpolation: p95 of the sorted list
    p95 = round(float(np.percentile(vals, 95, method="linear")), 6)
    assert r["p_hi"] == p95
    hi_i = int(np.floor(abs(p95) + 0.5))  # round half away, positive here
    expected = round((9 * 100 + min(10000, hi_i)) / 10, 6)
    assert r["winsorized_mean"] == expected
    assert r["winsorized_mean"] < r["mean_raw"]


def test_winsorized_equals_raw_without_outliers(spark):
    df = spark.createDataFrame(
        [(i, "en", 50) for i in range(8)],
        "doc_id long, lang string, n_chars int",
    )
    r = robust_length_stats(df).collect()[0]
    assert r["winsorized_mean"] == r["mean_raw"] == 50.0


def test_term_index_summary_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana banana banana"),
            (3, "apple cherry"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["df"], r["cf"], r["top_doc"], r["top_tf"])
        for r in term_index_summary(docs, min_df=2).collect()
    }
    # apple: df 3, cf 4, top doc 1 (tf 2); banana: df 2, cf 4, top doc 2
    assert got == {"apple": (3, 4, 1, 2), "banana": (2, 4, 2, 3)}


def test_term_index_top_tie_breaks_to_smaller_doc(spark):
    docs = spark.createDataFrame(
        [(5, "z z"), (9, "z z"), (1, "q")],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["top_doc"], r["top_tf"])
        for r in term_index_summary(docs, min_df=1).collect()
    }
    assert got["z"] == (5, 2)  # equal tf 2 in docs 5 and 9 -> doc 5
