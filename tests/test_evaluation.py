"""auc_score + chi2_terms — hand goldens and python lockstep."""

import random
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F


def _r6(x: float) -> float:
    """Spark/DuckDB round(): decimal HALF_UP, not python banker's."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _auc_pairs(rows) -> float:
    """Brute-force pair-counting AUC with 0.5 tie credit."""
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return _r6(num / (len(pos) * len(neg)))


def test_auc_hand_golden_with_tie(spark):
    from careers_spark.operators.evaluation import auc_score

    rows = [(0.1, 0), (0.2, 1), (0.2, 0), (0.3, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = auc_score(df).collect()[0]
    # pairs: (.2+,.1-) win, (.2+,.2-) tie, (.3+,.1-) win, (.3+,.2-) win
    assert (r.npos, r.nneg, r.auc) == (2, 2, 0.875)


def test_auc_perfect_and_inverted(spark):
    from careers_spark.operators.evaluation import auc_score

    perfect = [(float(i) / 10, 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(perfect, "score double, label int")
    assert auc_score(df).collect()[0].auc == 1.0
    inverted = [(s, 1 - y) for s, y in perfect]
    df2 = spark.createDataFrame(inverted, "score double, label int")
    assert auc_score(df2).collect()[0].auc == 0.0


def test_auc_degenerate_labels_null(spark):
    from careers_spark.operators.evaluation import auc_score

    df = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, label int")
    r = auc_score(df).collect()[0]
    assert r.auc is None and r.nneg == 0


def test_auc_matches_pair_counting_random(spark):
    from careers_spark.operators.evaluation import auc_score

    rng = random.Random(11)
    # heavy ties: scores on a coarse 0.05 grid
    rows = [
        (round(rng.randrange(0, 20) * 0.05, 2), rng.randrange(2))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    assert auc_score(df).collect()[0].auc == _auc_pairs(rows)


def _chi2_py(a, df_t, nl, nn):
    adbc = a * 1.0 * (nn - nl - df_t + a) - (df_t - a) * 1.0 * (nl - a)
    return _r6((nn * 1.0) * adbc * adbc / ((df_t * 1.0) * (nn - df_t) * nl * (nn - nl)))


def test_chi2_hand_golden(spark):
    from careers_spark.operators.evaluation import chi2_terms

    # 6 docs, 2 langs; 'aa' only in lang x (perfectly discriminative),
    # 'cc' everywhere (uninformative -> excluded: df_t == nn)
    rows = [
        (1, "aa bb cc", "x"),
        (2, "aa cc", "x"),
        (3, "aa bb cc", "x"),
        (4, "bb cc", "y"),
        (5, "cc", "y"),
        (6, "bb cc dd", "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = chi2_terms(
        df, F.split("text", " "), class_col="lang", top_n=2, min_df=1
    ).collect()
    by = {(r.lang, r.token): (r.n_class_docs, r.chi2, r.rk) for r in got}
    assert ("x", "cc") not in by and ("y", "cc") not in by
    # aa: a=3, df_t=3, nl=3, nn=6 -> chi2 = 6
    assert by[("x", "aa")] == (3, _chi2_py(3, 3, 3, 6), 1)
    # bb in y: a=2, df_t=4, nl=3
    assert by[("y", "bb")][1] == _chi2_py(2, 4, 3, 6)
    # top_n respected and ranks contiguous per class
    for lang in ("x", "y"):
        rks = sorted(v[2] for k, v in by.items() if k[0] == lang)
        assert rks == list(range(1, len(rks) + 1)) and len(rks) <= 2


def test_chi2_min_df_filter(spark):
    from careers_spark.operators.evaluation import chi2_terms

    rows = [(1, "rare common", "x"), (2, "common", "y"), (3, "common", "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = chi2_terms(df, F.split("text", " "), top_n=5, min_df=2).collect()
    assert all(r.token != "rare" for r in got)
