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


def test_confusion_stats_hand_golden(spark):
    from careers_spark.operators.evaluation import confusion_stats

    # truth: a a a b b; pred: a b a c b  -> 'c' hallucinated, every
    # class exercises a different zero/partial cell
    rows = [("a", "a"), ("a", "b"), ("a", "a"), ("b", "c"), ("b", "b")]
    df = spark.createDataFrame(rows, "truth string, pred string")
    got = {r.cls: r for r in confusion_stats(df).collect()}
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert (a.n_true, a.n_pred, a.n_correct) == (3, 2, 2)
    assert a.precision == 1.0 and a.recall == _r6(2 / 3)
    assert a.f1 == _r6(4 / 5)  # 2*2/(3+2)
    b = got["b"]
    assert (b.n_true, b.n_pred, b.n_correct) == (2, 2, 1)
    assert b.precision == 0.5 and b.recall == 0.5 and b.f1 == 0.5
    c = got["c"]
    assert (c.n_true, c.n_pred, c.n_correct) == (0, 1, 0)
    assert c.precision == 0.0 and c.recall is None and c.f1 == 0.0


def test_cohens_kappa_hand_golden(spark):
    from careers_spark.operators.evaluation import cohens_kappa

    # classic 2x2: agree 20+15=35 of 50; marginals t=(25,25), p=(30,20)
    rows = (
        [("x", "x")] * 20 + [("x", "y")] * 5 + [("y", "x")] * 10 + [("y", "y")] * 15
    )
    df = spark.createDataFrame(rows, "truth string, pred string")
    r = cohens_kappa(df).collect()[0]
    assert (r.nn, r.n_agree) == (50, 35)
    assert r.sum_rc == 25 * 30 + 25 * 20  # 1250
    # kappa = (50*35 - 1250) / (50*50 - 1250) = 500/1250 = 0.4
    assert r.kappa == 0.4 and r.accuracy == 0.7


def test_cohens_kappa_degenerate_null(spark):
    from careers_spark.operators.evaluation import cohens_kappa

    df = spark.createDataFrame([("a", "a"), ("a", "a")], "truth string, pred string")
    r = cohens_kappa(df).collect()[0]
    assert r.kappa is None and r.accuracy == 1.0


def test_calibration_bins_hand_golden(spark):
    from careers_spark.operators.evaluation import calibration_bins

    rows = [
        (0.05, 0), (0.05, 1),          # bin 0: conf .05, acc .5
        (0.95, 1), (0.95, 1),          # bin 9
        (1.0, 0),                      # score == 1.0 folds into bin 9
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r.bin: r for r in calibration_bins(df, bins=10).collect()}
    assert set(got) == {0, 9}
    b0 = got[0]
    assert (b0.n, b0.n_pos, b0.conf, b0.acc, b0.gap) == (2, 1, 0.05, 0.5, 0.45)
    b9 = got[9]
    assert (b9.n, b9.n_pos) == (3, 2)
    assert b9.conf == _r6((0.95 + 0.95 + 1.0) / 3)
    assert b9.acc == _r6(2 / 3)
    assert b9.gap == _r6(abs(b9.conf - b9.acc))


def test_welch_ttest_lockstep(spark):
    import math

    from careers_spark.operators.evaluation import welch_ttest

    g1 = [120, 140, 135, 150, 128]
    g0 = [100, 90, 110, 95]
    rows = [(v, 1) for v in g1] + [(v, 0) for v in g0]
    df = spark.createDataFrame(rows, "value long, grp int")
    r = welch_ttest(df).collect()[0]

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    n1, m1, v1 = stats(g1)
    n0, m0, v0 = stats(g0)
    se2 = v1 / n1 + v0 / n0
    t = (m1 - m0) / math.sqrt(se2)
    dfw = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v0 / n0) ** 2 / (n0 - 1))
    assert (r.n_1, r.n_0) == (n1, n0)
    assert r.mean_1 == _r6(m1) and r.mean_0 == _r6(m0)
    assert abs(r.var_1 - v1) < 1e-6 and abs(r.var_0 - v0) < 1e-6
    assert abs(r.t_stat - t) < 1e-6 and abs(r.df_welch - dfw) < 1e-6


def test_welch_ttest_degenerate_null(spark):
    from careers_spark.operators.evaluation import welch_ttest

    df = spark.createDataFrame(
        [(10, 1), (12, 1), (11, 0)], "value long, grp int"
    )
    r = welch_ttest(df).collect()[0]
    assert r.t_stat is None and r.df_welch is None and r.var_0 is None


def test_pearson_corr_hand_cases(spark):
    from careers_spark.operators.evaluation import pearson_corr

    # perfect positive, perfect negative, and an exact hand value
    up = spark.createDataFrame([(i, 2 * i + 3) for i in range(6)], "x long, y long")
    assert pearson_corr(up).collect()[0].r == 1.0
    dn = spark.createDataFrame([(i, -5 * i) for i in range(6)], "x long, y long")
    assert pearson_corr(dn).collect()[0].r == -1.0

    import math

    rows = [(1, 2), (2, 1), (3, 4), (4, 3), (5, 9)]
    df = spark.createDataFrame(rows, "x long, y long")
    n = len(rows)
    sx = sum(x for x, _ in rows); sy = sum(y for _, y in rows)
    sxx = sum(x * x for x, _ in rows); syy = sum(y * y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    want = _r6((n * 1.0 * sxy - sx * 1.0 * sy)
               / math.sqrt((n * 1.0 * sxx - sx * 1.0 * sx)
                           * (n * 1.0 * syy - sy * 1.0 * sy)))
    assert pearson_corr(df).collect()[0].r == want


def test_pearson_corr_zero_variance_null(spark):
    from careers_spark.operators.evaluation import pearson_corr

    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x long, y long")
    assert pearson_corr(df).collect()[0].r is None


def _mwu_reference(rows):
    """Pure-python Mann-Whitney: doubled U via pair counting, z with
    the tie-corrected normal approximation (no continuity corr)."""
    import math

    g1 = sorted(v for v, g in rows if g == 1)
    g0 = sorted(v for v, g in rows if g == 0)
    n1, n0 = len(g1), len(g0)
    u2 = sum(
        2 if x > y else 1 if x == y else 0 for x in g1 for y in g0
    )
    from collections import Counter

    cnt = Counter(v for v, _ in rows)
    ties3 = sum(t**3 - t for t in cnt.values())
    n = n1 + n0
    sig2 = (n1 * 1.0 * n0 / 12.0) * (
        (n + 1.0) - ties3 * 1.0 / (n * 1.0 * (n - 1.0))
    )
    z = None
    if n1 and n0 and sig2 > 0:
        z = _r6((u2 - n1 * 1.0 * n0) / (2.0 * math.sqrt(sig2)))
    return n1, n0, u2, ties3, z


def test_mann_whitney_hand_golden(spark):
    """Hand case with a cross-group tie: g1={3,5}, g0={1,3}.
    Pairs: (3>1)=1, (3=3)=.5, (5>1)=1, (5>3)=1 -> U1=3.5, u2=7."""
    from careers_spark.operators.evaluation import mann_whitney_u

    rows = [(3, 1), (5, 1), (1, 0), (3, 0)]
    df = spark.createDataFrame(rows, "value long, grp int")
    r = mann_whitney_u(df).collect()[0]
    assert (r.n_1, r.n_0, r.u2_1) == (2, 2, 7)
    assert r.u_1 == 3.5
    # ties3: value 3 has t=2 -> 6; values 1, 5 contribute 0
    assert r.ties3 == 6
    n1, n0, u2, ties3, z = _mwu_reference(rows)
    assert r.z == z


def test_mann_whitney_python_lockstep_random(spark):
    from careers_spark.operators.evaluation import mann_whitney_u
    import random

    rng = random.Random(23)
    # coarse grid forces heavy ties
    rows = [(rng.randrange(0, 8), rng.randrange(2)) for _ in range(400)]
    df = spark.createDataFrame(rows, "value long, grp int")
    r = mann_whitney_u(df).collect()[0]
    n1, n0, u2, ties3, z = _mwu_reference(rows)
    assert (r.n_1, r.n_0, r.u2_1, r.ties3) == (n1, n0, u2, ties3)
    assert r.z == z
    # the reported AUC is the same statistic as auc_score
    from careers_spark.operators.evaluation import auc_score

    a = auc_score(
        spark.createDataFrame(
            [(float(v), g) for v, g in rows], "score double, label int"
        )
    ).collect()[0]
    assert r.auc == a.auc


def test_mann_whitney_degenerate_null(spark):
    from careers_spark.operators.evaluation import mann_whitney_u

    # all rows tied at one value: sigma = 0 -> NULL z (auc = 0.5)
    df = spark.createDataFrame(
        [(7, 1), (7, 1), (7, 0), (7, 0)], "value long, grp int"
    )
    r = mann_whitney_u(df).collect()[0]
    assert r.z is None and r.auc == 0.5
    # one-group input: NULL z and NULL auc
    df2 = spark.createDataFrame([(1, 1), (2, 1)], "value long, grp int")
    r2 = mann_whitney_u(df2).collect()[0]
    assert r2.z is None and r2.auc is None


def _cuped_reference(rows):
    """Pure-python CUPED over exact integer sums (floats only in the
    closing expressions, mirroring the shared-text recipe)."""
    n0 = sum(1 for *_, g in rows if g == 0)
    n1 = sum(1 for *_, g in rows if g == 1)
    sx0 = sum(x for x, _, g in rows if g == 0)
    sx1 = sum(x for x, _, g in rows if g == 1)
    sy0 = sum(y for _, y, g in rows if g == 0)
    sy1 = sum(y for _, y, g in rows if g == 1)
    sxx = sum(x * x for x, _, _ in rows)
    syy = sum(y * y for _, y, _ in rows)
    sxy = sum(x * y for x, y, _ in rows)
    n, sx, sy = n0 + n1, sx0 + sx1, sy0 + sy1
    varx = n * 1.0 * sxx - sx * 1.0 * sx
    vary = n * 1.0 * syy - sy * 1.0 * sy
    cov = n * 1.0 * sxy - sx * 1.0 * sy
    theta = cov / varx
    diff = sy1 * 1.0 / n1 - sy0 * 1.0 / n0
    dx = sx1 * 1.0 / n1 - sx0 * 1.0 / n0
    return (
        _r6(theta),
        _r6(diff),
        _r6(diff - theta * dx),
        _r6(cov * cov / (varx * vary)),
    )


def test_cuped_hand_lockstep(spark):
    from careers_spark.operators.evaluation import cuped_adjusted

    rows = [
        (10, 25, 0),
        (20, 41, 0),
        (30, 58, 0),
        (12, 39, 1),
        (22, 55, 1),
        (28, 70, 1),
    ]
    df = spark.createDataFrame(rows, "x long, y long, grp int")
    r = cuped_adjusted(df).collect()[0]
    theta, diff, adj, vr = _cuped_reference(rows)
    assert (r.theta, r.diff_raw, r.diff_cuped, r.var_reduction) == (
        theta,
        diff,
        adj,
        vr,
    )


def test_cuped_perfect_covariate_removes_all_variance(spark):
    """y = 3x exactly: var_reduction = 1 and the adjusted diff nulls
    out the raw diff entirely (theta = 3, diff = theta * dx)."""
    from careers_spark.operators.evaluation import cuped_adjusted

    rows = [(x, 3 * x, g) for g, xs in ((0, [1, 2, 5]), (1, [2, 4, 9])) for x in xs]
    df = spark.createDataFrame(rows, "x long, y long, grp int")
    r = cuped_adjusted(df).collect()[0]
    assert r.theta == 3.0
    assert r.var_reduction == 1.0
    assert r.diff_cuped == 0.0


def test_cuped_degenerate_nulls(spark):
    from careers_spark.operators.evaluation import cuped_adjusted

    # zero covariate variance: theta undefined, raw diff still out
    rows = [(5, 10, 0), (5, 14, 0), (5, 30, 1), (5, 34, 1)]
    df = spark.createDataFrame(rows, "x long, y long, grp int")
    r = cuped_adjusted(df).collect()[0]
    assert r.theta is None and r.diff_cuped is None
    assert r.diff_raw == 20.0
    # empty arm: everything adjusted is NULL
    df2 = spark.createDataFrame([(1, 2, 1), (2, 3, 1)], "x long, y long, grp int")
    r2 = cuped_adjusted(df2).collect()[0]
    assert r2.diff_raw is None and r2.diff_cuped is None


def test_abc_classes_hand_golden(spark):
    """amounts 80/15/5 over three keys: one key per class, exact
    cross-multiplied boundaries (the 80-unit key sits exactly ON the
    80% boundary and classifies A)."""
    from careers_spark.operators.evaluation import abc_classes

    df = spark.createDataFrame(
        [(1, 80), (2, 15), (3, 5)], "key long, amount long"
    )
    rows = {r.cls: r for r in abc_classes(df).collect()}
    assert rows["A"].n_keys == 1 and rows["A"].class_total == 80
    assert rows["A"].heaviest_key == 1
    assert rows["B"].n_keys == 1 and rows["B"].class_total == 15
    assert rows["C"].n_keys == 1 and rows["C"].class_total == 5
    assert rows["A"].share == 0.8 and rows["C"].share == 0.05


def test_abc_classes_accumulates_per_key_and_ties(spark):
    """Per-key aggregation precedes ranking; equal amounts break ties
    by ascending key, so the boundary lands deterministically."""
    from careers_spark.operators.evaluation import abc_classes

    # key 1 appears twice (30+30=60); keys 2 and 3 tie at 20
    df = spark.createDataFrame(
        [(1, 30), (1, 30), (2, 20), (3, 20)], "key long, amount long"
    )
    rows = {r.cls: r for r in abc_classes(df).collect()}
    # total 100, exclusive-cum rule: key 1 (prev 0) A, key 2 (prev 60,
    # tie order: key 2 before 3) A, key 3 (prev 80: not < 80%, < 95%)
    # -> B; no C row exists
    assert rows["A"].n_keys == 2 and rows["A"].class_total == 80
    assert rows["A"].heaviest_key == 1
    assert rows["B"].n_keys == 1 and rows["B"].heaviest_key == 3
    assert "C" not in rows


def test_abc_classes_single_key_all_a(spark):
    from careers_spark.operators.evaluation import abc_classes

    df = spark.createDataFrame([(7, 42)], "key long, amount long")
    (r,) = abc_classes(df).collect()
    assert (r.cls, r.n_keys, r.share, r.heaviest_key) == ("A", 1, 1.0, 7)


def test_stump_perfect_split_hand_golden(spark):
    """Values 1..4 with label = v <= 2: four bins, the bin-1 split
    separates perfectly (gini 0, gain = the parent's 0.5)."""
    from careers_spark.operators.evaluation import stump_split_gain

    rows = [(v, 1 if v <= 2 else 0) for v in (1, 1, 2, 2, 3, 3, 4, 4)]
    df = spark.createDataFrame(rows, "x long, label int")
    out = {r.split_bin: r for r in stump_split_gain(df, n_bins=4).collect()}
    assert set(out) == {0, 1, 2}
    best = out[1]
    assert best.is_best
    assert (best.n_left, best.pos_left, best.n_right, best.pos_right) == (
        4, 4, 4, 0,
    )
    assert best.gini_split == 0.0 and best.gain == 0.5
    assert best.threshold_le == 2
    assert not out[0].is_best and not out[2].is_best


def test_stump_python_lockstep_random(spark):
    from careers_spark.operators.evaluation import stump_split_gain
    import random
    from decimal import ROUND_HALF_UP, Decimal

    def r9(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    rng = random.Random(53)
    rows = [
        (rng.randrange(0, 200), 1 if rng.random() < 0.3 else 0)
        for _ in range(500)
    ]
    n_bins = 16
    df = spark.createDataFrame(rows, "x long, label int")
    got = {r.split_bin: r for r in stump_split_gain(df, n_bins=n_bins).collect()}
    mn = min(v for v, _ in rows)
    mx = max(v for v, _ in rows)
    n = len(rows)
    pos = sum(y for _, y in rows)
    hist = {}
    for v, y in rows:
        b = ((v - mn) * n_bins) // (mx - mn + 1)
        nb, pb = hist.get(b, (0, 0))
        hist[b] = (nb + 1, pb + y)
    nl = pl = 0
    want = {}
    for b in sorted(hist):
        nb, pb = hist[b]
        nl += nb
        pl += pb
        if nl >= n:
            continue
        nr, pr = n - nl, pos - pl
        gl = nl * 1.0 - (pl * 1.0 * pl + (nl * 1.0 - pl) * (nl * 1.0 - pl)) / nl
        gr = nr * 1.0 - (pr * 1.0 * pr + (nr * 1.0 - pr) * (nr * 1.0 - pr)) / nr
        want[b] = (nl, pl, nr, pr, r9((gl + gr) / n))
    assert set(got) == set(want)
    for b, (wnl, wpl, wnr, wpr, wg) in want.items():
        r = got[b]
        assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == (
            wnl, wpl, wnr, wpr,
        )
        assert r.gini_split == wg
    best_bin = min(want, key=lambda b: (want[b][4], b))
    assert got[best_bin].is_best
    assert sum(1 for r in got.values() if r.is_best) == 1


def test_stump_tie_breaks_to_smaller_bin(spark):
    """A label split symmetric around the middle makes the two outer
    candidate splits equally good; the smaller bin wins the flag."""
    from careers_spark.operators.evaluation import stump_split_gain

    # values 1,2,3,4 one each; label 1 on the middle two
    rows = [(1, 0), (2, 1), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "x long, label int")
    out = {r.split_bin: r for r in stump_split_gain(df, n_bins=4).collect()}
    assert out[0].gini_split == out[2].gini_split
    assert out[0].is_best and not out[2].is_best


def test_stump_constant_feature_empty(spark):
    from careers_spark.operators.evaluation import stump_split_gain

    df = spark.createDataFrame([(7, 1), (7, 0)], "x long, label int")
    assert stump_split_gain(df, n_bins=8).count() == 0


def _conf_split(key, salt="conf0"):
    import hashlib

    h = hashlib.md5((str(key) + salt).encode()).hexdigest()
    return int(h[:8], 16) % 1000


def test_conformal_python_lockstep(spark):
    """conformal_gate == an exact python replay of the split-conformal
    recipe (same md5 split, same ceil rank, same tie handling) on 300
    lattice scores, at two alphas."""
    import math
    import random

    rng = random.Random(17)
    rows = [(k, rng.randrange(0, 1000000) / 1e6) for k in range(300)]
    from careers_spark.operators.evaluation import conformal_gate

    df = spark.createDataFrame(rows, "key long, score double")
    got = {
        r.alpha_mille: r
        for r in conformal_gate(
            df, alphas_mille=(100, 250), calib_mille=500
        ).collect()
    }
    cal = sorted(
        -round(s * 1e6) for k, s in rows if _conf_split(k) < 500
    )
    test = [-round(s * 1e6) for k, s in rows if _conf_split(k) >= 500]
    for am in (100, 250):
        r = math.ceil((len(cal) + 1) * (1000 - am) / 1000)
        qh = cal[r - 1] if r <= len(cal) else None
        ncov = (
            len(test) if qh is None else sum(1 for s in test if s <= qh)
        )
        g = got[am]
        assert (g.n_cal, g.n_test, g.q_rank) == (len(cal), len(test), r)
        assert g.q_hat == qh
        assert g.n_covered == ncov
        assert g.coverage == round(ncov / len(test), 6)
        # the finite-sample theorem is about the RANK: E[coverage] =
        # q_rank/(n_cal+1) >= 1-alpha (per-split coverage fluctuates
        # Beta-style around it, so asserting a band on one split would
        # be statistically wrong)
        assert g.q_rank / (g.n_cal + 1) >= 1 - am / 1000


def test_conformal_rank_past_calibration_covers_all(spark):
    """alpha smaller than 1/(n_cal+1) -> q_hat = +inf (NULL): every
    test row is covered and that is REPORTED, not raised."""
    from careers_spark.operators.evaluation import conformal_gate

    rows = [(k, k / 1e6) for k in range(40)]
    df = spark.createDataFrame(rows, "key long, score double")
    (r,) = conformal_gate(
        df, alphas_mille=(1,), calib_mille=500
    ).collect()
    assert r.q_rank == r.n_cal + 1
    assert r.q_hat is None
    assert r.n_covered == r.n_test and r.coverage == 1.0


def test_conformal_empty_test_side(spark):
    """calib_mille=1000 puts every row in calibration: n_test=0 and
    coverage is NULL (0/0), not a crash."""
    from careers_spark.operators.evaluation import conformal_gate

    df = spark.createDataFrame(
        [(k, 0.5) for k in range(10)], "key long, score double"
    )
    (r,) = conformal_gate(
        df, alphas_mille=(200,), calib_mille=1000
    ).collect()
    assert r.n_cal == 10 and r.n_test == 0
    assert r.n_covered == 0 and r.coverage is None


def _pav(ns, ps):
    """Weighted PAV with integer block sums, one division per block."""
    blocks = []  # [w, p, n_bins]
    for n, p in zip(ns, ps):
        blocks.append([n, p, 1])
        while len(blocks) > 1 and (
            blocks[-2][1] * blocks[-1][0] >= blocks[-1][1] * blocks[-2][0]
        ):
            w2, p2, c2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += p2
            blocks[-1][2] += c2
    out = []
    for w, p, c in blocks:
        out += [p / w] * c
    return out


def test_isotonic_hand_golden_pools_violation(spark):
    """Rates 0.2, 0.6, 0.3, 0.9: bins 1-2 violate monotonicity and
    pool to (6+3)/20 = 0.45; ends untouched."""
    from careers_spark.operators.evaluation import isotonic_calibration

    rows = [(0, 10, 2), (1, 10, 6), (2, 10, 3), (3, 10, 9)]
    df = spark.createDataFrame(rows, "bin long, n long, n_pos long")
    got = {r.bin: r for r in isotonic_calibration(df).collect()}
    assert [got[i].fitted for i in range(4)] == [0.2, 0.45, 0.45, 0.9]
    assert got[2].rate == 0.3


def test_isotonic_python_pav_lockstep_and_monotone(spark):
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from careers_spark.operators.evaluation import isotonic_calibration

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    rng = random.Random(77)
    ns = [rng.randrange(1, 40) for _ in range(25)]
    ps = [rng.randrange(0, n + 1) for n in ns]
    df = spark.createDataFrame(
        list(zip(range(25), ns, ps)), "bin long, n long, n_pos long"
    )
    got = [
        r.fitted
        for r in sorted(
            isotonic_calibration(df).collect(), key=lambda r: r.bin
        )
    ]
    want = [r6(v) for v in _pav(ns, ps)]
    assert got == want
    assert got == sorted(got)  # nondecreasing


def test_isotonic_max_bins_raises(spark):
    import pytest as pt

    from careers_spark.operators.evaluation import isotonic_calibration

    df = spark.createDataFrame(
        [(i, 1, 0) for i in range(9)], "bin long, n long, n_pos long"
    )
    with pt.raises(ValueError, match="max_bins"):
        isotonic_calibration(df, max_bins=8)


def test_kendall_hand_goldens(spark):
    from careers_spark.operators.evaluation import rank_agreement

    # perfectly concordant
    df = spark.createDataFrame(
        [(i, i * 2) for i in range(6)], "x long, y long"
    )
    (r,) = rank_agreement(df).collect()
    assert (r.concordant, r.discordant, r.tau_b) == (15, 0, 1.0)
    # perfectly reversed
    df2 = spark.createDataFrame(
        [(i, -i) for i in range(6)], "x long, y long"
    )
    (r2,) = rank_agreement(df2).collect()
    assert r2.tau_b == -1.0
    # y all ties -> NULL
    df3 = spark.createDataFrame(
        [(i, 7) for i in range(5)], "x long, y long"
    )
    (r3,) = rank_agreement(df3).collect()
    assert r3.tau_b is None and r3.ties_y == 10


def test_kendall_scipy_style_lockstep(spark):
    """Value-table contingency == literal O(n^2) pair counting with the
    tau-b ties formula, heavy ties included."""
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal
    from itertools import combinations

    from careers_spark.operators.evaluation import rank_agreement

    rng = random.Random(29)
    rows = [(rng.randrange(8), rng.randrange(6)) for _ in range(150)]
    C = D = tx = ty = 0
    for (x1, y1), (x2, y2) in combinations(rows, 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            C += 1
        elif s < 0:
            D += 1
        if x1 == x2:
            tx += 1
        if y1 == y2:
            ty += 1
    n = len(rows)
    P = n * (n - 1) // 2
    want = (C - D) / math.sqrt((P - tx) * 1.0 * (P - ty))
    want = float(
        Decimal(repr(want)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )
    df = spark.createDataFrame(rows, "x long, y long")
    (r,) = rank_agreement(df).collect()
    assert (r.n, r.n_pairs) == (n, P)
    assert (r.concordant, r.discordant) == (C, D)
    # note: ties_x counts pairs tied on x REGARDLESS of y (incl. both-tied)
    assert (r.ties_x, r.ties_y) == (tx, ty)
    assert r.tau_b == want
