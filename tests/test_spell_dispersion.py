"""spell_suggest + count_dispersion."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def test_spell_suggest_hand_golden(spark):
    from careers_spark.operators.retrieval import spell_suggest

    rows = [
        (0, "table table table query"),
        (1, "table stream window"),
        (2, "query stream"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = spell_suggest(df, ["tabel", "qury"], max_dist=2, top_n=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query, []).append((r.rk, r.suggestion, r.dist))
    # 'tabel' -> table (dist 2 via transposition counted as 2 in plain
    # levenshtein); table wins over stream/window by distance
    assert sorted(by_q["tabel"])[0][1] == "table"
    assert sorted(by_q["qury"])[0] == (1, "query", 1)


def test_spell_suggest_exact_match_rank_one(spark):
    from careers_spark.operators.retrieval import spell_suggest

    df = spark.createDataFrame(
        [(0, "alpha beta alpha")], "doc_id long, text string"
    )
    got = spell_suggest(df, ["alpha"], max_dist=1).collect()
    top = [r for r in got if r.rk == 1][0]
    assert (top.suggestion, top.dist, top.freq) == ("alpha", 0, 2)


def test_spell_suggest_band_is_lossless(spark):
    """Every vocab word within max_dist appears — the length band
    cannot drop a true candidate (|len diff| <= edit distance)."""
    from careers_spark.operators.retrieval import spell_suggest

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    vocab = ["spark", "spar", "sparkle", "park", "dark", "shark", "sprocket"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(vocab)], "doc_id long, text string"
    )
    got = spell_suggest(df, ["spark"], max_dist=2, top_n=100).collect()
    expected = sorted(w for w in vocab if lev("spark", w) <= 2)
    assert sorted(r.suggestion for r in got) == expected


def test_dispersion_poisson_vs_clumped(spark):
    from careers_spark.operators.evaluation import count_dispersion

    rng = random.Random(71)
    # near-Poisson: every user ~same small rate
    pois = []
    for u in range(200):
        for _ in range(rng.randint(2, 4)):
            pois.append((u,))
    # clumped: a few whales
    clump = [(u,) for u in range(180) ] + [(900 + u,) for u in range(5) for _ in range(60)]
    d1 = count_dispersion(spark.createDataFrame(pois, "user_id long")).collect()[0]
    d2 = count_dispersion(spark.createDataFrame(clump, "user_id long")).collect()[0]
    assert d1.dispersion < d2.dispersion
    assert d2.z > 2.0


def test_dispersion_lockstep(spark):
    from careers_spark.operators.evaluation import count_dispersion

    rng = random.Random(73)
    rows = [(rng.randint(0, 30),) for _ in range(400)]
    got = count_dispersion(spark.createDataFrame(rows, "user_id long")).collect()[0]
    from collections import Counter

    cnt = Counter(u for (u,) in rows)
    n = len(cnt)
    s = sum(cnt.values())
    ss = sum(c * c for c in cnt.values())
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    chi2 = (n - 1) * var / mean
    assert got.mean == _r6(mean)
    assert got.variance == _r6(var)
    assert got.chi2_stat == _r6(chi2)
    assert got.z == _r6(math.sqrt(2 * chi2) - math.sqrt(2 * (n - 1) - 1))
