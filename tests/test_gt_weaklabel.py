"""good_turing + weak_lf_analysis/weak_label_votes — goldens."""

import pytest


def test_good_turing_hand_values(spark):
    """Corpus 'a a a b b c': counts a=3, b=2, c=1 -> N_1=N_2=N_3=1,
    N=6. mass(1)=1/6, r*(1)=2*1/1=2, r*(2)=3, r*(3)=NULL (no N_4);
    unseen row mass = N_1/N = 1/6."""
    from careers_spark.operators.textstats import good_turing

    df = spark.createDataFrame(
        [(0, "a a a b b c")], "doc_id long, text string"
    )
    out = {r["r"]: r for r in good_turing(df).collect()}
    assert out[1]["n_r"] == 1 and out[1]["mass"] == pytest.approx(1 / 6, abs=1e-6)
    assert out[1]["r_star"] == 2.0
    assert out[2]["r_star"] == 3.0
    assert out[3]["r_star"] is None
    assert out[0]["mass"] == pytest.approx(1 / 6, abs=1e-6)
    assert out[0]["n_r"] == 0


def test_good_turing_mass_sums_to_one(spark):
    """Observed masses r*N_r/N partition the corpus exactly."""
    from careers_spark.operators.textstats import good_turing

    df = spark.createDataFrame(
        [(i, "x y z w " * (i + 1) + f"tok{i}") for i in range(8)],
        "doc_id long, text string",
    )
    rows = good_turing(df).collect()
    obs = sum(r["mass"] for r in rows if r["r"] > 0)
    assert obs == pytest.approx(1.0, abs=1e-4)


def _lf_df(spark, rows):
    return spark.createDataFrame(
        rows, "unit long, lf_a int, lf_b int, lf_c int, gold int"
    )


def test_weak_lf_stats_hand_golden(spark):
    """4 units:
      u0: a=1 b=1 c=NULL  -> a votes+overlaps, no conflict
      u1: a=1 b=0 c=NULL  -> a conflicts with b
      u2: a=NULL b=NULL c=1
      u3: a=0 b=NULL c=NULL -> a votes alone: overlap/conflict 0
    gold = 1 everywhere."""
    from careers_spark.operators.features import weak_lf_analysis

    rows = [
        (0, 1, 1, None, 1),
        (1, 1, 0, None, 1),
        (2, None, None, 1, 1),
        (3, 0, None, None, 1),
    ]
    out = {
        r["lf"]: r
        for r in weak_lf_analysis(
            _lf_df(spark, rows), ["lf_a", "lf_b", "lf_c"], gold="gold"
        ).collect()
    }
    a = out["lf_a"]
    assert a["n_votes"] == 3 and a["coverage"] == 0.75
    assert a["n_overlap"] == 2 and a["overlap"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["n_conflict"] == 1
    assert a["n_correct"] == 2  # votes 1,1,0 vs gold 1
    c = out["lf_c"]
    assert c["n_votes"] == 1 and c["n_overlap"] == 0 and c["n_conflict"] == 0
    assert c["accuracy"] == 1.0


def test_weak_lf_never_votes_null_rates(spark):
    from careers_spark.operators.features import weak_lf_analysis

    rows = [(0, 1, None, None, 1), (1, 0, None, 1, 0)]
    out = {
        r["lf"]: r
        for r in weak_lf_analysis(
            _lf_df(spark, rows), ["lf_a", "lf_b", "lf_c"], gold="gold"
        ).collect()
    }
    b = out["lf_b"]
    assert b["n_votes"] == 0
    assert b["overlap"] is None and b["conflict"] is None
    assert b["accuracy"] is None


def test_weak_vote_majority_tie_abstain(spark):
    from careers_spark.operators.features import weak_label_votes

    rows = [
        (0, 1, 1, 0, 0),    # 2-1 -> 1
        (1, 0, 0, 1, 0),    # 1-2 -> 0
        (2, 1, 0, None, 0),  # 1-1 tie -> NULL
        (3, None, None, None, 0),  # all abstain -> NULL
    ]
    out = {
        r["unit"]: r
        for r in weak_label_votes(
            _lf_df(spark, rows), ["lf_a", "lf_b", "lf_c"]
        ).collect()
    }
    assert out[0]["vote"] == 1 and out[1]["vote"] == 0
    assert out[2]["vote"] is None and out[3]["vote"] is None
    assert out[2]["n_pos"] == 1 and out[2]["n_neg"] == 1


def test_weak_lf_validation(spark):
    from careers_spark.operators.features import (
        weak_label_votes,
        weak_lf_analysis,
    )

    df = _lf_df(spark, [(0, 1, 0, None, 1)])
    with pytest.raises(ValueError):
        weak_lf_analysis(df, ["lf_a"])
    with pytest.raises(ValueError):
        weak_label_votes(df, [])
