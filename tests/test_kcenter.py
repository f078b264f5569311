"""Gonzalez farthest-first k-center selection (clustering.kcenter_select):
hand-positioned 1-D golden, smaller-id tie-break, duplicate-corpus early
stop, empty input."""

from careers_spark.operators.clustering import kcenter_select


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hand_golden_1d(spark):
    # lattice coords: 0, 100000, 1000000, 550000, 300000
    df = _df(
        spark,
        [
            (1, [0.0]),
            (2, [0.1]),
            (3, [1.0]),
            (4, [0.55]),
            (5, [0.3]),
        ],
    )
    got = [
        (r["sel_rank"], r["vec_id"], r["sq_dist"])
        for r in kcenter_select(df, k=3).orderBy("sel_rank").collect()
    ]
    # seed = min id; round 1 farthest from 0 is 1.0 (d = 1e6^2);
    # round 2 argmax of min-dist is 0.55 (min(550000^2, 450000^2))
    assert got == [
        (0, 1, None),
        (1, 3, 1000000000000),
        (2, 4, 202500000000),
    ]


def test_tie_breaks_to_smaller_id(spark):
    # 0.2 and -0.2 are equidistant from the seed at 0 -> smaller id wins
    df = _df(spark, [(1, [0.0]), (7, [0.2]), (3, [-0.2])])
    got = [
        (r["sel_rank"], r["vec_id"])
        for r in kcenter_select(df, k=2).orderBy("sel_rank").collect()
    ]
    assert got == [(0, 1), (1, 3)]


def test_duplicates_stop_early(spark):
    # only 2 distinct points; k=5 must stop after 2 rows, never emitting
    # an arbitrary duplicate as a "center"
    df = _df(spark, [(1, [0.0]), (2, [0.0]), (3, [1.0]), (4, [1.0])])
    got = kcenter_select(df, k=5).orderBy("sel_rank").collect()
    assert [(r["sel_rank"], r["vec_id"]) for r in got] == [(0, 1), (1, 3)]


def test_empty_input(spark):
    df = _df(spark, [])
    out = kcenter_select(df, k=3)
    assert out.count() == 0
    assert out.columns == ["sel_rank", "vec_id", "sq_dist"]
