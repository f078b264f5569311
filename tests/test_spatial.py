import pytest

from careers_spark.operators import spatial as SP


def _pairs(df):
    return {(r.pt_a, r.pt_b): r.dist2 for r in df.collect()}


def test_grid_join_hand_golden(spark):
    """Closed threshold, cross-cell neighbors, and exclusion just
    past the radius — hand-computed squared distances."""
    pts = spark.createDataFrame(
        [
            (1, 10, 10),
            (2, 13, 14),   # dist2 to 1 = 9+16 = 25 == r^2 (kept, closed)
            (3, 10, 16),   # dist2 to 1 = 36 > 25 (dropped); to 2 = 9+4=13
            (4, 99, 10),   # far from everything
            (5, 104, 10),  # dist2 to 4 = 25, crosses the x=100 cell edge
        ],
        "pt_id long, x long, y long",
    )
    got = _pairs(SP.grid_distance_join(pts, radius=5))
    assert got == {(1, 2): 25, (2, 3): 13, (4, 5): 25}


def test_grid_join_equals_brute_force_on_lattice(spark):
    """Grid candidates are lossless: exact equality with the naive
    all-pairs distance join on a 300-point md5 lattice."""
    ids = spark.range(300)
    pts = SP.lattice_points(ids, "id", extent=256, seed="t1")
    r = 20
    got = _pairs(SP.grid_distance_join(pts, radius=r))
    rows = [(p.pt_id, p.x, p.y) for p in pts.collect()]
    want = {}
    for i, xi, yi in rows:
        for j, xj, yj in rows:
            if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r:
                want[(i, j)] = (xi - xj) ** 2 + (yi - yj) ** 2
    assert got == want and len(want) > 50  # non-vacuous at this density


def test_lattice_points_deterministic_and_in_range(spark):
    a = SP.lattice_points(spark.range(100), "id", extent=64, seed="s")
    b = SP.lattice_points(spark.range(100), "id", extent=64, seed="s")
    ra, rb = sorted(a.collect()), sorted(b.collect())
    assert ra == rb
    assert all(0 <= r.x < 64 and 0 <= r.y < 64 for r in ra)
    # a different seed moves the cloud
    c = sorted(SP.lattice_points(spark.range(100), "id", 64, "s2").collect())
    assert c != ra


def test_grid_join_plan_has_no_nested_loop(spark):
    pts = SP.lattice_points(spark.range(50), "id", extent=128, seed="p")
    plan = SP.grid_distance_join(pts, radius=10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grid_join_rejects_bad_radius(spark):
    pts = SP.lattice_points(spark.range(5), "id", 32, "r")
    with pytest.raises(ValueError):
        SP.grid_distance_join(pts, radius=0)


def test_zorder_interleave_matches_python(spark):
    from careers_spark.operators.spatial import lattice_points, zorder_key

    pts = lattice_points(spark.range(200), "id", extent=256, seed="z")
    got = {r.pt_id: r.zkey for r in zorder_key(pts, bits=8).collect()}

    def z(xx, yy):
        v = 0
        for i in range(8):
            v |= ((xx >> i) & 1) << (2 * i)
            v |= ((yy >> i) & 1) << (2 * i + 1)
        return v

    for p in pts.collect():
        assert got[p.pt_id] == z(p.x, p.y)


def test_zorder_monotone_and_locality(spark):
    """z is monotone in x for fixed y, and quadrant-level locality
    holds: all points of one 128x128 quadrant precede every point of
    the diagonal-opposite quadrant."""
    from careers_spark.operators.spatial import zorder_key

    rows = [(i, i, 7) for i in range(64)] + [
        (1000, 10, 10), (1001, 200, 200)
    ]
    df = spark.createDataFrame(rows, "pt_id long, x long, y long")
    got = {r.pt_id: r.zkey for r in zorder_key(df, bits=8).collect()}
    xs = [got[i] for i in range(64)]
    assert xs == sorted(xs)  # monotone in x at fixed y
    assert got[1000] < got[1001]  # low-low quadrant before high-high


def test_zorder_budget_guard(spark):
    import pytest

    from careers_spark.operators.spatial import zorder_key

    df = spark.createDataFrame([(1, 300, 0)], "pt_id long, x long, y long")
    with pytest.raises(Exception):
        zorder_key(df, bits=8).collect()
    with pytest.raises(ValueError):
        zorder_key(df, bits=0)


def test_scan_pruning_zorder_beats_single_column_sort(spark):
    """On a uniform lattice, a square box query scans fewer files
    under the Z-order layout than under an x-only sort; rows_matched
    is layout-invariant and equals the brute-force count."""
    from careers_spark.operators.spatial import (
        lattice_points,
        scan_pruning_stats,
    )

    pts = lattice_points(spark.range(4000), "id", extent=4096, seed="pr")
    box = (0, 0, 511, 511)
    got = {
        r.layout: r
        for r in scan_pruning_stats(
            pts, n_files=16, box=box, bits=12
        ).collect()
    }
    want = sum(
        1
        for p in pts.collect()
        if 0 <= p.x <= 511 and 0 <= p.y <= 511
    )
    z, xs = got["zorder"], got["xsort"]
    assert z.rows_matched == xs.rows_matched == want
    assert z.files_total == xs.files_total == 16
    # the x-sort layout bounds only x: every file containing the x
    # band must be scanned regardless of y; z-order bounds both dims
    assert z.files_scanned < xs.files_scanned
    assert z.rows_in_scanned_files < xs.rows_in_scanned_files
    assert z.files_scanned >= 1 and z.rows_matched <= z.rows_in_scanned_files


def _sky(df):
    return {(r.key, r.x, r.y) for r in df.collect()}


def test_skyline_hand_golden(spark):
    """Max-x/min-y frontier with an x-tie (only the smaller y wins)
    and an interior dominated point."""
    pts = spark.createDataFrame(
        [
            (1, 10, 5),   # frontier (largest x)
            (2, 8, 3),    # frontier
            (3, 8, 7),    # same x as 2, worse y -> dominated
            (4, 6, 4),    # dominated by 2 (8>=6, 3<=4, strict)
            (5, 2, 1),    # frontier (smallest y)
        ],
        "key long, x long, y long",
    )
    got = _sky(SP.skyline_2d(pts, n_buckets=4))
    assert got == {(1, 10, 5), (2, 8, 3), (5, 2, 1)}


def test_skyline_duplicates_all_survive(spark):
    """Coincident duplicates do not dominate each other: both copies
    of the frontier point survive."""
    pts = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 4, 9)],
        "key long, x long, y long",
    )
    got = _sky(SP.skyline_2d(pts, n_buckets=2))
    assert got == {(1, 5, 5), (2, 5, 5)}


def test_skyline_lockstep_brute_force(spark):
    """Bucketed-window plan == the O(n^2) dominance definition on a
    400-point random integer lattice, at two bucket counts."""
    import random

    rng = random.Random(71)
    rows = [(i, rng.randrange(0, 50), rng.randrange(0, 50)) for i in range(400)]

    def dominated(p):
        return any(
            q[1] >= p[1]
            and q[2] <= p[2]
            and (q[1] > p[1] or q[2] < p[2])
            for q in rows
        )

    want = {tuple(p) for p in rows if not dominated(p)}
    df = spark.createDataFrame(rows, "key long, x long, y long")
    for nb in (1, 16):
        assert _sky(SP.skyline_2d(df, n_buckets=nb)) == want


def test_skyline_single_point(spark):
    df = spark.createDataFrame([(9, 3, 3)], "key long, x long, y long")
    assert _sky(SP.skyline_2d(df)) == {(9, 3, 3)}
