"""Spatial grid join: distance-threshold pairs on an integer lattice.

The 2-D analogue of temporal.bucketed_interval_join — the grid-file /
geohash-cell strategy every scalable spatial join uses (and the shape
of Sedona/Magellan's partitioned range join): bucket points into
radius-sized square cells, generate candidates from a cell equi-join
against the 3x3 cell neighborhood, then verify the exact distance
predicate. Spark left to itself plans BroadcastNestedLoopJoin for the
raw inequality — O(|L| * |R|) and a non-starter at corpus scale; the
grid join's shuffle is ONE equi-join keyed by cell.

Everything is integer arithmetic: points live on an integer lattice
(synthesised deterministically from row ids via the repo's shared
md5-derived-integer recipe), the cell id is integer `div`, and the
verify predicate compares BIGINT squared distances — no floats, so
results hash identically across engines and parallelism.

Reference anchor: the reference's only "join on a continuous key"
shapes are the context-overlap self-joins (SurfaceForms.scala) which
it brute-forces in RAM; this operator is the from-scratch scale path
for the same need when the key is geometric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lattice_points(
    df: DataFrame,
    id_col: str,
    extent: int = 4096,
    seed: str = "geo0",
) -> DataFrame:
    """Deterministic integer lattice coordinates for each row id:
    (x, y) md5-derived in [0, extent) — the synthetic-but-reproducible
    point cloud used by tests, the driver query, and its oracle (the
    identical expression text runs in DuckDB).

    Output: (pt_id, x, y).
    """
    e = int(extent)

    def coord(axis: str) -> F.Column:
        return F.expr(
            f"cast(conv(substr(md5(concat('{seed}', '_{axis}_', "
            f"cast({id_col} as string))), 1, 8), 16, 10) as bigint) % {e}"
        )

    return df.select(
        F.col(id_col).alias("pt_id"),
        coord("x").alias("x"),
        coord("y").alias("y"),
    )


def grid_distance_join(points: DataFrame, radius: int) -> DataFrame:
    """All unordered point pairs within EUCLIDEAN distance `radius`
    (closed: dist == radius qualifies), via radius-sized grid cells.

    Soundness: with cell side == radius, two points within `radius`
    of each other sit in cells differing by at most 1 per axis, so
    every qualifying pair is covered by the 3x3 neighborhood probe —
    recall is exact by construction (bucketing is an optimization,
    never an approximation; same argument as the interval join's
    shared-bucket lemma). Each unordered pair is emitted exactly
    once: only the LEFT side fans out to its 9 neighbor cells, the
    right side is keyed by its single home cell (so a candidate
    (a, b) arises from exactly one (probe-cell, home-cell) match),
    and the a < b filter keeps one orientation.

    Cost shape at scale: fan-out is a constant 9x on one side; the
    join is an equi-join on (cell_x, cell_y) — skew only if the data
    piles into one cell, in which case shrink `radius` relative to
    the point density (the standard grid-file sizing rule).

    Input: (pt_id, x, y) integer lattice points.
    Output: (pt_a, pt_b, dist2) with dist2 = exact BIGINT squared
    distance <= radius^2.
    """
    r = int(radius)
    if r <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    one = F.sequence(F.lit(-1), F.lit(1))
    probes = (
        points.select(
            F.col("pt_id").alias("pt_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.explode(one).alias("_ox"),
        )
        .select("pt_a", "xa", "ya", "_ox", F.explode(one).alias("_oy"))
        .select(
            "pt_a",
            "xa",
            "ya",
            (F.expr(f"xa div {r}") + F.col("_ox")).alias("cell_x"),
            (F.expr(f"ya div {r}") + F.col("_oy")).alias("cell_y"),
        )
    )
    home = points.select(
        F.col("pt_id").alias("pt_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x div {r}").alias("cell_x"),
        F.expr(f"y div {r}").alias("cell_y"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    return (
        probes.join(home, ["cell_x", "cell_y"])
        .filter(F.col("pt_a") < F.col("pt_b"))
        .select("pt_a", "pt_b", (dx * dx + dy * dy).alias("dist2"))
        .filter(F.col("dist2") <= F.lit(r * r))
    )


def zorder_key(
    points: DataFrame,
    bits: int = 16,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Morton / Z-order key: interleave the low `bits` bits of (x, y)
    into one integer — the space-filling-curve clustering key behind
    Delta/Iceberg's OPTIMIZE ZORDER and HBase/Bigtable salting
    schemes: sorting a table by z co-locates spatially-near rows into
    the same files, so min/max zone maps prune 2-D range queries that
    a single-column sort cannot.

    Pure integer bit algebra as ONE fixed `bits`-term expression
    chain (((x >> i) & 1) << 2i | ((y >> i) & 1) << (2i+1)) — a
    projection, zero shuffles; the sort that USES the key is the
    one-off layout job. 2*bits <= 62 keeps every value a positive
    BIGINT (the bitmap_distinct sign rule). Raises if a coordinate
    exceeds the bit budget instead of silently aliasing distant
    points together.

    Output: input columns + zkey.
    """
    b = int(bits)
    if not 1 <= b <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = " + ".join(
        f"(shiftleft(shiftright({x}, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1}))"
        for i in range(b)
    )
    lim = 1 << b
    guard = (
        f"case when {x} >= {lim} or {y} >= {lim} or {x} < 0 or {y} < 0 "
        f"then raise_error('zorder_key: coordinate exceeds {b}-bit "
        f"budget') else cast({terms} as bigint) end"
    )
    return points.withColumn("zkey", F.expr(guard))


def scan_pruning_stats(
    points: DataFrame,
    n_files: int = 16,
    box: tuple = (0, 0, 512, 512),
    bits: int = 12,
) -> DataFrame:
    """Zone-map pruning evaluation: how many files a 2-D box query
    must scan under a Z-ORDER layout vs a single-column sort — the
    measurable payoff zorder_key exists for. Each layout sorts the
    table by its clustering key and cuts it into `n_files` equal
    ntiles (the one-off OPTIMIZE job; ntile over a TOTAL order
    (key, pt_id) is engine-deterministic); per file the min/max x/y
    zone map decides scan-vs-prune exactly the way parquet row-group
    / Iceberg manifest pruning does: scan iff the bounding box
    intersects the query box.

    The output machine-exhibits the layout lesson: rows_matched is
    layout-INVARIANT (same data), while files_scanned and
    rows_in_scanned_files differ — Z-order bounds both dimensions per
    file, a single-column sort bounds only one. All integers, one
    rounded division.

    Output: (layout, files_total, files_scanned, rows_matched,
    rows_in_scanned_files, prune_ratio).
    """
    x0, y0, x1, y1 = (int(v) for v in box)
    keyed = zorder_key(points, bits=bits)

    def layout_stats(df: DataFrame, key: str, name: str) -> DataFrame:
        filed = df.select(
            "x",
            "y",
            F.expr(
                f"ntile({int(n_files)}) over (order by {key}, pt_id)"
            ).alias("file_id"),
        )
        in_box = (
            (F.col("x") >= x0) & (F.col("x") <= x1)
            & (F.col("y") >= y0) & (F.col("y") <= y1)
        )
        per_file = filed.groupBy("file_id").agg(
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
            F.count("*").alias("n_rows"),
            F.sum(F.when(in_box, 1).otherwise(0)).cast("long").alias(
                "n_match"
            ),
        )
        scanned = (
            (F.col("min_x") <= x1) & (F.col("max_x") >= x0)
            & (F.col("min_y") <= y1) & (F.col("max_y") >= y0)
        )
        return per_file.agg(
            F.count("*").alias("files_total"),
            F.sum(F.when(scanned, 1).otherwise(0)).cast("long").alias(
                "files_scanned"
            ),
            F.sum("n_match").cast("long").alias("rows_matched"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_in_scanned_files"),
        ).select(
            F.lit(name).alias("layout"),
            "files_total",
            "files_scanned",
            "rows_matched",
            "rows_in_scanned_files",
            F.expr(
                "round(1e0 - files_scanned / cast(files_total as double),"
                " 6)"
            ).alias("prune_ratio"),
        )

    return layout_stats(keyed, "zkey", "zorder").unionByName(
        layout_stats(keyed, "x", "xsort")
    )


def skyline_2d(
    df: DataFrame,
    key: str = "key",
    x: str = "x",
    y: str = "y",
    n_buckets: int = 64,
) -> DataFrame:
    """2-D skyline (Pareto frontier, Borzsonyi et al. ICDE'01):
    the rows not dominated by any other row, maximizing `x` while
    minimizing `y` (negate a column to flip its direction). q
    dominates p iff q.x >= p.x, q.y <= p.y, and strict in at least
    one; coincident duplicates do not dominate each other and ALL
    survive.

    The naive plan is the O(n^2) NOT EXISTS self-join — the oracle
    states exactly that, so the hash match proves this plan lossless.
    Here the frontier test is pure dominance algebra on three bounded
    aggregates, never a pairwise join:

      p in skyline  <=>  p.y = min{q.y : q.x = p.x}          (gy)
                     AND  p.y < min{q.y : q.x > p.x}          (m1)

    gy comes from ONE map-side-combining groupBy(x). m1 is a strict-
    prefix running min over x DESCENDING — computed hierarchically so
    no window ever sees corpus-sized input: x-groups are range-
    bucketed by the stump_split_gain integer binning, the per-bucket
    suffix min runs in a window PARTITIONED BY bucket (parallel,
    bounded by the bucket's distinct-x count), and the cross-bucket
    carry is a strict-prefix min over the `n_buckets`-row bucket
    table (broadcast back). Raw rows then semi-join their x-group
    verdict on the same shuffle key. Both x and y must be integer
    (lattice) columns, so every min is exact and engine-identical.

    Output: (key, x, y) of surviving rows.
    """
    from pyspark.sql import Window

    v = df.select(
        F.col(key).alias("k"),
        F.col(x).cast("long").alias("x"),
        F.col(y).cast("long").alias("y"),
    )
    g = v.groupBy("x").agg(F.min("y").alias("gy"))
    bounds = g.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    gb = g.crossJoin(F.broadcast(bounds)).select(
        "x",
        "gy",
        F.expr(f"((x - mn) * {int(n_buckets)}) div (mx - mn + 1)").alias(
            "b"
        ),
    )
    # strict-prefix (over DESCENDING x) min within each bucket
    w_in = (
        Window.partitionBy("b")
        .orderBy(F.desc("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # cross-bucket carry: min gy of every bucket STRICTLY above
    bmin = gb.groupBy("b").agg(F.min("gy").alias("bgy"))
    w_b = (
        Window.orderBy(F.desc("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bmin.select("b", F.min("bgy").over(w_b).alias("above"))
    verdict = (
        gb.withColumn("win", F.min("gy").over(w_in))
        .join(F.broadcast(carry), "b")
        .select(
            "x",
            "gy",
            # least() skips NULLs in both engines (NULL only if both
            # inputs are NULL = nothing strictly above at all)
            F.least("win", "above").alias("m1"),
        )
        .filter(F.col("m1").isNull() | (F.col("gy") < F.col("m1")))
    )
    return (
        v.join(verdict, "x")
        .filter(F.col("y") == F.col("gy"))
        .select(F.col("k").alias(key), "x", "y")
    )
