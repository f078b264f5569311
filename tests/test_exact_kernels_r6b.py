"""r6 exact-kernel pinning, batch 2: the numpy/mapInPandas rewrites of
poisson_bootstrap_ci, winnowing_fingerprints, simhash_bands, and the
driver-side lattice-selection rewrites of hodges_lehmann /
cliffs_delta must be BIT-identical to the original pure-Catalyst
implementations they replaced (same md5 bytes, same IEEE uniform
construction, same CDF comparisons, same integer orderings, and the
closing divisions ride the identical Spark expressions).
"""

import pytest
from pyspark.sql import functions as F

from careers_spark.operators import dedup as DD
from careers_spark.operators.evaluation import (
    cliffs_delta,
    cliffs_delta_catalyst,
    hodges_lehmann,
    hodges_lehmann_catalyst,
)
from careers_spark.operators.sampling import (
    poisson_bootstrap_ci,
    poisson_bootstrap_ci_catalyst,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.mark.parametrize("n_reps,salt", [(200, "boot0"), (8, "x"), (40, "s-y.z_9")])
def test_poisson_bootstrap_kernel_bitexact(spark, orders, n_reps, salt):
    base = orders.select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias("cents"),
    )
    new = _rows(
        poisson_bootstrap_ci(
            base, value="cents", key="o_orderkey", n_reps=n_reps, salt=salt
        )
    )
    old = _rows(
        poisson_bootstrap_ci_catalyst(
            base, value="cents", key="o_orderkey", n_reps=n_reps, salt=salt
        )
    )
    assert new == old


def test_poisson_bootstrap_null_values_match(spark):
    d = spark.createDataFrame(
        [(1, None), (2, None), (3, 7)], "id long, value long"
    )
    assert _rows(poisson_bootstrap_ci(d, n_reps=8, salt="z")) == _rows(
        poisson_bootstrap_ci_catalyst(d, n_reps=8, salt="z")
    )
    allnull = spark.createDataFrame([(1, None)], "id long, value long")
    assert _rows(poisson_bootstrap_ci(allnull, n_reps=8, salt="z")) == _rows(
        poisson_bootstrap_ci_catalyst(allnull, n_reps=8, salt="z")
    )


@pytest.mark.parametrize("kgram,window", [(5, 4), (3, 2), (2, 7)])
def test_winnowing_kernel_bitexact(spark, docs, kgram, window):
    new = _rows(DD.winnowing_fingerprints(docs, kgram=kgram, window=window))
    old = _rows(
        DD.winnowing_fingerprints_catalyst(docs, kgram=kgram, window=window)
    )
    assert new == old
    assert len(new) > 0


def test_winnowing_kernel_degenerate_docs(spark):
    tiny = spark.createDataFrame(
        [
            (1, "a b c d"),  # fewer shingles than window
            (2, "a b c d e"),  # exactly one shingle
            (3, "a b c d e f g"),  # one short of a full window
            (4, ""),  # no shingles at all
            (5, "a a a a a a a a a a"),  # all-equal hashes: tie rule
        ],
        "doc_id long, text string",
    )
    assert _rows(DD.winnowing_fingerprints(tiny, 5, 4)) == _rows(
        DD.winnowing_fingerprints_catalyst(tiny, 5, 4)
    )


@pytest.mark.parametrize("bands", [4, 1, 3])
def test_simhash_bands_kernel_bitexact(spark, docs, bands):
    new = _rows(DD.simhash_bands(docs, bands=bands))
    old = _rows(DD.simhash_bands_catalyst(docs, bands=bands))
    assert new == old
    assert len(new) > 0


def _grp(spark, a, b):
    rows = [(int(v), True) for v in a] + [(int(v), False) for v in b]
    return spark.createDataFrame(rows, "value long, grp boolean")


@pytest.mark.parametrize(
    "a,b",
    [
        ([10, 11, 12, 13], [1, 2, 3]),
        ([5, 5, 5, 7, 9], [5, 6, 6, 8]),
        ([1], [1]),
        ([2, 2], []),
        ([-3, 0, 4, 4, 9], [-7, -3, 0, 0, 2, 11]),
    ],
)
def test_hl_and_cliffs_selection_bitexact(spark, a, b):
    g = _grp(spark, a, b)
    assert _rows(hodges_lehmann(g)) == _rows(hodges_lehmann_catalyst(g))
    assert _rows(cliffs_delta(g)) == _rows(cliffs_delta_catalyst(g))


def test_hl_and_cliffs_orders_lattice_bitexact(spark, orders):
    d = orders.select(
        F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias("value"),
        F.expr("o_orderpriority = '1-URGENT'").alias("grp"),
    )
    assert _rows(hodges_lehmann(d)) == _rows(hodges_lehmann_catalyst(d))
    assert _rows(cliffs_delta(d)) == _rows(cliffs_delta_catalyst(d))


def test_fs_em_python_vs_spark_loop(spark):
    from careers_spark.operators.linkage_em import (
        fs_em_linkage,
        fs_em_linkage_spark,
    )

    rows = [(bool(i % 2), bool(i % 3 == 0), bool(i % 5 == 0)) for i in range(4000)]
    d = spark.createDataFrame(rows, "fa boolean, fb boolean, fc boolean")
    a = sorted(map(tuple, fs_em_linkage(d, ["fa", "fb", "fc"], iters=10).collect()))
    b = sorted(
        map(tuple, fs_em_linkage_spark(d, ["fa", "fb", "fc"], iters=10).collect())
    )
    assert a == b
    d2 = spark.createDataFrame(
        [(bool(i % 2), bool((i // 7) % 2)) for i in range(300)],
        "x boolean, y boolean",
    )
    assert sorted(map(tuple, fs_em_linkage(d2, ["x", "y"], iters=4).collect())) == sorted(
        map(tuple, fs_em_linkage_spark(d2, ["x", "y"], iters=4).collect())
    )


def test_bradley_terry_numpy_vs_spark_loop(spark):
    """The driver MM path must reproduce the cluster loop's rounded
    iterates (same round(,10) lattice re-entry per round)."""
    import careers_spark.operators.preference as P

    rows = [
        (f"a{i % 7}", f"a{(i * 3 + 1) % 7}")
        for i in range(2000)
        if i % 7 != (i * 3 + 1) % 7
    ]
    d = spark.createDataFrame(rows, "winner string, loser string")
    a = sorted(map(tuple, P.bradley_terry_strength(d).collect()))
    src = open(P.__file__).read().replace("if k <= 100_000:", "if False:")
    ns = {}
    exec(compile(src, "pref_spark_loop", "exec"), ns)
    b = sorted(map(tuple, ns["bradley_terry_strength"](d).collect()))
    assert a == b
