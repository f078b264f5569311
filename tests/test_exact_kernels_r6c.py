"""r6 exact-kernel pinning, batch 3: the clustering/PQ/IVF numpy
kernels must be BIT-identical to the Catalyst expression forms they
replaced — driver Lloyd vs the cluster-side loop, the assignment
kernel vs least(struct(zip_with ...)), the route+encode kernel vs the
literal-centroid argmin expressions, and the ADC ranking kernel vs the
aggregate(zip_with) asymmetric distances.
"""

import pytest
from pyspark.sql import functions as F

from careers_spark.operators.clustering import (
    _adc_rank_kernel,
    _assign,
    _assign_kernel,
    _dist_expr,
    _quantize,
    _route_encode_kernel,
    _slice_dist_expr,
    lloyd_centroids,
    lloyd_centroids_spark,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cq(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return _quantize(emb, "vec_id", "embedding").localCheckpoint(eager=True)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("k,iters", [(8, 3), (5, 2), (16, 1), (3, 4)])
def test_lloyd_driver_vs_spark_bitexact(spark, cq, k, iters):
    assert lloyd_centroids(cq, k, iters) == lloyd_centroids_spark(cq, k, iters)


def test_lloyd_subspace_bitexact(spark, cq):
    qj = cq.select("id", F.slice(F.col("x"), 17, 16).alias("x"))
    assert lloyd_centroids(qj, 8, 2) == lloyd_centroids_spark(qj, 8, 2)


def test_assign_kernel_vs_exprs(spark, cq):
    cents = lloyd_centroids(cq, 8, 2)
    new = _rows(_assign_kernel(cq, cents))
    old = _rows(_assign(cq, cents).select("id", "cluster", "dist"))
    assert new == old


def test_route_encode_kernel_vs_exprs(spark, cq):
    sub = 16
    m = 4
    coarse = lloyd_centroids(cq, 8, 2)
    books = [
        lloyd_centroids(
            cq.select("id", F.slice(F.col("x"), j * sub + 1, sub).alias("x")),
            8,
            2,
        )
        for j in range(m)
    ]
    new = _rows(_route_encode_kernel(cq, books, sub, coarse=coarse))
    coarse_structs = [
        F.struct(F.expr(_dist_expr(c)).alias("d"), F.lit(i).cast("long").alias("j"))
        for i, c in enumerate(coarse)
    ]
    code_cols = []
    for j in range(m):
        lo = j * sub + 1
        structs = [
            F.struct(
                F.expr(_slice_dist_expr(c, lo, sub)).alias("d"),
                F.lit(ci).cast("long").alias("j"),
            )
            for ci, c in enumerate(books[j])
        ]
        code_cols.append(F.least(*structs).getField("j").alias(f"code_{j}"))
    old = _rows(
        cq.select(
            F.col("id").alias("neighbor_id"),
            F.least(*coarse_structs).getField("j").cast("int").alias("list_id"),
            *code_cols,
        )
    )
    assert new == old


@pytest.mark.parametrize("nlist,nprobe", [(16, 4), (8, 8), (4, 1)])
def test_ivf_topk_kernel_vs_catalyst(spark, nlist, nprobe):
    from careers_spark.operators.similarity import ivf_topk, ivf_topk_catalyst

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    new = _rows(ivf_topk(emb, k=5, nlist=nlist, nprobe=nprobe))
    old = _rows(ivf_topk_catalyst(emb, k=5, nlist=nlist, nprobe=nprobe))
    assert new == old
    assert len(new) > 0


def test_adc_rank_kernel_vs_exprs(spark, cq):
    sub = 16
    m = 4
    books = [
        lloyd_centroids(
            cq.select("id", F.slice(F.col("x"), j * sub + 1, sub).alias("x")),
            8,
            2,
        )
        for j in range(m)
    ]
    corpus = cq.filter("id % 50 != 0")
    queries = cq.filter("id % 50 = 0")
    codes = _route_encode_kernel(corpus, books, sub).localCheckpoint(eager=True)
    qx = queries.select(F.col("id").alias("query_id"), F.col("x").alias("qx"))
    new = _rows(_adc_rank_kernel(codes, qx, books, sub, k=5))

    from pyspark.sql import Window

    dist_terms = []
    for j in range(m):
        lo = j * sub + 1
        book = (
            "array("
            + ",".join(
                "array(" + ",".join(f"{int(v)}L" for v in c) + ")"
                for c in books[j]
            )
            + ")"
        )
        dist_terms.append(
            f"aggregate(zip_with(slice(qx, {lo}, {sub}), "
            f"element_at({book}, cast(code_{j} as int) + 1), "
            "(a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"
        )
    adist = F.expr(" + ".join(f"({t})" for t in dist_terms))
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    old = _rows(
        qx.crossJoin(codes)
        .select("query_id", "neighbor_id", adist.alias("adist"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "query_id", "neighbor_id", "adist",
            F.col("rk").cast("int").alias("rk"),
        )
    )
    assert new == old
    assert len(new) > 0
