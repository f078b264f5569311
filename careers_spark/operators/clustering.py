"""K-means clustering over embedding columns — the SemDeDup-style
semantic-clustering primitive (Abbas et al. 2023 cluster, then dedup
within clusters; also the coarse quantizer family IVF training belongs
to, similarity.py:198-340).

Exactness design (the integer-lattice recipe): embeddings are quantized
once to a 1e-6 integer lattice (``round(v * 1e6)`` as BIGINT — the
embedding_projection convention), and EVERY Lloyd quantity stays
integer-exact from there:

- distances are integer sums of squares — order-independent, no IEEE
  noise, so the argmin (dist, then smaller cluster id) can never flip
  between engines or partitionings;
- centroid updates are ``round(int_sum / n)`` back onto the lattice —
  ONE double division of exact integers per component, the identical
  correctly-rounded double in Spark and DuckDB, then the shared
  away-from-zero tie rule. Centroids being lattice points keeps the
  next iteration's distances integer-exact too.

This makes the full ``iters``-deep Lloyd loop reproducible bit-exactly
by an unrolled DuckDB oracle (the pagerank/louvain fixpoint-unroll
recipe, __spark_entry__.py), which a float-centroid k-means (MLlib's
included) can never be. The lattice perturbs each coordinate by
<= 5e-7 — far below any clustering-relevant structure at embedding
scale (unit-norm coords are O(1/sqrt(dim))).

Init is deterministic: the k rows with smallest id are the seeds
(cluster id = seed rank). No RNG anywhere.

Physical shape per iteration (the ivf_train_centroids shape,
similarity.py:228-340):
- assignment: centroids are LITERALS in the plan (k x dim bigints) —
  zero joins, zero broadcast; dist is a Catalyst ``zip_with`` +
  ``aggregate`` fold, argmin is ``least`` over structs. Pure map work.
- update: ONE algebraic groupBy(cluster) with dim ``sum`` columns +
  count — map-side combinable, one shuffle of k x (dim+1) partials.
- k rows collect to the driver per iteration (k*dim ints — the
  centroid table is tiny BY DEFINITION, that's what makes it k-means).

At 10^12 rows the cost is iters map passes + iters k-row shuffles; no
step grows super-linearly in N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = "1000000e0"  # 1e-6 lattice; e0 so both engines parse a DOUBLE


def _quantize(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, "
            f"v -> cast(round(cast(v as double) * {QUANT}, 0) as bigint))"
        ).alias("x"),
    )


def _dist_expr(centroid: list[int]) -> str:
    arr = "array(" + ",".join(f"{int(c)}L" for c in centroid) + ")"
    return (
        f"aggregate(zip_with(x, {arr}, (a, b) -> (a - b) * (a - b)), "
        "0L, (acc, v) -> acc + v)"
    )


def _assign(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, x, cluster, dist) under literal centroids: argmin by
    (dist, cluster id) via least-over-structs — no join, no shuffle."""
    structs = [
        F.struct(
            F.expr(_dist_expr(c)).alias("d"), F.lit(j).cast("long").alias("j")
        )
        for j, c in enumerate(centroids)
    ]
    best = F.least(*structs) if len(structs) > 1 else structs[0]
    return q.withColumn("_b", best).select(
        "id",
        "x",
        F.col("_b.j").alias("cluster"),
        F.col("_b.d").alias("dist"),
    )


def _assign_kernel(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, cluster, dist) under broadcast centroids — the numpy twin
    of `_assign` (guide §4.2: the per-row k x dim zip_with folds were
    interpreted Catalyst HOFs at ~0.5us/element): exact integer
    squared distances, argmin = first minimum = smallest cluster id on
    ties, identical to least(struct(d, j)). Pinned against `_assign`
    in tests. Map-only — distributes exactly like the expression
    version."""
    import numpy as np

    spark = q.sparkSession
    C = np.array(centroids, dtype=np.int64)
    bc = spark.sparkContext.broadcast(C)
    idt = dict(q.dtypes)["id"]

    def gen(batches):
        import numpy as np
        import pandas as pd

        CT = bc.value.T  # dim x k
        for pdf in batches:
            for lo in range(0, len(pdf), 2048):
                chunk = pdf.iloc[lo : lo + 2048]
                if len(chunk) == 0:
                    continue
                X = np.array(chunk["x"].tolist(), dtype=np.int64)
                D = ((X[:, :, None] - CT[None, :, :]) ** 2).sum(axis=1)
                j = D.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "id": chunk["id"].to_numpy(),
                        "cluster": j.astype(np.int64),
                        "dist": D[np.arange(len(j)), j],
                    }
                )

    return q.mapInPandas(gen, schema=f"id {idt}, cluster long, dist long")


def lloyd_centroids_spark(
    q: DataFrame, k: int, iters: int
) -> list[list[int]] | None:
    """The original cluster-side Lloyd loop (one assignment map pass +
    one k-row groupBy collect per iteration). Kept as the scale path
    for training sets too large to collect, and as the reference
    implementation `lloyd_centroids` (the driver kernel) is pinned
    bit-exact against in tests."""
    seeds = q.orderBy("id").limit(int(k)).collect()
    if not seeds:
        return None
    dim = len(seeds[0]["x"])
    centroids = [list(r["x"]) for r in seeds]

    sums = [F.sum(F.element_at("x", i + 1)).alias(f"s{i}") for i in range(dim)]
    for _ in range(int(iters)):
        a = _assign(q, centroids)
        upd = a.groupBy("cluster").agg(F.count("*").alias("n"), *sums)
        # round(int_sum / n) back onto the lattice IN SPARK SQL (not
        # python round(), which is banker's) so the oracle's identical
        # expression yields the identical component
        mean_cols = [
            F.expr(f"cast(round(s{i} / cast(n as double), 0) as bigint)")
            for i in range(dim)
        ]
        got = {
            r["cluster"]: list(r["c"])
            for r in upd.select(
                "cluster", F.array(*mean_cols).alias("c")
            ).collect()
        }
        # an emptied cluster keeps its previous centroid
        centroids = [got.get(j, centroids[j]) for j in range(len(centroids))]
    return centroids


def lloyd_centroids(
    q: DataFrame,
    k: int,
    iters: int,
    driver_train_max: int = 200_000,
    n_rows: int | None = None,
) -> list[list[int]] | None:
    """The Lloyd loop over a quantized (id, x) frame: deterministic
    seeds (k smallest ids, cluster id = seed rank), ``iters``
    assign-then-update rounds on the integer lattice. Returns the
    FINAL centroid list (lattice points), or None on empty input.

    r6 physical rewrite (guide §1.2: fix the algorithm's pass count
    first): the Spark loop paid 2+ jobs per iteration per subspace —
    ivfadc at m=4 ran 10 Lloyd loops = ~20 cluster round-trips for a
    2000-row training set. Training sets up to `driver_train_max` rows
    are collected ONCE (they are already quantized BIGINTs, so no
    rounding is re-derived) and the identical iteration runs in numpy:
    integer distances, first-min argmin (= smallest cluster id on
    ties), integer sums, and the centroid update's one double division
    rounded by the Spark-round emulation kernel pinned in
    tests/test_exact_kernels.py. Larger frames fall back to
    `lloyd_centroids_spark` unchanged — training on a driver-bounded
    set is the faiss convention and the r4-landed ivf_train_centroids
    precedent; the assignment/search passes stay distributed either
    way."""
    import numpy as np

    from careers_spark.operators.similarity import _np_round_half_up

    if (q.count() if n_rows is None else n_rows) > int(driver_train_max):
        return lloyd_centroids_spark(q, k, iters)
    pdf = q.toPandas()
    if len(pdf) == 0:
        return None
    ids = pdf["id"].to_numpy()
    X = np.array(pdf["x"].tolist(), dtype=np.int64)
    X = X[np.argsort(ids, kind="stable")]
    kk = min(int(k), len(X))
    cent = X[:kk].copy()
    for _ in range(int(iters)):
        # assignment: exact integer squared distances, first-min ties
        best = np.zeros(len(X), np.int64)
        for lo in range(0, len(X), 4096):
            hi = min(lo + 4096, len(X))
            D = ((X[lo:hi, :, None] - cent.T[None, :, :]) ** 2).sum(axis=1)
            best[lo:hi] = D.argmin(axis=1)
        cnt = np.bincount(best, minlength=kk)
        s = np.zeros((kk, X.shape[1]), np.int64)
        np.add.at(s, best, X)
        got = cnt > 0
        # the identical one double division + Spark-round per component
        mean = _np_round_half_up(
            s[got].astype(np.float64) / cnt[got, None].astype(np.float64), 0
        ).astype(np.int64)
        cent[got] = mean
    return [list(map(int, c)) for c in cent]


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means on the 1e-6 integer lattice; returns the FINAL
    assignment (id, cluster, dist) after ``iters`` full
    assign-then-update rounds plus one closing assignment.

    dist is the exact integer squared distance on the lattice
    (value units: (coordinate * 1e6)^2).
    """
    q = _quantize(embeddings, id_col, vec_col).cache()

    centroids = lloyd_centroids(q, k, iters)
    if centroids is None:
        return q.select(
            F.col("id").alias(id_col),
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("long").alias("dist"),
        )

    out = _assign_kernel(q, centroids).select(
        F.col("id").alias(id_col), "cluster", "dist"
    )
    q.unpersist()
    return out


def semantic_dedup_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup proper (Abbas et al. 2023): cluster the embedding space
    with k-means, then find near-duplicate pairs ONLY within clusters —
    the cosine self-join restricted to cluster-local candidates, which
    is the whole point of the method: pair work drops from O(N^2) to
    O(sum of cluster sizes squared), and clusters are balanced-ish by
    construction.

    Recall caveat (stated, as for every blocked similarity op here): a
    near-dup pair split across cluster boundaries is missed — SemDeDup
    accepts this because near-dups are near in embedding space and
    overwhelmingly co-cluster; raise k for tighter clusters, or use the
    LSH path (similarity.embedding_near_dup_pairs) for probabilistic
    guarantees.

    sim is rounded to 6 BEFORE the threshold compare (the repo-wide
    engine-identical decision rule). Output: (id_a, id_b, cluster,
    sim), id_a < id_b.
    """
    assign = kmeans_assign(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("_id"), "cluster")
    vecs = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    # r6 (guide §2.4): one materialization instead of re-deriving the
    # full quantize+train+assign chain on both sides of the self-join
    side = assign.join(vecs, "_id").localCheckpoint(eager=True)
    a = side.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "cluster"
    )
    b = side.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "cluster"
    )
    idt = dict(embeddings.dtypes)[id_col]
    paired = a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b"))

    # r6 (guide §4.2): the per-pair round6 cosine moved from the
    # interpreted HOF expression into the rowwise numpy kernel with
    # the identical IEEE sequence (pinned in tests); the >= threshold
    # decision still compares the kernel's rounded sim in Spark.
    def gen(batches):
        import numpy as np
        import pandas as pd

        from careers_spark.operators.similarity import _cos6_rows

        for pdf in batches:
            for lo in range(0, len(pdf), 2048):
                chunk = pdf.iloc[lo : lo + 2048]
                if len(chunk) == 0:
                    continue
                Q = np.array(chunk["_va"].tolist(), dtype=np.float64)
                N = np.array(chunk["_vb"].tolist(), dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "id_a": chunk["id_a"].to_numpy(),
                        "id_b": chunk["id_b"].to_numpy(),
                        "cluster": chunk["cluster"].to_numpy(),
                        "sim": _cos6_rows(Q, N),
                    }
                )

    return (
        paired.mapInPandas(
            gen,
            schema=f"id_a {idt}, id_b {idt}, cluster long, sim double",
        )
        .filter(F.col("sim") >= float(threshold))
        .select("id_a", "id_b", "cluster", "sim")
    )


def label_noise_audit(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-noise screening over a labeled embedding table (the
    confident-learning intuition, Northcutt et al. 2021, reduced to its
    distributed-friendly centroid form): a point whose own-label
    centroid is FARTHER than some other label's centroid is a
    mislabeling suspect.

    Every quantity rides the integer lattice (module docstring):
    per-label centroids are round(int_sum / n) lattice points, and all
    distances are exact integer sums of squares, so margins and flags
    are engine- and parallelism-exact with zero tolerance.

    Physical shape at scale: ONE algebraic groupBy(label) builds the
    centroids (label cardinality is tiny by definition — they collect
    to the driver like k-means seeds); per-point distances to the L
    literal centroids are pure map work (zip_with folds, argmin via
    array_min over structs) — no join, no window, no shuffle after the
    centroid pass.

    Output: (id, label, d_own, best_other_label, d_other, margin,
    flagged) with margin = d_own - d_other and flagged = margin > 0.
    """
    q = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("int").alias("label"),
        F.expr(
            f"transform({vec_col}, "
            f"v -> cast(round(cast(v as double) * {QUANT}, 0) as bigint))"
        ).alias("x"),
    )
    first = q.select(F.size("x").alias("d")).first()
    if first is None:
        return q.sparkSession.createDataFrame(
            [],
            f"{id_col} long, label int, d_own long, best_other_label int,"
            " d_other long, margin long, flagged boolean",
        )
    dim = first["d"]
    sums = [F.sum(F.element_at("x", i + 1)).alias(f"s{i}") for i in range(dim)]
    mean_cols = [
        F.expr(f"cast(round(s{i} / cast(n as double), 0) as bigint)")
        for i in range(dim)
    ]
    cent = {
        r["label"]: list(r["c"])
        for r in q.groupBy("label")
        .agg(F.count("*").alias("n"), *sums)
        .select("label", F.array(*mean_cols).alias("c"))
        .collect()
    }
    if len(cent) < 2:
        raise ValueError("label_noise_audit needs >= 2 distinct labels")
    arr = F.array(
        *[
            F.struct(
                F.expr(_dist_expr(c)).alias("d"),
                F.lit(lab).cast("int").alias("lab"),
            )
            for lab, c in sorted(cent.items())
        ]
    )
    with_d = q.withColumn(
        "_own", F.element_at(F.filter(arr, lambda s: s["lab"] == F.col("label")), 1)
    ).withColumn(
        "_oth", F.array_min(F.filter(arr, lambda s: s["lab"] != F.col("label")))
    )
    return with_d.select(
        F.col("id").alias(id_col),
        "label",
        F.col("_own.d").alias("d_own"),
        F.col("_oth.lab").alias("best_other_label"),
        F.col("_oth.d").alias("d_other"),
        (F.col("_own.d") - F.col("_oth.d")).alias("margin"),
        (F.col("_own.d") > F.col("_oth.d")).alias("flagged"),
    )


def knn_label_propagation(
    embeddings: DataFrame,
    k: int = 5,
    labeled_pred: str = "vec_id % 5 = 0",
    iterations: int = 3,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation over the embedding kNN graph
    (Zhu & Ghahramani 2002 with clamped seeds) — the
    spread-scarce-labels step of a weakly-labeled corpus: every
    unlabeled point takes the majority label of its k nearest
    neighbors, iterated synchronously; seed points never change.

    Determinism: the kNN edge set is `brute_force_topk`'s rounded-6
    cosine ranking (ties to smaller id); each round's majority vote is
    integer counts with the algebraic max(struct(cnt, -label)) argmax
    (ties: higher count, then smaller label). A node with no labeled
    neighbor stays NULL and retries next round. A fixed iteration
    count unrolls directly into the oracle — a converged round is a
    fixpoint (votes cannot change if no label changed), so extra
    rounds are no-ops.

    Scale: the exact kNN build is the documented dictionary-scale
    path (one cross join, as embedding_topk); at corpus scale feed
    the identical vote rounds from ANN candidates. Votes shuffle on
    the neighbor id — k-bounded fan-in, partial-agg counts.

    Output: (vec_id, label, is_seed) — label NULL if unreached.
    """
    from careers_spark.operators.similarity import brute_force_topk

    # the kNN build is the dominant cost; checkpoint it ONCE so the
    # vote rounds reuse the materialized edge set instead of
    # re-executing the full cross-join ranking every iteration
    # (measured at sf0.1: 225 s -> 85 s for iterations=3)
    edges = (
        brute_force_topk(embeddings, k=k, query_pred="true", id_col=id_col)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.expr(labeled_pred).alias("is_seed"),
        F.when(F.expr(labeled_pred), F.col(label_col))
        .cast("long")
        .alias("seed_label"),
    ).localCheckpoint(eager=True)
    cur = base.select(
        "vec_id", "is_seed", "seed_label", F.col("seed_label").alias("label")
    )
    for _ in range(int(iterations)):
        votes = (
            edges.join(
                cur.filter(F.col("label").isNotNull()).select(
                    F.col("vec_id").alias("nid"),
                    F.col("label").alias("nlabel"),
                ),
                F.col("neighbor_id") == F.col("nid"),
            )
            .groupBy("query_id", "nlabel")
            .agg(F.count("*").alias("cnt"))
            .groupBy("query_id")
            .agg(
                F.max(
                    F.struct("cnt", (-F.col("nlabel")).alias("nl"))
                ).alias("b")
            )
            .select(
                "query_id", (-F.col("b.nl")).cast("long").alias("maj")
            )
        )
        cur = (
            base.join(votes, base.vec_id == votes.query_id, "left")
            .select(
                "vec_id",
                "is_seed",
                "seed_label",
                F.when(F.col("is_seed"), F.col("seed_label"))
                .otherwise(F.col("maj"))
                .alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return cur.select("vec_id", "label", "is_seed")


def pq_codes(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding (Jegou et al. 2011, the faiss PQ
    path): split each vector into ``m`` contiguous subvectors, run the
    integer-lattice Lloyd k-means independently per subspace, and emit
    each vector's m-tuple of codebook indices plus its exact
    reconstruction error — the compressed representation an IVF-PQ
    index stores (log2(k)*m bits per vector; 12 bits here vs 2048 for
    float32x64).

    Everything inherits `kmeans_assign`'s exactness: subvectors live
    on the 1e-6 integer lattice, distances are integer sums of
    squares, centroid updates round back onto the lattice — so codes
    AND the reconstruction error are engine-exact with no tolerance,
    and the oracle nests m unrolled k-means chains. Per-subspace
    assignment is pure map work against literal centroids (no join);
    the m runs share one corpus scan shape.

    Output: (vec_id, code_0..code_{m-1}, recon_err) — recon_err the
    exact BIGINT sum of per-subspace squared distances (lattice
    units), i.e. the full-vector distance to the implicit PQ
    reconstruction, since subspaces are disjoint.
    """
    dim = embeddings.select(F.size(F.col(vec_col))).first()[0]
    if dim % m != 0:
        raise ValueError(f"pq_codes: dim {dim} not divisible by m={m}")
    sub = dim // m
    out = None
    for j in range(m):
        sliced = embeddings.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col),
        )
        a = kmeans_assign(
            sliced, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        ).select(
            id_col,
            F.col("cluster").alias(f"code_{j}"),
            F.col("dist").alias(f"_d{j}"),
        )
        out = a if out is None else out.join(a, id_col)
    return out.select(
        id_col,
        *[f"code_{j}" for j in range(m)],
        sum(F.col(f"_d{j}") for j in range(m)).cast("long").alias("recon_err"),
    )


def _route_encode_kernel(
    cq: DataFrame,
    codebooks: list[list[list[int]]],
    sub: int,
    coarse: list[list[int]] | None = None,
    out_id: str = "neighbor_id",
) -> DataFrame:
    """One map pass over a quantized (id, x) frame emitting the PQ code
    tuple (and, with `coarse` given, the IVF list id) — the numpy twin
    of the least(struct(dist, j)) encode expressions (guide §4.2: those
    are interpreted HOFs at k x dim folds per row). Exact integer
    argmins, first-minimum = smallest code / list id on ties. Map-only:
    distributes exactly like the expression version."""
    import numpy as np

    spark = cq.sparkSession
    m = len(codebooks)
    CB = [np.array(b, dtype=np.int64) for b in codebooks]
    CO = None if coarse is None else np.array(coarse, dtype=np.int64)
    bc = spark.sparkContext.broadcast((CB, CO))
    idt = dict(cq.dtypes)["id"]
    cols = ([f"{out_id} {idt}"] + (["list_id int"] if coarse is not None else [])
            + [f"code_{j} long" for j in range(m)])
    schema = ", ".join(cols)

    def gen(batches):
        import numpy as np
        import pandas as pd

        CB_, CO_ = bc.value
        for pdf in batches:
            for lo in range(0, len(pdf), 2048):
                chunk = pdf.iloc[lo : lo + 2048]
                if len(chunk) == 0:
                    continue
                X = np.array(chunk["x"].tolist(), dtype=np.int64)
                out = {out_id: chunk["id"].to_numpy()}
                if CO_ is not None:
                    D = ((X[:, :, None] - CO_.T[None, :, :]) ** 2).sum(axis=1)
                    out["list_id"] = D.argmin(axis=1).astype(np.int32)
                for j in range(len(CB_)):
                    Xj = X[:, j * sub : (j + 1) * sub]
                    Dj = ((Xj[:, :, None] - CB_[j].T[None, :, :]) ** 2).sum(
                        axis=1
                    )
                    out[f"code_{j}"] = Dj.argmin(axis=1).astype(np.int64)
                yield pd.DataFrame(out)

    return cq.mapInPandas(gen, schema=schema)


def _adc_rank_kernel(
    codes: DataFrame,
    qx_df: DataFrame,
    codebooks: list[list[list[int]]],
    sub: int,
    k: int,
) -> DataFrame:
    """ADC top-k against broadcast query lattice vectors: per task a
    (query x centroid) integer LUT per subspace, block-local top-k by
    (adist asc, neighbor asc), then one small global window — the
    numpy twin of the query x codes cross join + aggregate(zip_with)
    adist expressions. Exact BIGINT arithmetic end to end; block
    top-ks are supersets of the global top-k, so the closing window
    returns the identical rows. Queries are the bounded side by the
    query_pred contract (the brute_force_topk broadcast posture)."""
    import numpy as np

    from pyspark.sql import Window

    spark = codes.sparkSession
    m = len(codebooks)
    CB = [np.array(b, dtype=np.int64) for b in codebooks]
    qpdf = qx_df.toPandas()
    qids = qpdf["query_id"].to_numpy()
    QX = np.array(qpdf["qx"].tolist(), dtype=np.int64)
    bc = spark.sparkContext.broadcast((qids, QX, CB))
    idt = dict(codes.dtypes)["neighbor_id"]
    kk = int(k)

    def gen(batches):
        import numpy as np
        import pandas as pd

        qids_, QX_, CB_ = bc.value
        nq = len(qids_)
        if nq == 0:
            return
        luts = [
            ((QX_[:, None, j * sub : (j + 1) * sub] - CB_[j][None, :, :]) ** 2).sum(
                axis=2
            )
            for j in range(len(CB_))
        ]
        for pdf in batches:
            for lo in range(0, len(pdf), 4096):
                chunk = pdf.iloc[lo : lo + 4096]
                nb = len(chunk)
                if nb == 0:
                    continue
                nids = chunk["neighbor_id"].to_numpy()
                adist = np.zeros((nq, nb), dtype=np.int64)
                for j in range(len(CB_)):
                    cj = chunk[f"code_{j}"].to_numpy(np.int64)
                    adist += luts[j][:, cj]
                take = min(kk, nb)
                out_q, out_n, out_d = [], [], []
                for qi in range(nq):
                    order = np.lexsort((nids, adist[qi]))[:take]
                    out_q.extend([qids_[qi]] * take)
                    out_n.extend(nids[order].tolist())
                    out_d.extend(adist[qi][order].tolist())
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "adist": out_d}
                )

    cand = codes.mapInPandas(
        gen, schema=f"query_id {idt}, neighbor_id {idt}, adist long"
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= kk)
        .select(
            "query_id", "neighbor_id", "adist",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def _slice_dist_expr(centroid: list[int], lo: int, sub: int) -> str:
    """Exact integer squared distance between slice(x, lo, sub) and a
    literal lattice centroid."""
    arr = "array(" + ",".join(f"{int(c)}L" for c in centroid) + ")"
    return (
        f"aggregate(zip_with(slice(x, {lo}, {sub}), {arr}, "
        "(a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"
    )


def pq_adc_topk(
    embeddings: DataFrame,
    k: int = 5,
    m: int = 4,
    kcent: int = 8,
    iters: int = 2,
    query_pred: str = "vec_id % 50 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k search (Jegou et al. 2011, the
    faiss ADC path): the corpus is stored ONLY as pq_codes-style
    m-tuples of codebook indices, and each query's distance to a doc
    is the sum of subspace distances from the query's RAW subvector to
    the centroid the doc's code names:

        adist(q, doc) = sum_j || q_j - C_j[code_j(doc)] ||^2

    Codebooks are trained on the CORPUS side only (rows not matching
    `query_pred` — queries are never indexed), via the shared
    integer-lattice Lloyd loop, so codes, centroids, and every ADC
    distance are exact BIGINTs — no rounding recipe at all, and the
    ranking is deterministic across engines and parallelism.

    Provable-exactness property (the ivf nprobe==nlist analogue):
    with kcent == corpus size, every vector is its own centroid
    (seeds are the points, each assigns to itself at distance 0,
    updates are identity), so ADC degenerates to the exact lattice L2
    ranking — pinned in tests.

    Physical shape: training is m bounded Lloyd loops (k*sub ints to
    the driver per iteration); encoding is pure map work against
    literal centroids (the corpus never shuffles); the query x codes
    scan is the declared exact-baseline cross join (brute_force_topk's
    contract) — at corpus scale feed candidates from ivf_topk's lists
    and apply ADC as the re-rank, which is the faiss IVFADC
    composition. Codes are m bytes vs 4*dim floats, so the scanned
    side is ~64x slimmer than the raw corpus.

    Output: (query_id, neighbor_id, adist, rk) — adist the exact
    BIGINT lattice distance, ties to smaller neighbor id.
    """
    dim = embeddings.select(F.size(F.col(vec_col))).first()[0]
    if dim % m != 0:
        raise ValueError(f"pq_adc_topk: dim {dim} not divisible by m={m}")
    sub = dim // m

    corpus = embeddings.filter(f"NOT ({query_pred})")
    queries = embeddings.filter(query_pred)
    cq = _quantize(corpus, id_col, vec_col).cache()
    n_corpus = cq.count()
    if n_corpus == 0:
        raise ValueError("pq_adc_topk: empty corpus")

    # r6 (guide §4.2): training, encoding and the ADC ranking all moved
    # into exact-integer numpy kernels (driver Lloyd / map-only encode /
    # LUT block-top-k) — the former per-row least(struct(zip_with ...))
    # expressions were interpreted HOFs; every argmin and distance is
    # the identical BIGINT computation, pinned piecewise in tests.
    codebooks: list[list[list[int]]] = []
    for j in range(m):
        qj = cq.select("id", F.slice(F.col("x"), j * sub + 1, sub).alias("x"))
        cents = lloyd_centroids(qj, kcent, iters, n_rows=n_corpus)
        codebooks.append(cents)

    codes = _route_encode_kernel(cq, codebooks, sub)
    qx = _quantize(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("x").alias("qx")
    )
    out = _adc_rank_kernel(codes, qx, codebooks, sub, k)
    cq.unpersist()
    return out


def ivfadc_topk(
    embeddings: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 8,
    m: int = 4,
    kcent: int = 8,
    iters: int = 2,
    query_pred: str = "vec_id % 50 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC (Jegou et al. 2011 §IV, the faiss IndexIVFPQ search
    shape): a coarse quantizer routes each corpus vector into ONE
    inverted list, queries probe their `nprobe` nearest lists, and
    candidates are ranked by the PQ asymmetric distance over the
    corpus's compressed codes — the composition that makes
    billion-vector search tractable: the scan side is m-byte codes
    instead of raw vectors AND only nprobe/nlist of the corpus is
    touched per query.

    This is pq_adc_topk's declared scale path: the all-pairs cross
    join is replaced by a (list_id) equi-join, exactly as ivf_topk
    replaces brute_force_topk. Everything lives on the 1e-6 integer
    lattice — coarse assignment, codebooks, codes, ADC distances are
    all exact BIGINT argmins over literal centroids, so there is no
    rounding recipe anywhere and the provable-exactness property
    composes: with nprobe == nlist every list is probed, the candidate
    set is the whole corpus (each doc lives in exactly one list), and
    the result EQUALS pq_adc_topk with the same codebook parameters —
    the driver query runs that configuration so the machine-checked
    oracle covers the full train/route/encode/rank machinery; recall
    at nprobe < nlist is the standard IVF trade, gated in pytest.

    Codebooks encode raw vectors against a GLOBAL PQ codebook (the
    faiss non-residual variant); per-list residual encoding is the
    classic refinement and would reuse the same shapes with the
    coarse centroid subtracted before encoding.

    Physical shape: coarse centroids and PQ codebooks are literals in
    the plan (driver-bounded Lloyd training, nlist*dim + m*kcent*sub
    ints); corpus routing + encoding is ONE map pass with zero joins
    and zero shuffles; query probing is a map-side array_sort over
    nlist literal structs (no window); the only shuffles are the
    list_id equi-join and the final per-query top-k rank.

    Output: (query_id, neighbor_id, adist, rk) — exact BIGINT lattice
    ADC distance, ties to smaller neighbor id.
    """
    dim = embeddings.select(F.size(F.col(vec_col))).first()[0]
    if dim % m != 0:
        raise ValueError(f"ivfadc_topk: dim {dim} not divisible by m={m}")
    sub = dim // m
    nprobe = min(int(nprobe), int(nlist))

    corpus = embeddings.filter(f"NOT ({query_pred})")
    queries = embeddings.filter(query_pred)
    cq = _quantize(corpus, id_col, vec_col).cache()
    n_corpus = cq.count()
    if n_corpus == 0:
        raise ValueError("ivfadc_topk: empty corpus")

    coarse = lloyd_centroids(cq, nlist, iters, n_rows=n_corpus)

    codebooks: list[list[list[int]]] = []
    for j in range(m):
        qj = cq.select("id", F.slice(F.col("x"), j * sub + 1, sub).alias("x"))
        cents = lloyd_centroids(qj, kcent, iters, n_rows=n_corpus)
        codebooks.append(cents)

    # corpus: ONE map pass -> (neighbor_id, list_id, code_0..m-1)
    # (r6: the numpy route+encode kernel — exact integer argmins,
    # first-min ties, identical to the least(struct(...)) exprs)
    codes = _route_encode_kernel(cq, codebooks, sub, coarse=coarse)

    # queries: nprobe nearest lists via a map-side sort of the nlist
    # literal structs — no window, no shuffle
    coarse_structs = [
        F.struct(
            F.expr(_dist_expr(c)).alias("d"), F.lit(i).cast("long").alias("j")
        )
        for i, c in enumerate(coarse)
    ]
    probe = (
        _quantize(queries, id_col, vec_col)
        .select(
            F.col("id").alias("query_id"),
            F.col("x").alias("qx"),
            F.explode(
                F.slice(F.array_sort(F.array(*coarse_structs).cast(
                    "array<struct<d:bigint,j:bigint>>"
                )), 1, nprobe)
            ).alias("p"),
        )
        .select("query_id", "qx", F.col("p.j").cast("int").alias("list_id"))
    )

    # ADC over the list-local candidates: the equi-join stays (the
    # 100 TB routing shape is untouched); only the per-pair
    # aggregate(zip_with) fold moved into a rowwise integer kernel
    CBv = codebooks
    joined = probe.join(codes, "list_id").select(
        "query_id", "qx", "neighbor_id", *[f"code_{j}" for j in range(m)]
    )
    spark = embeddings.sparkSession
    import numpy as np

    bc_cb = spark.sparkContext.broadcast(
        [np.array(b, dtype=np.int64) for b in CBv]
    )
    idt = dict(embeddings.dtypes)[id_col]
    sub_ = sub

    def gen(batches):
        import numpy as np
        import pandas as pd

        CB_ = bc_cb.value
        for pdf in batches:
            for lo in range(0, len(pdf), 4096):
                chunk = pdf.iloc[lo : lo + 4096]
                if len(chunk) == 0:
                    continue
                QXr = np.array(chunk["qx"].tolist(), dtype=np.int64)
                adist = np.zeros(len(chunk), dtype=np.int64)
                for j in range(len(CB_)):
                    idx = chunk[f"code_{j}"].to_numpy(np.int64)
                    diff = QXr[:, j * sub_ : (j + 1) * sub_] - CB_[j][idx]
                    adist += (diff * diff).sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": chunk["query_id"].to_numpy(),
                        "neighbor_id": chunk["neighbor_id"].to_numpy(),
                        "adist": adist,
                    }
                )

    scored = joined.mapInPandas(
        gen, schema=f"query_id {idt}, neighbor_id {idt}, adist long"
    )

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select(
            "query_id", "neighbor_id", "adist", F.col("rk").cast("int").alias("rk")
        )
    )
    cq.unpersist()
    return out


def ivfadc_refined_topk(
    embeddings: DataFrame,
    k: int = 5,
    refine: int = 4,
    nlist: int = 8,
    nprobe: int = 8,
    m: int = 4,
    kcent: int = 8,
    iters: int = 2,
    query_pred: str = "vec_id % 50 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC + exact refinement (the faiss IndexRefineFlat pattern):
    retrieve a k*refine shortlist by compressed ADC distance, then
    re-rank ONLY the shortlist with exact lattice L2 against the raw
    vectors. The ANN recall study measures why this exists: on a
    clustered corpus, PQ quantization (not list routing) is the whole
    accuracy loss (ADC recall ~0.40 with routing loss ~0.00 at
    nprobe=1) — a small exact re-rank over refine*k rows buys the
    recall back while the corpus scan still touches only codes.

    Everything stays on the integer lattice: the refinement join
    fetches shortlist raw vectors by id (an equi-join on neighbor_id —
    k*refine rows per query, never corpus-sized) and the final rank is
    an exact BIGINT L2 argsort with the shared (dist, neighbor_id)
    tie-break. No rounding anywhere; fully oracle-checkable.

    Output: (query_id, neighbor_id, dist, rk) — dist the exact
    refined lattice L2 distance.
    """
    short = ivfadc_topk(
        embeddings, k=int(k) * int(refine), nlist=nlist, nprobe=nprobe,
        m=m, kcent=kcent, iters=iters, query_pred=query_pred,
        id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    qx = _quantize(embeddings.filter(query_pred), id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("x").alias("qx")
    )
    cx = _quantize(
        embeddings.filter(f"NOT ({query_pred})"), id_col, vec_col
    ).select(F.col("id").alias("neighbor_id"), F.col("x").alias("nx"))

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        short.join(qx, "query_id")
        .join(cx, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(qx, nx, (a, b) -> (a - b) * (a - b)), "
                "0L, (acc, v) -> acc + v)"
            ).alias("dist"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select(
            "query_id", "neighbor_id", "dist",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
def kcenter_select(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Gonzalez farthest-first traversal (the 2-approximate k-center
    algorithm) — greedy DIVERSITY-maximizing selection over an
    embedding column: the coreset / "pick maximally spread exemplars"
    step of training-data selection, the coverage-first complement of
    the density-respecting samplers (stratified / DSIR / Gumbel top-k).

    Round 0 seeds with the smallest id; each later round selects the
    point FARTHEST from the already-selected set (max of the min
    squared distance to any center), ties to the smaller id. All
    distances are exact integer sums of squares on the shared 1e-6
    lattice (the kmeans_assign recipe), so the argmax can never flip
    between engines or partitionings and the whole k-round loop
    unrolls into an exact DuckDB oracle.

    Physical shape per round: distances to the <=k selected centers
    are LITERALS in the plan (pure map work, no join), the argmax is
    ONE algebraic max(struct(d, -id)) aggregation — map-side
    combinable, nothing collected but a scalar; then one pruned fetch
    of the winner's vector. k scans total; no step grows
    super-linearly in N, and k is small by definition.

    Output: (sel_rank, <id_col>, sq_dist) — sq_dist is the point's
    exact min squared lattice distance to the set selected BEFORE it
    (its coverage radius contribution); NULL for the seed. Stops early
    if the farthest distance hits 0 (every remaining point duplicates
    a selected center — further rows would be arbitrary).
    """
    spark = embeddings.sparkSession
    q = _quantize(embeddings, id_col, vec_col).cache()
    schema = f"sel_rank int, {id_col} bigint, sq_dist bigint"
    seeds = q.orderBy("id").limit(1).collect()
    if not seeds:
        q.unpersist()
        return spark.createDataFrame([], schema)
    centers = [list(seeds[0]["x"])]
    out = [(0, int(seeds[0]["id"]), None)]
    for t in range(1, int(k)):
        dists = [F.expr(_dist_expr(cen)) for cen in centers]
        mind = F.least(*dists) if len(dists) > 1 else dists[0]
        best = q.select(
            F.max(
                F.struct(mind.alias("d"), (-F.col("id")).alias("nid"))
            ).alias("m")
        ).collect()[0]["m"]
        d, vid = int(best["d"]), -int(best["nid"])
        if d == 0:
            break
        x = q.filter(F.col("id") == vid).select("x").collect()[0]["x"]
        centers.append(list(x))
        out.append((t, vid, d))
    q.unpersist()
    return spark.createDataFrame(out, schema)


def dbscan_clusters(
    points: DataFrame, eps: int, min_pts: int, max_iter: int = 25
) -> DataFrame:
    """DBSCAN (Ester et al. KDD'96) over integer-lattice points,
    distributed the grid-blocked way (the MR-DBSCAN decomposition):

    1. eps-neighbor pairs from the radius-cell grid join — ONE
       equi-join on cell keys, recall exact by the 3x3 lemma
       (spatial.grid_distance_join); never an all-pairs join.
    2. core points: |N_eps(p)| >= min_pts, with the neighborhood
       INCLUDING p itself (the paper's convention) — one partial-agg
       degree count over the pair list.
    3. clusters: connected components of the core-core subgraph
       (canonicalize.connected_components — salted min-label
       propagation, O(diameter) rounds, label = min core pt_id);
       a core point with no core neighbor is its own singleton
       cluster.
    4. border points (non-core within eps of a core) attach to the
       SMALLEST cluster label among their core neighbors — classic
       DBSCAN leaves border assignment visit-order-dependent; the
       min rule makes it deterministic across engines and
       parallelism, which is what an oracle-checkable DBSCAN needs.
    5. everything else is noise (NULL cluster).

    All arithmetic is integer (lattice coords, squared distances,
    BIGINT labels) — no float exists anywhere, so results hash
    identically at any parallelism.

    Input: (pt_id, x, y). Output: (pt_id, role, cluster) with role
    in {'core', 'border', 'noise'} and cluster NULL iff noise.
    """
    from careers_spark.operators.canonicalize import connected_components
    from careers_spark.operators.spatial import grid_distance_join

    pairs = grid_distance_join(points, radius=eps).localCheckpoint(
        eager=True
    )
    nbrs = pairs.selectExpr("pt_a as p", "pt_b as q").union(
        pairs.selectExpr("pt_b as p", "pt_a as q")
    )
    deg = nbrs.groupBy("p").agg(F.count("*").alias("n_nbr"))
    core = (
        points.join(deg, points["pt_id"] == deg["p"], "left_outer")
        .select(
            "pt_id",
            (F.coalesce("n_nbr", F.lit(0).cast("long")) + 1 >= min_pts).alias(
                "is_core"
            ),
        )
        .localCheckpoint(eager=True)
    )
    core_ids = core.filter("is_core").select("pt_id")
    core_edges = (
        pairs.join(
            core_ids.withColumnRenamed("pt_id", "pt_a"), "pt_a", "left_semi"
        )
        .join(
            core_ids.withColumnRenamed("pt_id", "pt_b"), "pt_b", "left_semi"
        )
        .select(F.col("pt_a").alias("src"), F.col("pt_b").alias("dst"))
    )
    comp = connected_components(core_edges, max_iter=max_iter)
    core_lab = (
        core_ids.join(
            comp.withColumnRenamed("node", "pt_id"), "pt_id", "left_outer"
        )
        .select(
            "pt_id",
            F.coalesce("component", F.col("pt_id")).alias("cluster"),
        )
    )
    border_lab = (
        nbrs.join(
            core_lab.withColumnRenamed("pt_id", "q"), "q"
        )
        .groupBy(F.col("p").alias("pt_id"))
        .agg(F.min("cluster").alias("b_cluster"))
    )
    return (
        core.join(
            core_lab.withColumnRenamed("cluster", "c_cluster"),
            "pt_id",
            "left_outer",
        )
        .join(border_lab, "pt_id", "left_outer")
        .select(
            "pt_id",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.when(F.col("is_core"), F.col("c_cluster"))
            .otherwise(F.col("b_cluster"))
            .alias("cluster"),
        )
    )
