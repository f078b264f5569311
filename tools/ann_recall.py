"""Recall / cost study for the ANN operators.

For each configuration of lsh_bucketed_topk and ivf_topk, measures

- recall@K against brute_force_topk (the exact baseline),
- the candidate fraction: candidate pairs examined / (Q * (N-1)) —
  the 100 TB cost lever (candidate generation is the only part whose
  cost scales with corpus size; walls at this tiny SF are mostly
  per-job overhead). Candidate counts come from running the SAME
  operator with k = N: the exact re-rank then truncates nothing, so
  the output IS the candidate set — no duplicated internals.
- warm wall seconds (second of two runs; each call retrains/rehashes,
  as a cold query would).

Sanity invariants asserted in-run: IVF at nprobe == nlist and LSH
candidate sets are subsets of the exact universe; full-probe IVF
recall == 1.0.

Two corpora, because the recall/cost trade depends on neighborhood
structure:

- default: the sf embeddings table (near-random synthetic vectors —
  the WORST case for ANN; recall can't much exceed the candidate
  fraction when there is no cluster structure to exploit);
- --clustered: a deterministic clustered corpus (64 hash-generated
  unit centers, 2000 points at small offsets — the realistic regime
  for real embedding models, where IVF lists align with clusters).

Usage: python tools/ann_recall.py [--clustered]
(honors SPARK_GRAFT_SF_DIR / _CPUS)
Writes a markdown table to stdout and JSON to /tmp/ann_recall.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from careers_spark.session import get_spark  # noqa: E402
from careers_spark.operators import similarity as SIM  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 10
QPRED = "vec_id % 50 = 0"


def clustered_corpus(spark, n=2000, n_centers=64, dim=16, spread=0.15):
    """Deterministic clustered vectors, RNG-free: center components and
    point offsets come from a multiplicative integer hash (same recipe
    family as the LSH hyperplane table)."""
    import numpy as np

    def h(*ks):
        # splitmix64 finalizer per key — a bare multiply leaves small
        # keys in the low bits (every component near-identical)
        x = 0x9E3779B97F4A7C15
        for k in ks:
            x = (x ^ int(k)) * 0xBF58476D1CE4E5B9 % (1 << 64)
            x ^= x >> 30
            x = x * 0x94D049BB133111EB % (1 << 64)
            x ^= x >> 31
        return (x >> 16) / float(1 << 48) - 0.5

    centers = np.array(
        [[h(c, d) for d in range(dim)] for c in range(n_centers)]
    )
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % n_centers
        v = centers[c] + spread * np.array(
            [h(1_000_003, i, d) for d in range(dim)]
        )
        rows.append((i, [float(x) for x in v]))
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )


def main():
    clustered = "--clustered" in sys.argv
    spark = get_spark(
        "ann_recall", cpus=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    emb = (clustered_corpus(spark) if clustered
           else spark.read.parquet(f"{SF}/embeddings.parquet"))
    n = emb.count()
    q = emb.filter(QPRED).count()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(emb, k=K, query_pred=QPRED).collect()
    }

    rows = []

    def study(tag, fn):
        fn(K).count()  # warm (includes train/hash)
        t = time.time()
        got = {(r.query_id, r.neighbor_id) for r in fn(K).collect()}
        wall = time.time() - t
        cand = fn(n).count()
        rec = len(got & exact) / len(exact)
        rows.append({
            "config": tag,
            "recall_at_k": round(rec, 4),
            "cand_frac": round(cand / (q * (n - 1)), 4),
            "warm_wall_s": round(wall, 2),
        })

    study("brute_force (exact)", lambda k: SIM.brute_force_topk(
        emb, k=k, query_pred=QPRED))
    for planes, mp in [(6, 1), (8, 0), (8, 1), (10, 1)]:
        study(f"lsh planes={planes} multiprobe={mp}", lambda k, p=planes, m=mp:
              SIM.lsh_bucketed_topk(emb, k=k, n_planes=p, multiprobe=m,
                                    query_pred=QPRED))
    for nprobe in [1, 2, 4, 8, 16]:
        study(f"ivf nlist=16 nprobe={nprobe}", lambda k, np_=nprobe:
              SIM.ivf_topk(emb, k=k, nlist=16, nprobe=np_, iters=5,
                           query_pred=QPRED))

    full_probe = [r for r in rows if r["config"].endswith("nprobe=16")]
    assert full_probe and full_probe[0]["recall_at_k"] == 1.0, \
        "nprobe==nlist must equal brute force"

    # ---- compressed-search (ADC) section ----------------------------
    # The ADC family ranks by exact lattice L2 over PQ codes, so its
    # baseline is the exact lattice-L2 top-k over the same
    # corpus/query split (queries are never indexed), NOT the cosine
    # baseline above — recall here isolates quantization + routing
    # loss, with no metric mismatch in the measurement.
    from pyspark.sql import Window, functions as F  # noqa: E402

    from careers_spark.operators import clustering as CL  # noqa: E402

    dim = len(emb.select("embedding").first()[0])
    qx = CL._quantize(emb.filter(QPRED), "vec_id", "embedding").select(
        F.col("id").alias("query_id"), F.col("x").alias("qx")
    )
    cx = CL._quantize(
        emb.filter(f"NOT ({QPRED})"), "vec_id", "embedding"
    ).select(F.col("id").alias("neighbor_id"), F.col("x").alias("nx"))
    n_corpus = cx.count()
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact_l2 = {
        (r.query_id, r.neighbor_id)
        for r in (
            qx.crossJoin(cx)
            .select(
                "query_id",
                "neighbor_id",
                F.expr(
                    "aggregate(zip_with(qx, nx, (a, b) -> (a-b)*(a-b)), "
                    "0L, (acc, v) -> acc + v)"
                ).alias("d"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= K)
            .collect()
        )
    }

    def study_adc(tag, fn):
        fn(K).count()  # warm (includes codebook training)
        t = time.time()
        got = {(r.query_id, r.neighbor_id) for r in fn(K).collect()}
        wall = time.time() - t
        cand = fn(n_corpus).count()
        rec = len(got & exact_l2) / len(exact_l2)
        rows.append({
            "config": tag,
            "recall_at_k": round(rec, 4),
            "cand_frac": round(cand / (q * n_corpus), 4),
            "warm_wall_s": round(wall, 2),
        })

    m = 4 if dim % 4 == 0 else 2
    for kc in (8, 16):
        study_adc(
            f"pq_adc m={m} kcent={kc} (all-pairs ADC)",
            lambda k, kc_=kc: CL.pq_adc_topk(
                emb, k=k, m=m, kcent=kc_, iters=2, query_pred=QPRED
            ),
        )
    for nprobe in (1, 2, 4, 16):
        study_adc(
            f"ivfadc nlist=16 nprobe={nprobe} m={m} kcent=16",
            lambda k, np_=nprobe: CL.ivfadc_topk(
                emb, k=k, nlist=16, nprobe=np_, m=m, kcent=16,
                iters=2, query_pred=QPRED,
            ),
        )
    for nprobe in (1, 4):
        study_adc(
            f"ivfadc+refine4 nlist=16 nprobe={nprobe} m={m} kcent=16",
            lambda k, np_=nprobe: CL.ivfadc_refined_topk(
                emb, k=k, refine=4, nlist=16, nprobe=np_, m=m,
                kcent=16, iters=2, query_pred=QPRED,
            ),
        )
    # composed invariant: full-probe IVFADC == all-pairs ADC at the
    # same codebook params, so their recalls (vs exact L2) are equal
    adc16 = [r for r in rows if r["config"].startswith("pq_adc") and "kcent=16" in r["config"]]
    ivf_full = [r for r in rows if r["config"].startswith("ivfadc") and "nprobe=16" in r["config"]]
    assert adc16 and ivf_full and adc16[0]["recall_at_k"] == ivf_full[0]["recall_at_k"], \
        "full-probe IVFADC must equal all-pairs ADC"

    corpus = "clustered-synthetic" if clustered else SF
    print(f"\nN={n} Q={q} K={K} corpus={corpus}\n")
    print("| config | recall@10 | candidate frac | warm wall s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['recall_at_k']:.3f} "
              f"| {r['cand_frac']:.3f} | {r['warm_wall_s']} |")
    out = {"corpus": corpus, "n": n, "q": q, "k": K, "rows": rows}
    suffix = "_clustered" if clustered else ""
    with open(f"/tmp/ann_recall{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
