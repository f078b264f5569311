"""Deduplication operators over a `documents(doc_id, text, ...)` table.

All hot paths are pure Catalyst expressions (split/transform/aggregate/
window) so they stay inside whole-stage codegen and are oracle-checkable
against DuckDB with bit-identical hashing: token/shingle hashes derive
from md5 hex (same function both engines), folded into 63-bit-safe
integer space (multiplier ~1e6 * base < 2^63 — no overflow divergence).

Operators:
  - exact dedup         : md5(text) hash-groupBy
  - minhash + LSH       : shingle -> K minhashes -> banded bucket join
  - n-gram Jaccard      : shared-shingle self-join (exact verify path)
  - simhash             : per-bit majority over token hashes
  - embedding near-dup  : cosine over array<float> (see also similarity.py)

At 100 TB these are shuffle-on-shingle jobs: the shingle explode is
~10x input, the groupBys are partial-agg friendly, and LSH banding keeps
the candidate-pair join linear-ish instead of quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_P = 4294967311  # prime > 2^32
MINHASH_A0, MINHASH_A_STEP = 1000003, 7919
MINHASH_B0, MINHASH_B_STEP = 104729, 2654435761 % 1000003


def tokens_col(c: str = "text"):
    """Lowercase word tokens; identical to DuckDB
    list_filter(regexp_split_to_array(lower(x),'[^a-z0-9]+'), t -> t!='')."""
    return F.filter(
        F.split(F.lower(F.col(c)), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )


def shingles_expr(n: int = 3) -> str:
    """SQL expression producing word n-gram strings from a `toks` column."""
    return (
        f"case when size(toks) >= {n} then "
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', slice(toks, i + 1, {n}))) "
        f"else array() end"
    )


def _hash64_expr(col: str) -> str:
    """md5-derived 32-bit integer, identical in Spark and DuckDB."""
    return f"cast(conv(substr(md5({col}), 1, 8), 16, 10) as bigint)"


def minhash_expr(j: int, col: str = "sh") -> str:
    a = MINHASH_A0 + j * MINHASH_A_STEP
    b = MINHASH_B0 + j * MINHASH_B_STEP
    return f"min(({_hash64_expr(col)} * {a} + {b}) % {MINHASH_P})"


# ---------------------------------------------------------------------------
def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup: one canonical doc per text hash.

    Output: (text_hash, canonical_doc_id, n_dups).
    """
    return (
        documents.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_dups"),
        )
    )


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh) distinct word-n-gram shingles."""
    return (
        documents.select("doc_id", tokens_col("text").alias("toks"))
        .select("doc_id", F.explode(F.expr(shingles_expr(n))).alias("sh"))
        .dropDuplicates()
    )


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 12, n: int = 3, sh: DataFrame | None = None
) -> DataFrame:
    """Long-form minhash signatures: (doc_id, h_idx, minhash).

    Pass a precomputed (ideally checkpointed) `sh` shingle frame to
    avoid re-deriving the shingle explode when several consumers share
    it (minhash_calibration / blocking_quality do)."""
    if sh is None:
        sh = doc_shingles(documents, n)
    sigs = [
        F.expr(minhash_expr(j)).alias(f"mh{j}") for j in range(num_hashes)
    ]
    wide = sh.groupBy("doc_id").agg(*sigs)
    stack = ", ".join(f"{j}, mh{j}" for j in range(num_hashes))
    return wide.selectExpr(
        "doc_id", f"stack({num_hashes}, {stack}) as (h_idx, minhash)"
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    n: int = 3,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing at least one band bucket.

    band key = concatenated minhashes of the band; the bucket join is an
    equi-join on (band, key) — linear in corpus size for non-pathological
    data instead of the quadratic all-pairs comparison.

    Pass precomputed `sigs` (minhash_signatures output, ideally
    checkpointed) when the caller also consumes the signatures — else
    Spark recomputes the full shingle+minhash aggregation per consumer.
    """
    if sigs is None:
        sigs = minhash_signatures(documents, num_hashes, n)
    bands = (
        sigs.withColumn("band", (F.col("h_idx") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_list(F.struct("h_idx", "minhash"))), lambda s: s["minhash"].cast("string"))
            ).alias("band_key")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates()
    )


def jaccard_pairs(
    documents: DataFrame, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shared-shingle self-join.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|); pairs with no shared
    shingle are never materialized (the join IS the blocking).
    """
    # r6 (guide §2.4): the shingle explode feeds the self-join twice
    # plus the size agg — materialize it once
    sh = doc_shingles(documents, n).localCheckpoint(eager=True)
    size = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(size.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
        .join(size.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def lsh_verified_pairs(
    documents: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard — the scale path:
    candidate generation is linear-ish, verification touches only
    candidate pairs."""
    # r6 (guide §2.4): ONE shingle explode shared by signatures and
    # verification — the un-checkpointed plan re-derived doc_shingles
    # four times (bands self-join + both verify joins + sizes).
    sh = doc_shingles(documents, n).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(
        documents, num_hashes, band_size, n,
        sigs=minhash_signatures(documents, num_hashes, n, sh=sh),
    )
    size = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cands.join(sh.selectExpr("doc_id as doc_a", "sh"), "doc_a")
        .join(sh.selectExpr("doc_id as doc_b", "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(size.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
        .join(size.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(documents: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash: per-bit majority vote over (distinct) token hashes.

    Output: (doc_id, simhash bigint). Bit b is set when more token
    hashes have bit b set than unset.
    """
    toks = (
        documents.select("doc_id", tokens_col("text").alias("toks"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .dropDuplicates()
        .selectExpr("doc_id", f"{_hash64_expr('tok')} as h")
    )
    votes = (
        toks.select(
            "doc_id", F.explode(F.expr(f"sequence(0, {bits - 1})")).alias("b"), "h"
        )
        .withColumn("vote", F.expr("(shiftright(h, b) & 1) * 2 - 1"))
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn(
            "bitval",
            F.expr("case when v > 0 then shiftleft(cast(1 as bigint), b) else cast(0 as bigint) end"),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_bands_catalyst(documents: DataFrame, bands: int = 4) -> DataFrame:
    """64-bit SimHash, emitted as `bands` fixed-width band values.

    The 64 signature bits come from two md5-derived 32-bit token hashes
    (hex chars 1-8 and 9-16) so both engines compute identical values
    without ever shifting into a bigint's sign bit. Bit b of the
    signature is a majority vote of bit b across the document's
    DISTINCT token hashes; band j packs bits [j*w, (j+1)*w) with
    w = 64 // bands (the last band absorbs any remainder).

    Output: (doc_id, band int, band_val bigint) — `bands` rows per doc.
    Emitting bands instead of one packed bigint is deliberate: it is
    exactly the join key layout `simhash_near_dups` needs, and it
    avoids `1 << 63` sign-bit traps in both Spark and DuckDB.
    """
    width = 64 // bands
    toks = (
        documents.select("doc_id", tokens_col("text").alias("toks"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .dropDuplicates()
        .selectExpr(
            "doc_id",
            f"{_hash64_expr('tok')} as h_lo",
            "cast(conv(substr(md5(tok), 9, 8), 16, 10) as bigint) as h_hi",
        )
    )

    # All 64 bit-votes as parallel aggregates of ONE groupBy(doc_id) —
    # no 64x bit explode, no (doc_id, bit) shuffle; partial aggregation
    # combines map-side so the shuffle carries one 64-column row per doc.
    def vote(b: int):
        half, off = ("h_lo", b) if b < 32 else ("h_hi", b - 32)
        return F.sum(F.expr(f"(shiftright({half}, {off}) & 1) * 2 - 1"))

    votes = toks.groupBy("doc_id").agg(
        *[vote(b).alias(f"v{b}") for b in range(64)]
    )

    def band_expr(j: int) -> str:
        lo = j * width
        hi = 64 if j == bands - 1 else lo + width
        # bit 63 of a bigint is the sign bit: its two's-complement weight
        # is -2^63 (only reachable when bands == 1)
        weight = lambda s: -(1 << 63) if s == 63 else (1 << s)
        terms = " + ".join(
            f"if(v{b} > 0, cast({weight(b - lo)} as bigint), cast(0 as bigint))"
            for b in range(lo, hi)
        )
        return f"{j}, ({terms})"

    stack = ", ".join(band_expr(j) for j in range(bands))
    return votes.select(
        "doc_id",
        F.expr(f"stack({bands}, {stack}) as (band, band_val)"),
    )


def simhash_bands(documents: DataFrame, bands: int = 4) -> DataFrame:
    """64-bit SimHash band values — semantics identical to
    `simhash_bands_catalyst` (see its docstring for the banding layout
    and exactness contract); this is the r6 physical rewrite, pinned
    bit-exact against the catalyst plan in tests.

    SimHash is PER-DOCUMENT work (distinct token hashes, 64 majority
    votes, band packing — nothing crosses documents), but the Catalyst
    plan paid a corpus-wide token explode, a (doc_id, tok) distinct
    shuffle, and a 64-aggregate groupBy shuffle. The kernel computes
    the whole thing in numpy inside one mapInPandas over
    (doc_id, toks): per-doc distinct via np.unique, both md5-derived
    32-bit halves from the identical hashlib bytes, votes as vectorized
    bit tests, band packing as exact integer sums — ZERO exchanges.
    """
    width = 64 // bands
    spark = documents.sparkSession
    idt = dict(documents.dtypes)["doc_id"]
    n_par = spark.sparkContext.defaultParallelism
    t = documents.select("doc_id", tokens_col("text").alias("toks")).repartition(
        n_par
    )
    n_bands = int(bands)

    def gen(batches):
        from hashlib import md5

        import numpy as np
        import pandas as pd

        # two's-complement weight of signature bit s within its band
        # (bit 63 only lands at an in-band offset when bands == 1)
        w_lo = [
            np.array(
                [
                    -(1 << 63) if (b - j * width) == 63 else (1 << (b - j * width))
                    for b in range(
                        j * width, 64 if j == n_bands - 1 else (j + 1) * width
                    )
                    if b < 32
                ],
                np.int64,
            )
            for j in range(n_bands)
        ]
        w_hi = [
            np.array(
                [
                    -(1 << 63) if (b - j * width) == 63 else (1 << (b - j * width))
                    for b in range(
                        j * width, 64 if j == n_bands - 1 else (j + 1) * width
                    )
                    if b >= 32
                ],
                np.int64,
            )
            for j in range(n_bands)
        ]
        b_lo = [
            np.array(
                [
                    b
                    for b in range(
                        j * width, 64 if j == n_bands - 1 else (j + 1) * width
                    )
                    if b < 32
                ],
                np.int64,
            )
            for j in range(n_bands)
        ]
        b_hi = [
            np.array(
                [
                    b - 32
                    for b in range(
                        j * width, 64 if j == n_bands - 1 else (j + 1) * width
                    )
                    if b >= 32
                ],
                np.int64,
            )
            for j in range(n_bands)
        ]
        band_ids = np.arange(n_bands, dtype=np.int32)
        for pdf in batches:
            out_doc: list = []
            out_band: list = []
            out_val: list = []
            for doc_id, toks in zip(pdf["doc_id"].tolist(), pdf["toks"].tolist()):
                if toks is None or len(toks) == 0:
                    continue
                uniq = set(toks)
                nt = len(uniq)
                dig = np.frombuffer(
                    b"".join(md5(u.encode()).digest()[:8] for u in uniq),
                    dtype=">u4",
                ).reshape(nt, 2)
                h_lo = dig[:, 0].astype(np.int64)
                h_hi = dig[:, 1].astype(np.int64)
                vals = []
                for j in range(n_bands):
                    v = np.int64(0)
                    if len(b_lo[j]):
                        # votes: 2*set_count - n_tokens > 0 <=> v{b} > 0
                        setc = (
                            (h_lo[:, None] >> b_lo[j][None, :]) & 1
                        ).sum(axis=0)
                        v += (w_lo[j] * (2 * setc - nt > 0)).sum()
                    if len(b_hi[j]):
                        setc = (
                            (h_hi[:, None] >> b_hi[j][None, :]) & 1
                        ).sum(axis=0)
                        v += (w_hi[j] * (2 * setc - nt > 0)).sum()
                    vals.append(v)
                out_doc.extend([doc_id] * n_bands)
                out_band.extend(band_ids.tolist())
                out_val.extend(vals)
            if out_doc:
                yield pd.DataFrame(
                    {"doc_id": out_doc, "band": out_band, "band_val": out_val}
                )

    return t.mapInPandas(gen, schema=f"doc_id {idt}, band int, band_val bigint")


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs: hamming(sig_a, sig_b) <= max_hamming
    over 64-bit signatures.

    Scale path is the pigeonhole band blocking of Manku/Jain/Sarma
    (WWW'07, the Google simhash dedup paper): split the signature into
    max_hamming+1 bands — any pair within hamming distance max_hamming
    differs in at most max_hamming bands, so it agrees EXACTLY on at
    least one. Candidate generation is therefore an equi-join on
    (band, band_val), never an all-pairs product, and the verify step
    computes the exact hamming distance as sum(bit_count(xor)) over the
    pair's aligned bands. With 4 bands of 16 bits each key space is
    4 * 65536 buckets; at larger corpora widen the signature (more
    md5 chunks) before narrowing bands. Recall is EXACT (pigeonhole is
    a guarantee, not a probability), unlike MinHash-LSH.

    Output: (doc_a, doc_b, hamming bigint), doc_a < doc_b.
    """
    # r6 (guide §2.4): the plan references `bands` FOUR times (the
    # candidate self-join plus both verify joins, each on a different
    # key), and only the self-join's twin exchanges can be reused —
    # the signature pass was recomputed up to 3x. Materialize it once:
    # 4 slim rows per doc, far smaller than the token stream it is
    # derived from, so this is the classic cut-the-common-subtree
    # localCheckpoint (still fully inside this query's timed region).
    bands = simhash_bands(documents, bands=max_hamming + 1).localCheckpoint(
        eager=True
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return (
        cands.join(
            bands.selectExpr("doc_id as doc_a", "band", "band_val as ba"), "doc_a"
        )
        .join(
            bands.selectExpr("doc_id as doc_b", "band", "band_val as bb"),
            ["doc_b", "band"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.expr("sum(bit_count(ba ^ bb))").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def near_dup_canonical(
    documents: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    threshold: float = 0.5,
    n: int = 3,
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup canonicalization: one row per document with its duplicate
    cluster's canonical id — the standard corpus-dedup output (keep one
    representative per near-dup cluster, drop the rest).

    Composition of two existing scale paths: MinHash-LSH verified pairs
    (banded bucket equi-join, never all-pairs) are the edges of a
    near-dup graph; `canonicalize.connected_components` (salted min-label
    propagation, O(diameter) iterations) assigns each cluster its min
    doc_id as canonical. Documents with no near-dup edge are their own
    canonical. `is_kept` marks the representative, so the dedup filter
    downstream is `WHERE is_kept`.

    Output: (doc_id, canonical_id, is_kept) — one row per input doc.
    """
    from careers_spark.operators.canonicalize import connected_components

    pairs = lsh_verified_pairs(documents, num_hashes, band_size, threshold, n)
    comp = connected_components(
        pairs.select("doc_a", "doc_b"), src="doc_a", dst="doc_b",
        max_iter=max_iter,
    ).withColumnRenamed("node", "doc_id")
    canon = F.coalesce(F.col("component"), F.col("doc_id"))
    return (
        documents.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            canon.alias("canonical_id"),
            (F.col("doc_id") == canon).alias("is_kept"),
        )
    )


def contamination_flags(
    documents: DataFrame,
    eval_pred: str,
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-gram shingles overlap an eval/benchmark split.

    The standard pretraining hygiene step (GPT-3 appendix C / PaLM /
    Llama all ship a variant): any train document sharing too many
    n-grams with an evaluation set is excluded so benchmark numbers
    measure generalization, not memorization. `eval_pred` is a SQL
    predicate over the documents table selecting the eval split;
    everything else is the training split being screened.

    At 100 TB the eval split is tiny (benchmarks are ~1e5 docs), so its
    distinct-shingle set is broadcast — the screen is then a single
    map-side hash-join pass over the exploded train shingles with no
    shuffle on the (huge) train side, followed by a partial-agg-friendly
    per-doc count. No all-pairs anything.

    Output: (doc_id, n_shingles, n_shared, overlap_frac, contaminated)
    — one row per TRAIN document with >= n tokens.
    """
    sh = doc_shingles(documents, n)
    eval_ids = documents.filter(eval_pred).select("doc_id")
    eval_sh = (
        sh.join(F.broadcast(eval_ids), "doc_id", "left_semi")
        .select("sh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.join(F.broadcast(eval_ids), "doc_id", "left_anti")
    per = (
        train.join(F.broadcast(eval_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_shared"),
        )
    )
    frac = F.col("n_shared") / F.col("n_shingles")
    return per.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        F.round(frac, 6).alias("overlap_frac"),
        (frac >= threshold).alias("contaminated"),
    )


def dup_span_fraction(documents: DataFrame, n: int = 4) -> DataFrame:
    """Corpus-internal duplicated-span signal: per document, the fraction
    of its distinct word n-gram shingles that occur in at least one OTHER
    document.

    The cheap distributed stand-in for suffix-array substring dedup
    (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better"): a high fraction means the document is largely assembled
    from text that exists elsewhere in the corpus (boilerplate, mirrors,
    licenses), even when no single whole-document near-dup exists.

    Shape at scale: explode to (doc_id, shingle) — ~n x input tokens —
    then one partial-agg groupBy(shingle) for document counts and one
    shuffle-on-shingle join back; both partial-agg friendly, no
    quadratic step. Shingle-frequency skew ("the end of the" appears
    everywhere) is absorbed by map-side combine in the count and by AQE
    skew-split in the join.

    Output: (doc_id, n_shingles, n_dup, dup_frac) — one row per document
    with >= n tokens.
    """
    # r6 (guide §2.4): the shingle explode feeds both the count agg and
    # the join-back probe — materialize once
    sh = doc_shingles(documents, n).localCheckpoint(eager=True)
    counts = sh.groupBy("sh").agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        sh.join(counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup") / F.col("n_shingles"), 6)
        )
    )


def prefix_filter_jaccard_pairs(
    documents: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    n: int | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard >= t join via prefix filtering
    (Chaudhuri/Ganti/Kaushik ICDE'06; Bayardo/Ma/Srikant WWW'07 "all
    pairs") — the guaranteed-complete counterpart of the LSH and
    shared-shingle blocking paths: candidates come only from a join on
    PREFIX tokens, yet no qualifying pair can be missed.

    The filter: order every doc's distinct tokens by the global
    (df asc, token asc) rarity order and keep the first
    p = n - ceil(t*n) + 1 as its prefix. J(A,B) >= t implies
    |A∩B| >= ceil(t*max(|A|,|B|)), and two sets overlapping that much
    must share at least one PREFIX token (else each could exclude too
    few tokens) — so the (prefix-token) equi-join sees every qualifying
    pair, and rare-token-first ordering keeps the join fan-out minimal
    (the hottest tokens never enter prefixes of large sets).

    t is a RATIONAL num/den: prefix lengths and the verify predicate
    `den * inter >= num * (union)` are pure integer arithmetic — no
    float boundary can disagree between engines.

    Physical shape at scale: one token-count aggregation (vocabulary-
    sized), one per-doc window for rank positions, an equi-join on
    prefix tokens (bounded fan-out, never all-pairs; the plan test
    pins no CartesianProduct), and a candidate-bounded intersection
    count. A size filter (den*n_b >= num*n_a for n_a <= n_b) prunes
    length-incompatible candidates before the verify.

    With ``n`` set, the set elements are word n-gram shingles instead of
    tokens — the same verification semantics as jaccard_pairs /
    lsh_verified_pairs, making this the third candidate-generation
    strategy (prefix-exact vs shared-element vs LSH-probabilistic) over
    one near-dup definition.

    Output: (doc_a, doc_b, jaccard) for exact J >= num/den, doc_a < doc_b.
    """
    num, den = int(threshold_num), int(threshold_den)
    if n is None:
        tok = documents.select(
            "doc_id",
            F.explode(F.array_distinct(tokens_col("text"))).alias("tok"),
        )
    else:
        tok = doc_shingles(documents, n).withColumnRenamed("sh", "tok")
    # r6 (guide §2.4): `tok` feeds five plan branches (sizes, global
    # df, rank join, and both sides of the verify) — materialize once
    tok = tok.localCheckpoint(eager=True)
    size = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        tok.join(dfreq, "tok")
        .withColumn("pos", F.row_number().over(w))
        .join(size, "doc_id")
    )
    # p = n - ceil(t*n) + 1 with integer ceil: (num*n + den - 1) div den
    prefix = ranked.filter(
        F.expr(f"pos <= n_tok - ((({num}) * n_tok + {den} - 1) div {den}) + 1")
    ).select("doc_id", "tok", "n_tok")
    pa = prefix.selectExpr("doc_id as doc_a", "tok", "n_tok as n_a")
    pb = prefix.selectExpr("doc_id as doc_b", "tok", "n_tok as n_b")
    cand = (
        pa.join(pb, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # size filter: J >= t forces den*min >= num*max
        .filter(
            F.expr(
                f"{den} * least(n_a, n_b) >= {num} * greatest(n_a, n_b)"
            )
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    ta = tok.selectExpr("doc_id as doc_a", "tok")
    tb = tok.selectExpr("doc_id as doc_b", "tok")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.filter(
            F.expr(f"{den} * n_inter >= {num} * (n_a + n_b - n_inter)")
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "round(cast(n_inter as double) / (n_a + n_b - n_inter), 6)"
            ).alias("jaccard"),
        )
    )


def source_overlap_matrix(
    documents: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Inter-source duplication matrix: LSH-verified near-dup pairs
    rolled up by unordered source pair — the "which feeds mirror each
    other" diagnostic that decides source-level dedup order in a
    multi-feed corpus (mirror sites, syndication, re-crawls).

    Pure composition of two existing scale paths: the banded LSH
    candidate/verify join (never all-pairs) and two 1:1 doc_id joins
    against the dimension-sized (doc_id, source) projection, then one
    algebraic groupBy. src_a <= src_b so each unordered pair appears
    once.

    Output: (src_a, src_b, n_pairs) — near-dup pair count per source
    pair (diagonal = within-source duplication).
    """
    pairs = lsh_verified_pairs(documents, threshold=threshold, n=n)
    src = documents.select("doc_id", "source")
    return (
        pairs.join(src.selectExpr("doc_id as doc_a", "source as sa"), "doc_a")
        .join(src.selectExpr("doc_id as doc_b", "source as sb"), "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


def incremental_near_dups(
    documents: DataFrame,
    new_pred: str,
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Near-dups of NEW documents against the EXISTING corpus only —
    the "dedup this crawl against all previous crawls" step (CCNet
    dedups each snapshot against earlier ones; the same shape serves
    any append-only ingest).

    The shared-shingle blocking join is RESTRICTED to (new x old):
    old x old pairs — the quadratically dominant part a full re-dedup
    would recompute every ingest — are never generated, so per-ingest
    cost scales with the new slice, not the corpus. New x new pairs are
    also excluded (they belong to the batch-internal dedup pass,
    dedup.jaccard_pairs on the slice).

    Output: (new_doc, old_doc, jaccard) with jaccard >= threshold.
    """
    sh = doc_shingles(documents, n)
    # a NULL predicate result must not silently drop the doc from the
    # comparison universe — treat NULL as "existing" so it is still
    # dedup-checked (as the old side)
    is_new = documents.select(
        "doc_id",
        F.coalesce(F.expr(new_pred).cast("boolean"), F.lit(False)).alias("_new"),
    )
    tagged = sh.join(is_new, "doc_id")
    new_sh = tagged.filter("_new").select("doc_id", "sh")
    old_sh = tagged.filter("NOT _new").select("doc_id", "sh")
    size = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        new_sh.selectExpr("doc_id as new_doc", "sh")
        .join(old_sh.selectExpr("doc_id as old_doc", "sh"), "sh")
        .groupBy("new_doc", "old_doc")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(size.selectExpr("doc_id as new_doc", "n_sh as n_a"), "new_doc")
        .join(size.selectExpr("doc_id as old_doc", "n_sh as n_b"), "old_doc")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_doc", "old_doc", "jaccard")
    )


def minhash_calibration(
    documents: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    n: int = 3,
) -> DataFrame:
    """MinHash-estimate vs exact-Jaccard calibration over the LSH
    candidate pairs — the design diagnostic for choosing num_hashes /
    banding: E[fraction of agreeing minhashes] = J, so `est` should
    track `jaccard` within ~1/sqrt(num_hashes).

    Agreement counts are integers (signature equality per hash index);
    est = round(agree / num_hashes, 6) is one division. Candidates come
    from the banded join (never all-pairs) and the exact verify is the
    lsh_verified_pairs intersection shape.

    Output: (doc_a, doc_b, n_agree, est, jaccard, abs_err).
    """
    # one checkpointed shingle frame + one checkpointed signature frame
    # feed candidates, agreement, AND the exact verify — without this,
    # Spark lineage recomputes the shingle explode 3x and the 12-hash
    # aggregation 2x (code-review finding, r5)
    sh = doc_shingles(documents, n).localCheckpoint(eager=True)
    sigs = minhash_signatures(
        documents, num_hashes, n, sh=sh
    ).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(documents, num_hashes, band_size, n, sigs=sigs)
    agree = (
        cands.join(sigs.selectExpr("doc_id as doc_a", "h_idx", "minhash as ma"), "doc_a")
        .join(
            sigs.selectExpr("doc_id as doc_b", "h_idx", "minhash as mb"),
            ["doc_b", "h_idx"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.expr("case when ma = mb then 1 else 0 end")).alias("n_agree"))
    )
    size = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cands.join(sh.selectExpr("doc_id as doc_a", "sh"), "doc_a")
        .join(sh.selectExpr("doc_id as doc_b", "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        agree.join(inter, ["doc_a", "doc_b"], "left")
        .join(size.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
        .join(size.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            F.expr(f"round(n_agree / {int(num_hashes)}e0, 6)").alias("est"),
            F.expr(
                "round(coalesce(n_inter, 0) / cast(n_a + n_b - coalesce(n_inter, 0)"
                " as double), 6)"
            ).alias("jaccard"),
            F.expr(
                f"round(abs(n_agree / {int(num_hashes)}e0"
                " - coalesce(n_inter, 0) / cast(n_a + n_b - coalesce(n_inter, 0)"
                " as double)), 6)"
            ).alias("abs_err"),
        )
    )


def blocking_quality(
    documents: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    num_hashes: int = 12,
    band_size: int = 3,
    n: int = 3,
) -> DataFrame:
    """Blocking-quality metrics for the MinHash-LSH candidate
    generator — the two numbers every entity-resolution/dedup paper
    reports (Christen 2012):

      reduction_ratio   = 1 - |candidates| / |all pairs|   (work saved)
      pair_completeness = |true ∩ candidates| / |true|     (recall)

    "True" pairs are the exact shingle-Jaccard >= num/den set (the
    rational integer predicate — no float boundary). n_docs counts
    docs WITH at least one shingle (others can never pair). The output
    is ONE row of integers + two fixed single-division ratios, so the
    whole evaluation is oracle-checkable hash-exactly.

    Physical shape: the candidate count is the banded equi-join, the
    truth set the shared-shingle join (ground truth generation is the
    expensive exact path — this operator exists to certify the cheap
    one), and the intersection a broadcast-size semi-join.

    Output: (n_docs, n_all_pairs, n_candidates, n_true, n_found,
    reduction_ratio, pair_completeness).
    """
    num, den = int(threshold_num), int(threshold_den)
    sh = doc_shingles(documents, n).localCheckpoint(eager=True)
    size = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    cands = lsh_candidate_pairs(
        documents, num_hashes, band_size, n,
        sigs=minhash_signatures(documents, num_hashes, n, sh=sh),
    )
    inter = (
        sh.selectExpr("doc_id as doc_a", "sh")
        .join(sh.selectExpr("doc_id as doc_b", "sh"), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    true_pairs = (
        inter.join(size.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
        .join(size.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
        .filter(F.expr(f"{den} * n_inter >= {num} * (n_a + n_b - n_inter)"))
        .select("doc_a", "doc_b")
    )
    found = true_pairs.join(cands, ["doc_a", "doc_b"], "left_semi")
    counts = (
        size.agg(F.count("*").alias("n_docs"))
        .crossJoin(cands.agg(F.count("*").alias("n_candidates")))
        .crossJoin(true_pairs.agg(F.count("*").alias("n_true")))
        .crossJoin(found.agg(F.count("*").alias("n_found")))
    )
    return counts.select(
        "n_docs",
        F.expr("n_docs * (n_docs - 1) div 2").alias("n_all_pairs"),
        "n_candidates",
        "n_true",
        "n_found",
        F.expr(
            "round(1e0 - n_candidates / cast(n_docs * (n_docs - 1) div 2"
            " as double), 6)"
        ).alias("reduction_ratio"),
        F.expr(
            "round(case when n_true = 0 then 1e0"
            " else n_found / cast(n_true as double) end, 6)"
        ).alias("pair_completeness"),
    )


def fuzzy_name_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: str,
    max_dist: int = 3,
) -> DataFrame:
    """Blocked fuzzy string matching — the edit-distance verify stage of
    entity resolution (Magellan / Dedupe-style): candidate pairs come
    from an EQUI-join on a blocking key (never all-pairs), then
    ``levenshtein(name_a, name_b) <= max_dist`` keeps the matches.

    ``block_expr`` is a SQL expression over the input row producing the
    blocking key (e.g. a token, a phonetic code, an LSH bucket). The
    operator's recall is the blocking function's recall — standard ER;
    measure it with blocking_quality-style diagnostics if the key is
    heuristic.

    Scale: one shuffle on the block key; within-block pairing is
    quadratic in BLOCK size only, the same bound as every blocked
    similarity join here (LSH bands, shared shingles, prefix filter).
    Levenshtein runs JVM-side (Catalyst builtin) on candidates only.

    Output: (id_a, id_b, name_a, name_b, dist), id_a < id_b, integer
    dist — oracle-checkable exactly (both engines implement unit-cost
    edit distance).
    """
    side = df.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_nm"),
        F.expr(block_expr).alias("_blk"),
    ).filter(F.col("_blk").isNotNull())
    a = side.select(
        F.col("_id").alias("id_a"), F.col("_nm").alias("name_a"), "_blk"
    )
    b = side.select(
        F.col("_id").alias("id_b"), F.col("_nm").alias("name_b"), "_blk"
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= int(max_dist))
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def golden_records(
    documents: DataFrame,
    clusters: DataFrame | None = None,
    num_hashes: int = 12,
    band_size: int = 3,
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Entity-resolution survivorship: merge every near-dup cluster into
    ONE golden record with deterministic per-attribute survivorship
    rules — the step after `near_dup_canonical` that record-linkage
    systems call golden-record construction.

    Rules (all deterministic, all algebraic):
      - survivor_doc: the richest member — max n_chars, tie -> min
        doc_id — via one max(struct(n_chars, -doc_id)) aggregate;
      - lang_mode: most frequent lang in the cluster, tie -> smallest
        lang string — via min(struct(-cnt, lang)) over per-(cluster,
        lang) counts;
      - n_members / n_sources / total_chars: plain counts and sums.

    `clusters` (doc_id, canonical_id) may be injected for testing;
    by default it is `near_dup_canonical` over the same documents.

    Scale: two partial-agg groupBys on canonical_id plus the cluster
    chain itself — no window over the full corpus, no per-row Python.
    Singleton documents are their own golden record, so the output has
    one row per CLUSTER (including singletons).

    Output: (canonical_id, n_members, survivor_doc, n_sources,
    total_chars, lang_mode).
    """
    if clusters is None:
        clusters = near_dup_canonical(
            documents, num_hashes, band_size, threshold, n
        ).select("doc_id", "canonical_id")
    # r6 (guide §2.4): `m` feeds both the lang-mode and survivor aggs,
    # and it embeds the whole LSH+CC cluster chain — materialize the
    # slim join once instead of running that chain twice
    m = (
        documents.select("doc_id", "lang", "source", "n_chars")
        .join(clusters.select("doc_id", "canonical_id"), "doc_id")
        .localCheckpoint(eager=True)
    )
    lang_mode = (
        m.groupBy("canonical_id", "lang")
        .agg(F.count("*").alias("cnt"))
        .groupBy("canonical_id")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("lang"))
            ).alias("s")
        )
        .select("canonical_id", F.col("s.lang").alias("lang_mode"))
    )
    agg = (
        m.groupBy("canonical_id")
        .agg(
            F.count("*").alias("n_members"),
            F.max(
                F.struct(
                    F.col("n_chars").alias("nc"),
                    (-F.col("doc_id")).alias("neg_id"),
                )
            ).alias("sv"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            "canonical_id",
            "n_members",
            (-F.col("sv.neg_id")).cast("long").alias("survivor_doc"),
            "n_sources",
            "total_chars",
        )
    )
    return agg.join(lang_mode, "canonical_id")


def cluster_size_histogram(
    documents: DataFrame,
    clusters: DataFrame | None = None,
    num_hashes: int = 12,
    band_size: int = 3,
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Near-dup cluster-size histogram — the dedup diagnostic read
    before choosing a keep policy: how many clusters of each size, and
    how many documents they hold (n_docs = cluster_size * n_clusters;
    the size-1 row counts the untouched singletons).

    Two algebraic groupBys over the cluster labels; the heavy work is
    the cluster chain itself (shared with `near_dup_canonical`).

    Output: (cluster_size, n_clusters, n_docs).
    """
    if clusters is None:
        clusters = near_dup_canonical(
            documents, num_hashes, band_size, threshold, n
        ).select("doc_id", "canonical_id")
    return (
        clusters.groupBy("canonical_id")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def containment_pairs(
    documents: DataFrame, num: int = 9, den: int = 10, n: int = 3
) -> DataFrame:
    """Directed near-dup containment (Broder's containment coefficient
    C(A,B) = |A n B| / |A|): emits (contained, container) pairs where
    at least ``num/den`` of the contained document's distinct shingles
    appear in the container — the crawl-dedup case Jaccard MISSES (a
    short doc fully embedded in a long one has tiny Jaccard but
    containment 1.0).

    The threshold is a rational ``num/den`` compared by integer
    cross-multiplication (``n_inter * den >= num * n_contained``) — the
    prefix_filter_jaccard_pairs convention — so the keep decision is
    exact in both engines; the reported coefficient is one rounded
    division for display only.

    Physical shape: the shared-shingle equi-join IS the blocking (pairs
    with no common shingle never materialize), one partial-agg count
    per surviving pair, sizes joined from a doc-keyed dimension; both
    directions come from the same undirected intersection table.

    Output: (contained_id, container_id, n_inter, n_contained,
    containment).
    """
    num, den = int(num), int(den)
    # r6 (guide §2.4): one shingle explode for self-join + sizes
    sh = doc_shingles(documents, n).localCheckpoint(eager=True)
    size = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
        .join(size.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
        .join(size.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
    )
    d1 = inter.filter(
        F.col("n_inter") * den >= num * F.col("n_a")
    ).select(
        F.col("doc_a").alias("contained_id"),
        F.col("doc_b").alias("container_id"),
        "n_inter",
        F.col("n_a").alias("n_contained"),
    )
    d2 = inter.filter(
        F.col("n_inter") * den >= num * F.col("n_b")
    ).select(
        F.col("doc_b").alias("contained_id"),
        F.col("doc_a").alias("container_id"),
        "n_inter",
        F.col("n_b").alias("n_contained"),
    )
    return d1.union(d2).withColumn(
        "containment", F.round(F.col("n_inter") / F.col("n_contained"), 6)
    )


def reciprocal_best_pairs(
    documents: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    threshold: float = 0.2,
    n: int = 3,
) -> DataFrame:
    """Reciprocal best match over the LSH-verified near-dup graph: keep
    a pair only when EACH document is the other's single best match —
    the classic high-precision ER pairing rule (mutual nearest
    neighbor).

    Best match per document is one algebraic max(struct(jaccard,
    -other_id)) over the directed view of the verified pairs (ties:
    higher jaccard, then smaller id); mutuality is a self-join of the
    one-row-per-doc bests — never a second pass over the pair table.

    Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    pairs = lsh_verified_pairs(documents, num_hashes, band_size, threshold, n)
    directed = pairs.selectExpr(
        "doc_a as me", "doc_b as other", "jaccard"
    ).union(pairs.selectExpr("doc_b as me", "doc_a as other", "jaccard"))
    best = (
        directed.groupBy("me")
        .agg(
            F.max(
                F.struct(
                    F.col("jaccard").alias("j"), (-F.col("other")).alias("no")
                )
            ).alias("b")
        )
        .select(
            "me",
            (-F.col("b.no")).cast("long").alias("best_other"),
            F.col("b.j").alias("best_j"),
        )
    )
    b2 = best.selectExpr(
        "me as me2", "best_other as best_other2"
    )
    return (
        best.join(
            b2,
            (F.col("best_other") == F.col("me2"))
            & (F.col("best_other2") == F.col("me"))
            & (F.col("me") < F.col("me2")),
        )
        .select(
            F.col("me").alias("doc_a"),
            F.col("me2").alias("doc_b"),
            F.col("best_j").alias("jaccard"),
        )
    )


def winnowing_fingerprints_catalyst(
    documents: DataFrame, kgram: int = 5, window: int = 4
) -> DataFrame:
    """The original pure-Catalyst winnowing plan (posexplode + two
    per-document windows + distinct). Kept as the reference
    implementation `winnowing_fingerprints` (the kernel) is pinned
    bit-exact against in tests."""
    from pyspark.sql import Window

    t = documents.select(
        "doc_id", tokens_col("text").alias("toks")
    ).select("doc_id", F.expr(shingles_expr(kgram)).alias("gs"))
    sh = t.select(
        "doc_id", F.posexplode("gs").alias("pos", "g")
    ).select("doc_id", "pos", F.expr(_hash64_expr("g")).alias("h"))

    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, int(window) - 1)
    )
    wp = Window.partitionBy("doc_id")
    sel = (
        sh.withColumn(
            "m", F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(w)
        )
        .withColumn("nw", F.count("*").over(w))
        .withColumn("np_doc", F.count("*").over(wp))
        .filter(
            (F.col("nw") == int(window))
            | ((F.col("pos") == 0) & (F.col("np_doc") < int(window)))
        )
        .select(
            "doc_id",
            (-F.col("m.np")).cast("long").alias("pos"),
            F.col("m.h").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnowing_fingerprints(
    documents: DataFrame, kgram: int = 5, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every token k-gram, slide a
    window of `window` consecutive hashes, and select each window's
    minimum (rightmost occurrence on ties, the paper's rule). The
    selected set is a position-aware LOCAL fingerprint: any shared
    substring of length >= window + kgram - 1 tokens is GUARANTEED to
    share at least one fingerprint (the winnowing theorem) — the
    locality property MinHash lacks, which is why this is the standard
    plagiarism / benchmark-contamination detector.

    Exactness: hashes are the shared md5-32 integers (_hash64_expr
    bytes, reproduced by hashlib on the identical UTF-8 shingle text),
    window minima compare (hash, -pos) orderings — all integer,
    engine-identical, no rounding anywhere. Pinned bit-exact against
    `winnowing_fingerprints_catalyst` in tests.

    r6 physical rewrite (guide §2.4 + §4.2): winnowing is PER-DOCUMENT
    work, but the Catalyst plan paid a corpus-wide shuffle to window
    over the exploded shingles (every k-gram row moved once) plus a
    global distinct (every selected row moved again). The kernel keeps
    tokenization in Catalyst (bit-for-bit the same token arrays) and
    computes shingle hashes + sliding minima + the per-doc dedup in a
    numpy mapInPandas over (doc_id, toks) — ZERO exchanges end to end;
    selected sets are per-doc unique by construction, so the global
    distinct is a no-op the kernel performs locally. Documents shorter
    than one full window keep their global minimum (the
    degenerate-window rule), so every non-empty document fingerprints.

    Output: (doc_id, pos, fp) — distinct selected fingerprints with
    the 0-based k-gram position they were selected at.
    """
    kg = int(kgram)
    win = int(window)
    spark = documents.sparkSession
    idt = dict(documents.dtypes)["doc_id"]
    n_par = spark.sparkContext.defaultParallelism
    t = documents.select("doc_id", tokens_col("text").alias("toks")).repartition(
        n_par
    )

    def gen(batches):
        from hashlib import md5

        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            out_doc: list = []
            out_pos: list = []
            out_fp: list = []
            for doc_id, toks in zip(pdf["doc_id"].tolist(), pdf["toks"].tolist()):
                if toks is None:
                    continue
                ns = len(toks) - kg + 1
                if ns <= 0:
                    continue
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            md5(" ".join(toks[i : i + kg]).encode()).digest()[:4],
                            "big",
                        )
                        for i in range(ns)
                    ),
                    np.int64,
                    ns,
                )
                if ns < win:
                    # degenerate window: global min, rightmost tie
                    idx = np.array([ns - 1 - int(np.argmin(hs[::-1]))])
                else:
                    sw = sliding_window_view(hs, win)
                    # argmin on the reversed window = rightmost minimum
                    j = np.argmin(sw[:, ::-1], axis=1)
                    idx = np.unique(np.arange(ns - win + 1) + (win - 1 - j))
                out_doc.extend([doc_id] * len(idx))
                out_pos.extend(idx.tolist())
                out_fp.extend(hs[idx].tolist())
            if out_doc:
                yield pd.DataFrame(
                    {"doc_id": out_doc, "pos": out_pos, "fp": out_fp}
                )

    return t.mapInPandas(gen, schema=f"doc_id {idt}, pos long, fp bigint")


def winnowing_overlap_pairs(
    documents: DataFrame,
    kgram: int = 5,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing >= `min_shared` winnowing fingerprints —
    the contamination/plagiarism screen built on the locality
    guarantee: a shared run of window + kgram - 1 tokens ALWAYS
    surfaces here, so (unlike the probabilistic MinHash screen) a miss
    proves no such run exists.

    Blocking is the fingerprint itself: distinct (doc, fp) sets join
    on fp (bucketed equi-join, never all-pairs; hot fingerprints =
    boilerplate — cap or stoplist them upstream at corpus scale), then
    one partial-agg pair count. Output: (doc_id_a, doc_id_b, n_shared),
    a < b.
    """
    fps = winnowing_fingerprints(documents, kgram=kgram, window=window).select(
        "doc_id", "fp"
    ).distinct()
    a = fps.select(F.col("doc_id").alias("doc_id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


def pair_screen_eval(screen: DataFrame, exact: DataFrame) -> DataFrame:
    """Precision/recall of a near-dup SCREEN against exact ground
    truth — the dedup counterpart of similarity.recall_at_k, turning
    the "LSH banding misses some true pairs" caveat into a
    machine-checked number instead of a docstring claim.

    Both inputs carry (doc_a, doc_b) with doc_a < doc_b (the shared
    contract of lsh_verified_pairs / jaccard_pairs / simhash banding).
    For a verify-after-block screen, precision is 1.0 BY CONSTRUCTION
    (verified pairs re-check the exact predicate) — this operator
    proves that invariant on every run rather than assuming it; recall
    is the banding loss.

    Counts are integers from one equi-join and two single-row aggs;
    precision/recall are one rounded division each. Degenerate empty
    sides -> NULL, not 0/0.

    Output: one row (n_exact, n_screen, n_hit, precision, recall).
    """
    key = ["doc_a", "doc_b"]
    # r6 note: checkpointing both inputs here was A/B-measured and
    # REJECTED (5.0s vs 3.7s warm at sf0.1) — the double consumption
    # largely rides shared/reused exchanges, and two eager
    # materialization barriers cost more than the residual recompute.
    hit = screen.select(*key).join(exact.select(*key), key)
    agg = (
        screen.agg(F.count("*").alias("n_screen"))
        .crossJoin(exact.agg(F.count("*").alias("n_exact")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
    )
    return agg.select(
        "n_exact",
        "n_screen",
        "n_hit",
        F.when(F.col("n_screen") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n_hit") / (F.col("n_screen") * F.lit(1.0)), 6))
        .alias("precision"),
        F.when(F.col("n_exact") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n_hit") / (F.col("n_exact") * F.lit(1.0)), 6))
        .alias("recall"),
    )


# ---------------------------------------------------------------------------
def sorted_neighborhood_pairs(
    documents: DataFrame,
    window: int = 4,
    threshold: float = 0.2,
    n: int = 3,
    key_len: int = 16,
    block_len: int = 1,
) -> DataFrame:
    """Sorted-neighborhood ER blocking (Hernandez & Stolfo, SIGMOD'95)
    with exact n-gram-Jaccard verification — the fourth candidate
    strategy over the same near-dup semantics as shared-shingle,
    MinHash-LSH, and prefix filtering.

    Records sort by a normalized text-prefix key; candidates are pairs
    within `window` positions of each other in the sort order. This is
    the BLOCKED variant: the sort key's first `block_len` chars form a
    coarse block, ranks are per-block row_numbers (partition-local
    sorts — no global sort shuffle), and windows never span blocks.
    At larger scale, raise `block_len` so each block's partition-local
    sort stays in executor memory; the window semantics are unchanged.

    Unlike LSH banding (probabilistic) or prefix filtering (complete),
    sorted-neighborhood recall depends on the key bringing matches
    near each other — it is a blocking heuristic, which is why the
    output carries the exact verified jaccard and the family has
    lsh_blocking_quality-style evaluation available downstream.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard the
    exact n-gram Jaccard, filtered at `threshold`.
    """
    keyed = documents.select(
        "doc_id",
        F.expr(
            f"substr(regexp_replace(lower(text), '[^a-z0-9]+', ' '), 1, {int(key_len)})"
        ).alias("sn_key"),
    ).withColumn("block", F.expr(f"substr(sn_key, 1, {int(block_len)})"))
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("block").orderBy("sn_key", "doc_id")
    )
    ranked = keyed.select("doc_id", "block", rn.alias("rn"))
    a = ranked.selectExpr("doc_id as id_a", "block", "rn as rn_a")
    b = ranked.selectExpr("doc_id as id_b", "block as block_b", "rn as rn_b")
    cands = (
        a.join(
            b,
            (F.col("block") == F.col("block_b"))
            & (F.col("rn_b") > F.col("rn_a"))
            & (F.col("rn_b") < F.col("rn_a") + int(window)),
        )
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
        )
    )
    sh = doc_shingles(documents, n)
    size = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cands.join(sh.selectExpr("doc_id as doc_a", "sh"), "doc_a")
        .join(sh.selectExpr("doc_id as doc_b", "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(size.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
        .join(size.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def capture_recapture_dupes(
    pairs_a: DataFrame,
    pairs_b: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
) -> DataFrame:
    """Chapman capture-recapture estimate of the TOTAL near-duplicate
    population from two independent dedup screens (Chapman 1951; the
    mark-recapture estimator ecology uses for fish and corpus QA
    should use for dups): screen 1 "marks" n1 pairs, screen 2
    "recaptures" n2 of which m were already marked, so

        N_hat = (n1 + 1)(n2 + 1) / (m + 1) - 1

    estimates how many near-dup pairs EXIST — including the ones both
    screens missed — under screen-independence (stated assumption:
    LSH-Jaccard and SimHash-Hamming miss different pairs, which is why
    this pairing is informative; two runs of the same screen would
    violate it). The actionable read: N_hat minus the union count is
    the residual-dup estimate a curation team gates a release on.

    Chapman's +1 form is used over Lincoln-Petersen because it is
    unbiased for m >= 0 and never divides by zero. Counts come from
    ONE full-outer equi-join on the canonicalized pair key and one
    algebraic aggregate — n1, n2, m are exact BIGINTs; N_hat and the
    variance

        Var = (n1+1)(n2+1)(n1-m)(n2-m) / ((m+1)^2 (m+2))

    are single shared-text double expressions (one IEEE sqrt for the
    95% Wald interval, floored at 0 on the low side).

    Output: one row — (n_screen_a, n_screen_b, n_both, n_hat, se,
    lo95, hi95).
    """
    def canon(df):
        return df.select(
            F.least(F.col(a), F.col(b)).alias("x"),
            F.greatest(F.col(a), F.col(b)).alias("y"),
        ).distinct()

    p1 = canon(pairs_a).withColumn("in1", F.lit(1))
    p2 = canon(pairs_b).withColumn("in2", F.lit(1))
    j = p1.join(p2, ["x", "y"], "full").select(
        F.coalesce("in1", F.lit(0)).alias("in1"),
        F.coalesce("in2", F.lit(0)).alias("in2"),
    )
    agg = j.agg(
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).alias("m"),
    )
    nhat = "((n1 + 1e0) * (n2 + 1) / (m + 1) - 1)"
    var = (
        "((n1 + 1e0) * (n2 + 1) * (n1 - m) * (n2 - m)"
        " / ((m + 1e0) * (m + 1) * (m + 2)))"
    )
    return agg.select(
        F.col("n1").alias("n_screen_a"),
        F.col("n2").alias("n_screen_b"),
        F.col("m").alias("n_both"),
        F.expr(f"round({nhat}, 6)").alias("n_hat"),
        F.expr(f"round(sqrt({var}), 6)").alias("se"),
        F.expr(
            f"round(greatest({nhat} - 1.96e0 * sqrt({var}), 0e0), 6)"
        ).alias("lo95"),
        F.expr(f"round({nhat} + 1.96e0 * sqrt({var}), 6)").alias("hi95"),
    )
