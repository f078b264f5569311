"""Text retrieval scoring: BM25 top-k over the documents table.

The Okapi BM25 ranking function (Robertson & Walker; the Lucene
`BM25Similarity` variant whose idf is ln(1 + (N - df + 0.5)/(df + 0.5)),
always positive):

    score(d, Q) = sum_{t in Q} idf(t) * tf * (k1 + 1)
                                / (tf + k1 * (1 - b + b * dl/avgdl))

This is the standard lexical-retrieval primitive a corpus engine pairs
with the ANN operators (similarity.py) for hybrid search.

Engine-exactness (why the DuckDB oracle hash-matches with no
tolerance):

- every aggregate feeding a double is an INTEGER (tf, df, dl, N,
  sum(dl)) — addition order can't perturb them;
- each per-(doc, term) contribution is then ONE scalar double
  expression evaluated once, identical text in both engines (k1/b
  literals carry e0 so neither engine lifts them to DECIMAL; both
  libm lns are correctly rounded — pinned cross-engine by the tfidf /
  PMI oracles);
- the per-doc score sums the per-term contributions in FIXED QUERY
  ORDER (an explicit c1 + c2 + ... chain over pivoted conditional
  aggregates, the distinct_sketch recipe), never a double `sum()`
  aggregate, and is rounded BEFORE the rank order-by so the
  (score desc, doc_id asc) tie-break is engine-identical.

Physical shape at scale: the token explode filters to the query's
terms IMMEDIATELY (a pushed-down isin over the exploded column —
candidate set shrinks to docs containing >= 1 query term); df/idf is a
query-terms-sized broadcast; avgdl/N a broadcast 1-row aggregate; and
the global top-k is orderBy(...).limit(k), which Spark executes as
TakeOrdered (per-partition partial top-k + driver merge of k-row
heads) — NOT a full sort shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from careers_spark.operators.dedup import _hash64_expr, tokens_col

K1 = "1.2e0"
B = "0.75e0"


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 for a fixed bag of query terms.

    Output: (doc_id, score, rank) — rank 1..k by (score desc, doc_id).
    """
    toks = documents.select("doc_id", tokens_col("text").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("dl_sum")
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "c",
            F.expr(
                f"ln(1e0 + (n_docs - df + 0.5e0) / (df + 0.5e0))"
                f" * tf * ({K1} + 1e0)"
                f" / (tf + {K1} * (1e0 - {B} + {B} * dl / (dl_sum / cast(n_docs as double))))"
            ),
        )
    )
    # fixed-order pivot sum: one conditional max per query term (a
    # (doc, term) contribution is unique), chained c1 + c2 + ... so both
    # engines add the identical doubles in the identical order
    pivots = [
        F.max(F.when(F.col("term") == t, F.col("c"))).alias(f"_c{i}")
        for i, t in enumerate(query_terms)
    ]
    chain = " + ".join(f"coalesce(_c{i}, 0e0)" for i in range(len(query_terms)))
    scored = (
        contrib.groupBy("doc_id")
        .agg(*pivots)
        .withColumn("score", F.expr(f"round({chain}, 6)"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def ql_dirichlet_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mu: int = 2000,
) -> DataFrame:
    """Top-k documents by query-likelihood with Dirichlet smoothing
    (Zhai & Lafferty 2001) — the language-modeling retrieval family
    beside BM25's probabilistic one:

        score(d, Q) = sum_{t in Q} ln((tf_td + mu * cf_t / |C|)
                                      / (dl_d + mu))

    Candidate docs are those containing >= 1 query term (the inverted-
    index contract BM25 uses here too), but UNLIKE BM25 an absent term
    still contributes its smoothing-only mass ln(mu*p(t|C)/(dl+mu)),
    so candidates expand to the full candidate x query-term grid via a
    broadcast of the (query-terms-sized) collection-frequency table,
    with tf coalesced to 0. Query terms absent from the corpus are
    dropped (their smoothed probability is 0 -> ln undefined; the
    standard drop, and they would shift every doc equally anyway
    modulo dl).

    Engine exactness (the bm25_topk recipe): tf/cf/dl/|C| are
    integers; each per-(doc, term) contribution is ONE double
    expression with identical text both engines (mu carries e0); the
    per-doc score is a FIXED-QUERY-ORDER coalesce chain, rounded
    before the (score desc, doc_id) rank.

    Physical shape at scale: explode filters to query terms
    immediately; cf and |C| are broadcast; the grid is |candidates| x
    |Q| rows; top-k is TakeOrdered, never a full sort.

    Output: (doc_id, score, rank).
    """
    m = int(mu)
    toks = documents.select("doc_id", tokens_col("text").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    total = dl.agg(F.sum("dl").cast("long").alias("tok_total"))
    hits = toks.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(query_terms)
    )
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    cf = hits.groupBy("term").agg(F.count("*").alias("cf"))
    cand = tf.select("doc_id").distinct()
    grid = (
        cand.crossJoin(F.broadcast(cf))
        .join(tf, ["doc_id", "term"], "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "c",
            F.expr(
                f"ln((coalesce(tf, 0) + {m}e0 * cf / tok_total)"
                f" / (dl + {m}e0))"
            ),
        )
    )
    pivots = [
        F.max(F.when(F.col("term") == t, F.col("c"))).alias(f"_c{i}")
        for i, t in enumerate(query_terms)
    ]
    chain = " + ".join(
        f"coalesce(_c{i}, 0e0)" for i in range(len(query_terms))
    )
    scored = (
        grid.groupBy("doc_id")
        .agg(*pivots)
        .withColumn("score", F.expr(f"round({chain}, 6)"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k_const: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    ranked retrieval lists — the standard hybrid-search combiner for a
    lexical (BM25) list and a dense (embedding ANN) list:

        rrf(d) = sum_i 1 / (k_const + rank_i(d))

    with a document absent from list i contributing 0 from it.

    Each input must carry (doc_id, rank). The fusion is a chain of
    full-outer joins over lists that are ALREADY top-k truncated (a few
    dozen rows per query) — at scale this join is a per-query
    driver-free merge of k-row heads, trivially broadcastable; all the
    heavy lifting happened inside the upstream retrieval operators.

    Engine exactness: every term is 1/(k_const + rank) with an INTEGER
    denominator, the per-doc score is an explicit fixed-order
    t0 + t1 + ... chain (the bm25/distinct_sketch recipe, never a
    double sum aggregate), rounded to 9 before the final rank.

    Output: (doc_id, score, rank) — rank 1..k by (score desc, doc_id).
    """
    from pyspark.sql import Window

    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    fused = None
    for i, df in enumerate(ranked):
        cur = df.select("doc_id", F.col("rank").alias(f"_r{i}"))
        fused = cur if fused is None else fused.join(cur, "doc_id", "full_outer")
    chain = " + ".join(
        f"coalesce(1e0 / ({int(k_const)} + _r{i}), 0e0)" for i in range(len(ranked))
    )
    scored = fused.withColumn("score", F.expr(f"round({chain}, 9)"))
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def trigram_substring_search(
    documents: DataFrame,
    query: str,
) -> DataFrame:
    """Substring search through a character-trigram index (the pg_trgm
    strategy): a document can contain `query` only if it contains ALL of
    query's character trigrams, so candidates come from trigram-posting
    intersection and only they pay the exact verify — never a full-text
    contains() scan over the corpus.

    Pipeline: explode each doc's distinct lowercase char trigrams,
    filter IMMEDIATELY to the query's trigram set (an isin over a
    handful of literals — Catalyst pushes it into the generator's
    consumer, so non-matching trigrams never reach the aggregation),
    keep docs whose distinct-match count equals the query's trigram
    count, then verify with one contains()/locate() per CANDIDATE.
    Recall is a theorem (substring => all its trigrams present), the
    verify step removes trigram-collision false positives, and the
    oracle states the ground truth directly as a corpus-wide contains()
    — the hash match machine-proves the pruning is lossless.

    At index scale the (trigram, doc) postings are materialized once
    and reused per query; this operator inlines the build to stay
    self-contained.

    `query` must be lowercase and >= 3 chars (trigram pruning needs at
    least one trigram).

    Output: (doc_id, first_pos) — 1-based position of the first match.
    """
    q = query.lower()
    if len(q) < 3:
        raise ValueError("trigram search needs a query of >= 3 chars")
    # the query is interpolated into SQL string literals in BOTH engines,
    # whose escape rules differ (Spark honors backslash escapes, DuckDB
    # does not) — restrict to characters that are literal in both rather
    # than attempting double-dialect escaping
    if not re.fullmatch(r"[a-z0-9 .,+_-]+", q):
        raise ValueError(
            "query may contain only [a-z0-9 .,+_-] (got %r)" % query
        )
    trigrams = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    tg_list = ", ".join("'" + t.replace("'", "''") + "'" for t in trigrams)
    doc_tg = documents.select(
        "doc_id",
        # guard: sequence(1, 0) is DESCENDING in Spark, not empty —
        # texts shorter than 3 chars yield an empty trigram array
        F.explode(
            F.expr(
                "case when length(lower(text)) >= 3 then"
                " array_distinct(transform(sequence(1, length(lower(text)) - 2),"
                " i -> substring(lower(text), i, 3)))"
                " else array() end"
            )
        ).alias("tg"),
    ).filter(F.expr(f"tg in ({tg_list})"))
    cand = (
        doc_tg.groupBy("doc_id")
        .agg(F.countDistinct("tg").alias("n_hit"))
        .filter(F.col("n_hit") == len(trigrams))
        .select("doc_id")
    )
    lit = q.replace("'", "''")
    return (
        documents.join(cand, "doc_id", "left_semi")
        .withColumn("first_pos", F.expr(f"locate('{lit}', lower(text))"))
        .filter(F.col("first_pos") > 0)
        .select("doc_id", F.col("first_pos").cast("bigint").alias("first_pos"))
    )


def mmr_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_cands: int = 20,
    lam: float = 0.7,
    lam_comp: float = 0.3,
    query_pred: str = "vec_id % 50 = 0",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick k results per query maximizing

        mmr(c) = lam * rel(c) - lam_comp * max_{s in selected} sim(c, s)

    (first pick is argmax of lam * rel alone). The diversity-aware
    re-rank layered over ANN/BM25 retrieval — near-duplicate hits are
    penalized by their similarity to already-selected results.

    `lam_comp` is passed explicitly rather than computed as 1 - lam:
    the oracle writes both as SQL literals, and `1 - 0.7` in IEEE
    doubles is NOT the double `0.3` — the caller keeps the pair in
    sync with the literals.

    Engine-exactness: candidate relevance and pairwise candidate sims
    are both JVM-side index-order folds rounded to 6dp (the
    embedding_topk convention), so both engines see identical doubles;
    the greedy loop then only evaluates `lam*rel - lam_comp*maxsim`
    (same two multiplies and subtract as the oracle's SQL text) and
    rounds to 9dp via decimal HALF_UP — the same rule as Spark/DuckDB
    `round()` on doubles. Selection order is (score desc, id asc).

    Physical shape at scale: per-query work is n_cands^2 pairwise sims
    (the inherent MMR cost) computed as one self-equi-join on query_id
    over the candidate table — never over the corpus — and the greedy
    selection runs per-query-group in ONE applyInPandas pass,
    vectorized across queries. State per group is O(n_cands^2), bounded
    and tiny; no driver-side loop, no per-row Python UDF.

    Output: (query_id, pick_rank, neighbor_id, mmr_score).
    """
    import pandas as pd

    from careers_spark.operators.similarity import (
        _dot,
        _norm,
        brute_force_topk,
    )

    cand = brute_force_topk(
        embeddings, k=n_cands, query_pred=query_pred
    ).select("query_id", "neighbor_id", F.col("sim").alias("rel"))
    vecs = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v")
    )
    cv = cand.join(vecs, "neighbor_id")
    a = cv.select(
        "query_id",
        F.col("neighbor_id").alias("ca"),
        F.col("rel").alias("rel_a"),
        F.col("v").alias("va"),
    )
    b = cv.select(
        "query_id",
        F.col("neighbor_id").alias("cb"),
        F.col("v").alias("vb"),
    )
    pw = (
        a.join(b, "query_id")
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "query_id",
            "ca",
            "rel_a",
            "cb",
            F.round(
                F.expr(_dot("va", "vb"))
                / (F.expr(_norm("va")) * F.expr(_norm("vb"))),
                6,
            ).alias("s"),
        )
    )

    kk, ll, lc = int(k), float(lam), float(lam_comp)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        def r9(x: float) -> float:
            return float(
                Decimal(x).quantize(Decimal("1E-9"), rounding=ROUND_HALF_UP)
            )

        qid = pdf["query_id"].iloc[0]
        rel = dict(zip(pdf["ca"], pdf["rel_a"]))
        sim = dict(zip(zip(pdf["ca"], pdf["cb"]), pdf["s"]))
        selected: list[int] = []
        out = []
        while len(selected) < kk and len(selected) < len(rel):
            best = None
            for c, r in rel.items():
                if c in selected:
                    continue
                if selected:
                    ms = max(sim[(c, s_)] for s_ in selected)
                    score = r9(ll * r - lc * ms)
                else:
                    score = r9(ll * r)
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            selected.append(best[1])
            out.append((qid, len(selected), best[1], best[2]))
        return pd.DataFrame(
            out, columns=["query_id", "pick_rank", "neighbor_id", "mmr_score"]
        )

    return pw.groupBy("query_id").applyInPandas(
        _greedy,
        "query_id long, pick_rank int, neighbor_id long, mmr_score double",
    )


def rocchio_expansion(
    documents: DataFrame,
    query_terms: list[str],
    fb_k: int = 3,
    expand_n: int = 5,
) -> DataFrame:
    """Rocchio pseudo-relevance feedback (the classic query-expansion
    step, Rocchio 1971 / standard PRF): take the BM25 top-`fb_k` docs
    as pseudo-relevant, score every term they contain (minus the
    original query terms) by the summed tf x smoothed-idf centroid
    weight, and emit the top-`expand_n` expansion terms — the terms a
    second-round query would add.

    Exactness: idf uses the tfidf convention ln((N+1)/(df+1)) + 1 with
    corpus-wide df, quantized ONCE per term to the 1e-9 fixed-point
    lattice (the unigram_logloss recipe), so the sum over feedback
    docs is an exact integer at any parallelism; the final score is
    one closing division rounded to 6.

    Shapes: BM25 feedback is TakeOrdered-k; the expansion works on the
    feedback docs' terms only (fb_k documents' vocabulary — bounded),
    joined to the corpus-wide df table (partial-agg, vocabulary-
    sized); final top-n is again TakeOrdered. Nothing corpus-scale
    beyond the df aggregation BM25 already needs.

    Output: (term, n_fb_docs, score, rank).
    """
    fb = bm25_topk(documents, query_terms, k=fb_k).select("doc_id")
    toks = documents.select("doc_id", tokens_col("text").alias("toks"))
    tf_all = toks.select(
        "doc_id", F.explode("toks").alias("term")
    ).groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf_all.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.count()

    cand = (
        tf_all.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("term").isin(query_terms))
        .join(F.broadcast(dfreq), "term")
        .withColumn(
            "_c",
            F.expr(
                f"tf * cast(round((ln(({int(n_docs)} + 1e0) / (df + 1e0))"
                " + 1e0) * 1000000000e0, 0) as bigint)"
            ),
        )
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("n_fb_docs"),
            F.sum("_c").alias("_fp"),
        )
        .withColumn("score", F.expr("round(_fp / 1000000000e0, 6)"))
    )
    top = cand.orderBy(F.desc("score"), F.asc("term")).limit(int(expand_n))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term", "n_fb_docs", "score", F.col("rank").cast("int").alias("rank")
    )


def term_postings(
    documents: DataFrame,
    min_df: int = 2,
    block_size: int = 128,
) -> DataFrame:
    """Inverted-index construction — the materialized search index
    behind bm25_topk/ql_dirichlet_topk's on-the-fly scoring: per term,
    BLOCKED postings lists of (doc_id:tf) entries in ascending doc_id
    order, plus the term's df. Blocking (block_size docs per posting
    block, the Lucene skip-block shape) is what makes the row width
    bounded at ANY term frequency: a stopword-grade term with 10^8
    postings becomes 10^8/block_size rows, not one giant array.

    Determinism: postings serialize as a 'doc:tf doc:tf ...' string
    in doc_id order — integer content, explicit order, no
    struct-rendering differences between engines. The block id comes
    from a per-TERM row_number (partition-local sort — the standard
    index-build shuffle; never global).

    Output: (term, df, block_id, n_docs_in_block, postings).
    """
    from pyspark.sql import Window

    tf = (
        documents.select(
            "doc_id", F.explode(tokens_col("text")).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") >= int(min_df)
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    blocked = (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn(
            "block_id",
            F.expr(f"(row_number() over (partition by term order by doc_id)"
                   f" - 1) div {int(block_size)}"),
        )
    )
    return (
        blocked.groupBy("term", "df", "block_id")
        .agg(
            F.count("*").alias("n_docs_in_block"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "tf"))
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s["doc_id"].cast("string"),
                        s["tf"].cast("string"),
                    ),
                ),
                " ",
            ).alias("postings"),
        )
    )


def phrase_search(
    documents: DataFrame,
    phrase: list[str],
    text: str = "text",
) -> DataFrame:
    """Exact phrase query over a positional index — the capability a
    positional inverted index exists for (Lucene PhraseQuery /
    Postgres tsquery '<->'): find every document where the phrase's
    tokens occur CONTIGUOUSLY, with the occurrence count and first
    position.

    Plan shape: posexplode the token stream once, keep ONLY the
    phrase's terms (a semi-filter that shrinks the postings to the
    query vocabulary before any shuffle), then align by position
    arithmetic — an occurrence starting at p needs term i at p + i,
    so the k-term phrase is k-1 EQUI-joins on (doc_id, start), never
    an inequality or a window. Duplicate terms inside the phrase are
    handled naturally (each offset filters independently).

    At corpus scale each join side is |postings(term_i)|, so the cost
    is bounded by the rarest-term posting lists exactly like a real
    positional index probe; candidates are exact by construction (the
    oracle is the ground-truth contiguous-sublist scan, so the hash
    match machine-proves the join plan finds every occurrence and
    nothing else).

    Output: (doc_id, n_matches, first_pos), 0-based positions.
    """
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one token")
    toks = [t.lower() for t in phrase]
    pos = documents.select(
        "doc_id",
        F.posexplode(tokens_col(text)).alias("pos", "tok"),
    ).filter(F.col("tok").isin(toks))
    starts = (
        pos.filter(F.col("tok") == toks[0])
        .select("doc_id", F.col("pos").alias("start"))
    )
    for i, t in enumerate(toks[1:], start=1):
        nxt = pos.filter(F.col("tok") == t).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        starts = starts.join(nxt, ["doc_id", "start"])
    return starts.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"),
        F.min("start").alias("first_pos"),
    )


def spell_suggest(
    documents: DataFrame,
    queries: list[str],
    max_dist: int = 2,
    top_n: int = 3,
    text: str = "text",
) -> DataFrame:
    """Vocabulary-backed spelling suggestion — the did-you-mean step
    in front of bm25/phrase search: for each query term, the top
    corpus-vocabulary words within ``max_dist`` edits, ranked by
    (distance, -frequency, word).

    Blocking is LENGTH-banded and purely equi-join: each query
    explodes to its 2*max_dist+1 admissible candidate lengths and
    joins the vocabulary on length — no inequality join, no cross
    join; |length(a)-length(b)| <= levenshtein(a,b) guarantees the
    band loses nothing (the prefix_jaccard lossless-blocking
    argument). levenshtein() is unit-cost edit distance in both
    engines (the fuzzy_part_match precedent), so the oracle is exact.
    The rank window partitions per query over a candidate set bounded
    by the banded vocabulary slice.

    Output: (query, suggestion, dist, freq, rk).
    """
    vocab = (
        documents.select(F.explode(tokens_col(text)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn("wl", F.length("w"))
    )
    qs = ",".join("'" + q.lower().replace("'", "") + "'" for q in queries)
    spark = documents.sparkSession
    qdf = (
        spark.range(1)
        .select(F.explode(F.expr(f"array({qs})")).alias("query"))
        .select(
            "query",
            F.explode(
                F.expr(
                    f"sequence(length(query) - {int(max_dist)},"
                    f" length(query) + {int(max_dist)})"
                )
            ).alias("wl"),
        )
        .filter(F.col("wl") >= 1)
    )
    cand = (
        qdf.join(vocab, "wl")
        .withColumn("dist", F.expr("levenshtein(query, w)"))
        .filter(F.col("dist") <= int(max_dist))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query").orderBy(
        F.asc("dist"), F.desc("freq"), F.asc("w")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(top_n))
        .select(
            "query",
            F.col("w").alias("suggestion"),
            F.col("dist").cast("int").alias("dist"),
            "freq",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def late_interaction_maxsim(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    dims: int = 16,
    salt: str = "li0",
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia,
    SIGIR 2020): score(q, d) = sum over query tokens t of
    MAX over document tokens x of sim(v_t, v_x) — the MaxSim operator
    that makes late interaction different from both bag-of-words
    (bm25_topk: no token-token geometry) and single-vector ANN
    (similarity.*: one pooled embedding per doc). Each query token
    independently finds its best-matching document token; the doc is
    rewarded for covering ALL query facets.

    Token "embeddings" are the deterministic hashing-trick stand-in
    this environment's no-model contract allows (documented exactly
    like the multimodal decode stub): token v gets a ``dims``-bit sign
    mask from the shared md5 family, and the +-1-vector dot product is
    PURE INTEGER algebra

        dot(t, x) = dims - 2 * bit_count(mask_t XOR mask_x)

    — no floats anywhere in the score, so the oracle is exact with no
    rounding recipe at all. Swapping a real encoder in means replacing
    the mask expression with a vector column and the XOR-popcount with
    a dot product; the MaxSim plan shape is the contribution.

    Physical shape: distinct (doc, token) pairs fan out ONLY against
    the |Q|-row broadcast query (the bm25 explode profile, corpus
    touched once); per-(doc, term) MaxSim is an algebraic max
    (map-side combinable), the per-doc score a fixed-query-order sum
    of pivoted conditional aggregates (the bm25 recipe — never a
    float sum), and the final top-k a bounded TakeOrdered with
    (score desc, doc_id) ties. No window over corpus-sized input, no
    cross join wider than |Q|.

    Output: (rank, doc_id, score) — k rows, score an exact BIGINT.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if not 1 <= int(dims) <= 32:
        raise ValueError("dims must be in [1, 32]")
    from pyspark.sql import Window

    mask = (2 ** int(dims)) - 1

    def _mask_expr(col: str) -> str:
        return (
            f"({_hash64_expr(f'concat({col}, {chr(39)}|{salt}{chr(39)})')}"
            f" & {mask})"
        )

    toks = (
        documents.select(
            "doc_id", F.explode(tokens_col("text")).alias("tok")
        )
        .distinct()
        .withColumn("xmask", F.expr(_mask_expr("tok")))
    )
    qdf = documents.sparkSession.createDataFrame(
        [(t,) for t in query_terms], "term string"
    ).withColumn("tmask", F.expr(_mask_expr("term")))
    scored = (
        toks.crossJoin(F.broadcast(qdf))
        .withColumn(
            "dot",
            F.lit(int(dims))
            - 2 * F.expr("bit_count(xmask ^ tmask)").cast("long"),
        )
        .groupBy("doc_id", "term")
        .agg(F.max("dot").alias("maxsim"))
    )
    # fixed-query-order sum over pivoted conditional aggregates (the
    # bm25 recipe) — integer-exact anyway, but keeps the plan shape
    # identical to the rest of the retrieval family
    per_doc = scored.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(F.col("term") == F.lit(t), F.col("maxsim"))
            ).alias(f"_c{i}")
            for i, t in enumerate(query_terms)
        ]
    )
    score = None
    for i in range(len(query_terms)):
        c = F.coalesce(F.col(f"_c{i}"), F.lit(-int(dims)))
        score = c if score is None else score + c
    ranked = per_doc.select(
        "doc_id", score.cast("long").alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("rank", "doc_id", "score")
    )
