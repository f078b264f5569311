"""Per-conversation coherence disambiguation + triple extraction.

The Spark re-expression of the reference's AmbiguityForest resolution
(reference: disambiguator/AmbiguityForest.scala:677-1091 and the
site/alternative builder Disambiguator.scala:105-208):

  - overlap *sites*: mentions whose token spans overlap are grouped
    (AmbiguityForest.scala:574-619);
  - *alternatives*: maximal non-overlapping segmentations of a site
    (AmbiguitySiteBuilder.buildSite, Disambiguator.scala:126-206);
  - candidate *support*: topic-topic compatibility through shared
    contexts (w1*w2) plus direct topic-as-context links
    (AmbiguityForest.scala:832-875), excluding same-site pairs (:783-784);
  - two-round resolve replaces the greedy prune loop (:912-981): round 1
    scores every candidate against every other mention's prior-weighted
    candidates, round 2 re-scores against round-1 winners only, then the
    best alternative per site wins by (token coverage, score) — the
    coverage tiebreak mirrors the reference's longest-match ordering
    (end desc, start asc sort at Disambiguator.scala:550-560);
  - predicates: the deterministic gap-token pattern rules
    (careers_spark.synth.PRED_PATTERNS) applied between adjacent resolved
    mentions in the same turn — the "dependency-pattern triple extraction
    in the same batched UDF pass" of the north star.

Runs as a cogrouped applyInPandas over (candidates, turns) keyed by
conv_id — the conversation IS the coherence window, so no cross-group
state exists and the stage parallelizes embarrassingly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from careers_spark.functions.text import tokenize_py
from careers_spark.synth import PRED_PATTERNS

RESOLVED_SCHEMA = (
    "conv_id string, turn_idx int, kind string, start int, end int, "
    "surface string, topic string, score double, pred string, obj string"
)

_EPS = 1e-6


def _build_sites(spans: list[tuple[int, int, int]]) -> list[list[int]]:
    """Group mention indices into overlap sites. spans: (turn, start, end)."""
    order = sorted(range(len(spans)), key=lambda i: (spans[i][0], spans[i][1], spans[i][2]))
    sites: list[list[int]] = []
    cur: list[int] = []
    cur_turn, cur_end = None, -1
    for i in order:
        t, s, e = spans[i]
        if cur and t == cur_turn and s <= cur_end:
            cur.append(i)
            cur_end = max(cur_end, e)
        else:
            if cur:
                sites.append(cur)
            cur = [i]
            cur_turn, cur_end = t, e
    if cur:
        sites.append(cur)
    return sites


def _alternatives(site: list[int], spans: list[tuple[int, int, int]]) -> list[list[int]]:
    """Enumerate maximal non-overlapping segmentations of one site
    (the gap-free alternative enumeration of Disambiguator.scala:126-206,
    golden-tested in the reference at testDisambiguator.scala:565-630)."""
    members = sorted(site, key=lambda i: (spans[i][1], -spans[i][2]))
    alts: list[list[int]] = []

    def rec(chosen: list[int], rest: list[int]) -> None:
        ext = [
            j
            for j in rest
            if not chosen or spans[j][1] > spans[chosen[-1]][2]
        ]
        if not ext:
            alts.append(list(chosen))
            return
        for j in ext:
            chosen.append(j)
            rec(chosen, [k for k in ext if spans[k][1] > spans[j][2] or k == j])
            chosen.pop()

    if len(members) > 12:
        # pathological site: greedy longest-match fallback keeps the
        # enumeration bounded (site sizes this large do not occur in the
        # reference's corpus either — maxNumberOfWords guard at
        # AmbiguityForest.scala:105)
        greedy: list[int] = []
        pos = -1
        for i in sorted(members, key=lambda i: (spans[i][1], -spans[i][2])):
            if spans[i][1] > pos:
                greedy.append(i)
                pos = spans[i][2]
        return [greedy]

    rec([], members)
    # dedupe
    uniq = {tuple(a) for a in alts}
    return [list(a) for a in sorted(uniq)]


def _sim(ctx_a: dict, ctx_b: dict, ta: str, tb: str) -> float:
    """Topic-topic compatibility: shared-context w*w plus direct
    topic-as-context links (AmbiguityForest.scala:832-875)."""
    if ta == tb:
        return 0.0
    small, big = (ctx_a, ctx_b) if len(ctx_a) <= len(ctx_b) else (ctx_b, ctx_a)
    s = 0.0
    for c, w in small.items():
        wb = big.get(c)
        if wb is not None:
            s += w * wb
    s += ctx_a.get(tb, 0.0)
    s += ctx_b.get(ta, 0.0)
    return s


def _resolve_conv_rows(
    conv_id: str,
    cand_rows: list[tuple],
    turn_rows: list[tuple],
    ctx_map: dict[str, dict],
) -> list[tuple]:
    """Resolve one conversation. cand_rows: (turn_idx, start, end, surface,
    topic, prior); turn_rows: (turn_idx, text). Plain-python rows — the
    pandas slicing per tiny conversation dominated the stage cost.

    Context vectors come from the broadcast ctx_map (dimension-sized,
    the analogue of the reference's in-RAM linkWeights arrays,
    Disambiguator.scala:219-227) — NOT from per-row shuffle payload.
    """
    out_rows: list[tuple] = []
    if not cand_rows:
        return out_rows

    # --- group candidate rows into mentions -------------------------------
    _EMPTY: dict = {}
    cand_rows = sorted(cand_rows)
    mkeys: list[tuple[int, int, int, str]] = []
    mcands: list[list[tuple[str, float, dict]]] = []
    midx: dict[tuple, int] = {}
    for t, s, e, surf, topic, prior in cand_rows:
        key = (t, s, e, surf)
        i = midx.get(key)
        if i is None:
            i = len(mkeys)
            midx[key] = i
            mkeys.append(key)
            mcands.append([])
        mcands[i].append((topic, float(prior), ctx_map.get(topic, _EMPTY)))

    spans = [(k[0], k[1], k[2]) for k in mkeys]
    sites = _build_sites(spans)
    site_of = {}
    for si, site in enumerate(sites):
        for i in site:
            site_of[i] = si

    n = len(mkeys)

    # topic-pair similarities repeat across mentions and rounds within a
    # conversation — memoize (symmetric: _sim's shared-context term and
    # both direct-link terms are order-independent)
    sim_cache: dict[tuple[str, str], float] = {}

    def csim(ta: str, ca: dict, tb: str, cb: dict) -> float:
        key = (ta, tb) if ta <= tb else (tb, ta)
        v = sim_cache.get(key)
        if v is None:
            v = _sim(ca, cb, ta, tb)
            sim_cache[key] = v
        return v

    # --- round 1: support against prior-weighted peers ---------------------
    def support(i: int, topic: str, ctx: dict, peers: list[tuple[int, str, float, dict]]) -> float:
        s = 0.0
        for j, tj, wj, cj in peers:
            if site_of[j] == site_of[i]:
                continue  # same-site exclusion (AmbiguityForest.scala:783-784)
            s += csim(topic, ctx, tj, cj) * wj
        return s

    peers_r1 = [
        (i, t, p, c)
        for i in range(n)
        for (t, p, c) in mcands[i]
    ]
    winners: list[tuple[str, float, dict]] = []
    for i in range(n):
        best = None
        for t, p, c in mcands[i]:
            sc = p * (_EPS + support(i, t, c, peers_r1))
            key = (sc, t)
            if best is None or sc > best[0] or (sc == best[0] and t < best[1]):
                best = (sc, t, p, c)
        winners.append((best[1], best[2], best[3]))

    # --- round 2: re-score against round-1 winners -------------------------
    peers_r2 = [(i, t, p, c) for i, (t, p, c) in enumerate(winners)]
    final: list[tuple[str, float]] = []
    for i in range(n):
        best = None
        for t, p, c in mcands[i]:
            sc = p * (_EPS + support(i, t, c, peers_r2))
            if best is None or sc > best[0] or (sc == best[0] and t < best[1]):
                best = (sc, t)
        final.append((best[1], best[0]))

    # --- pick best alternative per site (coverage, then score) ------------
    chosen: list[int] = []
    for site in sites:
        alts = _alternatives(site, spans)
        best_alt, best_key = None, None
        for alt in alts:
            coverage = sum(spans[i][2] - spans[i][1] + 1 for i in alt)
            score = sum(final[i][1] for i in alt)
            key = (coverage, score, tuple(alt))
            if best_key is None or key > best_key:
                best_key, best_alt = key, alt
        chosen.extend(best_alt)

    chosen.sort(key=lambda i: (spans[i][0], spans[i][1]))
    for i in chosen:
        t, s, e, surf = mkeys[i]
        topic, score = final[i]
        out_rows.append((conv_id, t, "link", s, e, surf, topic, score, None, None))

    # --- triple extraction over adjacent resolved mentions ----------------
    toks_by_turn = {ti: tokenize_py(tx) for ti, tx in turn_rows}
    by_turn: dict[int, list[int]] = {}
    for i in chosen:
        by_turn.setdefault(spans[i][0], []).append(i)
    for turn, idxs in by_turn.items():
        toks = toks_by_turn.get(turn, [])
        idxs.sort(key=lambda i: spans[i][1])
        for a, b in zip(idxs, idxs[1:]):
            gap = " ".join(toks[spans[a][2] + 1 : spans[b][1]])
            pred = PRED_PATTERNS.get(gap)
            if pred is not None:
                out_rows.append(
                    (
                        conv_id, turn, "triple",
                        spans[a][1], spans[b][2], mkeys[a][3],
                        final[a][0], final[a][1], pred, final[b][0],
                    )
                )
    return out_rows


def _rows_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        rows,
        columns=[
            "conv_id", "turn_idx", "kind", "start", "end",
            "surface", "topic", "score", "pred", "obj",
        ],
    )
    for c in ("turn_idx", "start", "end"):
        pdf[c] = pdf[c].astype("int32")
    pdf["score"] = pdf["score"].astype("float64")
    return pdf


def resolve(
    candidates: DataFrame,
    transcripts: DataFrame,
    context_vectors,  # DataFrame (topic, ctx_ids, ctx_ws) or prebuilt dict
    n_buckets: int | None = None,
) -> DataFrame:
    """Cogrouped per-conversation resolution, bucket-batched.

    candidates: output of linking.attach_candidates — slim rows only
        (conv_id, turn_idx, start, end, surface, topic, prior); context
        vectors ride a BROADCAST, not the shuffle (carrying 30-element
        arrays per candidate row multiplied shuffle volume ~10x and made
        this stage I/O-bound).
    transcripts: (conv_id, turn_idx, text) — needed for gap tokens
    context_vectors: (topic, ctx_ids, ctx_ws) dimension table
    Returns the unified link/triple frame (RESOLVED_SCHEMA).

    Conversations are independent, so they are grouped into hash buckets
    and one pandas group carries many conversations — this amortizes the
    per-group Arrow/Python round-trip that dominates at small group
    sizes (same motivation as the reference loading its model once per
    task, not once per record). n_buckets should be a few times the
    core count but small enough that a bucket's conversations fit in
    worker memory; default 16x shuffle partitions.
    """
    from pyspark.sql import functions as F

    spark = candidates.sparkSession
    if n_buckets is None:
        n_buckets = 16 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    if isinstance(context_vectors, dict):
        ctx_map = context_vectors
    else:
        ctx_map = {
            r.topic: dict(zip(list(r.ctx_ids), list(r.ctx_ws)))
            for r in context_vectors.select("topic", "ctx_ids", "ctx_ws").collect()
        }
    ctx_bc = spark.sparkContext.broadcast(ctx_map)

    bucket = lambda df: df.withColumn(  # noqa: E731
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    )

    def fn(cand_pdf: pd.DataFrame, turns_pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = ctx_bc.value
        turns_by_conv: dict[str, list[tuple]] = {}
        for c, ti, tx in zip(
            turns_pdf["conv_id"].tolist(),
            turns_pdf["turn_idx"].tolist(),
            turns_pdf["text"].tolist(),
        ):
            turns_by_conv.setdefault(c, []).append((int(ti), tx))
        cands_by_conv: dict[str, list[tuple]] = {}
        for c, t, s, e, surf, topic, prior in zip(
            cand_pdf["conv_id"].tolist(),
            cand_pdf["turn_idx"].tolist(),
            cand_pdf["start"].tolist(),
            cand_pdf["end"].tolist(),
            cand_pdf["surface"].tolist(),
            cand_pdf["topic"].tolist(),
            cand_pdf["prior"].tolist(),
        ):
            cands_by_conv.setdefault(c, []).append(
                (int(t), int(s), int(e), surf, topic, prior)
            )
        rows: list[tuple] = []
        for conv_id in sorted(cands_by_conv):
            rows.extend(
                _resolve_conv_rows(
                    conv_id,
                    cands_by_conv[conv_id],
                    turns_by_conv.get(conv_id, []),
                    ctx,
                )
            )
        return _rows_to_pdf(rows)

    return (
        bucket(candidates.select(
            "conv_id", "turn_idx", "start", "end", "surface", "topic", "prior"
        ))
        .groupby("bucket")
        .cogroup(
            bucket(transcripts.select("conv_id", "turn_idx", "text")).groupby("bucket")
        )
        .applyInPandas(fn, schema=RESOLVED_SCHEMA)
    )


def links_of(resolved: DataFrame) -> DataFrame:
    return resolved.filter("kind = 'link'").select(
        "conv_id", "turn_idx", "start", "end", "surface", "topic", "score"
    )


def triples_of(resolved: DataFrame) -> DataFrame:
    return resolved.filter("kind = 'triple'").selectExpr(
        "conv_id", "turn_idx", "topic as subj", "pred", "obj"
    )
