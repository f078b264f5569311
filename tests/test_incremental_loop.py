"""End-to-end incremental run — the WebCVProcess polling-loop analogue
(reference: applications/WebCVProcess.scala:300-333) driven as two
Structured-Streaming micro-batches over stream_kg_incremental:

  - batch 2 must touch ONLY conv_ids fresh in batch 2 (the freshness
    gate = the reference's max-id cursor, :215-219);
  - the union of both batches' resolved triples must be IDENTICAL to a
    cold batch run over the full corpus;
  - the union of both batches' incremental matches must equal the cold
    all-pairs digest similarity at the same threshold (new x all +
    old x new over two polls covers every unordered pair exactly once).
"""

import pytest

from careers_spark import synth
from careers_spark.operators import coherence as CO
from careers_spark.operators import dictionary as D
from careers_spark.operators import linking as L
from careers_spark.operators import mentions as M
from careers_spark.operators.digests import digest_similarity, document_digests
from careers_spark.streaming import ingest

N_CONVS = 24
MIN_SIM = 0.1


@pytest.fixture(scope="module")
def corpus(spark):
    kb = synth.build_kb(8)
    built = D.build_dictionary(synth.kb_tables(spark, kb))
    sf = built["surface_forms"].localCheckpoint(eager=True)
    ctx = built["context_vectors"]
    transcripts = synth.gen_transcripts(spark, kb, N_CONVS).localCheckpoint(
        eager=True
    )
    ac = M.build_automaton(sf)
    return sf, ctx, transcripts, ac


def test_two_batch_incremental_equals_cold_run(spark, corpus, tmp_path):
    from pyspark.sql import functions as F

    sf, ctx, transcripts, ac = corpus
    convs = sorted(r.conv_id for r in transcripts.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    def poll(batch_no, frame):
        frame.write.mode("append").parquet(in_dir)
        q = ingest.stream_kg_incremental(
            spark,
            in_dir,
            out_dir,
            str(tmp_path / "ckpt"),
            ac,
            sf,
            ctx,
            once=True,
            min_similarity=MIN_SIM,
        )
        q.awaitTermination(300)

    # poll 1: first half; poll 2: full corpus re-delivered (the second
    # half is fresh, the first half must be gated away)
    poll(1, transcripts.filter(F.col("conv_id").isin(list(half))))
    poll(2, transcripts)

    # -- the gate: batch 2 processed only fresh conv_ids -------------------
    processed = spark.read.parquet(f"{out_dir}/processed").collect()
    by_epoch: dict[int, set] = {}
    for r in processed:
        by_epoch.setdefault(r.epoch, set()).add(r.conv_id)
    assert len(processed) == len(convs)  # each conversation exactly once
    epochs = sorted(by_epoch)
    assert len(epochs) == 2
    assert by_epoch[epochs[0]] == half
    assert by_epoch[epochs[1]] == set(convs) - half

    # -- resolved triples identical to a cold batch run --------------------
    cands = L.attach_candidates(M.detect_mentions(spark, transcripts, ac), sf)
    cold = CO.resolve(cands, transcripts, ctx)
    inc = spark.read.parquet(f"{out_dir}/resolved")
    cols = cold.columns
    assert inc.select(cols).exceptAll(cold).isEmpty()
    assert cold.exceptAll(inc.select(cols)).isEmpty()

    # -- matches identical to the cold all-pairs digest similarity ---------
    dg_store = spark.read.parquet(f"{out_dir}/digests")
    id_of = {
        r.conv_id: r.vec_id
        for r in dg_store.select("conv_id", "vec_id").distinct().collect()
    }
    assert len(id_of) == len(set(id_of.values()))  # vec ids unique
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.similarity
        for r in spark.read.parquet(f"{out_dir}/matches").collect()
    }
    cold_dg = document_digests(CO.links_of(cold))
    want = {}
    for r in digest_similarity(cold_dg, min_similarity=MIN_SIM).collect():
        a, b = id_of[r.conv_a], id_of[r.conv_b]
        want[(min(a, b), max(a, b))] = r.similarity
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_replay_is_idempotent(spark, corpus, tmp_path):
    """Exactly-once: replaying a batch from ANY partially-written state
    (the streaming checkpoint replays a failed batch whole) converges to
    the same store contents — per-epoch overwrite writes + gate-written-
    last + epoch-excluding reads (r4 ADVICE medium)."""
    import shutil

    from pyspark.sql import functions as F

    sf, ctx, transcripts, ac = corpus
    convs = sorted(
        r.conv_id for r in transcripts.select("conv_id").distinct().collect()
    )
    half = set(convs[: len(convs) // 2])
    out_dir = str(tmp_path / "out")
    sink = ingest.make_incremental_sink(
        spark, out_dir, ac, sf, ctx, min_similarity=MIN_SIM
    )
    b1 = transcripts.filter(F.col("conv_id").isin(list(half)))
    b2 = transcripts  # full corpus re-delivered; second half is fresh

    def snapshot():
        return {
            store: sorted(
                spark.read.parquet(f"{out_dir}/{store}").collect(), key=repr
            )
            for store in ("resolved", "digests", "matches", "processed")
        }

    sink(b1, 0)
    sink(b2, 1)
    want = snapshot()
    assert want["resolved"]  # non-trivial corpus

    # full replay of the last epoch: byte-identical, no duplicates
    sink(b2, 1)
    assert snapshot() == want

    # crash AFTER the data writes but BEFORE the gate write: the replay
    # must not be gated away by a stale registry (none exists) and must
    # overwrite, not duplicate, the epoch's data rows
    shutil.rmtree(f"{out_dir}/processed/epoch=1")
    sink(b2, 1)
    assert snapshot() == want

    # crash after the resolved write only — the r4 ADVICE scenario that
    # used to permanently lose the batch's digests and matches: replay
    # must restore them with the SAME vec_ids (prev_max excludes the
    # replayed epoch) and leave resolved duplicate-free
    for store in ("digests", "matches", "processed"):
        shutil.rmtree(f"{out_dir}/{store}/epoch=1")
    sink(b2, 1)
    assert snapshot() == want


def test_zero_hit_batch_does_not_poison_stores(spark, corpus, tmp_path):
    """A batch whose conversations contain no dictionary hits must flow
    through (registry written, no data rows) and must NOT leave the
    stores unreadable for later batches: empty outputs are skipped, so
    no epoch dir holds only a _SUCCESS marker, and an all-empty store
    reads as 'no data yet' rather than a schema-inference error."""
    from pyspark.sql import functions as F

    sf, ctx, transcripts, ac = corpus
    out_dir = str(tmp_path / "out")
    sink = ingest.make_incremental_sink(
        spark, out_dir, ac, sf, ctx, min_similarity=MIN_SIM
    )
    # batch 0: same schema, filler-only text -> zero mentions
    blank = transcripts.limit(40).withColumn(
        "text", F.lit("nothing relevant here at all")
    ).localCheckpoint(eager=True)
    sink(blank, 0)
    processed = spark.read.parquet(f"{out_dir}/processed")
    assert processed.filter("epoch = 0").count() > 0
    import os

    assert not os.path.exists(f"{out_dir}/resolved")  # skipped, not empty-written

    # batch 1: real content must process normally on top of the
    # all-empty data stores
    sink(transcripts, 1)
    assert spark.read.parquet(f"{out_dir}/resolved").count() > 0
    assert spark.read.parquet(f"{out_dir}/digests").count() > 0
