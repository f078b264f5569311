"""The long-conversation synth profile (r5) is part of the benchmark
evidence chain (BENCH/BASELINE.md "Dense-resolver study"), so its
contracts are pinned here:

  - deterministic at any parallelism (RNG keyed on conv_idx);
  - lengths follow the turn cycle;
  - candidate-row volume actually reaches the dense-resolver regime;
  - the pipeline's triple P/R on it is exact.
"""

import pytest
from pyspark.sql import functions as F

from careers_spark import synth
from careers_spark.plans.pipeline import KGPipeline

N_CONVS = 4  # one of each LONG_TURN_CYCLE length


@pytest.fixture(scope="module")
def long_corpus(spark):
    kb = synth.build_kb(8)
    t = synth.gen_long_transcripts(spark, kb, N_CONVS).localCheckpoint(
        eager=True
    )
    return kb, t


def test_lengths_follow_turn_cycle(spark, long_corpus):
    _, t = long_corpus
    lens = {
        r.conv_id: r.n
        for r in t.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    want = {
        f"lconv{i:08d}": synth.LONG_TURN_CYCLE[i % len(synth.LONG_TURN_CYCLE)]
        for i in range(N_CONVS)
    }
    assert lens == want


def test_deterministic_across_parallelism(spark, long_corpus):
    kb, t = long_corpus
    t2 = synth.gen_long_transcripts(spark, kb, N_CONVS, parallelism=2)
    assert t.exceptAll(t2).isEmpty()
    assert t2.exceptAll(t).isEmpty()


def test_pipeline_pr_exact_and_dense_regime(spark, long_corpus, tmp_path):
    kb, t = long_corpus
    run = KGPipeline(spark, str(tmp_path / "w")).run(
        t, synth.kb_tables(spark, kb)
    )
    got = run.outputs["triples"].select(
        "conv_id", "subj", "pred", "obj"
    ).distinct()
    exp = synth.gen_long_expected_triples(spark, kb, N_CONVS).select(
        "conv_id", "subj", "pred", "obj"
    ).distinct()
    assert got.exceptAll(exp).isEmpty()  # precision 1.0
    assert exp.exceptAll(got).isEmpty()  # recall 1.0
    # the corpus must actually reach the dense-resolver regime: every
    # conversation above the 64-row threshold, and at least one above
    # the 3000-row window cap (exercising _conv_windows)
    cand_rows = [
        r.n
        for r in run.outputs["candidates"]
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert min(cand_rows) >= 64
    assert max(cand_rows) > 3000
