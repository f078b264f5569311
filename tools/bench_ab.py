"""Same-session A/B re-baseline of the driver bench (r4 verdict #2).

BENCH_r04's totals were not comparable to r3 because bench.py's timer
changed (construction+count vs count-only) in the same round as a host
with documented ±25% co-tenant drift. This tool removes both
confounders: ONE Spark session, the exact bench.py query list, and for
every query a single measurement decomposed into

    construct_s  — query construction (where iterative operators do
                   their localCheckpoint work)
    count_s      — the terminal .count() (all a count-only timer sees)
    full_s       — construct_s + count_s (what bench.py reports)

run for PASSES passes back-to-back, plus the kg pipeline best-of-N in
the same session. The construct/count split shows exactly how much of
each query the old count-only timer hid; the pass-to-pass delta bounds
same-host drift without any cross-session environment confound.

Usage: python tools/bench_ab.py [out.json]   (env knobs as bench.py)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_CONVS = int(os.environ.get("KG_BENCH_CONVS", "100000"))
PASSES = int(os.environ.get("BENCH_AB_PASSES", "2"))
KG_REPEATS = int(os.environ.get("BENCH_AB_KG_REPEATS", "2"))


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from careers_spark import synth
    from careers_spark.plans.pipeline import KGPipeline
    from careers_spark.session import get_spark

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    spark = get_spark(
        "bench_ab",
        cpus=CPUS,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": os.path.join(scratch, "kgbench_spark_local"),
        },
    )
    qs = entrymod.queries()

    passes: list[dict] = []
    for p in range(PASSES):
        tab: dict[str, dict] = {}
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            t1 = time.monotonic()
            df.count()
            t2 = time.monotonic()
            tab[name] = {
                "construct_s": round(t1 - t0, 3),
                "count_s": round(t2 - t1, 3),
                "full_s": round(t2 - t0, 3),
            }
        passes.append(tab)

    # kg pipeline, best-of-N in the same session (fresh work dir per
    # repeat so no stage resumes)
    kb = synth.build_kb(max(8, KG_CONVS // 50))
    tmp = tempfile.mkdtemp(prefix="kgbench_ab_", dir=scratch)
    kg_walls = []
    try:
        synth.gen_transcripts(spark, kb, KG_CONVS).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/transcripts")
        transcripts = spark.read.parquet(f"{tmp}/transcripts")
        n_turns = transcripts.count()
        raw = synth.kb_tables(spark, kb)
        for rep in range(KG_REPEATS):
            pipe = KGPipeline(spark, f"{tmp}/work{rep}")
            drun = pipe.run_dictionary(raw)
            t0 = time.monotonic()
            run = pipe.run_corpus(transcripts, drun.outputs)
            kg_walls.append(round(time.monotonic() - t0, 2))
            n_triples = next(
                s.rows for s in run.stages if s.name == "triples"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "sf": SF_DIR,
        "cpus": CPUS,
        "passes": passes,
        "kg": {
            "n_convs": KG_CONVS,
            "n_turns": n_turns,
            "n_triples": n_triples,
            "walls_s": kg_walls,
            "best_wall_s": min(kg_walls),
            "turns_per_sec_best": round(n_turns / min(kg_walls), 1),
        },
    }
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_ab.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": dest, "kg_walls": kg_walls}))
    spark.stop()


if __name__ == "__main__":
    main()
