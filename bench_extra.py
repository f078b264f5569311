"""Per-query isolation bench (guide §1.4): times a NAMED subset of
declared queries with the noop sink, splitting CONSTRUCTION (driver
work + any eager localCheckpoint/collect loops inside the builder)
from EXECUTION (the final plan's run), and optionally dumping
`.explain("formatted")` to plans/r06/.

Usage:
    python bench_extra.py q1 q2 ...            # time them
    PLANS=1 python bench_extra.py q1 ...       # also dump plans
    REPS=3 python bench_extra.py q1 ...        # median-of-N execution

This file is NOT the driver bench (bench.py is frozen); its numbers
are cited in OPTIMIZATION_r06.md as isolation evidence only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "1"))
PLANS = os.environ.get("PLANS", "")


def main() -> None:
    import __spark_entry__ as entrymod
    from careers_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark(
        "bench_extra",
        cpus=CPUS,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/kgbench_extra_local",
        },
    )
    # same warmup as bench.py so numbers are comparable
    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4, numPartitions=n * 4).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = entrymod.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{name}: construct")
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        t_con = time.monotonic() - t0
        execs = []
        for r in range(max(1, REPS)):
            spark.sparkContext.setJobDescription(f"{name}: exec{r}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            execs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "construct_s": round(t_con, 3),
            "exec_s": execs,
            "total_first_s": round(t_con + execs[0], 3),
        }
        if PLANS:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_probe.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
