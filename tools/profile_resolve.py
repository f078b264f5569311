"""Dev profiling: measure python-side compute seconds inside the resolve
UDF at two parallelism levels (writes /tmp/rtimes_{n}.txt per run)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402

from careers_spark.operators import coherence as CO  # noqa: E402
from careers_spark.session import get_spark  # noqa: E402

out = open("/tmp/resolve_scale.txt", "w")

for cpus in (8, 32):
    spark = get_spark(
        f"rp{cpus}",
        cpus=cpus,
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    cand = spark.read.parquet("/tmp/kg_scale_run_8/candidates")
    turns = spark.read.parquet("/tmp/kg_scale_run_8/transcripts").select(
        "conv_id", "turn_idx", "text"
    )
    ctx = spark.read.parquet("/tmp/kg_scale_dict/dict_context_vectors")

    # monkeypatch fn wrapper to time python work per conversation
    orig_resolve = CO._resolve_conv
    tfile = f"/tmp/rtimes_{cpus}.txt"
    open(tfile, "w").close()

    import careers_spark.operators.coherence as comod

    def timed(*args, _o=orig_resolve, **kw):
        import os
        t0 = time.perf_counter()
        r = _o(*args, **kw)
        with open(tfile, "a") as f:
            f.write(f"{os.getpid()} {time.perf_counter() - t0}\n")
        return r

    comod._resolve_conv = timed
    t0 = time.monotonic()
    n = CO.resolve(cand, turns, ctx).count()
    wall = time.monotonic() - t0
    comod._resolve_conv = orig_resolve
    print(f"cpus={cpus} wall={wall:.1f}s rows={n}", file=out, flush=True)
    spark.stop()
out.close()
