#!/bin/bash
# Executor-count scaling evidence — the faithful proxy for the north
# rule's "N and 4N executors": spark-submit --master local-cluster[E,2,2048]
# launches E REAL separate executor JVMs (own heap, GC, python workers,
# netty shuffle) of a fixed 2-core shape on this host, and only the
# executor count scales. This avoids the one-fat-JVM artifact of
# local[N] threading (GC + allocator contention grow with threads, which
# models a bigger single executor, not more executors).
# DECLARED headline pair: 1 -> 4 executors (the minimal faithful
# executor scaling on one box; higher counts saturate the host's single
# memory subsystem, which real clusters do not share — both pairs are
# reported). The identical job/input/dict as
# tools/scaling_bench.sh; best-of-REPEATS per level.
set -euo pipefail
cd "$(dirname "$0")/.."

CONVS="${KG_SCALE_CONVS:-2000000}"
DOMAINS="${KG_SCALE_DOMAINS:-0}"   # 0 = synth default (n_convs/50); set
                                   # explicitly to hold the dictionary
                                   # FIXED across corpus sizes
REPEATS="${KG_SCALE_REPEATS:-2}"
LEVELS="${KG_EXEC_LEVELS:-1 4 2 8}"
BASE="${KG_SCALE_BASE:-/dev/shm/kg_scale}"
mkdir -p "$BASE"
INPUT="$BASE/input"
DICT="$BASE/dict"
ZIP=/tmp/careers_spark.zip

if [ ! -d "$INPUT/transcripts" ] || [ "${FORCE_PREP:-0}" = "1" ]; then
  rm -rf "$INPUT" "$DICT"
  python tools/prep_bench_corpus.py --n-convs "$CONVS" --n-domains "$DOMAINS" --out "$INPUT"
fi

rm -f "$ZIP"; zip -qr "$ZIP" careers_spark

if [ ! -f "$DICT/model.pkl" ]; then
  spark-submit --master "local[32]" \
    --conf spark.sql.shuffle.partitions=64 \
    --conf spark.driver.memory=6g \
    --conf spark.local.dir="$BASE/spark-local" \
    --py-files "$ZIP" \
    run_pipeline.py --input "$INPUT" --work-dir "$BASE/dictbuild" \
    --dict-cache "$DICT" --dict-only 2>/dev/null | tail -1
fi

for E in $LEVELS; do
  for R in $(seq 1 "$REPEATS"); do
    rm -rf "$BASE/run_e$E"
    uptime
    # bash builtin `time` aggregates user+sys over the reaped process
    # tree (driver JVM + executor JVMs + python workers) — the
    # CPU-seconds evidence for the memory-bandwidth decomposition:
    # equal work at higher core counts burning MORE CPU-seconds is
    # contention, not serialization
    TLOG="/tmp/kg_exectime_${CONVS}_${E}_r${R}.txt"
    { time spark-submit --master "local-cluster[$E,2,2048]" \
      --conf spark.sql.shuffle.partitions=$((4 * E)) \
      --conf spark.driver.memory=4g \
      --conf spark.local.dir="$BASE/spark-local" \
      --py-files "$ZIP" \
      run_pipeline.py --input "$INPUT" --work-dir "$BASE/run_e$E" \
      --dict-cache "$DICT" --skip-pr \
      --json-out "/tmp/kg_execscale_${CONVS}_${E}_r${R}.json" 2>/dev/null | tail -1 ; } 2> "$TLOG"
    cat "$TLOG"
  done
  python - "$E" "$REPEATS" "$CONVS" <<'PY'
import json, re, sys
e, reps, convs = sys.argv[1], int(sys.argv[2]), sys.argv[3]

def cpu_s(path):
    try:
        txt = open(path).read()
        tot = 0.0
        for kind in ("user", "sys"):
            m = re.search(rf"{kind}\s+(\d+)m([\d.]+)s", txt)
            if m:
                tot += int(m.group(1)) * 60 + float(m.group(2))
        return round(tot, 1)
    except OSError:
        return None

runs = []
for r in range(1, reps + 1):
    j = json.load(open(f"/tmp/kg_execscale_{convs}_{e}_r{r}.json"))
    j["cpu_s"] = cpu_s(f"/tmp/kg_exectime_{convs}_{e}_r{r}.txt")
    runs.append(j)
best = min(runs, key=lambda j: j["wall_s"])
best["all_walls_s"] = [j["wall_s"] for j in runs]
best["all_cpu_s"] = [j["cpu_s"] for j in runs]
best["executors"] = int(e)
json.dump(best, open(f"/tmp/kg_execscale_best_{convs}_{e}.json", "w"))
print(f"local-cluster[{e},2] best={best['wall_s']}s of {best['all_walls_s']} cpu_s={best['all_cpu_s']}")
PY
done
