"""Fold the round-final exec runs (/tmp/kg_final_{E}_r{R}.json +
/tmp/kg_exectime_final_{E}_r{R}.txt) into the best-file format
write_scaling_report.py consumes (/tmp/kg_execscale_best_<convs>_<E>.json)."""

import json
import re
import sys

CONVS = sys.argv[1] if len(sys.argv) > 1 else "4000000"
LEVELS = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [1, 4])]
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2


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


for e in LEVELS:
    runs = []
    for r in range(1, REPS + 1):
        j = json.load(open(f"/tmp/kg_final_{e}_r{r}.json"))
        j["cpu_s"] = cpu_s(f"/tmp/kg_exectime_final_{e}_r{r}.txt")
        runs.append(j)
    best = min(runs, key=lambda j: j["wall_s"])
    best["all_walls_s"] = [j["wall_s"] for j in runs]
    best["all_cpu_s"] = [j["cpu_s"] for j in runs]
    best["executors"] = e
    json.dump(best, open(f"/tmp/kg_execscale_best_{CONVS}_{e}.json", "w"))
    print(
        f"E={e} best={best['wall_s']}s of {best['all_walls_s']} "
        f"cpu={best['all_cpu_s']}"
    )
