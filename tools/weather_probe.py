"""Fixed host-weather probe for bench hygiene.

This VM carries co-tenant steal that loadavg does not show (the other
tenant's cycles never appear in this guest's run queue). Every bench
number in BENCH/ is interpreted against a probe of the host's
capability taken at measurement time; this file pins the probe so
rounds compare like with like instead of re-inventing ad-hoc loops with
different baselines.

Two probes, because the regimes are INDEPENDENT (measured r5 session
4): a window can be single-thread quiet (1.1-1.3 s) while 24-way
parallel throughput is 4-5x degraded — a co-tenant occupying
many-but-not-all cores leaves one thread unharmed but collapses
local[32] benches (kg_pipeline read 51-93 s against its 21-24 s quiet
band in exactly such a window, with the single-thread probe reading
"quiet" before, during, and after).

1. Single-thread: 20,000,000 integer multiply-accumulate iterations,
   best of 3 (the minimum is the least-stolen sample).
2. Wide: 24 concurrent processes of the same loop; `wide_ratio` =
   24-way wall / single best. On a free 32-vCPU host the loops run
   fully parallel and the ratio is ~1.0-1.5; it degrades linearly with
   the number of stolen cores (observed 4.3-5.0 in the degraded-wide
   window).

Reference points on this host (python 3.11):
  single quiet    : ~1.1-1.5 s      degraded: 1.9-2.6   heavy: >2.6
  wide quiet      : ratio <= 2      degraded-wide: >= 3 (discard
                    local[32] benches; single-thread-bound phases are
                    still comparable)

Usage: python tools/weather_probe.py  ->  one JSON line
  {"probe_s": ..., "samples": [...], "wide_s": ..., "wide_ratio": ...,
   "regime": "quiet|degraded|heavy", "wide_regime": "quiet|degraded"}
Run it immediately before and after any bench; record both values next
to the bench artifact. A bench is representative only if BOTH regimes
read quiet.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

_LOOP = "t=0\nfor i in range(20000000): t=(t*31+i)&0xffffffff\n"


def probe_once(n: int = 20_000_000) -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(n):
        x += i * i
    return round(time.monotonic() - t0, 3)


def wide_probe(n_procs: int = 24) -> float:
    t0 = time.monotonic()
    ps = [
        subprocess.Popen([sys.executable, "-c", _LOOP])
        for _ in range(n_procs)
    ]
    for p in ps:
        p.wait()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    samples = [probe_once() for _ in range(3)]
    best = min(samples)
    wide = wide_probe()
    ratio = round(wide / best, 2)
    regime = "quiet" if best < 1.7 else ("degraded" if best < 2.6 else "heavy")
    wide_regime = "quiet" if ratio <= 2.0 else "degraded"
    print(
        json.dumps(
            {
                "probe_s": best,
                "samples": samples,
                "wide_s": wide,
                "wide_ratio": ratio,
                "regime": regime,
                "wide_regime": wide_regime,
            }
        )
    )


if __name__ == "__main__":
    main()
