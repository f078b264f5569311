"""Fixed host-weather probe for bench hygiene.

This VM carries co-tenant steal that loadavg does not show (the other
tenant's cycles never appear in this guest's run queue). Every bench
number in BENCH/ is interpreted against a probe of the host's
single-thread capability taken at measurement time; this file pins the
probe so rounds compare like with like instead of re-inventing ad-hoc
loops with different baselines.

Probe: 20,000,000 iterations of integer multiply-accumulate in pure
python (no allocation, no syscalls), best of 3 — the minimum is the
least-stolen sample, same rationale as best-of-N bench walls.

Reference points on this host (python 3.11):
  quiet    : ~1.4-1.5 s   (r4/r5 quiet-window benchmarks)
  degraded : 1.9-2.6 s    (r5 "afternoon window" — discard threshold)
  heavy    : >2.6 s       (r5 second session: 2.5-3.6 s for 4+ hours;
                           kg_pipeline read 1.3-2.2x its quiet band)

Usage: python tools/weather_probe.py  ->  one JSON line
  {"probe_s": <best>, "samples": [...], "regime": "quiet|degraded|heavy"}
Run it immediately before and after any bench; record both values next
to the bench artifact.
"""

from __future__ import annotations

import json
import time


def probe_once(n: int = 20_000_000) -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(n):
        x += i * i
    return round(time.monotonic() - t0, 3)


def main() -> None:
    samples = [probe_once() for _ in range(3)]
    best = min(samples)
    regime = "quiet" if best < 1.7 else ("degraded" if best < 2.6 else "heavy")
    print(json.dumps({"probe_s": best, "samples": samples, "regime": regime}))


if __name__ == "__main__":
    main()
