#!/usr/bin/env python
"""Fixed-resource probes for the scaling evidence (BENCH/BASELINE.md).

Two microbenchmarks, each run at several worker counts:

- ``cpu``: pure in-register spin (no memory traffic) — measures whether
  the box's CPU capacity itself scales with worker count.
- ``membw``: streaming read+write over a per-worker 256 MiB numpy array
  (way beyond LLC) — measures aggregate DRAM bandwidth.

If cpu scales ~linearly while membw plateaus, the box has a fixed
shared memory-bandwidth ceiling: any bandwidth-bound pipeline stage
will stop scaling at the plateau point NO MATTER how efficient its
plan is — and per-stage CPU inflation (stall cycles are busy cycles)
is the corresponding signature in the engine bench. A real 4N-executor
cluster multiplies DRAM channels with N; one VM cannot.

Usage: python BENCH/resource_probe.py [--seconds 4] [--counts 1,4,8,32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _cpu_worker(seconds: float, out):
    t_end = time.monotonic() + seconds
    x = 1.0
    iters = 0
    while time.monotonic() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-12
        iters += 10000
    out.put(iters + (x == -1))


def _membw_worker(seconds: float, out):
    import numpy as np

    a = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MiB
    t_end = time.monotonic() + seconds
    nbytes = 0
    while time.monotonic() < t_end:
        a *= 1.0000001  # read + write the full array: 512 MiB traffic
        nbytes += a.nbytes * 2
    out.put(nbytes)


def run(kind: str, n: int, seconds: float) -> float:
    worker = _cpu_worker if kind == "cpu" else _membw_worker
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=worker, args=(seconds, q)) for _ in range(n)]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    return total / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--counts", default="1,4,8,16,32")
    args = ap.parse_args()
    counts = [int(x) for x in args.counts.split(",")]

    out: dict = {"counts": counts}
    for kind in ("cpu", "membw"):
        vals = [run(kind, n, args.seconds) for n in counts]
        base = vals[0]
        out[kind] = {
            "raw_per_sec": [round(v, 1) for v in vals],
            "speedup_vs_1": [round(v / base, 2) for v in vals],
            "efficiency": [round(v / base / n, 2) for v, n in zip(vals, counts)],
            "unit": "iters/s" if kind == "cpu" else "bytes/s",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
