#!/usr/bin/env python
"""Calibrated honesty probe for the sandbox's phantom degradation waves.

The host intermittently degrades this VM — identical runs of untouched
pipeline stages inflate up to ~4x in wall AND cgroup-CPU. Round-6
diagnosis: the degradation is MEMORY-BANDWIDTH (a 16-way numpy memcpy
aggregates 34 GB/s in an honest window — BENCH/BASELINE.md's
resource_probe plateau — vs ~5 GB/s in a degraded one) while a pure
in-register spin stays near calibration, so loadavg and CPU-only
probes cannot detect it. This probe reports both.

    python BENCH/quiet_probe.py

Prints one JSON line: {"spin_wall": ..., "membw_gbps": ..., ...}.
Calibration (honest window, 2026-08-22): spin_wall 1.18-1.35s
(n=16, 3e7 loops), membw_gbps ~30-34. Gate measurement runs on
membw_gbps >= 20 AND spin_wall <= 1.9.
"""

import json
import os
import sys
import time
from multiprocessing import Process, Queue


def spin(loops: int) -> None:
    i = 0
    while i < loops:
        i += 1


def membw(q, mb: int = 256, reps: int = 4) -> None:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    t0 = time.monotonic()
    for _ in range(reps):
        np.copyto(b, a)
    q.put(mb * reps * 2 / (time.monotonic() - t0))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    loops = int(float(sys.argv[2])) if len(sys.argv) > 2 else 30_000_000
    procs = [Process(target=spin, args=(loops,)) for _ in range(n)]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    spin_wall = round(time.monotonic() - t0, 3)
    q: Queue = Queue()
    procs = [Process(target=membw, args=(q,)) for _ in range(n)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    gbps = round(sum(q.get() for _ in range(n)) / 1024.0, 2)
    print(
        json.dumps(
            {
                "spin_wall": spin_wall,
                "membw_gbps": gbps,
                "n": n,
                "loops": loops,
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
