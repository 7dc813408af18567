"""Memory-bandwidth saturation probe: direct evidence for the single-box
scaling wall documented in STRESS.json (the 1e9 N=8->32 draw).

The frontier pipeline is a string-heavy streaming workload: canonicalize,
hash, sort and shuffle 10^9 URL rows is bandwidth-bound long before it is
ALU-bound. On one socket, aggregate DRAM bandwidth is a fixed resource —
per-core bandwidth FALLS as concurrency rises, so core-count scaling
measured on one box understates what N -> 4N *executors* (each bringing
its own socket) deliver. This probe measures that directly: P concurrent
PROCESSES (no GIL sharing) each run a STREAM-triad-like numpy kernel
(a = b + s*c over arrays far larger than LLC) and we record aggregate
GB/s at P = 1, 2, 4, 8, 16, 32.

    python tools/membw_probe.py [--mb 512] [--reps 8]

Appends {"membw_probe": {...}} evidence to STRESS.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(mb: int, reps: int, q: "mp.Queue") -> None:
    import numpy as np

    n = mb * 1024 * 1024 // 8  # float64 elements per array
    b = np.ones(n)
    c = np.full(n, 2.0)
    a = np.empty(n)
    # one untimed pass to fault pages in
    np.multiply(c, 1.5, out=a)
    a += b
    t0 = time.perf_counter()
    for _ in range(reps):
        np.multiply(c, 1.5, out=a)  # triad: a = b + 1.5*c, two fused steps
        a += b
    wall = time.perf_counter() - t0
    # triad traffic per rep: read b, read c, write a (+ RFO on a ~ ignored)
    gb = reps * 3 * n * 8 / 1e9
    q.put(gb / wall)


def measure(p: int, mb: int, reps: int) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(mb, reps, q)) for _ in range(p)]
    for pr in procs:
        pr.start()
    rates = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512, help="array MB per worker")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    a = ap.parse_args()

    levels = [int(x) for x in a.levels.split(",")]
    out = {}
    for p in levels:
        agg = measure(p, a.mb, a.reps)
        out[str(p)] = round(agg, 2)
        print(f"P={p:2d}  aggregate {agg:8.2f} GB/s  per-proc {agg / p:7.2f} GB/s")
    base = out[str(levels[0])]
    probe = {
        "kernel": "numpy STREAM-triad, independent processes, "
        f"{a.mb} MB/array x3 arrays/worker",
        "aggregate_gb_s": out,
        "per_core_retention_vs_P1": {
            k: round(v / (int(k) * base), 3) for k, v in out.items()
        },
        "ts": time.time(),
    }
    path = os.path.join(REPO, "STRESS.json")
    with open(path) as f:
        doc = json.load(f)
    doc["membw_probe"] = probe
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(probe, indent=2))


if __name__ == "__main__":
    main()
