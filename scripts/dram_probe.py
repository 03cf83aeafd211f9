#!/usr/bin/env python3
"""Memory-bandwidth ceiling probe: aggregate STREAM-like triad GB/s at
1, N, and 4N concurrent processes.

Purpose: the north rule's N -> 4N scaling gate assumes 4N cores can do
4x the work.  The encode kernels are memory-bound (byte histograms,
pack/shift passes), so on a single-socket sandbox the honest ceiling
for 4N-way scaling is ``BW(4N) / (4 * BW(N))`` — if the box's DRAM
saturates between N and 4N processes, an encode efficiency matching
the bandwidth ratio IS the hardware ceiling, not an engine defect.
This probe pins that ratio with numpy out-of-cache triads
(a = b + s*c over 64 MiB float64 arrays), one process per level,
processes started simultaneously and timed over their slowest member.

Output: one JSON line {"bw_gbs": {"p1": ..., "p8": ..., "p32": ...},
"bw_scaling_n_to_4n": ...}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np

ARR_MB = 64
REPS = 20


def _triad(q):
    n = ARR_MB * 1024 * 1024 // 8
    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    a = np.empty(n)
    np.add(b, c, out=a)  # warm/fault pages
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
    dt = time.perf_counter() - t0
    # triad moves ~4 arrays per rep through DRAM (2 reads + write x2 ops)
    q.put((4 * ARR_MB / 1024 * REPS) / dt)


def level(p: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_triad, args=(q,)) for _ in range(p)]
    t0 = time.perf_counter()
    for pr in procs:
        pr.start()
    vals = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    wall = time.perf_counter() - t0
    # aggregate over the shared window: total bytes / slowest wall
    total_gb = 4 * ARR_MB / 1024 * REPS * p
    return round(total_gb / wall, 2), [round(v, 2) for v in vals]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    out = {}
    for p in (1, args.n, 4 * args.n):
        agg, per = level(p)
        out[f"p{p}"] = agg
    ratio = round(out[f"p{4 * args.n}"] / (4 * out[f"p{args.n}"]), 4)
    print(json.dumps({"metric": "dram_triad_bw",
                      "arr_mb": ARR_MB, "bw_gbs": out,
                      "bw_scaling_n_to_4n": ratio}))


if __name__ == "__main__":
    main()
