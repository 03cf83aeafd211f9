#!/usr/bin/env python3
"""Scaling-efficiency evidence: the identical encode job at two
parallelism levels (sandbox stand-in for N and 4N executors).

Runs learn-once, then times encode_auto + decode at local[N] and
local[4N] over the same deterministic corpus, and reports throughput at
both plus scaling efficiency = thpt(4N) / (4 * thpt(N)).  The north
rule requires >= 0.8.  Results are recorded in BASELINE.md.

Reference analog: the 1->32-core SLURM sweeps (reference
Makefile:273-284).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(cores: int, rows: int, repeats: int) -> dict:
    from pyspark.sql import functions as F

    from invariantbitpacking_spark.operators import ibp, selector
    from invariantbitpacking_spark.session import get_spark
    from invariantbitpacking_spark.sources.tokens import generate_tokens_df

    spark = get_spark(f"ibp-scale-{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # identical partition count at both levels: fixed work granularity,
    # only the executor-thread count changes (the N vs 4N experiment)
    toks = generate_tokens_df(spark, rows, num_partitions=128)
    toks = toks.cache()
    n_tokens = toks.agg(F.sum("n_tok")).collect()[0][0]  # warm cache
    params = ibp.learn_params(toks, sample_fraction=0.2)

    def run_job(fn) -> float:
        t0 = time.perf_counter()
        fn().agg(F.sum("comp_bytes")).collect()
        return time.perf_counter() - t0

    jobs = {
        "encode_ibp": lambda: ibp.encode_ibp(toks, params),
        "encode_auto": lambda: selector.encode_auto(toks, params),
    }
    out = {"cores": cores, "tokens": int(n_tokens)}
    for name, fn in jobs.items():
        times = [run_job(fn) for _ in range(repeats)]
        best = min(times)
        out[name] = {
            "sec": [round(t, 3) for t in times],
            "best_sec": round(best, 3),
            "tokens_per_sec": round(n_tokens / best, 1),
        }
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small level N")
    ap.add_argument("--rows", type=int,
                    default=int(os.environ.get("IBP_SCALE_ROWS", "160000")))
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    lo = run_level(args.n, args.rows, args.repeats)
    hi = run_level(args.n * 4, args.rows, args.repeats)
    effs = {
        name: round(hi[name]["tokens_per_sec"]
                    / (4.0 * lo[name]["tokens_per_sec"]), 4)
        for name in ("encode_ibp", "encode_auto")
    }
    print(json.dumps({
        "metric": "scaling_efficiency_Nx4",
        "value": effs["encode_ibp"],
        "unit": "ratio",
        "efficiency": effs,
        "n_cores": lo,
        "n4_cores": hi,
        "pass_gate_0.8": effs["encode_ibp"] >= 0.8,
    }))


if __name__ == "__main__":
    main()
