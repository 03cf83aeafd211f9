#!/usr/bin/env python3
"""A/B the session's glibc malloc tuning (huge mmap/trim thresholds)
against default glibc on the bench encode path.

Why this exists: on snapshot-restored / overcommitted VMs a first-touch
page fault costs ~100us, and default glibc mmap/munmaps every >32MB
numpy temporary — the codec's Arrow-batch hot loops then re-fault the
same pages every batch.  session._malloc_tuning() keeps big buffers on
the brk heap so each page faults once per worker lifetime.  This probe
measures both settings interleaved in fresh subprocesses on the SAME
cached corpus (q1 = learn on a 25% sample, q2 = best-of-2 encode).

Usage: python scripts/malloc_probe.py [--rows 400000] [--trials 2]
Prints one JSON line per (setting, trial).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from invariantbitpacking_spark.operators import ibp
from invariantbitpacking_spark.session import get_spark
from invariantbitpacking_spark.sources.tokens import generate_tokens_df

rows = %(rows)d
spark = get_spark("malloc-probe", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
toks = generate_tokens_df(spark, rows, num_partitions=64).cache()
n_tok = toks.agg(F.sum("n_tok")).collect()[0][0]

t0 = time.perf_counter()
params = ibp.learn_params(toks, eval_sample_fraction=0.25)
q1 = time.perf_counter() - t0

ibp.encode_ibp(toks, params).agg(F.count(F.lit(1))).collect()
best = None
for _ in range(2):
    t0 = time.perf_counter()
    ibp.encode_ibp(toks, params).agg(F.sum("comp_bytes")).collect()
    d = time.perf_counter() - t0
    best = d if best is None or d < best else best
print(json.dumps({"tuning": os.environ.get("IBP_NO_MALLOC_TUNING") != "1",
                  "rows": rows, "tokens": int(n_tok),
                  "q1": round(q1, 3), "q2": round(best, 3),
                  "q2_tok_per_sec": round(n_tok / best, 1)}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    settings = [
        ("tuned", {}),
        ("default-glibc", {"IBP_NO_MALLOC_TUNING": "1"}),
    ]
    code = CHILD % {"repo": REPO, "rows": args.rows}
    for t in range(args.trials):
        for name, env_extra in settings:
            env = dict(os.environ)
            for k in ("IBP_NO_MALLOC_TUNING", "MALLOC_MMAP_THRESHOLD_",
                      "MALLOC_TRIM_THRESHOLD_"):
                env.pop(k, None)
            env.update(env_extra)
            env.setdefault("IBP_DATA_DIR", "/tmp/ibp_spark_data")
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=1200)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            print(json.dumps({"trial": t, "setting": name,
                              **json.loads(line)}), flush=True)


if __name__ == "__main__":
    main()
