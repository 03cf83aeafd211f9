#!/usr/bin/env python3
"""Attribute the 100x encode-throughput delta: spark.python.worker.reuse
A/B on the SAME cached corpus, q1 (learn) + q2 (encode) only.

The 100x campaign runs with worker.reuse=false (a reused worker's Arrow
socket handoff can race into a mutual-read deadlock on multi-hour runs;
see session.py IBP_SPARK_CONF note).  A fresh worker per task re-imports
numpy inside the fork, which is pure per-task overhead.  This probe
measures both settings interleaved in fresh subprocesses so the BASELINE
entry for the 100x point can attribute its encode wall honestly.

Usage: python scripts/reuse_probe.py [--rows 4000000] [--trials 2]
Prints one JSON line per (setting, trial): {"reuse": ..., "q1": s, "q2": s}
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
spark = get_spark("reuse-probe", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
toks = generate_tokens_df(spark, rows, num_partitions=64).cache()
n_tok = toks.agg(F.sum("n_tok")).collect()[0][0]

t0 = time.perf_counter()
params = ibp.learn_params(toks, eval_sample_fraction=0.25)
q1 = time.perf_counter() - t0

# one warm-up, then best-of-2 encode
ibp.encode_ibp(toks, params).agg(F.count(F.lit(1))).collect()
best = None
for _ in range(2):
    t0 = time.perf_counter()
    ibp.encode_ibp(toks, params).agg(F.sum("comp_bytes")).collect()
    d = time.perf_counter() - t0
    best = d if best is None or d < best else best
print(json.dumps({"reuse": os.environ.get("IBP_SPARK_CONF", "default"),
                  "rows": rows, "tokens": int(n_tok),
                  "q1": round(q1, 3), "q2": round(best, 3),
                  "q2_tok_per_sec": round(n_tok / best, 1)}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    settings = [
        ("reuse=true", {}),  # session default
        ("reuse=false", {"IBP_SPARK_CONF": "spark.python.worker.reuse=false"}),
    ]
    code = CHILD % {"repo": REPO, "rows": args.rows}
    for t in range(args.trials):
        for name, env_extra in settings:
            env = dict(os.environ)
            env.pop("IBP_SPARK_CONF", None)
            env.update(env_extra)
            env.setdefault("IBP_DATA_DIR", "/tmp/ibp_100x")
            env.setdefault("IBP_DRIVER_MEM", "64g")
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=1200)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            print(json.dumps({"trial": t, "setting": name,
                              **json.loads(line)}), flush=True)


if __name__ == "__main__":
    main()
