#!/usr/bin/env python3
"""Interleaved A/B bench for q1_learn_params and q2_encode: current
HEAD vs a given past commit (default: round-5 HEAD 5945709).

Protocol (same as the round-6 q3 A/B recorded in BASELINE.md): each
(version, round) runs in its own subprocess (fresh JVM) with
PYTHONPATH pointed at that version's checkout; version subprocesses
ALTERNATE so machine drift hits both sides equally; within one
subprocess each query is best-of-5.  The old version runs from a git
worktree (read-only checkout) so the live repo is never touched.

Purpose: BENCH_r06's driver run read q1 +43% / q2 +49% vs round 5
while same-HEAD runs sat inside the round-5 band; this pins whether
the byte-major bit-count rewrite (f219f03) regressed under 32-core
contention or the reading was box drift.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def trial(rows: int, cores: int, best_of: int) -> dict:
    from pyspark.sql import functions as F

    from invariantbitpacking_spark.operators import ibp
    from invariantbitpacking_spark.session import get_spark
    from invariantbitpacking_spark.sources.tokens import generate_tokens_df

    spark = get_spark("ibp-ab", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    toks = generate_tokens_df(spark, rows, num_partitions=cores * 2).cache()
    toks.agg(F.sum("n_tok")).collect()  # materialize cache (setup)

    def best(fn) -> tuple[float, object]:
        b, out = None, None
        for i in range(best_of):
            t0 = time.perf_counter()
            r = fn()
            d = time.perf_counter() - t0
            if b is None or d < b:
                b = d
            if i == 0:
                out = r
        return round(b, 3), out

    q1_sec, params = best(
        lambda: ibp.learn_params(toks, eval_sample_fraction=0.25))

    # untimed warm-up, same as bench.py
    ibp.encode_ibp(toks, params).agg(F.count(F.lit(1))).collect()
    q2_sec, _ = best(lambda: ibp.encode_ibp(toks, params)
                     .agg(F.sum("comp_bytes")).collect())
    spark.stop()
    return {"q1_learn_params": q1_sec, "q2_encode": q2_sec}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-commit", default="5945709")
    ap.add_argument("--new-commit", default="a5903c4",
                    help="pin the 'new' side too (round-6 HEAD) so "
                    "concurrent dev work in the live repo cannot "
                    "contaminate the A/B")
    ap.add_argument("--rows", type=int, default=40000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--best-of", type=int, default=5)
    ap.add_argument("--trial-run", action="store_true",
                    help="internal: run one trial in-process")
    args = ap.parse_args()

    if args.trial_run:
        print(json.dumps(trial(args.rows, args.cores, args.best_of)))
        return

    def worktree(commit: str) -> str:
        d = f"/tmp/ibp_ab_{commit}"
        if not os.path.isdir(d):
            subprocess.run(["git", "-C", REPO, "worktree", "add",
                            "--detach", d, commit], check=True)
        return d

    old_dir, new_dir = worktree(args.old_commit), worktree(args.new_commit)

    def run_side(repo_root: str) -> dict:
        # per-side scratch dir: the two checkouts must not share a
        # package-zip/cache path (and must not collide with whatever
        # else runs on the box while the A/B is in flight)
        env = dict(os.environ, PYTHONPATH=repo_root,
                   IBP_DATA_DIR=f"/tmp/ibp_ab_data_{os.path.basename(repo_root)}")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--trial-run",
             "--rows", str(args.rows), "--cores", str(args.cores),
             "--best-of", str(args.best_of)],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=repo_root)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-2000:])
            raise SystemExit(f"trial failed in {repo_root}")
        return json.loads(p.stdout.strip().splitlines()[-1])

    pairs = []
    for r in range(args.rounds):
        # alternate which side goes first each round
        order = [new_dir, old_dir] if r % 2 == 0 else [old_dir, new_dir]
        got = {root: run_side(root) for root in order}
        pairs.append({"round": r + 1, "new": got[new_dir],
                      "old": got[old_dir]})
        print(json.dumps(pairs[-1]), flush=True)

    summary = {q: {"new_best": min(p["new"][q] for p in pairs),
                   "old_best": min(p["old"][q] for p in pairs),
                   "new_all": [p["new"][q] for p in pairs],
                   "old_all": [p["old"][q] for p in pairs]}
               for q in ("q1_learn_params", "q2_encode")}
    print(json.dumps({"metric": "ab_q1_q2", "old_commit": args.old_commit,
                      "rows": args.rows, "cores": args.cores,
                      "summary": summary}))


if __name__ == "__main__":
    main()
