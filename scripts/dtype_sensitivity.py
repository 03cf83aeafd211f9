#!/usr/bin/env python3
"""Threshold / dtype-view sensitivity table (reference
tests/sens_threshold.py:18-34): the SAME feature matrix reinterpreted
as int8 / int16 / int32 / int64 views, each run through the threshold
sweep (preprocess) and the exact size predictor — how the learned
threshold and achievable ratio move with element width.

The matrix is a deterministic synthetic stand-in for the reference's
OGB node features (low-magnitude, mostly-sparse float32 — the
canonical invariant-high-bits case): 60% exact zeros + ~N(0, 0.25)
elsewhere, so sign/exponent bits are highly invariant while mantissa
tails are noise.

Prints ONE JSON line:
  {"metric": "dtype_sensitivity", "rows": [
      {"dtype": "int8", "vec_size": v, "theta": t, "ratio": r}, ...]}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from invariantbitpacking_spark.codecs import numpy_ref as nr

ROWS = int(os.environ.get("IBP_SENS_ROWS", "20000"))
DIM = int(os.environ.get("IBP_SENS_DIM", "64"))  # float32 features


def main() -> None:
    rng = np.random.default_rng(42)
    feats = (rng.standard_normal((ROWS, DIM)) * 0.25).astype(np.float32)
    feats[rng.random((ROWS, DIM)) < 0.6] = 0.0
    raw = np.ascontiguousarray(feats)
    out = []
    for dt in (np.int8, np.int16, np.int32, np.int64):
        view = raw.view(dt)  # same bytes, element width changes vec_size
        mask, bitval, theta, saved = nr.preprocess(view)
        sizes = nr.comp_sizes_matrix(view, mask, bitval)
        ratio = view.nbytes / sizes.sum()
        out.append({
            "dtype": np.dtype(dt).name,
            "vec_size": view.shape[1],
            "theta": None if theta is None else round(float(theta), 4),
            "invariant_bits_per_vec": int(saved // max(ROWS, 1)),
            "ratio": round(float(ratio), 4),
        })
        print(f"{np.dtype(dt).name:6s} vec_size {view.shape[1]:4d}  "
              f"theta {out[-1]['theta']}  ratio {out[-1]['ratio']:.4f}",
              file=sys.stderr)
    print(json.dumps({"metric": "dtype_sensitivity", "rows": ROWS,
                      "float_dim": DIM, "rows_out": out}))


if __name__ == "__main__":
    main()
