#!/usr/bin/env python3
"""Decode-throughput-vs-compression-ratio curve (reference Figure 7
analog, tests/decompression_thput.py:15-26 + 79-101): masks constructed
at target invariant-bit rates over a zeros matrix decouple DECODE speed
from preprocess quality, so regressions on high-compression data are
visible regardless of what the learner would pick.

Construction mirrors ``make_mask_and_bitval``: a seeded random
permutation sets ``rate * VEC_BITS + vec_size + 1`` mask bits (the
extra vec_size+1 overcomes the per-element header cost, exactly as the
reference adds ``tensor.shape[1] + 1``); bitval = row 0 (zeros).  Every
element of every vector passes the invariance predicate, so the
achieved stored ratio equals the reference's printed percentage.

Prints ONE JSON line:
  {"metric": "decode_ratio_curve", "rows": [
      {"rate": r, "achieved_pct": p, "decode_mtoks": t, ...}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from invariantbitpacking_spark.codecs import numpy_ref as nr

TARGET = (0.125, 0.25, 0.5, 0.75, 0.9, 0.95, 0.97)  # Figure-7 grid
VEC_SIZE = int(os.environ.get("IBP_RATIO_VEC", "256"))  # 1 KiB vectors
NUM_VECS = int(os.environ.get("IBP_RATIO_VECS", "20000"))
TRIALS = int(os.environ.get("IBP_RATIO_TRIALS", "5"))


def make_mask_and_bitval(vec_size: int, rate: float, seed: int):
    """Port of make_mask_and_bitval (decompression_thput.py:15-26):
    random-permutation mask at ``rate * VEC_BITS + vec_size + 1`` set
    bits, bitval = the (zero) first row."""
    vec_bits = vec_size * 32
    nbits = min(int(rate * vec_bits) + vec_size + 1, vec_bits)
    rng = np.random.default_rng(seed)
    flat = np.zeros(vec_bits, np.uint8)
    flat[rng.choice(vec_bits, nbits, replace=False)] = 1
    # LSB-first bit j of word j//32 (the kernel's 1 << (index % 32))
    mask = np.packbits(flat.reshape(vec_size, 32)[:, ::-1],
                       axis=1, bitorder="little")
    mask = mask.copy().view("<u4").reshape(vec_size).astype(np.uint32)
    return mask, np.zeros(vec_size, np.uint32)


def main() -> None:
    data = np.zeros((NUM_VECS, VEC_SIZE), np.uint32)
    total_tokens = data.size
    rows = []
    for rate in TARGET:
        mask, bitval = make_mask_and_bitval(VEC_SIZE, rate, int(rate * 1000))
        flat, sizes, is_comp = nr.encode_concat(data, mask, bitval)
        achieved = 1.0 - sizes.sum() / data.nbytes
        out = nr.decode_concat(flat, sizes, is_comp, VEC_SIZE, mask, bitval)
        assert (out == data).all(), f"roundtrip failed at rate {rate}"
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            nr.decode_concat(flat, sizes, is_comp, VEC_SIZE, mask, bitval)
            best = min(best, time.perf_counter() - t0)
        rows.append({
            "rate": rate,
            "achieved_pct": round(100 * achieved, 1),
            "decode_mtoks": round(total_tokens / best / 1e6, 2),
            "decode_gbps": round(data.nbytes / best / 1e9, 2),
        })
        print(f"rate {rate:5.3f}  stored {100 * achieved:5.1f}% smaller  "
              f"decode {rows[-1]['decode_mtoks']:8.2f} M tok/s  "
              f"{rows[-1]['decode_gbps']:6.2f} GB/s raw", file=sys.stderr)
    print(json.dumps({"metric": "decode_ratio_curve", "vec_size": VEC_SIZE,
                      "num_vecs": NUM_VECS, "rows": rows}))


if __name__ == "__main__":
    main()
