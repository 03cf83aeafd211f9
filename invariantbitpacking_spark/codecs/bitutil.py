"""Shared fixed-width bit-packing primitives (byte-plane layout).

Our own on-disk layout for the dict/FOR/delta codecs (these codecs are
new work per the north rule — the reference only benchmarks against
external codecs, src/compress_test.cu:125-137 — so the format is ours
to define; we pick one that vectorizes cleanly):

Values are packed in chunks of 8; a chunk of 8 w-bit values becomes w
bytes, byte b holding bit (w-1-b) of each value, value i at bit (7-i).
A row of n values occupies ceil(n/8)*w bytes (pad values are zero and
trimmed on decode via the known row length).
"""

from __future__ import annotations

import numpy as np

from ..operators.framing import gather_ranges


def width_for(max_delta: np.ndarray) -> np.ndarray:
    """ceil(log2(x+1)) — bits needed for values in [0, x] (the
    reference's bitpack width rule, tests/invariance_perc.py:30-44)."""
    x = np.asarray(max_delta, np.uint64)
    w = np.zeros(x.shape, np.int64)
    nz = x > 0
    # bit_length via frexp-free integer log2
    w[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
    # float rounding guard at exact powers of two
    too_small = nz & (x >= (np.uint64(1) << np.minimum(w, 63).astype(np.uint64)))
    w[too_small] += 1
    return w


def pack_fixed(flat_vals: np.ndarray, lens: np.ndarray, w: int):
    """Pack rows of w-bit values (concatenated in ``flat_vals`` with row
    lengths ``lens``) into byte-plane chunks.

    Returns ``(bytes_flat uint8, row_byte_sizes int64)``; rows are
    back-to-back in ``bytes_flat``.
    """
    lens = np.asarray(lens, np.int64)
    if w == 0:
        return np.zeros(0, np.uint8), np.zeros(len(lens), np.int64)
    nchunks = -(-lens // 8)
    tot_chunks = int(nchunks.sum())
    padded = np.zeros(tot_chunks * 8, np.uint32)
    starts = np.cumsum(lens) - lens
    pad_starts = (np.cumsum(nchunks) - nchunks) * 8
    tgt = gather_ranges(np.arange(tot_chunks * 8, dtype=np.int64), pad_starts, lens)
    padded[tgt] = np.asarray(flat_vals, np.uint32)
    # [chunks, 8 values, 32 bits MSB-first] -> keep low w bits -> transpose
    # to [chunks, w planes, 8 values] -> packbits = byte-plane layout,
    # three C-level passes instead of a per-bit Python loop
    bits = np.unpackbits(
        padded.reshape(-1, 8).astype(">u4").view(np.uint8).reshape(tot_chunks, 8, 4),
        axis=2, count=32).reshape(tot_chunks, 8, 32)[:, :, 32 - w:]
    planes = np.ascontiguousarray(bits.transpose(0, 2, 1)).reshape(tot_chunks, w * 8)
    out = np.packbits(planes, axis=1)
    return out.reshape(-1), nchunks * w


def unpack_fixed(bytes_flat: np.ndarray, lens: np.ndarray, w: int) -> np.ndarray:
    """Inverse of :func:`pack_fixed`: returns the concatenated values
    (row lengths ``lens``, pad values dropped)."""
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if w == 0:
        return np.zeros(total, np.uint32)
    nchunks = -(-lens // 8)
    tot_chunks = int(nchunks.sum())
    planes = np.asarray(bytes_flat, np.uint8)[: tot_chunks * w].reshape(tot_chunks, w)
    bits = np.unpackbits(planes, axis=1).reshape(tot_chunks, w, 8)
    # [chunks, w planes, 8 values] -> [chunks, 8, w] -> left-pad to 32
    # bits MSB-first -> packbits -> big-endian uint32
    full = np.zeros((tot_chunks, 8, 32), np.uint8)
    full[:, :, 32 - w:] = bits.transpose(0, 2, 1)
    vals = (np.packbits(full.reshape(tot_chunks, 8 * 32), axis=1)
            .reshape(tot_chunks, 8, 4).copy().view(">u4")
            .reshape(tot_chunks, 8).astype(np.uint32))
    padded = vals.reshape(-1)
    pad_starts = (np.cumsum(nchunks) - nchunks) * 8
    return gather_ranges(padded, pad_starts, lens)
