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


def _transpose8x8(x: np.ndarray) -> np.ndarray:
    """8x8 bit-matrix transpose on uint64 lanes (Hacker's Delight 7-3),
    vectorized over an array of matrices."""
    t = (x ^ (x >> np.uint64(7))) & np.uint64(0x00AA00AA00AA00AA)
    x = x ^ t ^ (t << np.uint64(7))
    t = (x ^ (x >> np.uint64(14))) & np.uint64(0x0000CCCC0000CCCC)
    x = x ^ t ^ (t << np.uint64(14))
    t = (x ^ (x >> np.uint64(28))) & np.uint64(0x00000000F0F0F0F0)
    return x ^ t ^ (t << np.uint64(28))


def pack_fixed(flat_vals: np.ndarray, lens: np.ndarray, w: int):
    """Pack rows of w-bit values (concatenated in ``flat_vals`` with row
    lengths ``lens``) into byte-plane chunks.

    Returns ``(bytes_flat uint8, row_byte_sizes int64)``; rows are
    back-to-back in ``bytes_flat``.

    A chunk's w plane bytes are the bit-transpose of its 8 value bytes,
    computed with uint64-lane 8x8 transposes (one per byte-plane group)
    — a few word ops per chunk instead of an unpackbits 8x expansion.
    """
    lens = np.asarray(lens, np.int64)
    if w == 0:
        return np.zeros(0, np.uint8), np.zeros(len(lens), np.int64)
    nchunks = -(-lens // 8)
    tot_chunks = int(nchunks.sum())
    padded = np.zeros(tot_chunks * 8, np.uint32)
    pad_starts = (np.cumsum(nchunks) - nchunks) * 8
    tgt = gather_ranges(np.arange(tot_chunks * 8, dtype=np.int64), pad_starts, lens)
    padded[tgt] = np.asarray(flat_vals, np.uint32)
    c = padded.reshape(-1, 8)

    ceil8 = -(-w // 8) * 8
    vshift = c << np.uint32(ceil8 - w)  # left-align to the group grid
    out = np.empty((tot_chunks, ceil8), np.uint8)
    for g in range(ceil8 // 8):
        ybytes = ((vshift >> np.uint32(ceil8 - 8 * (g + 1)))
                  & np.uint32(0xFF)).astype(np.uint8)
        # y_i at byte (7-i): reverse columns, view as LE uint64 lanes
        x = np.ascontiguousarray(ybytes[:, ::-1]).view("<u8").reshape(-1)
        z = _transpose8x8(x)
        planes = z.view(np.uint8).reshape(tot_chunks, 8)[:, ::-1]
        out[:, g * 8:(g + 1) * 8] = planes
    return np.ascontiguousarray(out[:, :w]).reshape(-1), nchunks * w


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
    ceil8 = -(-w // 8) * 8
    full = np.zeros((tot_chunks, ceil8), np.uint8)
    full[:, :w] = planes
    vals = np.zeros((tot_chunks, 8), np.uint32)
    for g in range(ceil8 // 8):
        grp = full[:, g * 8:(g + 1) * 8]
        x = np.ascontiguousarray(grp[:, ::-1]).view("<u8").reshape(-1)
        z = _transpose8x8(x)  # involution: planes -> value bytes
        ybytes = z.view(np.uint8).reshape(tot_chunks, 8)[:, ::-1]
        vals |= ybytes.astype(np.uint32) << np.uint32(ceil8 - 8 * (g + 1))
    vals >>= np.uint32(ceil8 - w)
    padded = vals.reshape(-1)
    pad_starts = (np.cumsum(nchunks) - nchunks) * 8
    return gather_ranges(padded, pad_starts, lens)
