"""Lightweight per-document codecs: FOR, delta-FOR, RLE, dictionary.

New work per the north rule (the reference implements only IBP and
*benchmarks against* external codecs, src/compress_test.cu:125-137; its
closest in-repo relative is the per-column bitpack baseline in
tests/invariance_perc.py:30-76, whose ``ceil(log2(max-min+1))`` width
rule FOR reuses).  Formats are self-describing per document given the
token count (little-endian):

- FOR   [u32 ref][u8 w][ceil(n/8)*w bytes byte-plane packed deltas]
- DFOR  [i64 ref][u8 w][packed deltas of consecutive diffs] (sorted data)
- RLE   [u32 n_runs][u32 values x r][u32 run_lens x r]
- DICT  [u16 card][u8 w][u8 0][u32 dict x card][packed indices]

Every encoder takes a ragged batch (concatenated values + row lengths)
and returns (flat_bytes, per_row_sizes); everything is whole-batch
vectorized numpy (rows grouped by packing width), no per-row Python in
the hot path.
"""

from __future__ import annotations

import numpy as np

from ..operators.framing import gather_ranges
from .bitutil import pack_fixed, unpack_fixed, width_for


def _row_of(lens: np.ndarray) -> np.ndarray:
    return np.repeat(np.arange(len(lens)), lens)


def _scatter_rows(out: np.ndarray, dst_starts: np.ndarray,
                  src_flat: np.ndarray, src_lens: np.ndarray) -> None:
    """out[dst_starts[r] : +src_lens[r]] = row r of src_flat (rows
    back-to-back).

    Adaptive: tiny rows use one vectorized index build (per-row Python
    would dominate); large rows use a per-row slice-assignment loop —
    each iteration is a pure C memcpy, and the vectorized path's int64
    index arrays would move ~40x the payload bytes in index traffic."""
    src_lens = np.asarray(src_lens, np.int64)
    dst_starts = np.asarray(dst_starts, np.int64)
    total = int(src_lens.sum())
    if total == 0:
        return
    nz = src_lens > 0
    if not nz.all():
        dst_starts, src_lens = dst_starts[nz], src_lens[nz]
    # coalesce adjacent runs (src is back-to-back by contract, so runs
    # merge whenever dst is contiguous — e.g. consecutive blocks of the
    # same document collapse to one per-doc run)
    if len(src_lens) > 1:
        brk = np.ones(len(src_lens), bool)
        brk[1:] = dst_starts[1:] != dst_starts[:-1] + src_lens[:-1]
        if not brk.all():
            bidx = np.flatnonzero(brk)
            src_off = np.cumsum(src_lens) - src_lens
            dst_starts = dst_starts[bidx]
            src_lens = np.add.reduceat(src_lens, bidx)
    if total >= len(src_lens) * 1024:
        src_off = np.cumsum(src_lens) - src_lens
        for d, s, n in zip(dst_starts.tolist(), src_off.tolist(),
                           src_lens.tolist()):
            out[d:d + n] = src_flat[s:s + n]
        return
    # target indices built directly (cumsum over per-position deltas):
    # O(total scattered), never O(out.size)
    out_pos = np.cumsum(src_lens) - src_lens
    idx = np.ones(total, np.int64)
    idx[0] = dst_starts[0]
    if len(dst_starts) > 1:
        idx[out_pos[1:]] = (dst_starts[1:]
                            - (dst_starts[:-1] + src_lens[:-1]) + 1)
    out[np.cumsum(idx)] = src_flat[:total]


def _pack_grouped(flat_vals: np.ndarray, lens: np.ndarray,
                  w_per_row: np.ndarray):
    """pack_fixed with a per-row width: rows are REORDERED by width
    once (one global gather), each width group then packs a contiguous
    slice (no per-group index building), and one final gather restores
    the original row order.  2 big gathers instead of 2 per width.

    Returns (packed rows back-to-back in ORIGINAL row order, per-row
    packed byte sizes)."""
    lens = np.asarray(lens, np.int64)
    w_per_row = np.asarray(w_per_row, np.int64)
    sizes = (-(-lens // 8)) * w_per_row
    if len(lens) == 0 or int(sizes.sum()) == 0:
        return np.zeros(0, np.uint8), sizes
    starts = np.cumsum(lens) - lens
    order = np.argsort(w_per_row, kind="stable")
    lens_s = lens[order]
    w_s = w_per_row[order]
    sizes_s = sizes[order]
    vals_s = gather_ranges(flat_vals, starts[order], lens_s)
    val_off = np.cumsum(lens_s) - lens_s
    out_off = np.cumsum(sizes_s) - sizes_s
    out_s = np.zeros(int(sizes_s.sum()), np.uint8)
    uniq, gs = np.unique(w_s, return_index=True)
    ge = np.append(gs[1:], len(w_s))
    for u, s, e in zip(uniq, gs, ge):
        if u == 0:
            continue
        seg = vals_s[val_off[s]: val_off[e - 1] + lens_s[e - 1]]
        packed, _ = pack_fixed(seg, lens_s[s:e], int(u))
        out_s[out_off[s]: out_off[s] + packed.size] = packed
    # restore original row order
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    out = gather_ranges(out_s, out_off[pos], sizes)
    return out, sizes


def _unpack_grouped(flat_bytes: np.ndarray, byte_starts: np.ndarray,
                    lens: np.ndarray, w_per_row: np.ndarray) -> np.ndarray:
    """Inverse of _pack_grouped; returns values concatenated in original
    row order.  Same width-sort restructure: one gather of the packed
    bytes in width order, contiguous per-group unpacks, one gather to
    restore row order."""
    lens = np.asarray(lens, np.int64)
    w_per_row = np.asarray(w_per_row, np.int64)
    total = int(lens.sum())
    if total == 0 or len(lens) == 0:
        return np.zeros(total, np.uint32)
    psizes = (-(-lens // 8)) * w_per_row
    order = np.argsort(w_per_row, kind="stable")
    lens_s = lens[order]
    w_s = w_per_row[order]
    bytes_s = gather_ranges(flat_bytes, byte_starts[order], psizes[order])
    byte_off = np.cumsum(psizes[order]) - psizes[order]
    val_off = np.cumsum(lens_s) - lens_s
    vals_s = np.zeros(total, np.uint32)
    uniq, gs = np.unique(w_s, return_index=True)
    ge = np.append(gs[1:], len(w_s))
    for u, s, e in zip(uniq, gs, ge):
        if u == 0:
            continue
        seg = bytes_s[byte_off[s]: byte_off[e - 1] + psizes[order][e - 1]]
        vals = unpack_fixed(seg, lens_s[s:e], int(u))
        vals_s[val_off[s]: val_off[s] + vals.size] = vals
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    return gather_ranges(vals_s, val_off[pos], lens)


# ---------------------------------------------------------------------------
# FOR / delta-FOR
# ---------------------------------------------------------------------------

def _minmax_per_row(flat: np.ndarray, lens: np.ndarray):
    starts = np.cumsum(lens) - lens
    nz = lens > 0
    mn = np.zeros(len(lens), flat.dtype)
    mx = np.zeros(len(lens), flat.dtype)
    if nz.any():
        s = starts[nz].astype(np.int64)
        mn[nz] = np.minimum.reduceat(flat, s)
        mx[nz] = np.maximum.reduceat(flat, s)
    return mn, mx


def encode_for(flat: np.ndarray, lens: np.ndarray):
    flat = np.asarray(flat).view(np.uint32)
    lens = np.asarray(lens, np.int64)
    mn, mx = _minmax_per_row(flat, lens)
    w = width_for(mx.astype(np.uint64) - mn.astype(np.uint64))
    deltas = flat - np.repeat(mn, lens)
    packed, psizes = _pack_grouped(deltas, lens, w)
    sizes = 5 + psizes
    out = np.zeros(int(sizes.sum()), np.uint8)
    off = np.cumsum(sizes) - sizes
    hdr_idx = off[:, None] + np.arange(4)[None, :]
    out[hdr_idx] = mn.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[off + 4] = w.astype(np.uint8)
    _scatter_rows(out, off + 5, packed, psizes)
    return out, sizes


def decode_for(flat_bytes: np.ndarray, sizes: np.ndarray, lens: np.ndarray):
    flat_bytes = np.asarray(flat_bytes, np.uint8)
    sizes = np.asarray(sizes, np.int64)
    lens = np.asarray(lens, np.int64)
    off = np.cumsum(sizes) - sizes
    refs = np.ascontiguousarray(
        flat_bytes[off[:, None] + np.arange(4)[None, :]]).view("<u4").reshape(-1)
    w = flat_bytes[off + 4].astype(np.int64)
    deltas = _unpack_grouped(flat_bytes, off + 5, lens, w)
    return deltas + np.repeat(refs, lens)


def encode_dfor(flat: np.ndarray, lens: np.ndarray):
    """Delta (consecutive difference) then FOR — wins on sorted rows."""
    flat = np.asarray(flat).view(np.uint32).astype(np.int64)
    lens = np.asarray(lens, np.int64)
    starts = np.cumsum(lens) - lens
    d = np.empty(flat.size, np.int64)
    if flat.size:
        d[1:] = flat[1:] - flat[:-1]
        d[starts[lens > 0]] = flat[starts[lens > 0]]  # first value verbatim
    mn, mx = _minmax_per_row(d, lens)
    w = width_for((mx - mn).astype(np.uint64))
    # A row whose delta range exceeds 32 bits (possible: consecutive
    # diffs of uint32 data span up to 2^33-2) is still encoded
    # LOSSLESSLY at the clamped w<=32: dfor arithmetic is mod-2^32 —
    # the bits dropped by the clamp are a multiple of 2^32 per element
    # and cancel in decode_dfor's final uint32 cast.  (The selector
    # doesn't need to reject such rows; it only prices them at w=32.)
    deltas = (d - np.repeat(mn, lens)).astype(np.uint64)
    packed, psizes = _pack_grouped(deltas.astype(np.uint32), lens,
                                   np.minimum(w, 32))
    sizes = 9 + psizes
    out = np.zeros(int(sizes.sum()), np.uint8)
    off = np.cumsum(sizes) - sizes
    out[off[:, None] + np.arange(8)[None, :]] = (
        mn.astype("<i8").view(np.uint8).reshape(-1, 8))
    out[off + 8] = np.minimum(w, 32).astype(np.uint8)
    _scatter_rows(out, off + 9, packed, psizes)
    return out, sizes


def decode_dfor(flat_bytes: np.ndarray, sizes: np.ndarray, lens: np.ndarray):
    flat_bytes = np.asarray(flat_bytes, np.uint8)
    sizes = np.asarray(sizes, np.int64)
    lens = np.asarray(lens, np.int64)
    off = np.cumsum(sizes) - sizes
    refs = np.ascontiguousarray(
        flat_bytes[off[:, None] + np.arange(8)[None, :]]).view("<i8").reshape(-1)
    w = flat_bytes[off + 8].astype(np.int64)
    d = _unpack_grouped(flat_bytes, off + 9, lens, w).astype(np.int64)
    d += np.repeat(refs, lens)
    # segmented cumsum: global cumsum minus the value just before each row
    if d.size == 0:
        return d.astype(np.uint32)
    starts = np.cumsum(lens) - lens
    g = np.cumsum(d)
    prev = np.where(starts > 0, g[np.maximum(starts - 1, 0)], 0)
    return (g - np.repeat(prev, lens)).astype(np.uint32)


# ---------------------------------------------------------------------------
# RLE
# ---------------------------------------------------------------------------

def encode_rle(flat: np.ndarray, lens: np.ndarray):
    flat = np.asarray(flat).view(np.uint32)
    lens = np.asarray(lens, np.int64)
    total = flat.size
    starts = np.cumsum(lens) - lens
    is_start = np.zeros(total, bool)
    if total:
        is_start[0] = True
        is_start[1:] = flat[1:] != flat[:-1]
        is_start[starts[lens > 0]] = True
    run_idx = np.flatnonzero(is_start)
    run_vals = flat[run_idx]
    run_ends = np.append(run_idx[1:], total)
    run_lens = (run_ends - run_idx).astype(np.uint32)
    row_of_run = _row_of(lens)[run_idx] if total else np.zeros(0, np.int64)
    runs_per_row = np.bincount(row_of_run, minlength=len(lens)).astype(np.int64)
    sizes = 4 + 8 * runs_per_row
    out = np.zeros(int(sizes.sum()), np.uint8)
    off = np.cumsum(sizes) - sizes
    out[off[:, None] + np.arange(4)[None, :]] = (
        runs_per_row.astype("<u4").view(np.uint8).reshape(-1, 4))
    _scatter_rows(out, off + 4,
                  run_vals.astype("<u4").view(np.uint8), 4 * runs_per_row)
    _scatter_rows(out, off + 4 + 4 * runs_per_row,
                  run_lens.astype("<u4").view(np.uint8), 4 * runs_per_row)
    return out, sizes


def decode_rle(flat_bytes: np.ndarray, sizes: np.ndarray, lens: np.ndarray):
    flat_bytes = np.asarray(flat_bytes, np.uint8)
    sizes = np.asarray(sizes, np.int64)
    lens = np.asarray(lens, np.int64)
    off = np.cumsum(sizes) - sizes
    nruns = np.ascontiguousarray(
        flat_bytes[off[:, None] + np.arange(4)[None, :]]).view("<u4").reshape(-1).astype(np.int64)
    vals_flat = gather_ranges(flat_bytes, off + 4, 4 * nruns)
    lens_flat = gather_ranges(flat_bytes, off + 4 + 4 * nruns, 4 * nruns)
    run_vals = np.ascontiguousarray(vals_flat).view("<u4")
    run_lens = np.ascontiguousarray(lens_flat).view("<u4").astype(np.int64)
    return np.repeat(run_vals, run_lens)


# ---------------------------------------------------------------------------
# Dictionary
# ---------------------------------------------------------------------------

def encode_dict(flat: np.ndarray, lens: np.ndarray):
    flat = np.asarray(flat).view(np.uint32)
    lens = np.asarray(lens, np.int64)
    total = flat.size
    ndocs = len(lens)
    row = _row_of(lens)
    key = (row.astype(np.uint64) << np.uint64(32)) | flat.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    sv, sr = flat[order], row[order]
    new = np.ones(total, bool)
    if total:
        k = key[order]
        new[1:] = k[1:] != k[:-1]
    card = np.bincount(sr[new], minlength=ndocs).astype(np.int64) if total \
        else np.zeros(ndocs, np.int64)
    grank = np.cumsum(new) - 1 if total else np.zeros(0, np.int64)
    first = np.cumsum(card) - card
    local = grank - first[sr] if total else grank
    if card.max(initial=0) > 0xFFFF:
        raise ValueError("dict codec: per-row cardinality exceeds u16 "
                         "(selector must not pick dict for such rows)")
    idx_flat = np.empty(total, np.uint32)
    idx_flat[order] = local.astype(np.uint32)
    dict_vals = sv[new] if total else sv  # per-row dictionaries, contiguous
    w = width_for(np.maximum(card - 1, 0).astype(np.uint64))
    packed, psizes = _pack_grouped(idx_flat, lens, w)
    sizes = 4 + 4 * card + psizes
    out = np.zeros(int(sizes.sum()), np.uint8)
    off = np.cumsum(sizes) - sizes
    out[off[:, None] + np.arange(2)[None, :]] = (
        card.astype("<u2").view(np.uint8).reshape(-1, 2))
    out[off + 2] = w.astype(np.uint8)
    _scatter_rows(out, off + 4,
                  dict_vals.astype("<u4").view(np.uint8), 4 * card)
    _scatter_rows(out, off + 4 + 4 * card, packed, psizes)
    return out, sizes


def decode_dict(flat_bytes: np.ndarray, sizes: np.ndarray, lens: np.ndarray):
    flat_bytes = np.asarray(flat_bytes, np.uint8)
    sizes = np.asarray(sizes, np.int64)
    lens = np.asarray(lens, np.int64)
    off = np.cumsum(sizes) - sizes
    card = np.ascontiguousarray(
        flat_bytes[off[:, None] + np.arange(2)[None, :]]).view("<u2").reshape(-1).astype(np.int64)
    w = flat_bytes[off + 2].astype(np.int64)
    dict_flat = np.ascontiguousarray(
        gather_ranges(flat_bytes, off + 4, 4 * card)).view("<u4")
    idx = _unpack_grouped(flat_bytes, off + 4 + 4 * card, lens, w).astype(np.int64)
    dict_starts = np.cumsum(card) - card
    return dict_flat[idx + np.repeat(dict_starts, lens)]
