"""FSST-style symbol-table string compression (vectorized, lossless).

North-rule string codec.  This is a simplified FSST variant ("FSST-lite"):
symbols are the most frequent byte BIGRAMS of a sample (canonical FSST
uses 1-8 byte symbols built by iterative refinement; we trade some ratio
for a fully numpy-vectorizable encoder — documented divergence).

Code space: 0x00-0x7F literal ASCII byte; 0x80-0xFE one of up to 127
bigram symbols; 0xFF escape (next encoded byte is a literal, used for
input bytes >= 0x80 so arbitrary UTF-8 round-trips).

Greedy leftmost matching is vectorized with the run-parity trick: within
each maximal run of candidate positions, exactly the even offsets are
replaced — equivalent to sequential greedy left-to-right.
"""

from __future__ import annotations

import numpy as np

from ..operators.framing import gather_ranges

ESCAPE = 0xFF
FIRST_CODE = 0x80
MAX_SYMBOLS = 127


def build_table(sample_bytes: np.ndarray, max_symbols: int = MAX_SYMBOLS,
                min_count: int = 4) -> np.ndarray:
    """Top bigrams of a concatenated uint8 sample -> uint16 array of
    bigram keys (a*256+b), most frequent first."""
    if sample_bytes.size < 2:
        return np.zeros(0, np.uint16)
    pairs = sample_bytes[:-1].astype(np.uint32) * 256 + sample_bytes[1:]
    counts = np.bincount(pairs, minlength=65536)
    order = np.argsort(counts, kind="stable")[::-1][:max_symbols]
    keep = order[counts[order] >= min_count]
    return keep.astype(np.uint16)


def _run_parity_select(cand: np.ndarray, boundary: np.ndarray) -> np.ndarray:
    """cand positions chosen by greedy leftmost matching: within each
    maximal run of True (runs broken at ``boundary`` positions), keep
    even offsets."""
    if cand.size == 0:
        return cand
    prev = np.zeros_like(cand)
    prev[1:] = cand[:-1]
    prev[boundary] = False
    run_start = cand & ~prev
    # index of the run start for every position in a run
    idx = np.arange(cand.size)
    start_idx = np.where(run_start, idx, 0)
    start_idx = np.maximum.accumulate(np.where(cand, start_idx, idx))
    return cand & (((idx - start_idx) & 1) == 0)


def encode_strings(data: np.ndarray, lens: np.ndarray,
                   table: np.ndarray):
    """Encode concatenated uint8 string bytes (row lengths ``lens``).

    Returns (encoded uint8 flat, encoded row lens int64)."""
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.uint8), np.zeros(len(lens), np.int64)
    starts = np.cumsum(lens) - lens
    b = np.asarray(data, np.uint8)
    code_of = np.full(65536, -1, np.int32)
    code_of[table.astype(np.int64)] = FIRST_CODE + np.arange(table.size)

    pair_key = np.zeros(total, np.int64)
    pair_key[:-1] = b[:-1].astype(np.int64) * 256 + b[1:]
    cand = code_of[pair_key] >= 0
    # a pair must not span a row boundary; last position has no pair
    row_last = starts + lens - 1
    cand[row_last[lens > 0]] = False
    boundary = np.zeros(total, bool)
    boundary[starts[lens > 0]] = True
    rep = _run_parity_select(cand, boundary)
    consumed = np.zeros(total, bool)
    consumed[1:] = rep[:-1]

    is_lit = ~rep & ~consumed
    needs_escape = is_lit & (b >= 0x80)
    out_len_per_pos = np.where(rep, 1, np.where(consumed, 0,
                               np.where(needs_escape, 2, 1)))
    out_off = np.cumsum(out_len_per_pos) - out_len_per_pos
    out_total = int(out_len_per_pos.sum())
    out = np.zeros(out_total, np.uint8)
    # symbols
    out[out_off[rep]] = code_of[pair_key[rep]].astype(np.uint8)
    # plain literals
    plain = is_lit & ~needs_escape
    out[out_off[plain]] = b[plain]
    # escaped literals
    out[out_off[needs_escape]] = ESCAPE
    out[out_off[needs_escape] + 1] = b[needs_escape]

    # per-row encoded lengths via boundaries
    row_of = np.repeat(np.arange(len(lens)), lens)
    enc_lens = np.bincount(row_of, weights=out_len_per_pos,
                           minlength=len(lens)).astype(np.int64)
    return out, enc_lens


def decode_strings(enc: np.ndarray, enc_lens: np.ndarray,
                   table: np.ndarray):
    """Inverse of :func:`encode_strings` -> (decoded uint8 flat, lens)."""
    enc_lens = np.asarray(enc_lens, np.int64)
    total = int(enc_lens.sum())
    if total == 0:
        return np.zeros(0, np.uint8), np.zeros(len(enc_lens), np.int64)
    starts = np.cumsum(enc_lens) - enc_lens
    e = np.asarray(enc, np.uint8)
    sym_a = (table >> 8).astype(np.uint8)
    sym_b = (table & 0xFF).astype(np.uint8)

    is_escape_marker = e == ESCAPE
    boundary = np.zeros(total, bool)
    boundary[starts[enc_lens > 0]] = True
    # escapes consume the next byte; chains resolve with the same parity
    esc = _run_parity_select(is_escape_marker, boundary)
    consumed = np.zeros(total, bool)
    consumed[1:] = esc[:-1]
    is_sym = (e >= FIRST_CODE) & (e < ESCAPE) & ~consumed & ~esc
    is_lit = ~esc & ~consumed & ~is_sym

    out_len = np.where(esc, 1, np.where(consumed, 0, np.where(is_sym, 2, 1)))
    out_off = np.cumsum(out_len) - out_len
    out = np.zeros(int(out_len.sum()), np.uint8)
    out[out_off[is_lit]] = e[is_lit]
    # escaped literal: output the byte AFTER the marker
    nxt = np.zeros(total, np.uint8)
    nxt[:-1] = e[1:]
    out[out_off[esc]] = nxt[esc]
    si = e[is_sym].astype(np.int64) - FIRST_CODE
    out[out_off[is_sym]] = sym_a[si]
    out[out_off[is_sym] + 1] = sym_b[si]

    row_of = np.repeat(np.arange(len(enc_lens)), enc_lens)
    dec_lens = np.bincount(row_of, weights=out_len,
                           minlength=len(enc_lens)).astype(np.int64)
    return out, dec_lens


def strings_to_flat(strings) -> tuple[np.ndarray, np.ndarray]:
    """Encode a list of str/bytes to (uint8 flat, lens)."""
    bs = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
    lens = np.fromiter((len(x) for x in bs), np.int64, count=len(bs))
    flat = np.frombuffer(b"".join(bs), np.uint8)
    return flat, lens


def flat_to_strings(flat: np.ndarray, lens: np.ndarray) -> list[str]:
    starts = np.cumsum(lens) - lens
    buf = flat.tobytes()
    return [buf[int(s): int(s) + int(n)].decode("utf-8")
            for s, n in zip(starts, lens)]
