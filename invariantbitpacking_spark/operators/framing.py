"""Framing of variable-length token sequences into codec blocks.

The reference codec operates on rectangular [num_vecs x vec_size]
matrices (src/preprocess.cu:23).  Our input rows are variable-length
``tokens array<int32>``, so each document is split into
``n_tok // vec_size`` FULL blocks of ``vec_size`` tokens plus (when
``n_tok % vec_size != 0``) one ragged TAIL block of width
``L = n_tok % vec_size`` encoded against ``mask[:L]``/``bitval[:L]``.

Ragged tails instead of zero-padding: padding a 60-token document out
to 128 would *grow* its compressed size past its raw size (the pad
zeros still cost their residual bits), which at corpus scale wastes
10-50% on short documents.  On rectangular inputs (every reference
test vector) framing is the identity and the byte streams stay
bit-identical to the reference.

All framing is whole-batch vectorized numpy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

VEC_SIZE = 128


MAX_BATCH_TOKENS = 16_000_000  # ~64 MB of int32 per UDF sub-batch


def split_by_token_mass(pdf, tokens_col: str = "tokens",
                        max_tokens: int | None = None):
    """Split one Arrow batch into sub-batches bounded by total token
    count.  Spark caps batches by ROW count
    (spark.sql.execution.arrow.maxRecordsPerBatch) but not by bytes, so
    a batch of long documents could otherwise materialize multi-GB
    framing buffers inside the Python worker.

    ``tokens_col`` may be the token-array column or an integer length
    column (e.g. ``n_tok`` on already-encoded tables)."""
    if max_tokens is None:
        max_tokens = MAX_BATCH_TOKENS
    vals = pdf[tokens_col].values
    if vals.dtype == object:
        lens = np.fromiter((len(a) if a is not None else 0 for a in vals),
                           np.int64, count=len(pdf))
    else:
        lens = np.asarray(vals, np.int64)
    if lens.sum() <= max_tokens:
        yield pdf
        return
    bucket = np.minimum(np.cumsum(lens) // max_tokens, np.iinfo(np.int64).max)
    start = 0
    for i in range(1, len(pdf) + 1):
        if i == len(pdf) or bucket[i] != bucket[start]:
            yield pdf.iloc[start:i].reset_index(drop=True)
            start = i


def gather_ranges(flat: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenate flat[starts[i] : starts[i]+lengths[i]] for all i —
    variable-length gather.

    Adaptive: tiny ranges use one vectorized index build (a cumsum over
    per-position deltas: ones within a range, a jump at each boundary —
    per-range Python would dominate); large ranges use a per-range
    slice-copy loop, where each iteration is a pure C memcpy and the
    vectorized path's int64 index arrays would move ~8-40x the payload
    bytes in index traffic."""
    lengths = np.asarray(lengths, np.int64)
    starts = np.asarray(starts, np.int64)
    total = int(lengths.sum())
    if total == 0:
        return flat[:0]
    nz = lengths > 0
    if not nz.all():
        starts, lengths = starts[nz], lengths[nz]
    # coalesce adjacent ranges (flat[s:s+n] runs merge when contiguous)
    if len(lengths) > 1:
        brk = np.ones(len(lengths), bool)
        brk[1:] = starts[1:] != starts[:-1] + lengths[:-1]
        if not brk.all():
            bidx = np.flatnonzero(brk)
            starts = starts[bidx]
            lengths = np.add.reduceat(lengths, bidx)
    if total * flat.dtype.itemsize >= len(lengths) * 1024:
        out = np.empty(total, flat.dtype)
        out_pos = np.cumsum(lengths) - lengths
        for d, s, n in zip(out_pos.tolist(), starts.tolist(),
                           lengths.tolist()):
            out[d:d + n] = flat[s:s + n]
        return out
    out_pos = np.cumsum(lengths) - lengths
    idx = np.ones(total, np.int64)
    idx[0] = starts[0]
    if len(starts) > 1:
        idx[out_pos[1:]] = starts[1:] - (starts[:-1] + lengths[:-1]) + 1
    return flat[np.cumsum(idx)]


@dataclass
class FramedBatch:
    """Blocks of one Arrow batch of documents, doc-major order."""

    lens: np.ndarray       # int64[ndocs] token counts
    nfull: np.ndarray      # int64[ndocs] full-block counts
    tail_len: np.ndarray   # int64[ndocs] tail width (0 = no tail)
    nblocks: np.ndarray    # int64[ndocs] = nfull + (tail_len > 0)
    full_mat: np.ndarray   # uint32 [sum(nfull), vec_size]
    # tail groups: width L -> (matrix uint32 [nL, L], doc index int64[nL])
    tails: dict[int, tuple[np.ndarray, np.ndarray]]
    vec_size: int


SIGNED_DT = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}
UNSIGNED_DT = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def frame_batch_flat(tok_flat: np.ndarray, starts: np.ndarray,
                     lens: np.ndarray,
                     vec_size: int = VEC_SIZE) -> FramedBatch:
    """Frame documents given directly as (flat values, per-doc starts,
    per-doc lengths) — the Arrow ListArray layout (``values`` buffer +
    ``offsets``), so ``mapInArrow`` paths frame with ZERO per-document
    Python: no list of arrays, no concatenate.  ``starts`` need not be
    contiguous (null docs carry len 0 and any start)."""
    sdt = SIGNED_DT[tok_flat.dtype.itemsize]
    udt = UNSIGNED_DT[tok_flat.dtype.itemsize]
    tok_flat = tok_flat.view(sdt)
    lens = np.asarray(lens, np.int64)
    starts = np.asarray(starts, np.int64)
    nfull = lens // vec_size
    tail_len = lens % vec_size
    nblocks = nfull + (tail_len > 0)

    full_mat = gather_ranges(tok_flat, starts, nfull * vec_size)
    full_mat = full_mat.reshape(-1, vec_size).view(udt)

    tails: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    tdocs = np.flatnonzero(tail_len)
    if tdocs.size:
        tstarts = starts[tdocs] + nfull[tdocs] * vec_size
        twidth = tail_len[tdocs]
        order = np.argsort(twidth, kind="stable")
        tdocs, tstarts, twidth = tdocs[order], tstarts[order], twidth[order]
        uniq, grp_start = np.unique(twidth, return_index=True)
        grp_end = np.append(grp_start[1:], twidth.size)
        for L, s, e in zip(uniq, grp_start, grp_end):
            L = int(L)
            docs = tdocs[s:e]
            mat = gather_ranges(tok_flat, tstarts[s:e], twidth[s:e])
            tails[L] = (mat.reshape(-1, L).view(udt), docs)

    return FramedBatch(lens, nfull, tail_len, nblocks, full_mat, tails,
                       vec_size)


def list_array_flat(col, itemsize: int = 4):
    """Decompose a pyarrow ListArray (or ChunkedArray with one chunk)
    into ``(values uint8-view flat, starts, lens)`` numpy views — the
    zero-copy input contract of :func:`frame_batch_flat`.  Null entries
    become length-0 documents.  Handles sliced arrays (offsets reflect
    the slice window; values stay the full child buffer)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    if col.null_count:
        nulls = col.is_null().to_numpy(zero_copy_only=False)
        lens = np.where(nulls, 0, lens)
    sdt = SIGNED_DT[itemsize]
    values_arr = col.values
    if values_arr.null_count:
        # Null ELEMENTS in the child buffer make to_numpy fall back to
        # float64+NaN, and viewing that as int silently corrupts every
        # token after the first null.  A null inside a live document
        # window is real (Spark allows array<int> element nulls) but
        # meaningless to a token codec -> fail loudly.  Nulls outside
        # every window (slice artifacts) are zero-filled and harmless.
        null_pos = np.flatnonzero(
            values_arr.is_null().to_numpy(zero_copy_only=False))
        if null_pos.size and starts.size:
            doc = np.searchsorted(starts, null_pos, "right") - 1
            doc = np.maximum(doc, 0)
            if ((null_pos >= starts[doc]) &
                    (null_pos < starts[doc] + lens[doc])).any():
                raise ValueError(
                    "tokens arrays contain null elements; null-free "
                    "array<int> input is required for encoding")
        values_arr = values_arr.fill_null(0)
    values = values_arr.to_numpy(zero_copy_only=False)
    if values.dtype.kind == "f" and values.dtype.itemsize == itemsize:
        # float feature columns (array<float>/array<double> — the
        # reference's DLRM-embedding / KV-cache workloads view float
        # tensors as int words, tests/nvcomp_comparison.py:39,
        # tests/invariance_perc.py:112): reinterpret the IEEE bits as
        # same-width integers.  Zero-copy view; the codec layer is
        # bit-pattern-generic, and the decode side views back.
        values = values.view(sdt)
    if values.dtype.kind not in "iu" or values.dtype.itemsize != itemsize:
        raise ValueError(
            f"token values decoded to {values.dtype}, expected a "
            f"{itemsize}-byte integer or float dtype")
    return np.ascontiguousarray(values).view(sdt), starts, lens


def frame_batch(token_arrays, vec_size: int = VEC_SIZE,
                itemsize: int = 4) -> FramedBatch:
    """``itemsize`` selects the element width: 1/2/4/8 bytes — the full
    reference preprocess dtype dispatch (src/preprocess.cu:25-26,
    56-72 instantiates int8/int16/int32/ull; compress adds the 4/8-byte
    pair, src/compress.cu:192).  4 (int32 tokens) is the primary path;
    1/2-byte views cover byte-quantized embeddings and uint16 vocab
    ids.  Matrices come out as the unsigned twin; the numpy codec layer
    is dtype-generic."""
    sdt = SIGNED_DT[itemsize]
    udt = UNSIGNED_DT[itemsize]
    # null arrays (SQL NULL tokens) are treated as empty documents
    arrs = [np.asarray(a, sdt) if a is not None else np.zeros(0, sdt)
            for a in token_arrays]
    ndocs = len(arrs)
    lens = np.fromiter((a.size for a in arrs), np.int64, count=ndocs)
    nfull = lens // vec_size
    tail_len = lens % vec_size
    nblocks = nfull + (tail_len > 0)

    tok_flat = (np.concatenate(arrs) if lens.sum() else np.zeros(0, sdt))
    doc_tok_start = np.cumsum(lens) - lens

    # full blocks, doc-major
    full_mat = gather_ranges(tok_flat, doc_tok_start, nfull * vec_size)
    full_mat = full_mat.reshape(-1, vec_size).view(udt)

    # ragged tails grouped by width
    tails: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    tdocs = np.flatnonzero(tail_len)
    if tdocs.size:
        tstarts = doc_tok_start[tdocs] + nfull[tdocs] * vec_size
        twidth = tail_len[tdocs]
        order = np.argsort(twidth, kind="stable")
        tdocs, tstarts, twidth = tdocs[order], tstarts[order], twidth[order]
        uniq, grp_start = np.unique(twidth, return_index=True)
        grp_end = np.append(grp_start[1:], twidth.size)
        for L, s, e in zip(uniq, grp_start, grp_end):
            L = int(L)
            docs = tdocs[s:e]
            mat = gather_ranges(tok_flat, tstarts[s:e], twidth[s:e])
            tails[L] = (mat.reshape(-1, L).view(udt), docs)

    return FramedBatch(lens, nfull, tail_len, nblocks, full_mat, tails, vec_size)


def unframe_flat(fb: FramedBatch, full_dec: np.ndarray,
                 tail_dec: dict[int, np.ndarray]):
    """Rebuild the batch's decoded tokens as ONE flat array plus
    per-doc start offsets (the Arrow ListArray layout) — no per-doc
    Python at all."""
    v = fb.vec_size
    total = int(fb.lens.sum())
    sdt = SIGNED_DT[full_dec.dtype.itemsize]
    flat = np.zeros(total, sdt)
    doc_tok_start = np.cumsum(fb.lens) - fb.lens
    from ..codecs.lightweight import _scatter_rows

    full_flat = full_dec.view(sdt).reshape(-1)
    _scatter_rows(flat, doc_tok_start, full_flat, fb.nfull * v)
    # scatter tails: same width within a group, so targets broadcast
    # directly (no O(total) index build per group)
    for L, (mat, docs) in fb.tails.items():
        dec = tail_dec[L].view(sdt).reshape(-1, L)
        tstarts = doc_tok_start[docs] + fb.nfull[docs] * v
        flat[tstarts[:, None] + np.arange(L)[None, :]] = dec
    return flat, doc_tok_start


def unframe_batch(fb: FramedBatch, full_dec: np.ndarray,
                  tail_dec: dict[int, np.ndarray]) -> list[np.ndarray]:
    """Rebuild per-document int32 token arrays from decoded full-block
    and tail-group matrices."""
    flat, doc_tok_start = unframe_flat(fb, full_dec, tail_dec)
    return [flat[int(doc_tok_start[i]): int(doc_tok_start[i]) + int(fb.lens[i])]
            for i in range(len(fb.lens))]


# Backwards-compatible rectangular helpers (used by tests / stats on
# rectangular data).

def frame_tokens(token_arrays, vec_size: int = VEC_SIZE):
    """Zero-padded rectangular framing: [N x vec_size] plus per-doc
    block counts.  Retained for stats paths and tests on rectangular
    data; the encode/decode pipeline uses ragged frame_batch."""
    fb = frame_batch(token_arrays, vec_size)
    total_blocks = int(fb.nblocks.sum())
    out = np.zeros((total_blocks, vec_size), np.uint32)
    blk_start = np.cumsum(fb.nblocks) - fb.nblocks
    # place full blocks
    if fb.full_mat.shape[0]:
        fidx = gather_ranges(np.arange(total_blocks, dtype=np.int64),
                             blk_start, fb.nfull)
        out[fidx] = fb.full_mat
    for L, (mat, docs) in fb.tails.items():
        out[blk_start[docs] + fb.nfull[docs], :L] = mat
    return out, fb.nblocks


def unframe_tokens(matrix: np.ndarray, nblocks: np.ndarray, n_toks: np.ndarray):
    """Inverse of :func:`frame_tokens` (rectangular layout)."""
    vec_size = matrix.shape[1]
    flat = matrix.view(np.int32).reshape(-1)
    doc_blk_start = np.cumsum(nblocks) - nblocks
    return [flat[int(doc_blk_start[i]) * vec_size:
                 int(doc_blk_start[i]) * vec_size + int(n_toks[i])]
            for i in range(len(nblocks))]
