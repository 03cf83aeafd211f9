"""Distributed IBP operators: parameter learning, encode, decode.

Spark-first re-expression of the reference's three hot entry points
(SURVEY.md §3):

- :func:`learn_params` == ``ibp.preprocess`` (src/preprocess.cu:17-76):
  one distributed partial+final aggregation for the per-(column, bit)
  histogram (count_bit_kernel, ibp_preproc_kernels.cuh:8-31), a
  driver-side numpy mask construction per threshold
  (create_mask, :34-51), then ONE more distributed pass evaluating all
  swept thresholds simultaneously (check_feats, :54-77) — strictly
  fewer scans than the reference's 1 + |grid| kernel launches.
- :func:`encode_ibp` == ``compress_condensed`` (src/compress.cu:238-313):
  an Arrow-batched ``mapInPandas`` projection producing per-document
  binary payloads; no shuffle, no driver collection.
- :func:`decode_ibp` == ``decompress_fetch`` (src/decompress.cu:10-142):
  the inverse projection; gather-by-id variants compose with a plain
  DataFrame join upstream.

Documents are framed into full ``vec_size`` blocks plus one ragged
tail block (see operators/framing.py); tail blocks of width L use
``mask[:L]``/``bitval[:L]``, so rectangular inputs remain bit-identical
to the reference while short documents pay no padding tax.

Codec parameters ride to executors inside the UDF closure (they are
``vec_size`` words — broadcast-variable semantics without the
ceremony).  All hot loops are whole-batch numpy over Arrow data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..codecs import numpy_ref as nr
from .framing import (SIGNED_DT, UNSIGNED_DT, VEC_SIZE, FramedBatch,
                      frame_batch, gather_ranges, split_by_token_mass,
                      unframe_batch)


@dataclass
class IbpParams:
    """The learned codec parameters — the reference's (mask, bitval)
    'IR' (SURVEY.md §3.1) plus provenance for lineage records."""

    mask: np.ndarray  # uint32/uint64 [vec_size] (dtype == element width)
    bitval: np.ndarray  # same dtype as mask
    vec_size: int = VEC_SIZE
    threshold: float | None = None
    saved_bits: int = 0
    num_vecs: int = 0

    @property
    def item_bytes(self) -> int:
        """Element width in bytes (the reference's dtype dispatch,
        src/preprocess.cu:56-72 / src/compress.cu:192: 4- or 8-byte
        words in the distributed path)."""
        return self.mask.dtype.itemsize

    def to_dict(self) -> dict:
        return {
            "vec_size": self.vec_size,
            "threshold": self.threshold,
            "saved_bits": int(self.saved_bits),
            "num_vecs": int(self.num_vecs),
            "item_bytes": self.item_bytes,
            "mask": self.mask.tolist(),
            "bitval": self.bitval.tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "IbpParams":
        from .framing import UNSIGNED_DT

        dt = UNSIGNED_DT[int(d.get("item_bytes", 4))]
        return cls(
            mask=np.array(d["mask"], dt),
            bitval=np.array(d["bitval"], dt),
            vec_size=int(d["vec_size"]),
            threshold=d.get("threshold"),
            saved_bits=int(d.get("saved_bits", 0)),
            num_vecs=int(d.get("num_vecs", 0)),
        )


def _elem_bytes(df: DataFrame, tokens_col: str) -> int:
    """Element width from the Spark schema: 1 for array<tinyint>, 2 for
    array<smallint>, 4 for array<int>, 8 for array<bigint> — the full
    reference element-size dispatch (src/preprocess.cu:25-26, 56-72
    instantiates int8/int16/int32/ull)."""
    from pyspark.sql.types import ArrayType, ByteType, LongType, ShortType

    dt = df.schema[tokens_col].dataType
    if isinstance(dt, ArrayType):
        if isinstance(dt.elementType, ByteType):
            return 1
        if isinstance(dt.elementType, ShortType):
            return 2
        if isinstance(dt.elementType, LongType):
            return 8
    return 4


# ---------------------------------------------------------------------------
# learn_params (preprocess)
# ---------------------------------------------------------------------------

def _batch_counts(fb: FramedBatch, vec_size: int, word_bits: int = 32):
    """Set-bit counts [v, W] + per-column block coverage [v]."""
    counts = np.zeros((vec_size, word_bits), np.int64)
    cov = np.zeros(vec_size, np.int64)
    if fb.full_mat.shape[0]:
        counts += nr.count_bits(fb.full_mat)
        cov += fb.full_mat.shape[0]
    for L, (mat, _) in fb.tails.items():
        counts[:L] += nr.count_bits(mat)
        cov[:L] += mat.shape[0]
    return counts, cov


def bit_count_df(df: DataFrame, tokens_col: str = "tokens",
                 vec_size: int = VEC_SIZE) -> DataFrame:
    """Distributed per-(column, bit) set-count histogram as a DataFrame
    ``(pos int, cnt long)``: ``pos = col * 32 + bit`` (LSB-first bit
    index) for set counts, plus ``pos = vec_size*32 + col`` rows
    carrying per-column block coverage (how many blocks include that
    column — needed because ragged tails cover a prefix of columns),
    and a sentinel ``pos = -1`` with the total block count.  Partial
    sums per Arrow batch + a small-key final ``groupBy`` = the exact
    partial/final shape of count_bit_kernel's shmem-then-atomicAdd
    scheme (ibp_preproc_kernels.cuh:8-31).  The word width W follows the
    input element type (32 for array<int>, 64 for array<bigint> —
    src/preprocess.cu:56-72 dtype dispatch)."""
    ib = _elem_bytes(df, tokens_col)
    w = ib * 8

    def counter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf0 in batches:
          for pdf in split_by_token_mass(pdf0, tokens_col):
            fb = frame_batch(pdf[tokens_col].values, vec_size, itemsize=ib)
            counts, cov = _batch_counts(fb, vec_size, w)
            yield pd.DataFrame({
                "pos": np.concatenate(
                    [[-1], np.arange(vec_size * w + vec_size)]),
                "cnt": np.concatenate(
                    [[int(fb.nblocks.sum())], counts.reshape(-1), cov]),
            })

    partial = df.select(tokens_col).mapInPandas(counter, schema="pos int, cnt long")
    return partial.groupBy("pos").agg(F.sum("cnt").alias("cnt"))


def _gated_savings(mat: np.ndarray, mask: np.ndarray, bitval: np.ndarray,
                   mask_popc: np.ndarray) -> int:
    """check_feats semantics (ibp_preproc_kernels.cuh:54-77): per-block
    savings count only when strictly above the block's header bits."""
    L = mat.shape[1]
    pred = (mat & mask[None, :L]) == bitval[None, :L]
    per_vec = (pred * mask_popc[None, :L]).sum(axis=1, dtype=np.int64)
    return int(np.where(per_vec > L, per_vec - L, 0).sum())


def learn_params(df: DataFrame, tokens_col: str = "tokens",
                 vec_size: int = VEC_SIZE, threshold: float | None = None,
                 sample_fraction: float | None = None,
                 seed: int = 42) -> IbpParams:
    """Learn (mask, bitval) over the whole table (or a sample — the
    reference's sens_sweep fits on a prefix sample, tests/sens_sweep.py:
    20-24; ``df.sample`` is the distribution-safe analog)."""
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)
    ib = _elem_bytes(df, tokens_col)
    w = ib * 8
    udt = UNSIGNED_DT[ib]

    rows = bit_count_df(df, tokens_col, vec_size).collect()
    counts = np.zeros(vec_size * w, np.int64)
    cov = np.zeros(vec_size, np.int64)
    num_vecs = 0
    for r in rows:
        if r["pos"] == -1:
            num_vecs = int(r["cnt"])
        elif r["pos"] >= vec_size * w:
            cov[r["pos"] - vec_size * w] = r["cnt"]
        else:
            counts[r["pos"]] = r["cnt"]
    counts = counts.reshape(vec_size, w)
    if num_vecs == 0:
        z = np.zeros(vec_size, udt)
        return IbpParams(z, z.copy(), vec_size, None, 0, 0)

    grid = [threshold] if threshold is not None else nr.sweep_thresholds()
    cands = [nr.create_mask(counts, cov, t) for t in grid]
    masks = np.stack([m for m, _ in cands])        # [G, v]
    bitvals = np.stack([b for _, b in cands])      # [G, v]
    mask_popc = np.stack([nr._popcount(m) for m in masks])  # [G, v]

    # Single evaluation pass for ALL thresholds: per batch, per-block
    # gated savings (ibp_preproc_kernels.cuh:69-72) summed per candidate.
    def evaluator(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf0 in batches:
          for pdf in split_by_token_mass(pdf0, tokens_col):
            fb = frame_batch(pdf[tokens_col].values, vec_size, itemsize=ib)
            saveds = np.zeros(len(grid), np.int64)
            for g in range(len(grid)):
                if fb.full_mat.shape[0]:
                    saveds[g] += _gated_savings(
                        fb.full_mat, masks[g], bitvals[g], mask_popc[g])
                for L, (mat, _) in fb.tails.items():
                    saveds[g] += _gated_savings(
                        mat, masks[g], bitvals[g], mask_popc[g])
            yield pd.DataFrame({"ti": np.arange(len(grid)), "saved": saveds})

    ev = (
        df.select(tokens_col)
        .mapInPandas(evaluator, schema="ti int, saved long")
        .groupBy("ti").agg(F.sum("saved").alias("saved"))
        .collect()
    )
    saved_by_t = np.zeros(len(grid), np.int64)
    for r in ev:
        saved_by_t[r["ti"]] = r["saved"]

    # strict improvement, earlier threshold wins ties
    # (ibp_preproc_host.cuh:92-95)
    best_g, best_saved = None, 0
    for g in range(len(grid)):
        if saved_by_t[g] > best_saved:
            best_g, best_saved = g, int(saved_by_t[g])
    if best_g is None:
        z = np.zeros(vec_size, udt)
        return IbpParams(z, z.copy(), vec_size, None, 0, num_vecs)
    return IbpParams(masks[best_g].copy(), bitvals[best_g].copy(), vec_size,
                     float(grid[best_g]), best_saved, num_vecs)


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

ENCODED_SCHEMA = (
    "doc_id string, source string, n_tok int, n_blocks int, "
    "block_sizes array<int>, block_flags binary, payload binary, "
    "comp_bytes long, raw_bytes long, codec string"
)


def encode_batch_flat(fb: FramedBatch, mask: np.ndarray, bitval: np.ndarray):
    """Encode one framed batch into ONE doc-major buffer (no per-doc
    Python in the byte assembly — every phase is a vectorized scatter).

    Returns ``(buf, doc_bytes, sizes, flags_packed, flag_nbytes)``:
    ``buf`` uint8 holds every doc's blocks back-to-back doc-major,
    ``doc_bytes`` int64[ndocs] each doc's payload span in ``buf``,
    ``sizes`` int64[sum(nblocks)] the flat doc-major per-block byte
    sizes, ``flags_packed`` uint8 the per-doc byte-padded LSB-first
    compressed bitmaps back-to-back, ``flag_nbytes`` int64[ndocs] each
    doc's bitmap width in ``flags_packed``."""
    from ..codecs.lightweight import _scatter_rows

    ndocs = len(fb.lens)
    nb_tot = int(fb.nblocks.sum())
    blk_start = np.cumsum(fb.nblocks) - fb.nblocks
    sizes = np.zeros(nb_tot, np.int64)
    is_comp = np.zeros(nb_tot, bool)
    pending: list[tuple] = []  # (global block ids, group blob, sizes)
    if fb.full_mat.shape[0]:
        flat_full, sizes_full, comp_full = nr.encode_concat(
            fb.full_mat, mask, bitval)
        doc_of_full = np.repeat(np.arange(ndocs), fb.nfull)
        within = (np.arange(fb.full_mat.shape[0])
                  - np.repeat(np.cumsum(fb.nfull) - fb.nfull, fb.nfull))
        gidx = blk_start[doc_of_full] + within
        sizes[gidx] = sizes_full
        is_comp[gidx] = comp_full
        pending.append((gidx, flat_full, sizes_full))
    for L, (mat, docs) in fb.tails.items():
        tflat, tsizes, tcomp = nr.encode_concat(mat, mask[:L], bitval[:L])
        gidx = blk_start[docs] + fb.nblocks[docs] - 1
        sizes[gidx] = tsizes
        is_comp[gidx] = tcomp
        pending.append((gidx, tflat, tsizes))
    offsets = np.cumsum(sizes) - sizes
    buf = np.zeros(int(sizes.sum()), np.uint8)
    for gidx, flat, sz in pending:
        _scatter_rows(buf, offsets[gidx], flat, sz)
    # blocks are doc-major, so each doc's payload is one contiguous span
    doc_bytes = np.add.reduceat(
        np.append(sizes, 0), np.minimum(blk_start, nb_tot)) * (fb.nblocks > 0)
    # per-doc byte-padded flag bitmaps packed in ONE packbits call
    flag_bits = ((fb.nblocks + 7) // 8) * 8
    fbit_start = np.cumsum(flag_bits) - flag_bits
    bigbits = np.zeros(int(flag_bits.sum()), np.uint8)
    if nb_tot:
        within_all = np.arange(nb_tot) - np.repeat(blk_start, fb.nblocks)
        bigbits[np.repeat(fbit_start, fb.nblocks) + within_all] = is_comp
    flags_packed = np.packbits(bigbits, bitorder="little")
    return buf, doc_bytes.astype(np.int64), sizes, flags_packed, flag_bits // 8


def encode_batch(fb: FramedBatch, mask: np.ndarray, bitval: np.ndarray):
    """Encode one framed batch; returns per-doc (payloads bytes list,
    block_sizes list, block_flags bytes list, comp_bytes int64[]).
    All byte assembly happens in :func:`encode_batch_flat`; the per-doc
    loop below only slices contiguous spans (O(ndocs) cheap slicing,
    no per-doc numpy work — the offset-table assembly the reference's
    condensed layout implies, src/compress.cu:284-285)."""
    if len(fb.lens) == 0:
        return [], [], [], np.zeros(0, np.int64)
    buf, doc_bytes, sizes, flags_packed, flag_nbytes = encode_batch_flat(
        fb, mask, bitval)
    doc_off = np.cumsum(doc_bytes) - doc_bytes
    flag_off = np.cumsum(flag_nbytes) - flag_nbytes
    payloads = [buf[o:o + n].tobytes()
                for o, n in zip(doc_off.tolist(), doc_bytes.tolist())]
    bsizes = np.split(sizes.astype(np.int32),
                      np.cumsum(fb.nblocks[:-1]).tolist())
    bflags = [flags_packed[o:o + n].tobytes()
              for o, n in zip(flag_off.tolist(), flag_nbytes.tolist())]
    return payloads, bsizes, bflags, doc_bytes


def encode_ibp(df: DataFrame, params: IbpParams,
               tokens_col: str = "tokens",
               max_batch_tokens: int | None = None) -> DataFrame:
    """Encode the tokens table into per-document condensed blobs.

    Output row = one document: ``payload`` holds its blocks'
    back-to-back blobs (full blocks then the ragged tail),
    ``block_sizes`` their byte sizes, ``block_flags`` the per-block
    compressed bitmap (LSB-first — the reference's ``bitmask`` int32
    array, src/compress.cu:214-215).  A pure narrow projection.
    Element width follows ``params.mask.dtype`` (4- or 8-byte words,
    src/compress.cu:192)."""
    mask, bitval, v = params.mask, params.bitval, params.vec_size
    ib = params.item_bytes

    def encoder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf0 in batches:
          for pdf in split_by_token_mass(pdf0, tokens_col, max_batch_tokens):
            fb = frame_batch(pdf[tokens_col].values, v, itemsize=ib)
            payloads, bsizes, bflags, comp_bytes = encode_batch(fb, mask, bitval)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                # n_tok recomputed from the arrays: decode trims by it
                "n_tok": fb.lens.astype("int32"),
                "n_blocks": fb.nblocks.astype("int32"),
                "block_sizes": bsizes,
                "block_flags": bflags,
                "payload": payloads,
                "comp_bytes": comp_bytes,
                "raw_bytes": fb.lens * ib,
                "codec": "ibp",
            })

    cols = ["doc_id", tokens_col, "source"]
    return df.select(*cols).mapInPandas(encoder, schema=ENCODED_SCHEMA)


def decode_docs(lens: np.ndarray, block_sizes_list, block_flags_list,
                payload_list, mask: np.ndarray, bitval: np.ndarray,
                v: int) -> list[np.ndarray]:
    """Decode a batch of encoded documents to int32 token arrays —
    the vectorized inverse of :func:`encode_batch`."""
    ndocs = len(lens)
    sdt = SIGNED_DT[mask.dtype.itemsize]
    lens = np.asarray(lens, np.int64)
    nfull = lens // v
    tail_len = lens % v
    nblocks = nfull + (tail_len > 0)
    if ndocs == 0 or nblocks.sum() == 0:
        return [np.zeros(0, sdt)] * ndocs
    sizes = np.concatenate(
        [np.asarray(s, np.int64) for s in block_sizes_list])
    flat = np.frombuffer(b"".join(payload_list), np.uint8)
    offsets = np.cumsum(sizes) - sizes
    # per-doc flag bitmaps are byte-padded; unpack per doc width
    bits = np.unpackbits(
        np.frombuffer(b"".join(block_flags_list), np.uint8),
        bitorder="little")
    doc_flag_bits = ((nblocks + 7) // 8) * 8
    fb_start = np.cumsum(doc_flag_bits) - doc_flag_bits
    blk_start = np.cumsum(nblocks) - nblocks
    within = (np.arange(int(nblocks.sum()), dtype=np.int64)
              - np.repeat(blk_start, nblocks))
    is_comp = bits[np.repeat(fb_start, nblocks) + within].astype(bool)

    doc_of_block = np.repeat(np.arange(ndocs), nblocks)
    is_tail = (tail_len[doc_of_block] > 0) & (
        within == (nblocks[doc_of_block] - 1))

    # full blocks: one vectorized decode
    fsel = ~is_tail
    fbuf = gather_ranges(flat, offsets[fsel], sizes[fsel])
    full_dec = nr.decode_concat(
        fbuf, sizes[fsel], is_comp[fsel], v, mask, bitval)

    # tails grouped by width
    tail_dec: dict[int, np.ndarray] = {}
    tails: dict[int, tuple] = {}
    tsel = np.flatnonzero(is_tail)
    if tsel.size:
        widths = tail_len[doc_of_block[tsel]]
        order = np.argsort(widths, kind="stable")
        tsel, widths = tsel[order], widths[order]
        uniq, gs = np.unique(widths, return_index=True)
        ge = np.append(gs[1:], widths.size)
        for L, s, e in zip(uniq, gs, ge):
            L = int(L)
            sel = tsel[s:e]
            buf = gather_ranges(flat, offsets[sel], sizes[sel])
            tail_dec[L] = nr.decode_concat(
                buf, sizes[sel], is_comp[sel], L, mask[:L], bitval[:L])
            tails[L] = (None, doc_of_block[sel])

    fb = FramedBatch(lens, nfull, tail_len, nblocks, full_dec, tails, v)
    return unframe_batch(fb, full_dec, tail_dec)


def predict_sizes_ibp(fb: FramedBatch, mask: np.ndarray,
                      bitval: np.ndarray) -> np.ndarray:
    """Per-document IBP compressed size WITHOUT encoding (the
    get_compress_size operator, src/compress.cu:25-174) — one predicate
    pass over the framed batch."""
    ndocs = len(fb.lens)
    out = np.zeros(ndocs, np.int64)
    if fb.full_mat.shape[0]:
        s = nr.comp_sizes_matrix(fb.full_mat, mask, bitval)
        doc_of_full = np.repeat(np.arange(ndocs), fb.nfull)
        out += np.bincount(doc_of_full, weights=s,
                           minlength=ndocs).astype(np.int64)
    for L, (mat, docs) in fb.tails.items():
        out[docs] += nr.comp_sizes_matrix(mat, mask[:L], bitval[:L])
    return out


def decode_ibp(df: DataFrame, params: IbpParams,
               max_batch_tokens: int | None = None) -> DataFrame:
    """Decode an encoded table back to ``(doc_id, tokens, n_tok,
    source)`` — per-row inverse, bit-identical token arrays.  The
    tokens element type follows ``params.item_bytes`` (int / bigint)."""
    mask, bitval, v = params.mask, params.bitval, params.vec_size

    def decoder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf0 in batches:
          for pdf in split_by_token_mass(pdf0, "n_tok", max_batch_tokens):
            toks = decode_docs(
                pdf["n_tok"].values, pdf["block_sizes"].values,
                pdf["block_flags"].values.tolist(),
                pdf["payload"].values.tolist(), mask, bitval, v)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "tokens": toks,
                "n_tok": pdf["n_tok"].astype("int32"),
                "source": pdf["source"],
            })

    elem = {1: "tinyint", 2: "smallint", 4: "int", 8: "bigint"}[params.item_bytes]
    schema = f"doc_id string, tokens array<{elem}>, n_tok int, source string"
    return df.select("doc_id", "n_blocks", "block_sizes", "block_flags",
                     "payload", "n_tok", "source").mapInPandas(decoder, schema=schema)
