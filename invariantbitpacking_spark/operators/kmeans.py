"""Hamming k-means clustered codec parameters.

Re-expression of ``ibp.preprocess_kmeans`` (reference ibp/__init__.py:
16-17 -> src/preprocess.cu:88-139 -> preproc_kmeans
ibp_preproc_host.cuh:118-284) as an iterative DataFrame job, the
MLlib-KMeans shape (broadcast centroids, assign, re-aggregate) but with
XOR+popcount distance, which MLlib does not offer:

- init: k distinct sample blocks as centroids (the reference uses
  std::random_shuffle, ibp_preproc_host.cuh:176-188; we use a seeded
  numpy choice — divergence in the random stream only, not semantics)
- 10 iterations (ibp_preproc_host.cuh:191-193): assign each block to
  the nearest centroid by Hamming distance (cluster_vecs,
  ibp_preproc_kmeans.cuh:106-150), recompute each centroid bit as the
  cluster majority with integer division (`bits_set > size / 2`,
  construct_bitmasks :219-236); empty clusters collapse to zero
- final: per-cluster (mask, bitval) via the same strict-threshold rule
  (create_mask_many :238-297), sweeping one GLOBAL threshold over the
  float32 grid and keeping the argmax of real gated savings measured
  with per-cluster params (check_feats_many :299-323,
  ibp_preproc_host.cuh:257-268)

Clustering is learned on full blocks (the reference clusters whole
rectangular vectors); ragged tails are assigned at encode time by
prefix Hamming distance.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..codecs import numpy_ref as nr
from ..codecs.lightweight import _scatter_rows
from ..codecs.numpy_ref import popcount32
from .framing import (FramedBatch, VEC_SIZE, frame_batch, frame_batch_flat,
                      gather_ranges, list_array_flat, unframe_flat)
from .ibp import _elem_bytes, _mass_ranges, binary_array_flat


def _cluster_counts_batches(batches, centroids, vec_size):
    """Shared mapInArrow body for the Lloyd/statistics passes: per
    sub-batch, assign full blocks to centroids and emit per-(cluster,
    bit-position) set counts plus a pos=-1 cluster-size row."""
    import pyarrow as pa

    k = centroids.shape[0]
    for rb in batches:
        flat, starts, lens = list_array_flat(rb.column(0), 4)
        for i0, i1 in _mass_ranges(lens, None):
            fb = frame_batch_flat(flat, starts[i0:i1], lens[i0:i1], vec_size)
            if fb.full_mat.shape[0] == 0:
                continue
            cl = hamming_assign(fb.full_mat, centroids)
            bits = nr._bits_msb(fb.full_mat)[..., ::-1]  # LSB-first
            outs_c, outs_p, outs_n = [], [], []
            for c in range(k):
                sel = cl == c
                if not sel.any():
                    continue
                counts = bits[sel].sum(axis=0, dtype=np.int64).reshape(-1)
                outs_c.append(np.full(counts.size + 1, c, np.int32))
                outs_p.append(np.concatenate(
                    [[-1], np.arange(counts.size)]).astype(np.int32))
                outs_n.append(np.concatenate([[int(sel.sum())], counts]))
            if outs_c:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(outs_c), pa.int32()),
                     pa.array(np.concatenate(outs_p), pa.int32()),
                     pa.array(np.concatenate(outs_n).astype(np.int64),
                              pa.int64())],
                    names=["cluster", "pos", "cnt"])


def _require_int32_kmeans(df: DataFrame, tokens_col: str, op: str) -> None:
    """The clustered codec is 32-bit throughout (uint32 centroids,
    popcount32 Hamming distance — matching the reference's kmeans
    preprocessing, which only instantiates on 4-byte words,
    ibp_preproc_host.cuh:118-284).  frame_batch would silently truncate
    wider elements, so refuse them here; 64-bit input goes through the
    pure-IBP path (encode_ibp/decode_ibp handle array<bigint>)."""
    if _elem_bytes(df, tokens_col) != 4:
        raise ValueError(
            f"{op}: tokens column must be array<int> — the kmeans codec "
            "clusters 32-bit words; use encode_ibp/decode_ibp for wider "
            "elements")


@dataclass
class KmeansParams:
    centroids: np.ndarray  # uint32 [k, v]
    masks: np.ndarray      # uint32 [k, v]
    bitvals: np.ndarray    # uint32 [k, v]
    vec_size: int = VEC_SIZE
    threshold: float | None = None
    saved_bits: int = 0

    @property
    def k(self) -> int:
        return self.centroids.shape[0]

    def to_dict(self) -> dict:
        return {
            "vec_size": self.vec_size, "threshold": self.threshold,
            "saved_bits": int(self.saved_bits),
            "centroids": self.centroids.tolist(),
            "masks": self.masks.tolist(), "bitvals": self.bitvals.tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "KmeansParams":
        return cls(np.array(d["centroids"], np.uint32),
                   np.array(d["masks"], np.uint32),
                   np.array(d["bitvals"], np.uint32),
                   int(d["vec_size"]), d.get("threshold"),
                   int(d.get("saved_bits", 0)))


def hamming_assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """argmin_c popcount(row ^ centroid_c) — cluster_vecs
    (ibp_preproc_kmeans.cuh:106-150).  Loops over k (small), whole-batch
    per centroid."""
    n, L = mat.shape
    best = np.full(n, np.iinfo(np.int64).max, np.int64)
    out = np.zeros(n, np.int32)
    for c in range(centroids.shape[0]):
        d = popcount32(mat ^ centroids[c, :L][None, :]).sum(axis=1)
        better = d < best
        best[better] = d[better]
        out[better] = c
    return out


def learn_kmeans(df: DataFrame, k: int = 8, iters: int = 10,
                 tokens_col: str = "tokens", vec_size: int = VEC_SIZE,
                 threshold: float | None = None,
                 sample_fraction: float | None = None,
                 seed: int = 42, init: str = "sample") -> KmeansParams:
    """``init`` picks the centroid seeding:

    - ``"sample"`` (default): seeded uniform Bernoulli sample + local
      seeded choice — the distribution-faithful analog of the
      reference's std::random_shuffle (ibp_preproc_host.cuh:176-188).
    - ``"hash"``: the first full block of the k docs with the smallest
      ``md5(doc_id)`` (requires a doc_id column).  Hash order is as
      arbitrary as a shuffle but ENGINE-INDEPENDENT: DuckDB computes
      the identical md5, which lets an oracle replay the entire
      clustering — init, Lloyd iterations, threshold sweep, and sizes
      — in pure SQL.
    """
    _require_int32_kmeans(df, tokens_col, "learn_kmeans")
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)
    if init == "hash":
        if "doc_id" not in df.columns:
            raise ValueError("init='hash' needs a doc_id column")
        seed_rows = (df.filter(F.size(tokens_col) >= vec_size)
                     .select(tokens_col,
                             F.md5(F.col("doc_id").cast("string"))
                             .alias("h"))
                     .orderBy("h").limit(k).collect())
        if len(seed_rows) < k:
            raise ValueError(
                f"init='hash' found only {len(seed_rows)} docs with a "
                f"full {vec_size}-token block, need {k}")
        centroids = np.stack([
            np.asarray(r[tokens_col][:vec_size], np.int64).astype(np.int32)
            .view(np.uint32) for r in seed_rows])
    # The Lloyd loop makes iters+2 distributed passes; persist the
    # (possibly sampled) projection ONCE so iterations scan cached
    # blocks, not the source table 12 times (the reference iterates over
    # GPU-resident data, ibp_preproc_host.cuh:191-193 — this is the
    # Spark analog of that residency).
    toks = df.select(tokens_col).persist()

    if init != "hash":
        # ---- init: k blocks from a tiny driver-side seeded sample -------
        # Uniform across the table, not a head slice: an ingest-ordered
        # corpus would otherwise seed every centroid from one modality.
        # Deterministic: seeded Bernoulli sample, then ordered by doc_id
        # so the local rng.choice below sees a stable row order (the
        # reference's std::random_shuffle is seeded by srand in the same
        # spirit, ibp_preproc_host.cuh:176-188).
        n_seed_rows = max(4 * k, 64)
        total = df.count()
        frac = min(1.0, 3.0 * n_seed_rows / max(total, 1))
        seed_src = (df.select("doc_id", tokens_col)
                    if "doc_id" in df.columns else df.select(tokens_col))
        if frac < 1.0:
            seed_src = seed_src.sample(fraction=frac, seed=seed)
        if "doc_id" in df.columns:
            seed_src = seed_src.orderBy("doc_id")
        sample_rows = seed_src.limit(3 * n_seed_rows).toPandas()
        fb0 = frame_batch(sample_rows[tokens_col].values, vec_size)
        if fb0.full_mat.shape[0] < k and frac < 1.0:
            # sampling undershot (short docs / binomial variance): retry
            # over the full table before giving up
            retry = (df.select("doc_id", tokens_col).orderBy("doc_id")
                     if "doc_id" in df.columns else df.select(tokens_col))
            sample_rows = retry.limit(3 * n_seed_rows).toPandas()
            fb0 = frame_batch(sample_rows[tokens_col].values, vec_size)
        if fb0.full_mat.shape[0] < k:
            toks.unpersist()
            raise ValueError(
                f"need >= {k} full blocks to seed {k} centroids")
        rng = np.random.default_rng(seed)
        centroids = fb0.full_mat[
            rng.choice(fb0.full_mat.shape[0], k, replace=False)].copy()

    # ---- Lloyd iterations (distributed assign + majority re-center) -----
    for _ in range(iters):
        cent = centroids  # closure capture per iteration

        def it(batches):
            yield from _cluster_counts_batches(batches, cent, vec_size)

        rows = (toks.mapInArrow(it, schema="cluster int, pos int, cnt long")
                .groupBy("cluster", "pos").agg(F.sum("cnt").alias("cnt"))
                .collect())
        counts = np.zeros((k, vec_size * 32), np.int64)
        sizes = np.zeros(k, np.int64)
        for r in rows:
            if r["pos"] == -1:
                sizes[r["cluster"]] = r["cnt"]
            else:
                counts[r["cluster"], r["pos"]] = r["cnt"]
        # majority vote with integer division (construct_bitmasks :230)
        weights = (np.uint64(1) << np.arange(32, dtype=np.uint64))
        new = np.zeros((k, vec_size), np.uint32)
        for c in range(k):
            if sizes[c] == 0:
                continue  # empty -> all-zero centroid, like the reference
            bitset = counts[c].reshape(vec_size, 32) > (sizes[c] // 2)
            new[c] = (bitset * weights[None, :]).sum(axis=1).astype(np.uint32)
        centroids = new

    # ---- final per-cluster (mask, bitval): global-threshold sweep -------
    def stats(batches):
        yield from _cluster_counts_batches(batches, centroids, vec_size)

    rows = (toks.mapInArrow(stats, schema="cluster int, pos int, cnt long")
            .groupBy("cluster", "pos").agg(F.sum("cnt").alias("cnt"))
            .collect())
    counts = np.zeros((k, vec_size * 32), np.int64)
    sizes = np.zeros(k, np.int64)
    for r in rows:
        if r["pos"] == -1:
            sizes[r["cluster"]] = r["cnt"]
        else:
            counts[r["cluster"], r["pos"]] = r["cnt"]

    grid = [threshold] if threshold is not None else nr.sweep_thresholds()
    cand = []  # per theta: (masks [k,v], bitvals [k,v])
    for t in grid:
        ms = np.zeros((k, vec_size), np.uint32)
        bs = np.zeros((k, vec_size), np.uint32)
        for c in range(k):
            if sizes[c]:
                m, b = nr.create_mask(
                    counts[c].reshape(vec_size, 32), int(sizes[c]), t)
                ms[c], bs[c] = m, b
        cand.append((ms, bs))

    # one distributed pass evaluates savings for every theta
    def evaluator(batches):
        import pyarrow as pa

        for rb in batches:
            flat, starts, lens = list_array_flat(rb.column(0), 4)
            for i0, i1 in _mass_ranges(lens, None):
                fb = frame_batch_flat(flat, starts[i0:i1], lens[i0:i1],
                                      vec_size)
                if fb.full_mat.shape[0] == 0:
                    continue
                cl = hamming_assign(fb.full_mat, centroids)
                saveds = np.zeros(len(grid), np.int64)
                for g, (ms, bs) in enumerate(cand):
                    popc = popcount32(ms)
                    for c in range(k):
                        sel = cl == c
                        if not sel.any():
                            continue
                        sub = fb.full_mat[sel]
                        pred = (sub & ms[c][None, :]) == bs[c][None, :]
                        # exact float32 matvec (see ibp._gated_savings);
                        # same 2^24 exactness guard as there
                        if int(popc[c].sum()) < (1 << 24):
                            per_vec = (pred.astype(np.float32)
                                       @ popc[c].astype(np.float32)
                                       ).astype(np.int64)
                        else:
                            per_vec = pred @ popc[c].astype(np.int64)
                        saveds[g] += np.where(per_vec > vec_size,
                                              per_vec - vec_size, 0).sum()
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.arange(len(grid), dtype=np.int32)),
                     pa.array(saveds, pa.int64())],
                    names=["ti", "saved"])

    ev = (toks.mapInArrow(evaluator, schema="ti int, saved long")
          .groupBy("ti").agg(F.sum("saved").alias("saved")).collect())
    toks.unpersist()
    saved_by_t = np.zeros(len(grid), np.int64)
    for r in ev:
        saved_by_t[r["ti"]] = r["saved"]
    best_g, best_saved = 0, 0
    for g in range(len(grid)):
        if saved_by_t[g] > best_saved:
            best_g, best_saved = g, int(saved_by_t[g])
    masks, bitvals = cand[best_g]
    return KmeansParams(centroids, masks, bitvals, vec_size,
                        float(grid[best_g]), best_saved)


# ---------------------------------------------------------------------------
# clustered encode / decode
# ---------------------------------------------------------------------------

ENCODED_KMEANS_SCHEMA = (
    "doc_id string, source string, n_tok int, n_blocks int, "
    "block_sizes array<int>, block_flags binary, block_clusters binary, "
    "payload binary, comp_bytes long, raw_bytes long, codec string"
)


def _encode_group(mat, mask, bitval):
    return nr.encode_concat(mat, mask, bitval)


def _encode_kmeans_flat(fb: FramedBatch, cents, masks, bitvals):
    """Clustered encode of one framed batch into flat buffers (the
    kmeans twin of ibp.encode_batch_flat): global doc-major block
    table, per-(cluster, width) group encodes, ONE scatter per group,
    ONE packbits for all flag bitmaps.  Returns ``(buf, doc_bytes,
    sizes, clusters, flags_packed, flag_nbytes)``."""
    ndocs = len(fb.lens)
    nb_tot = int(fb.nblocks.sum())
    sizes = np.zeros(nb_tot, np.int64)
    is_comp = np.zeros(nb_tot, bool)
    clusters = np.zeros(nb_tot, np.uint8)
    pending: list[tuple] = []  # (block ids, group blob, sizes)
    blk_start = np.cumsum(fb.nblocks) - fb.nblocks
    # full blocks, grouped by cluster
    if fb.full_mat.shape[0]:
        cl = hamming_assign(fb.full_mat, cents)
        doc_of_full = np.repeat(np.arange(ndocs), fb.nfull)
        within = (np.arange(fb.full_mat.shape[0])
                  - np.repeat(np.cumsum(fb.nfull) - fb.nfull, fb.nfull))
        gidx = blk_start[doc_of_full] + within
        clusters[gidx] = cl.astype(np.uint8)
        for c in np.unique(cl):
            sel = cl == c
            flat, sz, ic = _encode_group(fb.full_mat[sel], masks[c],
                                         bitvals[c])
            tgt = gidx[sel]
            sizes[tgt] = sz
            is_comp[tgt] = ic
            pending.append((tgt, flat, sz))
    # tails: assign by prefix distance, group by (cluster, L)
    for L, (mat, docs) in fb.tails.items():
        cl = hamming_assign(mat, cents[:, :L])
        gidx = blk_start[docs] + fb.nblocks[docs] - 1
        clusters[gidx] = cl.astype(np.uint8)
        for c in np.unique(cl):
            sel = cl == c
            flat, sz, ic = _encode_group(mat[sel], masks[c][:L],
                                         bitvals[c][:L])
            tgt = gidx[sel]
            sizes[tgt] = sz
            is_comp[tgt] = ic
            pending.append((tgt, flat, sz))
    offsets = np.cumsum(sizes) - sizes
    buf = np.zeros(int(sizes.sum()), np.uint8)
    for tgt, flat, sz in pending:
        _scatter_rows(buf, offsets[tgt], flat, sz)
    # blocks are doc-major, so each doc's payload is one contiguous span
    doc_bytes = np.add.reduceat(
        np.append(sizes, 0), np.minimum(blk_start, nb_tot)
    ) * (fb.nblocks > 0) if ndocs else np.zeros(0, np.int64)
    # per-doc byte-padded flag bitmaps in ONE packbits call
    flag_bits = ((fb.nblocks + 7) // 8) * 8
    fbit_start = np.cumsum(flag_bits) - flag_bits
    bigbits = np.zeros(int(flag_bits.sum()), np.uint8)
    if nb_tot:
        within_all = np.arange(nb_tot) - np.repeat(blk_start, fb.nblocks)
        bigbits[np.repeat(fbit_start, fb.nblocks) + within_all] = is_comp
    flags_packed = np.packbits(bigbits, bitorder="little")
    return (buf, doc_bytes.astype(np.int64), sizes, clusters,
            flags_packed, flag_bits // 8)


def encode_ibp_kmeans(df: DataFrame, kp: KmeansParams,
                      tokens_col: str = "tokens") -> DataFrame:
    """Per-block cluster assignment + per-cluster (mask, bitval) encode;
    cluster ids stored as one u8 per block (``block_clusters``).

    Runs as ``mapInArrow`` over flat buffers (see
    :func:`_encode_kmeans_flat`) — zero per-document Python."""
    import pyarrow as pa

    _require_int32_kmeans(df, tokens_col, "encode_ibp_kmeans")
    v = kp.vec_size
    cents, masks, bitvals = kp.centroids, kp.masks, kp.bitvals

    def encoder(batches) -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            names = rb.schema.names
            flat, starts, lens = list_array_flat(
                rb.column(names.index(tokens_col)), 4)
            for i0, i1 in _mass_ranges(lens, None):
                n = i1 - i0
                fb = frame_batch_flat(flat, starts[i0:i1], lens[i0:i1], v)
                buf, doc_bytes, sizes, clusters, flags_packed, flag_nb = (
                    _encode_kmeans_flat(fb, cents, masks, bitvals))
                pay_off = np.zeros(n + 1, np.int32)
                np.cumsum(doc_bytes, out=pay_off[1:])
                payload = pa.BinaryArray.from_buffers(
                    pa.binary(), n,
                    [None, pa.py_buffer(pay_off), pa.py_buffer(buf)])
                blk_off = np.zeros(n + 1, np.int32)
                np.cumsum(fb.nblocks, out=blk_off[1:])
                block_sizes = pa.ListArray.from_arrays(
                    pa.array(blk_off, pa.int32()),
                    pa.array(sizes.astype(np.int32), pa.int32()))
                # block_clusters: the doc-major u8 table IS the binary
                # column; its offsets are the block offsets
                block_clusters = pa.BinaryArray.from_buffers(
                    pa.binary(), n,
                    [None, pa.py_buffer(blk_off), pa.py_buffer(clusters)])
                flg_off = np.zeros(n + 1, np.int32)
                np.cumsum(flag_nb, out=flg_off[1:])
                block_flags = pa.BinaryArray.from_buffers(
                    pa.binary(), n,
                    [None, pa.py_buffer(flg_off),
                     pa.py_buffer(flags_packed)])
                yield pa.RecordBatch.from_arrays(
                    [rb.column(names.index("doc_id")).slice(i0, n),
                     rb.column(names.index("source")).slice(i0, n),
                     pa.array(fb.lens.astype(np.int32), pa.int32()),
                     pa.array(fb.nblocks.astype(np.int32), pa.int32()),
                     block_sizes, block_flags, block_clusters, payload,
                     pa.array(doc_bytes, pa.int64()),
                     pa.array(fb.lens * 4, pa.int64()),
                     pa.array(np.full(n, "ibp_kmeans", object))],
                    names=["doc_id", "source", "n_tok", "n_blocks",
                           "block_sizes", "block_flags", "block_clusters",
                           "payload", "comp_bytes", "raw_bytes", "codec"])

    cols = ["doc_id", tokens_col, "source"]
    return df.select(*cols).mapInArrow(encoder, schema=ENCODED_KMEANS_SCHEMA)


def _decode_kmeans_flat(lens, sizes, flags_flat, flags_starts,
                        clus_flat, clus_starts, pay_flat, pay_starts,
                        masks, bitvals, v):
    """Flat-native clustered decode (the kmeans twin of
    ibp.decode_docs_flat) — per-doc spans addressed through explicit
    start offsets into shared Arrow buffers."""
    ndocs = len(lens)
    lens = np.asarray(lens, np.int64)
    nfull = lens // v
    tail_len = lens % v
    nblocks = nfull + (tail_len > 0)
    nb_tot = int(nblocks.sum())
    if ndocs == 0 or nb_tot == 0:
        return np.zeros(0, np.int32), np.zeros(ndocs, np.int64)
    sizes = np.asarray(sizes, np.int64)
    blk_start = np.cumsum(nblocks) - nblocks
    exc = np.append(np.cumsum(sizes) - sizes, 0)
    local = exc[:-1] - np.repeat(exc[np.minimum(blk_start, nb_tot)], nblocks)
    offsets = np.repeat(pay_starts, nblocks) + local
    within = np.arange(nb_tot, dtype=np.int64) - np.repeat(blk_start, nblocks)
    fbyte = np.repeat(flags_starts, nblocks) + (within >> 3)
    is_comp = ((flags_flat[fbyte].astype(np.int64) >> (within & 7)) & 1
               ).astype(bool)
    clusters = clus_flat[np.repeat(clus_starts, nblocks) + within]
    doc_of_block = np.repeat(np.arange(ndocs), nblocks)
    is_tail = (tail_len[doc_of_block] > 0) & (
        within == nblocks[doc_of_block] - 1)

    full_dec = np.zeros((int((~is_tail).sum()), v), np.uint32)
    fpos = np.cumsum(~is_tail) - 1  # full-block ordinal per block
    for c in np.unique(clusters[~is_tail]):
        sel = ~is_tail & (clusters == c)
        buf = gather_ranges(pay_flat, offsets[sel], sizes[sel])
        full_dec[fpos[sel]] = nr.decode_concat(
            buf, sizes[sel], is_comp[sel], v, masks[c], bitvals[c])

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
            dec = np.zeros((sel.size, L), np.uint32)
            for c in np.unique(clusters[sel]):
                cs = sel[clusters[sel] == c]
                buf = gather_ranges(pay_flat, offsets[cs], sizes[cs])
                dec[clusters[sel] == c] = nr.decode_concat(
                    buf, sizes[cs], is_comp[cs], L,
                    masks[c][:L], bitvals[c][:L])
            tail_dec[L] = dec
            tails[L] = (None, doc_of_block[sel])

    fb = FramedBatch(lens, nfull, tail_len, nblocks, full_dec, tails, v)
    return unframe_flat(fb, full_dec, tail_dec)


def decode_ibp_kmeans(df: DataFrame, kp: KmeansParams) -> DataFrame:
    """Inverse of :func:`encode_ibp_kmeans`, as ``mapInArrow`` over
    flat buffers — zero per-document Python."""
    import pyarrow as pa

    v = kp.vec_size
    masks, bitvals = kp.masks, kp.bitvals

    def decoder(batches) -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            names = rb.schema.names
            n_tok_all = rb.column(names.index("n_tok")).to_numpy(
                zero_copy_only=False).astype(np.int64)
            for i0, i1 in _mass_ranges(n_tok_all, None):
                n = i1 - i0
                sl = rb.slice(i0, n)
                lens = n_tok_all[i0:i1]
                bs_vals, bs_starts, bs_lens = list_array_flat(
                    sl.column(names.index("block_sizes")), 4)
                sizes = gather_ranges(bs_vals, bs_starts, bs_lens)
                flags_flat, flags_starts, _ = binary_array_flat(
                    sl.column(names.index("block_flags")))
                clus_flat, clus_starts, _ = binary_array_flat(
                    sl.column(names.index("block_clusters")))
                pay_flat, pay_starts, _ = binary_array_flat(
                    sl.column(names.index("payload")))
                tok_flat, _ = _decode_kmeans_flat(
                    lens, sizes, flags_flat, flags_starts,
                    clus_flat, clus_starts, pay_flat, pay_starts,
                    masks, bitvals, v)
                tok_off = np.zeros(n + 1, np.int32)
                np.cumsum(lens, out=tok_off[1:])
                tokens = pa.ListArray.from_arrays(
                    pa.array(tok_off, pa.int32()),
                    pa.array(tok_flat.view(np.int32), pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [sl.column(names.index("doc_id")),
                     tokens,
                     pa.array(lens.astype(np.int32), pa.int32()),
                     sl.column(names.index("source"))],
                    names=["doc_id", "tokens", "n_tok", "source"])

    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    return df.select("doc_id", "n_blocks", "block_sizes", "block_flags",
                     "block_clusters", "payload", "n_tok", "source"
                     ).mapInArrow(decoder, schema=schema)
