"""Multimodal asset columns: opaque binary payloads + typed metadata.

A training-data pipeline at corpus scale carries image/audio/video next
to text.  This module provides the Spark-side plumbing — schema,
deterministic synthesis, Arrow-batched transform signatures, partition
behavior — with the actual media decoding STUBBED: the sandbox has no
image/audio libraries, so ``decode_image``/``decode_audio`` parse only
our deterministic fake container header and raise
``NotImplementedError`` for real formats.  Swapping the stub for
Pillow/ffmpeg changes one function body, not the pipeline.

Fake container format (deterministic, self-describing):
  magic  4B  b"FAKE"
  kind   1B  0=image 1=audio 2=video
  w,h    2x u16 LE (image/video) | sample_rate u32 (audio)
  frames u16 LE (video) | 1
  body   raw bytes (w*h per frame, or n_samples)
"""

from __future__ import annotations

import struct

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

ASSET_DDL = ("asset_id string, kind string, payload binary, "
             "width int, height int, frames int, sample_rate int")

MAGIC = b"FAKE"


def make_fake_asset(rng: np.random.Generator, kind: str) -> tuple:
    if kind == "image":
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        body = rng.integers(0, 256, w * h, dtype=np.int64).astype(np.uint8)
        hdr = MAGIC + bytes([0]) + struct.pack("<HHH", w, h, 1)
        return hdr + body.tobytes(), w, h, 1, 0
    if kind == "audio":
        sr = int(rng.choice([8000, 16000]))
        n = int(rng.integers(100, 2000))
        body = rng.integers(0, 256, n, dtype=np.int64).astype(np.uint8)
        hdr = MAGIC + bytes([1]) + struct.pack("<IH", sr, 1)
        return hdr + body.tobytes(), 0, 0, 1, sr
    # video
    w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
    fr = int(rng.integers(2, 12))
    body = rng.integers(0, 256, w * h * fr, dtype=np.int64).astype(np.uint8)
    hdr = MAGIC + bytes([2]) + struct.pack("<HHH", w, h, fr)
    return hdr + body.tobytes(), w, h, fr, 0


def generate_assets_df(spark: SparkSession, n: int = 300,
                       seed: int = 42) -> DataFrame:
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload, w, h, fr, sr = make_fake_asset(rng, kind)
        rows.append((f"{kind}-{i:06d}", kind, bytearray(payload), w, h, fr, sr))
    return spark.createDataFrame(rows, ASSET_DDL)


def _parse_headers_flat(flat, starts, sizes):
    """Vectorized header parse for one Arrow batch of FAKE containers:
    fixed-offset arithmetic over the shared payload buffer — no
    per-asset Python (headers are fixed-width after the magic, so every
    field is a strided u8 gather).  Returns (kind, w, h, frames,
    sample_rate); body of asset i is flat[starts[i]+11 :
    starts[i]+sizes[i]]."""
    n = len(starts)
    magic = np.frombuffer(MAGIC, np.uint8)
    if n and not (flat[starts[:, None] + np.arange(4)] ==
                  magic[None, :]).all():
        raise NotImplementedError(
            "real media decoding is stubbed in this environment; "
            "only the deterministic FAKE container is parseable")
    kind = flat[starts + 4].astype(np.int64) if n else np.zeros(0, np.int64)

    def u16(off):
        return (flat[starts + off].astype(np.int64)
                | (flat[starts + off + 1].astype(np.int64) << 8))

    z = np.zeros(0, np.int64)
    if not n:
        return kind, z, z, z.copy(), z.copy()
    imgvid = kind != 1
    w = np.where(imgvid, u16(5), 0)
    h = np.where(imgvid, u16(7), 0)
    frames = u16(9)  # u16 at offset 9 in every container kind
    sr = np.where(imgvid, 0, u16(5) | (u16(7) << 16))
    return kind, w, h, frames, sr


def decode_and_featurize(assets: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode (stub) + per-asset feature extraction as one
    ``mapInArrow`` pass: payloads are consumed as one shared Arrow
    buffer + offsets, features are deterministic byte-histogram
    projections emitted as one flat float buffer (a stand-in with the
    exact batch shape a real embedding model UDF would have)."""

    def fx(batches):
        import pyarrow as pa

        from ..operators.framing import gather_ranges
        from ..operators.ibp import binary_array_flat

        for rb in batches:
            names = rb.schema.names
            n = rb.num_rows
            flat, starts, sizes = binary_array_flat(
                rb.column(names.index("payload")))
            kind, w, h, fr, sr = _parse_headers_flat(flat, starts, sizes)
            body_len = sizes - 11
            # all bodies' histograms in ONE bincount over a combined
            # (asset, byte % feat_dim) key — no per-asset Python
            body = gather_ranges(flat, starts + 11, body_len)
            asset_of = np.repeat(np.arange(n), body_len)
            key = asset_of * feat_dim + (body % feat_dim)
            hist = np.bincount(key, minlength=n * feat_dim).reshape(
                n, feat_dim) if n else np.zeros((0, feat_dim), np.int64)
            feats = (hist / np.maximum(body_len, 1)[:, None]).astype(
                np.float32)
            f_off = np.arange(n + 1, dtype=np.int32) * feat_dim
            features = pa.ListArray.from_arrays(
                pa.array(f_off, pa.int32()),
                pa.array(feats.reshape(-1), pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [rb.column(names.index("asset_id")),
                 rb.column(names.index("kind")),
                 pa.array(w.astype(np.int32), pa.int32()),
                 pa.array(h.astype(np.int32), pa.int32()),
                 pa.array(body_len, pa.int64()),
                 features],
                names=["asset_id", "kind", "decoded_w", "decoded_h",
                       "body_bytes", "features"])

    schema = ("asset_id string, kind string, decoded_w int, decoded_h int, "
              "body_bytes long, features array<float>")
    return assets.select("asset_id", "kind", "payload").mapInArrow(
        fx, schema=schema)


def sample_video_frames(assets: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video assets: emit one row per kept frame
    (1:N ``mapInArrow`` fan-out — the batch shape of a real frame
    extractor).  Kept frames leave as ONE gathered buffer wrapped in a
    zero-copy BinaryArray."""

    def fs(batches):
        import pyarrow as pa

        from ..operators.framing import gather_ranges
        from ..operators.ibp import binary_array_flat

        for rb in batches:
            names = rb.schema.names
            flat, starts, sizes = binary_array_flat(
                rb.column(names.index("payload")))
            kind, w, h, fr, _ = _parse_headers_flat(flat, starts, sizes)
            vsel = np.flatnonzero(kind == 2)
            wh = (w * h)[vsel]
            nkeep = -(-fr[vsel] // every)
            # kept-frame table: one repeat + offset arithmetic, then one
            # gather of every kept frame's bytes (no per-video Python)
            vid_of = np.repeat(np.arange(vsel.size), nkeep)
            keep_start = np.cumsum(nkeep) - nkeep
            total_keep = int(nkeep.sum())
            fidx = (np.arange(total_keep)
                    - np.repeat(keep_start, nkeep)) * every
            fstarts = starts[vsel][vid_of] + 11 + fidx * wh[vid_of]
            flens = wh[vid_of]
            buf = gather_ranges(flat, fstarts, flens)
            b_off = np.zeros(total_keep + 1, np.int32)
            np.cumsum(flens, out=b_off[1:])
            frame = pa.BinaryArray.from_buffers(
                pa.binary(), total_keep,
                [None, pa.py_buffer(b_off), pa.py_buffer(buf)])
            ids = rb.column(names.index("asset_id")).take(
                pa.array(vsel[vid_of], pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [ids,
                 pa.array(fidx.astype(np.int32), pa.int32()),
                 frame],
                names=["asset_id", "frame_idx", "frame"])

    return assets.select("asset_id", "payload").mapInArrow(
        fs, schema="asset_id string, frame_idx int, frame binary")
