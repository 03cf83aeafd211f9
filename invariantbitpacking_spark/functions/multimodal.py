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
from typing import Iterator

import numpy as np
import pandas as pd

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


def _parse_header(payload: bytes):
    if payload[:4] != MAGIC:
        raise NotImplementedError(
            "real media decoding is stubbed in this environment; "
            "only the deterministic FAKE container is parseable")
    kind = payload[4]
    if kind in (0, 2):
        w, h, fr = struct.unpack("<HHH", payload[5:11])
        return kind, w, h, fr, 0, payload[11:]
    sr, fr = struct.unpack("<IH", payload[5:11])
    return kind, 0, 0, fr, sr, payload[11:]


def _parse_headers_batch(payloads):
    """Vectorized header parse for one Arrow batch of FAKE containers:
    one buffer concat + fixed-offset arithmetic — no per-asset Python
    (headers are fixed-width after the magic, so every field is a
    strided u8 gather).  Returns (flat u8, starts, sizes, kind, w, h,
    frames, sample_rate); body of asset i is flat[starts[i]+11 :
    starts[i]+sizes[i]]."""
    n = len(payloads)
    sizes = np.fromiter((len(p) for p in payloads), np.int64, count=n)
    flat = np.frombuffer(b"".join(payloads), np.uint8)
    starts = np.cumsum(sizes) - sizes
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
        return flat, starts, sizes, kind, z, z, z, z.copy()
    imgvid = kind != 1
    w = np.where(imgvid, u16(5), 0)
    h = np.where(imgvid, u16(7), 0)
    frames = u16(9)  # u16 at offset 9 in every container kind
    sr = np.where(imgvid, 0, u16(5) | (u16(7) << 16))
    return flat, starts, sizes, kind, w, h, frames, sr


def decode_and_featurize(assets: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode (stub) + per-asset feature extraction as one Arrow-batched
    ``mapInPandas``: bodies become numpy arrays, features are
    deterministic byte-histogram projections (a stand-in with the exact
    batch shape a real embedding model UDF would have)."""

    def fx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.framing import gather_ranges

        for pdf in batches:
            n = len(pdf)
            flat, starts, sizes, kind, w, h, fr, sr = _parse_headers_batch(
                list(pdf["payload"].values))
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
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "decoded_w": pd.array(w.astype("int32"), dtype="int32"),
                "decoded_h": pd.array(h.astype("int32"), dtype="int32"),
                "body_bytes": pd.array(body_len, dtype="int64"),
                "features": list(feats),
            })

    schema = ("asset_id string, kind string, decoded_w int, decoded_h int, "
              "body_bytes long, features array<float>")
    return assets.select("asset_id", "kind", "payload").mapInPandas(fx, schema=schema)


def sample_video_frames(assets: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video assets: emit one row per kept frame
    (1:N mapInPandas fan-out — the batch shape of a real frame
    extractor)."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.framing import gather_ranges

        for pdf in batches:
            flat, starts, sizes, kind, w, h, fr, _ = _parse_headers_batch(
                list(pdf["payload"].values))
            vsel = np.flatnonzero(kind == 2)
            wh = (w * h)[vsel]
            nkeep = -(-fr[vsel] // every)
            # kept-frame table: one repeat + offset arithmetic, then one
            # gather of every kept frame's bytes (no per-video Python)
            vid_of = np.repeat(np.arange(vsel.size), nkeep)
            keep_start = np.cumsum(nkeep) - nkeep
            fidx = (np.arange(int(nkeep.sum()))
                    - np.repeat(keep_start, nkeep)) * every
            fstarts = starts[vsel][vid_of] + 11 + fidx * wh[vid_of]
            flens = wh[vid_of]
            buf = gather_ranges(flat, fstarts, flens)
            boff = np.cumsum(flens) - flens
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].values[vsel][vid_of],
                "frame_idx": pd.array(fidx.astype("int32"), dtype="int32"),
                "frame": [buf[o:o + m].tobytes()
                          for o, m in zip(boff.tolist(), flens.tolist())],
            })

    return assets.select("asset_id", "payload").mapInPandas(
        fs, schema="asset_id string, frame_idx int, frame binary")
