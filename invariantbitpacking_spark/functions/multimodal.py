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


def decode_and_featurize(assets: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode (stub) + per-asset feature extraction as one Arrow-batched
    ``mapInPandas``: bodies become numpy arrays, features are
    deterministic byte-histogram projections (a stand-in with the exact
    batch shape a real embedding model UDF would have)."""

    def fx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok_w, ok_h, n_bytes = [], [], [], []
            for payload in pdf["payload"].values:
                kind, w, h, fr, sr, body = _parse_header(bytes(payload))
                arr = np.frombuffer(body, np.uint8)
                hist = np.bincount(arr % feat_dim, minlength=feat_dim)
                feats.append((hist / max(arr.size, 1)).astype(np.float32))
                ok_w.append(w)
                ok_h.append(h)
                n_bytes.append(arr.size)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "decoded_w": pd.array(ok_w, dtype="int32"),
                "decoded_h": pd.array(ok_h, dtype="int32"),
                "body_bytes": pd.array(n_bytes, dtype="int64"),
                "features": feats,
            })

    schema = ("asset_id string, kind string, decoded_w int, decoded_h int, "
              "body_bytes long, features array<float>")
    return assets.select("asset_id", "kind", "payload").mapInPandas(fx, schema=schema)


def sample_video_frames(assets: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video assets: emit one row per kept frame
    (1:N mapInPandas fan-out — the batch shape of a real frame
    extractor)."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, frames = [], [], []
            for asset_id, payload in zip(pdf["asset_id"].values,
                                         pdf["payload"].values):
                kind, w, h, fr, _, body = _parse_header(bytes(payload))
                if kind != 2:
                    continue
                arr = np.frombuffer(body, np.uint8).reshape(fr, h * w)
                for i in range(0, fr, every):
                    ids.append(asset_id)
                    fidx.append(i)
                    frames.append(arr[i].tobytes())
            yield pd.DataFrame({"asset_id": ids,
                                "frame_idx": pd.array(fidx, dtype="int32"),
                                "frame": frames})

    return assets.select("asset_id", "payload").mapInPandas(
        fs, schema="asset_id string, frame_idx int, frame binary")
