"""Multimodal asset plumbing: schema, decode-stub, featurize, frames."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invariantbitpacking_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.generate_assets_df(spark, 120).cache()


def test_featurize_shapes(spark, assets):
    out = mm.decode_and_featurize(assets, feat_dim=16).collect()
    assert len(out) == 120
    for r in out:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3
        if r["kind"] == "image":
            assert r["decoded_w"] > 0 and r["body_bytes"] == r["decoded_w"] * r["decoded_h"]


def test_frame_sampling(spark, assets):
    frames = mm.sample_video_frames(assets, every=2)
    got = frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    meta = {r["asset_id"]: r["frames"] for r in
            assets.filter("kind = 'video'").select("asset_id", "frames").collect()}
    assert {r["asset_id"] for r in got} == set(meta)
    for r in got:
        assert r["n"] == -(-meta[r["asset_id"]] // 2)


def test_real_format_is_stubbed(spark):
    df = spark.createDataFrame(
        [("x", "image", bytearray(b"\x89PNG....."), 0, 0, 1, 0)], mm.ASSET_DDL)
    with pytest.raises(Exception) as ei:
        mm.decode_and_featurize(df).collect()
    assert "NotImplementedError" in str(ei.value) or "stubbed" in str(ei.value)
