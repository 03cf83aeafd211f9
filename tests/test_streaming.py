"""Streaming encode: exactly-once incremental processing + round-trip."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from invariantbitpacking_spark.operators import ibp, selector
from invariantbitpacking_spark.streaming.encode_stream import run_incremental


def _write_batch(spark, path, start, n):
    rng = np.random.default_rng(start)
    rows = [(f"s{start + i:06d}",
             rng.integers(0, 32000, int(rng.integers(50, 400))).astype(np.int32).tolist(),
             0, "stream") for i in range(n)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    df = df.withColumn("n_tok", F.size("tokens"))
    df.coalesce(1).write.mode("append").parquet(path)
    return df


def test_incremental_encode_stream(spark, tmp_path, tokens_df):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    params = ibp.learn_params(tokens_df)

    _write_batch(spark, inp, 0, 120)
    run_incremental(spark, inp, out, cp, params)
    got1 = spark.read.parquet(out).count()
    assert got1 == 120

    # second micro-batch: only the NEW file is processed (checkpoint)
    _write_batch(spark, inp, 1000, 80)
    run_incremental(spark, inp, out, cp, params)
    enc = spark.read.parquet(out)
    assert enc.count() == 200
    assert enc.select("doc_id").distinct().count() == 200  # exactly-once

    # the streamed output decodes bit-identically
    src = spark.read.parquet(inp)
    dec = selector.decode_auto(enc, params)
    bad = (src.alias("a").join(dec.alias("b"), "doc_id")
           .filter(F.col("a.tokens") != F.col("b.tokens")).count())
    assert bad == 0


def test_incremental_decode_stream(spark, tmp_path, tokens_df):
    """Streaming decode round-trip: encode a batch corpus, stream-decode
    it exactly once (AvailableNow), re-running processes nothing new,
    and the streamed tokens checksum-match the source."""
    from invariantbitpacking_spark.operators import ibp, selector
    from invariantbitpacking_spark.streaming.encode_stream import (
        run_incremental_decode)

    params = ibp.learn_params(tokens_df, sample_fraction=0.5)
    enc_dir = str(tmp_path / "enc")
    out_dir = str(tmp_path / "dec")
    ckpt = str(tmp_path / "ckpt_dec")
    selector.encode_auto(tokens_df, params).write.parquet(enc_dir)

    run_incremental_decode(spark, enc_dir, out_dir, ckpt, params)
    dec = spark.read.parquet(out_dir)
    assert dec.count() == tokens_df.count()
    fold = F.expr("bit_xor(xxhash64(doc_id, tokens))")
    src = tokens_df.select("doc_id", "tokens").agg(fold).collect()[0][0]
    got = dec.select("doc_id", "tokens").agg(fold).collect()[0][0]
    assert src == got
    # exactly-once: a second AvailableNow run appends nothing
    run_incremental_decode(spark, enc_dir, out_dir, ckpt, params)
    assert spark.read.parquet(out_dir).count() == tokens_df.count()
