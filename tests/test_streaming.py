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


def test_streaming_ingest_into_pipeline_snapshot(spark, tmp_path, tokens_df):
    """File-source micro-batches upsert bucket-locally into a committed
    snapshot; replaying the stream from the same checkpoint is a no-op
    (table-state exactly-once via append's idempotent upsert)."""
    from invariantbitpacking_spark.plans.pipeline import CompressionPipeline
    from invariantbitpacking_spark.streaming.encode_stream import (
        run_incremental_ingest)

    out = str(tmp_path / "pipe")
    pipe = CompressionPipeline(spark, out, num_buckets=8, wave_buckets=8,
                               sample_fraction=None)
    pipe.run(tokens_df, "live")
    n0 = tokens_df.count()

    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    d1 = spark.createDataFrame(
        [(f"s-{i:03d}", list(range(i + 3, i + 40)), 37, "stream1")
         for i in range(15)],
        "doc_id string, tokens array<int>, n_tok int, source string")
    d1.write.mode("append").parquet(inbox)
    run_incremental_ingest(spark, inbox, pipe, "live", ckpt)
    assert pipe.read_encoded("live").count() == n0 + 15
    assert pipe.verify_checksums("live") == 0

    # replay with no new files: checkpoint skips everything
    run_incremental_ingest(spark, inbox, pipe, "live", ckpt)
    assert pipe.read_encoded("live").count() == n0 + 15

    # a second landing, including an UPSERT of a streamed doc
    d2 = spark.createDataFrame(
        [("s-000", list(range(500, 560)), 60, "stream2"),
         ("s-900", list(range(9, 90)), 81, "stream2")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    d2.write.mode("append").parquet(inbox)
    run_incremental_ingest(spark, inbox, pipe, "live", ckpt)
    enc = pipe.read_encoded("live")
    assert enc.count() == n0 + 16  # one replaced, one new
    assert pipe.verify_checksums("live") == 0
    # the whole corpus (initial + stream, upsert applied) round-trips
    params = pipe.load_or_learn_params(tokens_df, "live")
    final = (tokens_df.unionByName(d1.filter("doc_id != 's-000'"))
             .unionByName(d2))
    assert pipe.verify_roundtrip(final, params, "live") == 0


def test_streaming_ingest_with_auto_compaction(spark, tmp_path, tokens_df):
    """compact_every folds delta files into the base (and the lineage
    history) on cadence, leaving a delta-free snapshot with green
    audits after the stream drains."""
    from invariantbitpacking_spark.plans.pipeline import CompressionPipeline
    from invariantbitpacking_spark.streaming.encode_stream import (
        start_ingest_stream)

    out = str(tmp_path / "pipe")
    pipe = CompressionPipeline(spark, out, num_buckets=4, wave_buckets=4,
                               sample_fraction=None)
    sub = tokens_df.limit(80)
    pipe.run(sub, "live")
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    d = spark.createDataFrame(
        [(f"ac-{i:03d}", list(range(i, i + 20)), 20, "stream")
         for i in range(6)],
        "doc_id string, tokens array<int>, n_tok int, source string")
    d.write.mode("append").parquet(inbox)
    q = start_ingest_stream(spark, inbox, pipe, "live", ckpt,
                            compact_every=1)
    q.awaitTermination()
    # the availableNow drain ended with a compaction: no delta dirs left
    assert pipe._delta_buckets("live") == []
    assert pipe.read_encoded("live").count() == sub.count() + 6
    assert pipe.verify_checksums("live") == 0
    params = pipe.load_or_learn_params(sub, "live")
    assert pipe.verify_roundtrip(sub.unionByName(d), params, "live") == 0


def test_streaming_delete_from_pipeline_snapshot(spark, tmp_path, tokens_df):
    """Erasure-request files tombstone-delete per micro-batch; replay
    from the same checkpoint is a no-op; compact_every physically
    erases; checksums stay green throughout (the GDPR half of the
    living-snapshot stream pair)."""
    from pyspark.sql import functions as F

    from invariantbitpacking_spark.plans.pipeline import CompressionPipeline
    from invariantbitpacking_spark.streaming.encode_stream import (
        run_incremental_delete, start_delete_stream)

    out = str(tmp_path / "pipe")
    pipe = CompressionPipeline(spark, out, num_buckets=4, wave_buckets=4,
                               sample_fraction=None)
    sub = tokens_df.limit(100)
    pipe.run(sub, "live")
    n0 = sub.count()
    victims = [r["doc_id"] for r in
               sub.select("doc_id").orderBy("doc_id").limit(6).collect()]

    inbox = str(tmp_path / "erasure_inbox")
    ckpt = str(tmp_path / "ckpt_del")
    spark.createDataFrame([(v,) for v in victims[:4]], "doc_id string") \
        .write.mode("append").parquet(inbox)
    run_incremental_delete(spark, inbox, pipe, "live", ckpt)
    enc = pipe.read_encoded("live")
    assert enc.count() == n0 - 4
    assert enc.filter(F.col("doc_id").isin(victims[:4])).count() == 0
    assert pipe.verify_checksums("live") == 0

    # replay with no new files: checkpoint skips everything
    run_incremental_delete(spark, inbox, pipe, "live", ckpt)
    assert pipe.read_encoded("live").count() == n0 - 4

    # second landing (includes an already-deleted id + a ghost id),
    # draining through auto-compaction: markers become physical erasure
    spark.createDataFrame(
        [(victims[4],), (victims[0],), ("ghost-x",), (victims[5],)],
        "doc_id string").write.mode("append").parquet(inbox)
    q = start_delete_stream(spark, inbox, pipe, "live", ckpt,
                            compact_every=1)
    q.awaitTermination()
    assert pipe._delta_buckets("live") == []  # compacted away
    enc = pipe.read_encoded("live")
    assert enc.count() == n0 - 6
    assert enc.filter(F.col("doc_id").isin(victims)).count() == 0
    assert pipe.verify_checksums("live") == 0
    params = pipe.load_or_learn_params(sub, "live")
    remaining = sub.filter(~F.col("doc_id").isin(victims))
    assert pipe.verify_roundtrip(remaining, params, "live") == 0
