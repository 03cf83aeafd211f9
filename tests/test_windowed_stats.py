"""Watermarked windowed streaming agg: append-mode emission matches the
batch twin for every finalized window."""

import pytest
from pyspark.sql import functions as F

from invariantbitpacking_spark.streaming.windowed_stats import (
    start_windowed_stats_stream, windowed_stats_batch)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_stream_matches_batch_for_finalized_windows(spark, tmp_path):
    inp, out, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    events = spark.read.parquet(EVENTS)
    events.write.parquet(inp)

    q = start_windowed_stats_stream(spark, inp, out, cp,
                                    window="1 hour", watermark="2 hours")
    q.awaitTermination()

    got = {(r["win_start"], r["event_type"]): (r["events"], r["value_sum"])
           for r in spark.read.parquet(out).collect()}
    assert got, "stream emitted nothing"

    batch = windowed_stats_batch(events, "1 hour")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    expect = {}
    finalized_all = {}
    for r in batch.collect():
        key = (r["win_start"], r["event_type"])
        finalized_all[key] = (r["events"], r["value_sum"])
        # append mode emits a window once watermark >= window end
        import datetime
        if r["win_start"] + datetime.timedelta(hours=3) <= max_ts:
            expect[key] = (r["events"], r["value_sum"])

    # every definitely-finalized window was emitted, values identical
    for k, v in expect.items():
        assert got[k] == v, k
    # nothing emitted that disagrees with batch
    for k, v in got.items():
        assert finalized_all[k] == v, k
