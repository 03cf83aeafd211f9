"""Watermarked windowed aggregation over an event stream.

The second streaming surface (next to the stateless encode stream):
event-time tumbling windows with a watermark bounding late data, so
window state is dropped once the watermark passes — the standard
Structured Streaming shape for monitoring a 100 TB ingest (events/sec,
value sums per type) without unbounded state.

Batch parity: :func:`windowed_stats_batch` computes the identical
aggregation on a static DataFrame, which is what the SQL oracle can
check (streaming and batch share the same logical plan in Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def _agg(df: DataFrame, window: str) -> DataFrame:
    return (df.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("events"),
                 F.round(F.sum("value"), 6).alias("value_sum"))
            .select(F.col("w.start").alias("win_start"),
                    "event_type", "events", "value_sum"))


def windowed_stats_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of the streaming aggregation (oracle-checkable)."""
    return _agg(events, window)


def start_windowed_stats_stream(spark: SparkSession, input_path: str,
                                output_path: str, checkpoint_path: str,
                                window: str = "1 hour",
                                watermark: str = "2 hours",
                                available_now: bool = True) -> StreamingQuery:
    """Stream event files into watermarked tumbling-window aggregates.

    The watermark bounds both late-data acceptance and state size:
    windows older than (max event time - watermark) are finalized,
    emitted (append mode), and their state evicted."""
    stream = (spark.readStream.schema(EVENTS_DDL).parquet(input_path)
              .withWatermark("ts", watermark))
    agg = _agg(stream, window)
    writer = (agg.writeStream.format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
