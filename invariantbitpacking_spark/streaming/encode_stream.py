"""Structured Streaming ingest: encode token documents as they land.

The reference is purely batch (SURVEY.md §2.6: no streaming/state); a
production corpus, however, grows continuously, so the engine exposes
the same auto-selected encoder as an incremental stream: new parquet
files under the input path are discovered, encoded, and appended to
the sink exactly once (checkpoint-tracked offsets — the streaming
analog of the batch pipeline's lineage resume).

The encode itself is the stateless ``mapInPandas`` projection from
operators/selector.py, which Structured Streaming runs unchanged; with
``Trigger.AvailableNow`` the same job doubles as an incremental batch
backfill.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.ibp import IbpParams
from ..operators import selector

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def start_encode_stream(spark: SparkSession, input_path: str,
                        output_path: str, checkpoint_path: str,
                        params: IbpParams,
                        available_now: bool = True,
                        max_files_per_trigger: int | None = None
                        ) -> StreamingQuery:
    """Start (and return) the streaming encode query.  Callers own
    ``query.awaitTermination()`` / ``stop()``."""
    reader = (spark.readStream.schema(TOKENS_DDL)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              if max_files_per_trigger else
              spark.readStream.schema(TOKENS_DDL))
    stream = reader.parquet(input_path)
    enc = selector.encode_auto(stream, params)
    writer = (enc.writeStream
              .format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_incremental(spark: SparkSession, input_path: str,
                    output_path: str, checkpoint_path: str,
                    params: IbpParams) -> None:
    """Process everything new under ``input_path`` once and stop —
    exactly-once incremental encode (AvailableNow)."""
    q = start_encode_stream(spark, input_path, output_path,
                            checkpoint_path, params, available_now=True)
    q.awaitTermination()
