"""Custom stateful streaming operator: running per-source corpus totals.

``applyInPandasWithState`` keeps (docs, tokens, raw_bytes) per source
across micro-batches AND across query restarts (state lives in the
checkpoint), emitting the updated totals whenever a source receives
data — the ingest-monitoring counter a 10^12-sequence pipeline runs
next to the encoder.  This is the arbitrary-stateful surface the
declarative windowed aggregation (windowed_stats.py) cannot express.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"
OUTPUT_DDL = "source string, docs long, tokens long, raw_bytes long"
STATE_DDL = "docs long, tokens long, raw_bytes long"


def _update_totals(key: Any, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterable[pd.DataFrame]:
    docs, toks, raw = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        docs += len(pdf)
        t = int(pdf["n_tok"].fillna(0).sum())
        toks += t
        raw += 4 * t
    state.update((docs, toks, raw))
    yield pd.DataFrame({"source": [key[0]], "docs": [docs],
                        "tokens": [toks], "raw_bytes": [raw]})


def start_running_totals(spark: SparkSession, input_path: str,
                         output_path: str, checkpoint_path: str,
                         available_now: bool = True) -> StreamingQuery:
    """Start the stateful totals query.  Each micro-batch's updated
    totals are appended to ``output_path`` tagged with the (monotonic,
    restart-surviving) batch id via foreachBatch — the upsert-into-a-
    metrics-table pattern.  State persists in ``checkpoint_path``: a
    restarted query RESUMES the running totals, it does not restart
    from zero."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(TOKENS_DDL).parquet(input_path)
    totals = (stream.select("source", "n_tok")
              .groupBy("source")
              .applyInPandasWithState(
                  _update_totals, OUTPUT_DDL, STATE_DDL,
                  "update", GroupStateTimeout.NoTimeout))

    def sink(batch_df, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_path))

    writer = (totals.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_latest_totals(spark: SparkSession, output_path: str):
    """Latest running total per source (max batch_id wins)."""
    from pyspark.sql import Window, functions as F

    df = spark.read.parquet(output_path)
    w = Window.partitionBy("source").orderBy(F.desc("batch_id"))
    return (df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").drop("rn", "batch_id"))
