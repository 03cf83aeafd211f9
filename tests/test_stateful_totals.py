"""applyInPandasWithState running totals: state accumulates across
micro-batches AND across query restarts (checkpointed state)."""

from pyspark.sql import functions as F

from invariantbitpacking_spark.streaming.stateful_totals import (
    read_latest_totals, start_running_totals)


def _write(spark, tokens_df, path, lo, hi):
    (tokens_df.orderBy("doc_id").limit(hi).subtract(
        tokens_df.orderBy("doc_id").limit(lo))
     .coalesce(1).write.mode("append").parquet(path))


def test_totals_survive_restart(spark, tokens_df, tmp_path):
    inp, out, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    first = tokens_df.limit(100).cache()
    first.coalesce(1).write.mode("append").parquet(inp)

    q = start_running_totals(spark, inp, out, cp)
    q.awaitTermination()
    t1 = {r["source"]: (r["docs"], r["tokens"])
          for r in read_latest_totals(spark, out).collect()}
    exp1 = {r["source"]: (r["d"], r["t"]) for r in
            first.groupBy("source").agg(
                F.count(F.lit(1)).alias("d"), F.sum("n_tok").alias("t")
            ).collect()}
    assert t1 == exp1

    # restart with NEW data: totals must include the old state
    second = tokens_df.subtract(first).limit(80).cache()
    second.coalesce(1).write.mode("append").parquet(inp)
    q2 = start_running_totals(spark, inp, out, cp)
    q2.awaitTermination()
    t2 = {r["source"]: (r["docs"], r["tokens"])
          for r in read_latest_totals(spark, out).collect()}
    both = first.unionByName(second)
    exp2 = {r["source"]: (r["d"], r["t"]) for r in
            both.groupBy("source").agg(
                F.count(F.lit(1)).alias("d"), F.sum("n_tok").alias("t")
            ).collect()}
    # update-mode only re-emits touched sources; untouched keep t1 values
    for src, v in t2.items():
        assert v == exp2[src], src
    for src, v in exp2.items():
        assert t2.get(src, t1.get(src)) == v, src
