"""Column-statistics functions (JVM-side, whole-stage-codegen friendly).

These feed the codec auto-selector (BASELINE.json north_rule: choose a
codec from cardinality, run count, bit-width histogram, value range)
and double as SQL-oracle-checkable queries.  Everything here is pure
``pyspark.sql.functions`` — no Python UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column (min, max, exact NDV, count) as rows
    ``(col_name, min_v, max_v, ndv, cnt)``.

    One aggregation per column unioned; Catalyst collapses each into a
    partial+final hash agg over the scan with column pruning.
    """
    parts = [
        df.agg(
            F.lit(c).alias("col_name"),
            F.min(F.col(c)).cast("long").alias("min_v"),
            F.max(F.col(c)).cast("long").alias("max_v"),
            F.count_distinct(F.col(c)).alias("ndv"),
            F.count(F.col(c)).alias("cnt"),
        )
        for c in cols
    ]
    return reduce(lambda a, b: a.unionAll(b), parts)


def bit_width(col: Column) -> Column:
    """ceil(log2(max-min+1)) bit width of a value range — the
    frame-of-reference width rule (reference tests/invariance_perc.py:
    30-44: ``ceil(log2(max - min + 1))`` bits per column)."""
    return F.ceil(F.log2(col + F.lit(1))).cast("int")


def bitwidth_histogram(tokens_df: DataFrame) -> DataFrame:
    """Selector input: histogram of per-document FOR bit widths
    (``ceil(log2(max - min + 1))``) keyed by source — how many bits the
    frame-of-reference codec needs per document.  Pure expressions:
    array_min/max per row, then a two-key hash aggregation."""
    t = F.col("tokens")
    rng = (F.array_max(t).cast("long") - F.array_min(t).cast("long"))
    # integer bit length via binary-string length: exact, unlike float
    # log2 which can straddle a ulp at powers of two across engines
    width = (F.when(F.size(t) == 0, F.lit(0))
             .when(rng == 0, F.lit(0))
             .otherwise(F.length(F.conv(rng.cast("string"), 10, 2)))
             .cast("int"))
    return (tokens_df
            .select("source", width.alias("bit_width"))
            .groupBy("source", "bit_width")
            .agg(F.count(F.lit(1)).alias("docs")))


def token_stats_per_source(tokens_df: DataFrame) -> DataFrame:
    """Selector inputs per source partition: token count, distinct
    tokens (approx at scale), min/max token, mean run length proxy.
    Exploding is avoided: per-row partials via array functions, then a
    single hash agg keyed by (low-cardinality) source."""
    t = F.col("tokens")
    per_row = tokens_df.select(
        "source",
        F.size(t).alias("n"),
        F.array_min(t).alias("mn"),
        F.array_max(t).alias("mx"),
        F.size(F.array_distinct(t)).alias("row_ndv"),
        # runs within the row: 1 + count of adjacent unequal pairs
        (F.lit(1) + F.size(F.filter(
            F.zip_with(F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                       F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                       lambda a, b: a != b),
            lambda x: x))).alias("row_runs"),
    )
    return per_row.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.min("mn").alias("min_tok"),
        F.max("mx").alias("max_tok"),
        F.sum("row_ndv").alias("sum_row_ndv"),
        F.sum("row_runs").alias("sum_row_runs"),
        F.count(F.lit(1)).alias("docs"),
    )
