"""Sources for the pre-tokenized training-sequence table.

The engine's input is a table ``(doc_id string, tokens array<int32>,
n_tok int, source string)`` (BASELINE.json input_hint).  Two sources:

- :func:`generate_tokens_table` — deterministic synthetic profiles
  mirroring the reference's generated-tensor coverage (FIXTURES.md §2,
  reference tests/compress_test.py:29-46, tests/kmeans_test.py:43-74);
  used by tests and the bench harness.  Seeded; no external data.
- :func:`tokens_from_documents` — derives a tokens table from the
  driver-provided ``documents`` parquet via a deterministic hash
  tokenizer, entirely with JVM-side expressions (no Python UDF).
"""

from __future__ import annotations

import os

import numpy as np

try:  # allow numpy-only use (bench data gen) without a JVM
    from pyspark.sql import DataFrame, SparkSession, functions as F
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )
except ImportError:  # pragma: no cover
    SparkSession = DataFrame = None  # type: ignore

SEED = 42
VEC_SIZE = 128

PROFILES = (
    "uniform", "semidense", "vocab32k", "zipf", "sorted", "runs",
    "lowcard", "normal", "clustered", "constant", "skewdoc",
)

TOKENS_SCHEMA = None
if SparkSession is not None:
    TOKENS_SCHEMA = StructType([
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ])


def _profile_tokens(rng: np.random.Generator, source: str, n: int,
                    templates: np.ndarray) -> np.ndarray:
    if source == "uniform":
        return rng.integers(0, 2**31, n, dtype=np.int64).astype(np.int32)
    if source == "semidense":
        return rng.integers(0, 2**31 // 100, n, dtype=np.int64).astype(np.int32)
    if source == "vocab32k":
        return rng.integers(0, 32_000, n, dtype=np.int64).astype(np.int32)
    if source == "zipf":
        return np.minimum(rng.zipf(1.5, n), 2**31 - 1).astype(np.int32)
    if source == "sorted":
        return np.sort(rng.integers(0, 2**31, n, dtype=np.int64)).astype(np.int32)
    if source == "runs":
        base = rng.integers(0, 1000, max(1, -(-n // 16)), dtype=np.int64)
        return np.repeat(base, 16)[:n].astype(np.int32)
    if source == "lowcard":
        pool = rng.integers(0, 2**31, 256, dtype=np.int64).astype(np.int32)
        return pool[rng.integers(0, 256, n)]
    if source == "normal":
        return rng.normal(0, 2**31 / 3, n).clip(-(2**31), 2**31 - 1).astype(np.int32)
    if source == "clustered":
        t = templates[rng.integers(0, len(templates))]
        reps = int(np.ceil(n / t.size))
        row = np.tile(t, reps)[:n]
        noise = rng.integers(0, 16, n, dtype=np.int64).astype(np.int32)
        return (row | noise).astype(np.int32)
    if source == "constant":
        return np.full(n, 7777, np.int32)
    if source == "skewdoc":
        return rng.integers(0, 32_000, n, dtype=np.int64).astype(np.int32)
    raise ValueError(source)


def _gen_row(i: int, rng: np.random.Generator, templates) -> tuple:
    """Row i of the deterministic corpus.  ALL rng draws for a row go
    through here in a fixed order, so any chunking of the enclosing
    loop yields bit-identical rows at every corpus size."""
    source = PROFILES[i % len(PROFILES)]
    if source == "skewdoc":
        n_tok = min(int(rng.pareto(1.2) * 256) + 16, 65_536)
    else:
        n_tok = int(rng.integers(64, 2048))
    toks = _profile_tokens(rng, source, n_tok, templates)
    return (f"{source}-{i:08d}", toks, n_tok, source)


def _gen_templates(rng: np.random.Generator) -> np.ndarray:
    t = rng.integers(0, 2**31, (32, VEC_SIZE), dtype=np.int64).astype(np.int32)
    t &= ~np.int32(15)  # low 4 bits left for noise
    return t


def generate_tokens_rows(num_rows: int, seed: int = SEED):
    """Deterministic (doc_id, tokens, n_tok, source) numpy rows,
    round-robin over profiles.  Same seed -> same table; a prefix of a
    larger corpus equals the smaller corpus."""
    rng = np.random.default_rng(seed)
    templates = _gen_templates(rng)
    return [_gen_row(i, rng, templates) for i in range(num_rows)]


def write_tokens_parquet(path: str, num_rows: int, seed: int = SEED,
                         row_group_docs: int = 2000,
                         chunk_docs: int = 20_000) -> str:
    """Materialize the synthetic table as parquet with pyarrow (fast,
    no JVM needed); idempotent per (path exists) check.  Rows stream
    through one ParquetWriter in fixed-size chunks, so driver memory
    stays O(chunk) — the previous whole-table buffer held ~35 GB at
    the 100x bench point (4M docs / 4.1B tokens) before a single
    monolithic write_table call."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    os.makedirs(path, exist_ok=True)
    schema = pa.schema([
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ])
    rng = np.random.default_rng(seed)
    templates = _gen_templates(rng)
    buf = {k: [] for k in ("doc_id", "tokens", "n_tok", "source")}
    with pq.ParquetWriter(os.path.join(path, "part-0.parquet"),
                          schema) as writer:

        def flush():
            if not buf["doc_id"]:
                return
            writer.write_table(pa.table(buf, schema=schema),
                               row_group_size=row_group_docs)
            for v in buf.values():
                v.clear()

        for i in range(num_rows):
            doc_id, toks, n_tok, source = _gen_row(i, rng, templates)
            buf["doc_id"].append(doc_id)
            buf["tokens"].append(toks)
            buf["n_tok"].append(n_tok)
            buf["source"].append(source)
            if (i + 1) % chunk_docs == 0:
                flush()
        flush()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return path


def generate_tokens_df(spark: "SparkSession", num_rows: int,
                       seed: int = SEED, num_partitions: int | None = None) -> "DataFrame":
    """Synthetic table as a Spark DataFrame (via a temp parquet cache so
    repeated calls are cheap and the plan is a real columnar scan)."""
    cache = os.path.join(
        os.environ.get("IBP_DATA_DIR", "/tmp/ibp_spark_data"),
        f"tokens_n{num_rows}_s{seed}",
    )
    write_tokens_parquet(cache, num_rows, seed)
    df = spark.read.parquet(cache)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def read_tokens_table(spark: "SparkSession", path: str,
                      fmt: str = "auto") -> "DataFrame":
    """Read a (doc_id, tokens, n_tok, source) table.

    ``fmt='auto'`` prefers an Iceberg table (the production input per
    BASELINE.json input_hint) when the Iceberg runtime is on the
    classpath, else falls back to plain parquet — the sandbox ships no
    Iceberg jars, the code path is the same either way (a V2 scan with
    pushdown + pruning)."""
    if fmt in ("auto", "iceberg"):
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:
            if fmt == "iceberg":
                raise
    return spark.read.parquet(path)


# Deterministic word -> token-id hash, expressible identically in Spark
# and ANSI SQL (DuckDB oracle): both agree that ascii('') == 0.
TOKENIZER_SQL_LAMBDA = (
    "(ascii(substr(w, 1, 1)) * 521 + ascii(substr(w, 2, 1)) * 31 + length(w)) % 32000"
)


def _word_token(w):
    return (
        (F.ascii(F.substring(w, 1, 1)) * 521
         + F.ascii(F.substring(w, 2, 1)) * 31
         + F.length(w)) % 32_000
    ).cast("int")


def tokens_from_documents(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Derive a (doc_id, tokens, n_tok, source) table from the driver's
    ``documents`` parquet with a deterministic space-split + char-hash
    tokenizer — pure Catalyst expressions, fully pushdown-friendly, and
    replicable in the DuckDB oracle (TOKENIZER_SQL_LAMBDA)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = F.transform(F.split(F.col("text"), " "), _word_token)
    return (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            toks.alias("tokens"),
            F.col("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
