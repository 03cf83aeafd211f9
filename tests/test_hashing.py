"""Driver-side XXH64 must be bit-equal to Spark's xxhash64 — the
fetch() bucket computation depends on it (a divergent hash would make
point lookups silently miss their bucket dirs)."""

import random
import string

import numpy as np
from pyspark.sql import functions as F

from invariantbitpacking_spark.functions.hashing import (
    bucket_of, spark_xxhash64_str, xxh64)


def test_xxh64_matches_spark_all_length_classes(spark):
    cases = ["", "a", "ab", "abc", "abcd", "doc-1", "x" * 7, "y" * 8,
             "uniform-00000000", "z" * 31, "w" * 32, "v" * 33,
             "m" * 100, "тест-юникод", "emoji-\U0001F600"]
    rng = random.Random(7)
    cases += ["".join(rng.choices(string.printable, k=rng.randint(0, 80)))
              for _ in range(60)]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for c in cases:
        assert got[c] == spark_xxhash64_str(c), c


def test_bucket_of_matches_salting_expression(spark):
    ids = [f"doc-{i:06d}" for i in range(200)] + ["", "x", "long" * 40]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    for nb in (4, 8, 64, 4096):
        got = {r["doc_id"]: r["b"] for r in df.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id"), F.lit(nb)).cast("int").alias("b")
        ).collect()}
        for i in ids:
            assert got[i] == bucket_of(i, nb), (i, nb)


def test_xxh64_known_vector():
    # canonical XXH64 with seed 0 of b"" is 0xEF46DB3751D8E999
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
