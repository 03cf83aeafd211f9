"""Float feature columns end-to-end (round-5 verdict item 1).

The reference's real workloads view float tensors as integer words
(DLRM embeddings as int64, tests/nvcomp_comparison.py:39; KV-cache as
int32, tests/invariance_perc.py:112; float64 bit-views,
tests/compress_test.py:30-33).  Here array<float>/array<double>
columns flow through frame/learn/encode/decode via IEEE bit views —
zero-copy reinterpretation at the Arrow boundary, float element types
restored on decode — and round-trip BIT-identical (checked on the
int-viewed buffers, so -0.0 vs 0.0 and NaN payloads can't hide)."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from invariantbitpacking_spark.operators import ibp, selector
from invariantbitpacking_spark.operators.framing import list_array_flat


def _float_df(spark, n=250, seed=7, dtype=np.float32):
    rng = np.random.default_rng(seed)
    rows = []
    specials = [0.0, -0.0, 1.0, -1.0, float(np.finfo(dtype).tiny) / 4,
                float(np.nan), float(np.inf), float(-np.inf)]
    for i in range(n):
        m = int(rng.integers(4, 180))
        v = (rng.standard_normal(m) * rng.choice([0.05, 1.0, 30.0])
             ).astype(dtype)
        if i % 7 == 0:  # sprinkle signed zeros / subnormals / non-finite
            v[: min(len(specials), m)] = np.array(
                specials[: min(len(specials), m)], dtype)
        rows.append((f"f{i:05d}", [float(x) for x in v], m,
                     f"s{i % 3}"))
    elem = "float" if dtype == np.float32 else "double"
    return spark.createDataFrame(
        rows, f"doc_id string, tokens array<{elem}>, n_tok int, "
              "source string"), dtype


def _bitmaps(df, dtype):
    idt = np.int32 if dtype == np.float32 else np.int64
    return {r["doc_id"]: np.array(r["tokens"], dtype).view(idt)
            for r in df.collect()}


def test_list_array_flat_views_floats():
    col = pa.array([[1.5, -0.0, float("nan")], [2.0]],
                   type=pa.list_(pa.float32()))
    flat, starts, lens = list_array_flat(col, 4)
    assert flat.dtype == np.int32
    exp = np.array([1.5, -0.0, np.nan], np.float32).view(np.int32)
    np.testing.assert_array_equal(flat[starts[0]:starts[0] + 3], exp)
    col64 = pa.array([[1e-310]], type=pa.list_(pa.float64()))
    flat64, s64, _ = list_array_flat(col64, 8)
    assert flat64.dtype == np.int64
    assert flat64[s64[0]] == np.float64(1e-310).view(np.int64)


def test_float32_ibp_roundtrip_bit_identical(spark):
    df, dtype = _float_df(spark)
    params = ibp.learn_params(df, sample_fraction=None)
    assert params.value_kind == "float32" and params.item_bytes == 4
    dec = ibp.decode_ibp(ibp.encode_ibp(df, params), params)
    assert dec.schema["tokens"].dataType.simpleString() == "array<float>"
    a, b = _bitmaps(df, dtype), _bitmaps(dec, dtype)
    assert set(a) == set(b)
    bad = [k for k in a if not np.array_equal(a[k], b[k])]
    assert bad == []


def test_float32_auto_roundtrip_bit_identical(spark):
    df, dtype = _float_df(spark, seed=11)
    params = ibp.learn_params(df, sample_fraction=None)
    enc = selector.encode_auto(df, params)
    dec = selector.decode_auto(enc, params)
    assert dec.schema["tokens"].dataType.simpleString() == "array<float>"
    a, b = _bitmaps(df, dtype), _bitmaps(dec, dtype)
    bad = [k for k in a if not np.array_equal(a[k], b[k])]
    assert bad == []
    # never-expand holds on float bits too
    assert enc.filter(F.col("comp_bytes") > F.col("raw_bytes")).count() == 0


def test_float64_ibp_roundtrip_bit_identical(spark):
    df, dtype = _float_df(spark, n=80, seed=13, dtype=np.float64)
    params = ibp.learn_params(df, sample_fraction=None)
    assert params.value_kind == "float64" and params.item_bytes == 8
    dec = ibp.decode_ibp(ibp.encode_ibp(df, params), params)
    assert dec.schema["tokens"].dataType.simpleString() == "array<double>"
    a, b = _bitmaps(df, dtype), _bitmaps(dec, dtype)
    bad = [k for k in a if not np.array_equal(a[k], b[k])]
    assert bad == []


def test_float64_rejected_by_lightweight_family(spark):
    df, _ = _float_df(spark, n=5, dtype=np.float64)
    params = ibp.learn_params(df, sample_fraction=None)
    with pytest.raises(ValueError, match="array<bigint>/array<double>"):
        selector.encode_auto(df, params)


def test_float_params_persist_value_kind(tmp_path):
    p = ibp.IbpParams(np.zeros(8, np.uint32), np.zeros(8, np.uint32),
                      vec_size=8, value_kind="float32")
    q = ibp.IbpParams.from_dict(p.to_dict())
    assert q.value_kind == "float32"
    # legacy dicts (no key) default to int
    d = p.to_dict()
    del d["value_kind"]
    assert ibp.IbpParams.from_dict(d).value_kind == "int"


def test_float_exact_integer_values_compress(spark):
    """CAST(id AS FLOAT) vocab data: the float view spreads ids across
    ~15 binades, so only sign + top exponent bits are invariant —
    savings are real but modest (vs 2.0x on the raw ints, whose high
    17 bits are all-zero).  A SINGLE-binade column (ids in
    [2^14, 2^15), one shared exponent — the normalized-embedding
    shape) recovers the full sign+exponent+leading-mantissa
    invariance."""
    from invariantbitpacking_spark.sources.tokens import generate_tokens_df

    t = generate_tokens_df(spark, 300, seed=42)
    ft = t.select(
        "doc_id",
        F.transform("tokens", lambda x: x.cast("float")).alias("tokens"),
        "n_tok", "source")
    params = ibp.learn_params(ft, sample_fraction=None)
    enc = ibp.encode_ibp(ft, params)
    r = enc.agg(F.sum("raw_bytes"), F.sum("comp_bytes")).collect()[0]
    assert r[0] / r[1] > 1.05  # sign + shared-prefix exponent bits
    dec = ibp.decode_ibp(enc, params)
    a, b = _bitmaps(ft, np.float32), _bitmaps(dec, np.float32)
    assert all(np.array_equal(a[k], b[k]) for k in a)
    # single binade: (id % 2^14) + 2^14 in float -> 9 invariant top bits
    f1 = t.select(
        "doc_id",
        F.transform("tokens", lambda x:
                    (x % 16384 + 16384).cast("float")).alias("tokens"),
        "n_tok", "source")
    p1 = ibp.learn_params(f1, sample_fraction=None)
    e1 = ibp.encode_ibp(f1, p1)
    r1 = e1.agg(F.sum("raw_bytes"), F.sum("comp_bytes")).collect()[0]
    assert r1[0] / r1[1] > 1.25
    d1 = ibp.decode_ibp(e1, p1)
    a1, b1 = _bitmaps(f1, np.float32), _bitmaps(d1, np.float32)
    assert all(np.array_equal(a1[k], b1[k]) for k in a1)


def test_float_corpus_through_durable_pipeline(spark, tmp_path):
    """The WHOLE living-snapshot stack on an array<float> corpus:
    run -> checksums -> point fetch (floats back, bit-identical) ->
    delta upsert -> tombstone delete -> streaming float ingest via the
    schema_ddl override -> compact.  Proves value_kind flows through
    persisted params, FSST string columns, delta resolution and the
    decode-on-fetch path."""
    from invariantbitpacking_spark.plans.pipeline import CompressionPipeline
    from invariantbitpacking_spark.streaming.encode_stream import (
        start_ingest_stream)

    df, dtype = _float_df(spark, n=120, seed=3)
    out = str(tmp_path / "fpipe")
    pipe = CompressionPipeline(spark, out, num_buckets=4, wave_buckets=4,
                               sample_fraction=None)
    pipe.run(df, "fsnap")
    assert pipe.verify_checksums("fsnap") == 0
    params = pipe._load_params("fsnap")
    assert params.value_kind == "float32"
    # point fetch decodes back to float, bit-identical
    want = [r["doc_id"] for r in
            df.select("doc_id").orderBy("doc_id").limit(3).collect()]
    got = pipe.fetch(want, "fsnap")
    assert got.schema["tokens"].dataType.simpleString() == "array<float>"
    a = _bitmaps(df.filter(F.col("doc_id").isin(want)), dtype)
    b = _bitmaps(got, dtype)
    assert a.keys() == b.keys()
    assert all(np.array_equal(a[k], b[k]) for k in a)
    # delta upsert of a float doc
    delta = spark.createDataFrame(
        [("f-new", [1.5, -0.0, 2.25], 3, "s0")],
        "doc_id string, tokens array<float>, n_tok int, source string")
    pipe.append(delta, "fsnap")
    nv = pipe.fetch(["f-new"], "fsnap").first()
    assert np.array_equal(
        np.array(nv["tokens"], np.float32).view(np.int32),
        np.array([1.5, -0.0, 2.25], np.float32).view(np.int32))
    # tombstone delete
    ids = spark.createDataFrame([(want[0],)], "doc_id string")
    pipe.delete(ids, "fsnap")
    assert pipe.fetch([want[0]], "fsnap").count() == 0
    assert pipe.verify_checksums("fsnap") == 0
    # streaming float ingest (schema_ddl override)
    inbox = str(tmp_path / "finbox")
    ckpt = str(tmp_path / "fckpt")
    spark.createDataFrame(
        [(f"fs-{i}", [float(i), float(i) / 4], 2, "fs") for i in range(5)],
        "doc_id string, tokens array<float>, n_tok int, source string"
    ).write.mode("append").parquet(inbox)
    q = start_ingest_stream(
        spark, inbox, pipe, "fsnap", ckpt,
        schema_ddl="doc_id string, tokens array<float>, n_tok int, "
                   "source string")
    q.awaitTermination()
    assert pipe.fetch(["fs-3"], "fsnap").first()["tokens"] == [3.0, 0.75]
    pipe.compact("fsnap")
    assert pipe.verify_checksums("fsnap") == 0
    assert pipe.read_encoded("fsnap").count() == 120 - 1 + 1 + 5
