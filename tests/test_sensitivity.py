"""Sample-fraction sensitivity (reference tests/sens_sweep.py:20-26:
masks learned on a sample must compress nearly as well as full-data
masks) and threshold-override parity."""

import pytest
from pyspark.sql import functions as F

from invariantbitpacking_spark.operators import ibp


def test_sampled_learning_close_to_full(spark, tokens_df):
    full = ibp.learn_params(tokens_df)
    sampled = ibp.learn_params(tokens_df, sample_fraction=0.25, seed=7)
    b_full = (ibp.encode_ibp(tokens_df, full)
              .agg(F.sum("comp_bytes")).collect()[0][0])
    b_samp = (ibp.encode_ibp(tokens_df, sampled)
              .agg(F.sum("comp_bytes")).collect()[0][0])
    # sampled params must stay within 5% of full-data compression
    assert b_samp <= b_full * 1.05, (b_samp, b_full)


def test_fixed_threshold_override(spark, tokens_df):
    # on the compressible vocab32k slice theta=0.9 has real savings
    vocab = tokens_df.filter("source = 'vocab32k'")
    p = ibp.learn_params(vocab, threshold=0.9)
    assert p.threshold == pytest.approx(0.9)
    dec = ibp.decode_ibp(ibp.encode_ibp(vocab, p), p)
    bad = (vocab.alias("a").join(dec.alias("b"), "doc_id")
           .filter(F.col("a.tokens") != F.col("b.tokens")).count())
    assert bad == 0


def test_no_savings_degrades_to_zero_mask(spark, tokens_df):
    # strict gating at theta=0.9 over the mixed corpus: nothing saves,
    # so params collapse to the zero mask (everything stored verbatim),
    # matching the reference's untouched-output semantics
    p = ibp.learn_params(tokens_df, threshold=0.9)
    assert p.threshold is None and p.saved_bits == 0
    assert int(p.mask.sum()) == 0
    enc = ibp.encode_ibp(tokens_df.limit(50), p)
    assert enc.filter(F.col("comp_bytes") != F.col("raw_bytes")).count() == 0
