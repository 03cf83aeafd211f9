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


def test_eval_sampled_learning_identical_params(spark, tokens_df):
    """bench.py q1 runs the θ-selection evaluation on a 25% seeded
    sample with EXACT bit counts: candidate masks per θ are identical
    to the full run, so if the sample votes the same θ the returned
    params are bit-identical — pinned here on the bench corpus."""
    import numpy as np

    full = ibp.learn_params(tokens_df)
    fast = ibp.learn_params(tokens_df, eval_sample_fraction=0.25)
    assert fast.threshold == full.threshold
    assert np.array_equal(fast.mask, full.mask)
    assert np.array_equal(fast.bitval, full.bitval)


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


def test_decode_throughput_guard_at_97pct_mask():
    """Figure-7 regression guard (reference decompression_thput.py): at
    the 97% constructed-rate mask, kernel decode throughput must stay
    within an order of magnitude of its measured ~64 M tok/s (floor set
    8x below to ride out VM noise — this catches path regressions such
    as the all-pass fastpath silently falling back to the bit loop)."""
    import time

    import numpy as np

    from invariantbitpacking_spark.codecs import numpy_ref as nr
    from scripts.decode_ratio_bench import make_mask_and_bitval

    v, n = 256, 8000
    data = np.zeros((n, v), np.uint32)
    mask, bitval = make_mask_and_bitval(v, 0.97, 970)
    flat, sizes, is_comp = nr.encode_concat(data, mask, bitval)
    assert 1.0 - sizes.sum() / data.nbytes > 0.95  # construction holds
    out = nr.decode_concat(flat, sizes, is_comp, v, mask, bitval)
    np.testing.assert_array_equal(out, data)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        nr.decode_concat(flat, sizes, is_comp, v, mask, bitval)
        best = min(best, time.perf_counter() - t0)
    mtoks = data.size / best / 1e6
    assert mtoks > 8.0, f"decode at 97% mask regressed to {mtoks:.1f} M tok/s"
