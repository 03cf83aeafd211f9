"""Property-based round-trips (hypothesis) across the whole codec
family — arbitrary token values, lengths, masks (mirrors and extends
the reference's generated-tensor strategy, SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from invariantbitpacking_spark.codecs import fsst, lightweight as lw, numpy_ref as nr

tokens_row = st.lists(
    st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=300)
corpus = st.lists(tokens_row, min_size=1, max_size=12)


def to_ragged(rows):
    lens = np.array([len(r) for r in rows], np.int64)
    flat = (np.array([x for r in rows for x in r], np.uint64).astype(np.uint32)
            if lens.sum() else np.zeros(0, np.uint32))
    return flat, lens


@settings(max_examples=40, deadline=None)
@given(corpus, st.sampled_from(["for", "dfor", "rle", "dict"]))
def test_lightweight_roundtrip(rows, codec):
    flat, lens = to_ragged(rows)
    if codec == "dict":
        # respect the documented u16 cardinality precondition
        for r in rows:
            if len(set(r)) > 0xFFFF:
                return
    enc = getattr(lw, f"encode_{codec}")
    dec = getattr(lw, f"decode_{codec}")
    blob, sizes = enc(flat, lens)
    assert blob.size == sizes.sum()
    np.testing.assert_array_equal(dec(blob, sizes, lens), flat)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=80),   # vec_size
    st.integers(min_value=1, max_value=30),   # rows
    st.integers(min_value=0, max_value=2**32 - 1),  # mask seed
    st.integers(min_value=0, max_value=2**31),      # data seed
)
def test_ibp_roundtrip(v, n, mask_seed, data_seed):
    rng = np.random.default_rng(mask_seed % 2**31)
    drng = np.random.default_rng(data_seed)
    mask = rng.integers(0, 2**32, v, dtype=np.uint64).astype(np.uint32)
    bitval = rng.integers(0, 2**32, v, dtype=np.uint64).astype(np.uint32) & mask
    data = drng.integers(0, 2**32, (n, v), dtype=np.uint64).astype(np.uint32)
    # bias some rows toward the predicate to hit compressed paths
    half = slice(0, n // 2)
    data[half] = (data[half] & ~mask[None, :]) | bitval[None, :]
    flat, sizes, is_comp = nr.encode_concat(data, mask, bitval)
    np.testing.assert_array_equal(
        nr.decode_concat(flat, sizes, is_comp, v, mask, bitval), data)
    np.testing.assert_array_equal(
        sizes, nr.comp_sizes_matrix(data, mask, bitval))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
def test_fsst_roundtrip(strings):
    flat, lens = fsst.strings_to_flat(strings)
    table = fsst.build_table(flat, min_count=2)
    enc, enc_lens = fsst.encode_strings(flat, lens, table)
    dec, dec_lens = fsst.decode_strings(enc, enc_lens, table)
    assert fsst.flat_to_strings(dec, dec_lens) == strings
