"""The word-level fast path must be byte-identical to the general
bit-level path on every input shape (it is an evaluation strategy, not
a different codec)."""

import numpy as np
import pytest

from invariantbitpacking_spark.codecs import numpy_ref as nr


def both_paths(block, mask, bitval):
    """Encode with fastpath enabled and disabled; return both."""
    fast = nr.encode_concat(block, mask, bitval)
    orig = nr._fast_layout
    nr._fast_layout = lambda m, b: None
    try:
        slow = nr.encode_concat(block, mask, bitval)
    finally:
        nr._fast_layout = orig
    return fast, slow


@pytest.mark.parametrize("case", ["contig", "noncontig", "mixedrows",
                                  "fullmask", "zeromaskcols", "v33"])
def test_fast_equals_general(case):
    rng = np.random.default_rng(hash(case) % 2**31)
    if case == "contig":
        v, mask_word = 128, 0xFFFF8000
    elif case == "noncontig":
        v, mask_word = 64, 0xF0F0F0F0
    elif case == "mixedrows":
        v, mask_word = 64, 0xFFFF0000
    elif case == "fullmask":
        v, mask_word = 32, 0xFFFFFFFF
    elif case == "zeromaskcols":
        v, mask_word = 48, 0x0
    else:
        v, mask_word = 33, 0xFFFFFF00
    mask = np.full(v, mask_word, np.uint32)
    if case == "zeromaskcols":
        mask[::2] = 0xFFFF0000  # alternate zero-mask / masked columns
    bitval = rng.integers(0, 2**32, v, dtype=np.uint64).astype(np.uint32) & mask
    data = rng.integers(0, 2**32, (200, v), dtype=np.uint64).astype(np.uint32)
    # force most rows all-pass
    npass = 150 if case == "mixedrows" else 200
    data[:npass] = (data[:npass] & ~mask[None, :]) | bitval[None, :]
    (f_flat, f_sizes, f_comp), (s_flat, s_sizes, s_comp) = both_paths(
        data, mask, bitval)
    np.testing.assert_array_equal(f_sizes, s_sizes)
    np.testing.assert_array_equal(f_comp, s_comp)
    assert f_flat.tobytes() == s_flat.tobytes()
    # decode both ways too
    dec_fast = nr.decode_concat(f_flat, f_sizes, f_comp, v, mask, bitval)
    orig = nr._fast_layout
    nr._fast_layout = lambda m, b: None
    try:
        dec_slow = nr.decode_concat(f_flat, f_sizes, f_comp, v, mask, bitval)
    finally:
        nr._fast_layout = orig
    np.testing.assert_array_equal(dec_fast, data)
    np.testing.assert_array_equal(dec_slow, data)


def test_random_masks_fast_vs_general():
    rng = np.random.default_rng(77)
    for _ in range(10):
        v = int(rng.integers(1, 200))
        mask = rng.integers(0, 2**32, v, dtype=np.uint64).astype(np.uint32)
        bitval = rng.integers(0, 2**32, v, dtype=np.uint64).astype(np.uint32) & mask
        data = rng.integers(0, 2**32, (64, v), dtype=np.uint64).astype(np.uint32)
        data[:48] = (data[:48] & ~mask[None, :]) | bitval[None, :]
        (f_flat, f_sizes, f_comp), (s_flat, s_sizes, s_comp) = both_paths(
            data, mask, bitval)
        assert f_flat.tobytes() == s_flat.tobytes()
        np.testing.assert_array_equal(
            nr.decode_concat(f_flat, f_sizes, f_comp, v, mask, bitval), data)
