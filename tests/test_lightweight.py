"""Round-trip + size-formula tests for the FOR/DFOR/RLE/DICT codecs."""

import numpy as np
import pytest

from invariantbitpacking_spark.codecs import lightweight as lw
from invariantbitpacking_spark.codecs.bitutil import pack_fixed, unpack_fixed, width_for


def ragged(rng, ndocs, gen):
    lens = rng.integers(0, 300, ndocs)
    lens[rng.integers(0, ndocs)] = 0  # always include an empty row
    rows = [gen(int(n)) for n in lens]
    flat = np.concatenate([r for r in rows if r.size]) if lens.sum() else np.zeros(0, np.uint32)
    return flat.astype(np.uint32), lens.astype(np.int64)


class TestBitUtil:
    @pytest.mark.parametrize("w", [1, 3, 7, 8, 13, 16, 31, 32])
    def test_pack_roundtrip(self, w):
        rng = np.random.default_rng(w)
        lens = np.array([0, 1, 7, 8, 9, 100], np.int64)
        hi = np.uint64(1) << np.uint64(w)
        flat = rng.integers(0, int(hi), int(lens.sum()), dtype=np.uint64).astype(np.uint32)
        packed, sizes = pack_fixed(flat, lens, w)
        assert sizes.tolist() == [-(-int(n) // 8) * w for n in lens]
        out = unpack_fixed(packed, lens, w)
        np.testing.assert_array_equal(out, flat)

    def test_width_for(self):
        assert width_for(np.array([0]))[0] == 0
        assert width_for(np.array([1]))[0] == 1
        assert width_for(np.array([2]))[0] == 2
        assert width_for(np.array([255]))[0] == 8
        assert width_for(np.array([256]))[0] == 9
        assert width_for(np.array([2**31]))[0] == 32
        assert width_for(np.array([2**32 - 1], np.uint64))[0] == 32


@pytest.mark.parametrize("codec", ["for", "dfor", "rle", "dict"])
def test_roundtrip_profiles(codec):
    enc = getattr(lw, f"encode_{codec}")
    dec = getattr(lw, f"decode_{codec}")
    rng = np.random.default_rng(123)
    gens = {
        "lowcard": lambda n: rng.choice(
            rng.integers(0, 2**31, 50).astype(np.uint32), n),
        "sorted": lambda n: np.sort(rng.integers(0, 2**31, n)).astype(np.uint32),
        "runs": lambda n: np.repeat(
            rng.integers(0, 1000, max(1, -(-n // 16))), 16)[:n].astype(np.uint32),
        "uniform": lambda n: rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32),
        "constant": lambda n: np.full(n, 424242, np.uint32),
        "narrow": lambda n: (1000 + rng.integers(0, 17, n)).astype(np.uint32),
    }
    for name, gen in gens.items():
        flat, lens = ragged(rng, 30, gen)
        blob, sizes = enc(flat, lens)
        assert blob.size == sizes.sum()
        out = dec(blob, sizes, lens)
        np.testing.assert_array_equal(out, flat, err_msg=f"{codec}/{name}")


def test_expected_winners():
    """Each codec must win its canonical profile (size sanity)."""
    rng = np.random.default_rng(7)
    n = 4096
    lens = np.array([n], np.int64)

    def all_sizes(flat):
        return {c: int(getattr(lw, f"encode_{c}")(flat, lens)[1][0])
                for c in ["for", "dfor", "rle", "dict"]}

    raw = 4 * n
    sorted_data = np.sort(rng.integers(0, 2**31, n)).astype(np.uint32)
    s = all_sizes(sorted_data)
    # max-gap of 4096 uniform draws dominates the delta width (~23 bits)
    assert s["dfor"] == min(s.values()) and s["dfor"] < raw * 3 // 4

    runs_data = np.repeat(rng.integers(0, 1000, n // 16), 16).astype(np.uint32)
    s = all_sizes(runs_data)
    assert s["rle"] == min(s.values()) and s["rle"] < raw // 4

    lowcard = rng.choice(rng.integers(0, 2**31, 64).astype(np.uint32), n)
    s = all_sizes(lowcard)
    assert s["dict"] == min(s.values()) and s["dict"] < raw // 4

    narrow = (10**6 + rng.integers(0, 256, n)).astype(np.uint32)
    s = all_sizes(narrow)
    assert s["for"] <= s["dict"] and s["for"] < raw // 3


def test_dict_cardinality_guard():
    flat = np.arange(70000, dtype=np.uint32)
    lens = np.array([70000], np.int64)
    with pytest.raises(ValueError):
        lw.encode_dict(flat, lens)


def test_dfor_delta_range_beyond_32_bits_is_lossless():
    """Alternating near-extremes make the consecutive-diff range span
    ~2^33 (> 32 bits); the w<=32 clamp must stay lossless because dfor
    arithmetic is mod-2^32 (dropped high bits are multiples of 2^32
    and cancel in the final uint32 cast)."""
    from invariantbitpacking_spark.codecs.lightweight import (
        decode_dfor, encode_dfor)

    row = np.array([0, 0xFFFFFFFF, 0, 0xFFFFFFFF, 7, 0xFFFFFFF0],
                   np.uint32)
    lens = np.array([row.size], np.int64)
    blob, sizes = encode_dfor(row, lens)
    out = decode_dfor(blob, sizes, lens)
    assert (out == row).all()
    # and the packed width was indeed clamped to 32
    assert blob[8] == 32
