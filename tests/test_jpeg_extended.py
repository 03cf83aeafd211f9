"""JPEG beyond baseline 4:4:4: subsampled chroma, restart intervals,
progressive (SOF2 spectral selection + successive approximation).

The load-bearing invariant: the progressive scan script restores every
quantized coefficient bit, so a progressive file must decode
BYTE-IDENTICAL to its sequential twin — any defect in EOB-run
accumulation, ZRL interleaving, correction-bit ordering or the
refinement walk breaks exact equality somewhere in the image."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from invariantbitpacking_spark.functions import multimodal as mm


def test_jpeg_420_constant_tiles_gray_exact():
    """16x16-constant tiles at q0 decode EXACTLY; a single-component
    image has no chroma to subsample, so the encoder writes plain 1x1
    factors regardless of the requested subsampling."""
    rng = np.random.default_rng(3)
    tiles = rng.integers(0, 256, (2, 3)).astype(np.uint8)
    px = np.kron(tiles, np.ones((16, 16), np.uint8))
    f = mm.make_jpeg(48, 32, px, quality=0, subsampling=(2, 2))
    img, meta = mm.decode_image(f)
    assert (meta["w"], meta["h"]) == (48, 32)
    assert np.array_equal(img, px)
    sof = f.index(b"\xff\xc0")
    assert f[sof + 11] == 0x11  # gray: one 1x1 component


def test_jpeg_420_rgb_constant_tiles_within_rounding():
    """RGB 4:2:0 with 16x16-constant tiles at q0: box-mean chroma
    downsampling is lossless on constants, so only the YCbCr
    forward+inverse rounding remains; the SOF really carries 2x2 luma
    factors against 1x1 chroma."""
    rng = np.random.default_rng(5)
    t = rng.integers(0, 256, (2, 2, 3)).astype(np.uint8)
    px = np.kron(t.transpose(2, 0, 1),
                 np.ones((16, 16), np.uint8)).transpose(1, 2, 0)
    f = mm.make_jpeg(32, 32, px, quality=0, subsampling=(2, 2))
    img, _ = mm.decode_image(f)
    assert np.abs(img.astype(int) - px.astype(int)).max() <= 1
    sof = f.index(b"\xff\xc0")
    assert f[sof + 11] == 0x22  # luma h=2, v=2
    assert f[sof + 14] == 0x11  # chroma 1x1


def test_jpeg_422_440_ragged_dims_chroma_flat_roundtrip():
    """Non-multiple dimensions through every subsampling mode: shapes
    survive the pad/crop path.  The image is chroma-flat (Cb=Cr=128,
    i.e. gray expressed as RGB), so box-mean downsampling is lossless
    and the decode must land within DCT+color rounding of the input —
    on an arbitrary image, subsampling legitimately loses chroma, so
    exactness is only provable on chroma-constant content."""
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (21, 19), dtype=np.uint8)
    px = np.repeat(y[:, :, None], 3, axis=2)  # R=G=B -> Cb=Cr=128
    for sub in ((2, 1), (1, 2), (2, 2)):
        f = mm.make_jpeg(19, 21, px, quality=0, subsampling=sub)
        img, _ = mm.decode_image(f)
        assert img.shape == (21, 19, 3)
        assert np.abs(img.astype(int) - px.astype(int)).max() <= 2


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: markers are really written, DC prediction restarts,
    and the decode equals the restart-free file's decode exactly."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 40), dtype=np.uint8)  # 15 MCUs
    f = mm.make_jpeg(40, 24, px, quality=0, restart_interval=4)
    assert b"\xff\xdd" in f
    scan = f[f.index(b"\xff\xda"):]
    assert any(bytes([0xFF, 0xD0 + k]) in scan for k in range(8))
    a, _ = mm.decode_image(f)
    b, _ = mm.decode_image(mm.make_jpeg(40, 24, px, quality=0))
    assert np.array_equal(a, b)
    assert np.abs(a.astype(int) - px.astype(int)).max() <= 1


def test_jpeg_progressive_equals_sequential():
    for shape, sub in (((24, 24), (1, 1)),
                       ((24, 40, 3), (2, 2)),
                       ((17, 9), (1, 1)),
                       ((16, 16, 3), (1, 1))):
        rng = np.random.default_rng(13)
        px = rng.integers(0, 256, shape).astype(np.uint8)
        h, w = shape[:2]
        seq = mm.make_jpeg(w, h, px, quality=0, subsampling=sub)
        pro = mm.make_jpeg(w, h, px, quality=0, subsampling=sub,
                           progressive=True)
        assert b"\xff\xc2" in pro
        a, _ = mm.decode_image(seq)
        b, _ = mm.decode_image(pro)
        assert np.array_equal(a, b), f"shape {shape} sub {sub}"


def test_jpeg_progressive_eobrun_and_zrl_stress():
    """A mostly-flat image with isolated hot pixels drives long EOB
    runs across blocks and long in-block zero runs (ZRL), in both the
    first and the refinement AC scans."""
    px = np.full((48, 48), 128, np.uint8)
    px[5, 5], px[37, 42], px[20, 21] = 255, 0, 129
    a, _ = mm.decode_image(mm.make_jpeg(48, 48, px, quality=0))
    b, _ = mm.decode_image(
        mm.make_jpeg(48, 48, px, quality=0, progressive=True))
    assert np.array_equal(a, b)


def test_jpeg_progressive_with_restarts_and_quality():
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    seq = mm.make_jpeg(48, 32, px, quality=2, subsampling=(2, 2),
                       restart_interval=2)
    pro = mm.make_jpeg(48, 32, px, quality=2, subsampling=(2, 2),
                       restart_interval=2, progressive=True)
    a, _ = mm.decode_image(seq)
    b, _ = mm.decode_image(pro)
    assert np.array_equal(a, b)


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40),
       quality=st.integers(0, 3),
       sub=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
       ri=st.integers(0, 5), rgb=st.booleans(),
       seed=st.integers(0, 2**31 - 1))
def test_jpeg_progressive_equals_sequential_property(
        w, h, quality, sub, ri, rgb, seed):
    """Property: for ANY image/quality/subsampling/restart combination
    the progressive file decodes byte-identical to the sequential one
    (both encoders quantize identically; the entropy layers are
    lossless)."""
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    px = rng.integers(0, 256, shape).astype(np.uint8)
    seq = mm.make_jpeg(w, h, px, quality=quality, subsampling=sub,
                       restart_interval=ri)
    pro = mm.make_jpeg(w, h, px, quality=quality, subsampling=sub,
                       restart_interval=ri, progressive=True)
    a, _ = mm.decode_image(seq)
    b, _ = mm.decode_image(pro)
    assert np.array_equal(a, b)


def test_jpeg_remaining_gates_raise():
    """The decoder still refuses what it genuinely cannot decode, by
    name: arithmetic/lossless SOFs, 16-bit DQT, bad subsampling args."""
    px = np.zeros((8, 8), np.uint8)
    base = mm.make_jpeg(8, 8, px)
    sof_at = base.index(b"\xff\xc0")
    for marker in (0xC9, 0xCB, 0xC3, 0xC7):
        patched = bytearray(base)
        patched[sof_at + 1] = marker
        with pytest.raises(NotImplementedError,
                           match="arithmetic|lossless"):
            mm.parse_container(bytes(patched))
    with pytest.raises(ValueError, match="subsampling"):
        mm.make_jpeg(8, 8, px, subsampling=(3, 1))
