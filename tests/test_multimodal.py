"""Multimodal asset plumbing: schema, decode-stub, featurize, frames."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invariantbitpacking_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.generate_assets_df(spark, 120).cache()


def test_featurize_shapes(spark, assets):
    out = mm.decode_and_featurize(assets, feat_dim=16).collect()
    assert len(out) == 120
    for r in out:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3
        if r["kind"] == "image":
            assert r["decoded_w"] > 0 and r["body_bytes"] == r["decoded_w"] * r["decoded_h"]


def test_frame_sampling(spark, assets):
    frames = mm.sample_video_frames(assets, every=2)
    got = frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    meta = {r["asset_id"]: r["frames"] for r in
            assets.filter("kind = 'video'").select("asset_id", "frames").collect()}
    assert {r["asset_id"] for r in got} == set(meta)
    for r in got:
        assert r["n"] == -(-meta[r["asset_id"]] // 2)


def test_real_format_is_stubbed(spark):
    df = spark.createDataFrame(
        [("x", "image", bytearray(b"\x89PNG....."), 0, 0, 1, 0)], mm.ASSET_DDL)
    with pytest.raises(Exception) as ei:
        mm.decode_and_featurize(df).collect()
    assert "NotImplementedError" in str(ei.value) or "stubbed" in str(ei.value)


def test_real_bmp_roundtrip_with_padding():
    """24-bit BMP: padded strides, bottom-up row order, BGR channel
    order all round-trip through the pure-numpy parser."""
    import numpy as np

    from invariantbitpacking_spark.functions import multimodal as mm

    rng = np.random.default_rng(5)
    for w, h in [(16, 4), (7, 9), (1, 1), (5, 3), (3, 0)]:
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        bmp = mm.make_bmp24(w, h, px)  # RGB in; builder writes BGR
        img, meta = mm.decode_image(bmp)
        assert meta["fmt"] == "bmp" and img.shape == (h, w, 3)
        assert np.array_equal(img, px)


def test_real_pnm_roundtrip_and_comments():
    import numpy as np

    from invariantbitpacking_spark.functions import multimodal as mm

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (4, 6, 3)).astype(np.uint8)
    img, meta = mm.decode_image(mm.make_ppm(6, 4, rgb))
    assert meta["fmt"] == "ppm" and np.array_equal(img, rgb)
    gray = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    img, meta = mm.decode_image(mm.make_pgm(7, 5, gray))
    assert meta["fmt"] == "pgm" and np.array_equal(img, gray)
    raw = b"P5\n# comment\n3 2\n255\n" + bytes(range(6))
    img, _ = mm.decode_image(raw)
    assert img.reshape(-1).tolist() == list(range(6))


def test_real_wav_pcm16_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from invariantbitpacking_spark.functions import multimodal as mm

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, 777).astype(np.int16)
    wav = mm.make_wav_pcm16(22050, s)
    got, sr = mm.decode_audio(wav)
    assert sr == 22050 and np.array_equal(got, s)
    # an extra chunk before data must be skipped by the walk
    extra = b"LIST" + struct.pack("<I", 5) + b"xxxxx" + b"\x00"  # padded
    wav2 = wav[:12] + extra + wav[12:]
    got2, sr2 = mm.decode_audio(wav2)
    assert sr2 == 22050 and np.array_equal(got2, s)


def test_codec_bound_formats_still_raise():
    import pytest as _pytest

    from invariantbitpacking_spark.functions import multimodal as mm

    # MP4/MP3 remain codec-bound
    with _pytest.raises(NotImplementedError, match="codec"):
        mm.parse_container(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)
    with _pytest.raises(NotImplementedError, match="codec"):
        mm.decode_image(b"BM" + b"\x00" * 60)  # bpp 0 => not BI_RGB 24
    # PNG and JPEG decode for real now; truncated files fail loudly,
    # not as codec gaps
    with _pytest.raises(ValueError, match="IHDR/IDAT"):
        mm.parse_container(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with _pytest.raises(ValueError, match="desync"):
        mm.parse_container(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


def _patch_jpeg(raw: bytes, find: bytes, repl: bytes) -> bytes:
    i = raw.index(find)
    return raw[:i] + repl + raw[i + len(find):]


def test_jpeg_unsupported_features_raise():
    """The JPEG decoder raises by name for the features it genuinely
    cannot decode (arithmetic coding, 16-bit tables, weird sampling),
    and rejects structurally invalid progressive scans — patched real
    files prove each gate fires before any wrong decode.  Progressive,
    subsampling and restart intervals decode for real now
    (tests/test_jpeg_extended.py)."""
    from invariantbitpacking_spark.functions import multimodal as mm

    px = np.zeros((8, 8), np.uint8)
    base = mm.make_jpeg(8, 8, px)

    # marker says SOF2 but the scan keeps the sequential full band
    # (Ss=0, Se=63): invalid progressive spectral selection
    with pytest.raises(ValueError, match="spectral band"):
        mm.parse_container(_patch_jpeg(base, b"\xff\xc0", b"\xff\xc2"))
    # arithmetic-coded SOF
    with pytest.raises(NotImplementedError, match="arithmetic"):
        mm.parse_container(_patch_jpeg(base, b"\xff\xc0", b"\xff\xc9"))
    # SOF payload: len(2) prec(1) h(2) w(2) nc(1) then cid,hv,tq —
    # sampling factor 3 is outside the supported 1/2/4 set
    sof_at = base.index(b"\xff\xc0")
    patched = bytearray(base)
    patched[sof_at + 11] = 0x31
    with pytest.raises(NotImplementedError, match="sampling factors"):
        mm.parse_container(bytes(patched))
    # DQT precision nibble -> 16-bit tables
    dqt_at = base.index(b"\xff\xdb")
    patched = bytearray(base)
    patched[dqt_at + 4] = 0x10
    with pytest.raises(NotImplementedError, match="16-bit"):
        mm.parse_container(bytes(patched))


def test_jpeg_byte_stuffing_in_scan():
    """High-entropy images produce 0xFF scan bytes, which the writer
    stuffs with 0x00 and the reader unstuffs; assert a stuffed file
    actually occurs and decodes within the q0 rounding bound."""
    from invariantbitpacking_spark.functions import multimodal as mm

    rng = np.random.default_rng(7)
    for _ in range(30):
        px = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        f = mm.make_jpeg(24, 24, px)
        if b"\xff\x00" in f[f.index(b"\xff\xda"):]:
            img, _ = mm.decode_image(f)
            assert np.abs(img.astype(int) - px.astype(int)).max() <= 1
            return
    raise AssertionError("no stuffed scan byte in 30 random files")


def test_featurize_batch_with_real_jpeg(spark):
    """decode_and_featurize's mixed path handles a real JPEG payload:
    dims come from the SOF header, body bytes are the decoded RGB
    raster (w*h*3)."""
    from invariantbitpacking_spark.functions import multimodal as mm

    rng = np.random.default_rng(11)
    tiles = rng.integers(0, 256, (2, 2, 3)).astype(np.uint8)
    px = np.kron(tiles.transpose(2, 0, 1),
                 np.ones((8, 8), np.uint8)).transpose(1, 2, 0)
    jpg = mm.make_jpeg(16, 16, px, quality=0)
    fake, w, h, fr, sr = mm.make_fake_asset(rng, "image")
    rows = [("a-jpg", "image", bytearray(jpg), 16, 16, 1, 0),
            ("a-fake", "image", bytearray(fake), w, h, fr, sr)]
    assets = spark.createDataFrame(rows, mm.ASSET_DDL).coalesce(1)
    out = {r["asset_id"]: r for r in
           mm.decode_and_featurize(assets, feat_dim=8).collect()}
    assert out["a-jpg"]["decoded_w"] == 16
    assert out["a-jpg"]["decoded_h"] == 16
    assert out["a-jpg"]["body_bytes"] == 16 * 16 * 3


def test_featurize_mixed_real_and_fake_containers(spark):
    """decode_and_featurize must handle a batch mixing FAKE, BMP and
    WAV containers: per-asset dims from the real headers, histogram
    over decoded bodies."""
    import numpy as np

    from invariantbitpacking_spark.functions import multimodal as mm

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    bmp = mm.make_bmp24(5, 4, px)
    wav = mm.make_wav_pcm16(8000, rng.integers(-100, 100, 50).astype(np.int16))
    fake, w, h, fr, sr = mm.make_fake_asset(rng, "image")
    rows = [("a-bmp", "image", bytearray(bmp), 5, 4, 1, 0),
            ("a-wav", "audio", bytearray(wav), 0, 0, 1, 8000),
            ("a-fake", "image", bytearray(fake), w, h, fr, sr)]
    assets = spark.createDataFrame(rows, mm.ASSET_DDL).coalesce(1)
    out = {r["asset_id"]: r for r in
           mm.decode_and_featurize(assets, feat_dim=8).collect()}
    assert out["a-bmp"]["decoded_w"] == 5
    assert out["a-bmp"]["decoded_h"] == 4
    assert out["a-bmp"]["body_bytes"] == 5 * 4 * 3  # no row padding
    assert out["a-wav"]["body_bytes"] == 100  # 50 samples x 2 bytes
    assert out["a-fake"]["decoded_w"] == w
    assert abs(sum(out["a-bmp"]["features"]) - 1.0) < 1e-5
