"""Multimodal plumbing: binary columns through Arrow-batched mapInPandas."""

import numpy as np
import pytest

from esper_tv_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.make_asset_table(spark, n=40).cache()


def test_decode_stats_deterministic(spark, assets):
    a = {r["asset_id"]: tuple(r)[1:] for r in mm.decode_stats(assets).collect()}
    b = {r["asset_id"]: tuple(r)[1:] for r in mm.decode_stats(assets).collect()}
    assert a == b and len(a) == 40
    for aid, (w, h, n, luma) in a.items():
        assert n == w * h and 4 <= w <= 8 and 4 <= h <= 8
        assert 0.0 <= luma <= 255.0


def test_decode_matches_local_oracle(spark, assets):
    rows = assets.collect()
    got = {r["asset_id"]: r["mean_luma"] for r in mm.decode_stats(assets).collect()}
    for r in rows[:10]:
        img = mm._fake_decode(bytes(r["payload"]))
        assert got[r["asset_id"]] == pytest.approx(float(img.astype(np.float64).mean()))


def test_embed_unit_vectors(spark, assets):
    out = mm.embed_assets(assets)
    rows = out.collect()
    assert len(rows) == 40
    for r in rows:
        v = np.array(r["embedding"])
        assert v.shape == (mm.EMBED_DIM,)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)


def test_frame_sample_explodes_jvm_side(spark, assets):
    frames = mm.frame_sample(assets, every_n=16)
    n = frames.count()
    assert n > 40  # multiple frames per asset
    first = frames.orderBy("asset_id", "frame_no").first()
    assert first["frame_no"] == 0


def test_resize_plan(spark, assets):
    out = {r["asset_id"]: (r["scale_x"], r["scale_y"]) for r in mm.resize_plan(assets, 64, 64).collect()}
    assert len(out) == 40
    for sx, sy in out.values():
        assert sx >= 64 / 8 and sy >= 64 / 8


def test_decoder_swap_and_empty_payload(spark):
    # installing a custom decoder changes results; empty payload raises
    df = mm.make_asset_table(spark, n=3)
    orig = mm._decoder
    try:
        mm.set_decoder(lambda b: np.ones((2, 2, 3), dtype=np.uint8) * 7)
        got = mm.decode_stats(df).collect()
        assert all(r["mean_luma"] == 7.0 and r["n_pixels"] == 4 for r in got)
    finally:
        mm.set_decoder(orig)
    with pytest.raises(mm.DecoderNotAvailable):
        mm._fake_decode(b"")


def test_ppm_decode_roundtrip():
    """ppm_decode is a REAL format parser: encode a known array to P6 (with
    a header comment) and get the identical pixels back."""
    import numpy as np

    from esper_tv_spark.operators.multimodal import DecoderNotAvailable, ppm_decode

    img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    payload = b"P6\n# comment\n5 3\n255\n" + img.tobytes()
    out = ppm_decode(payload)
    assert out.shape == (3, 5, 3)
    assert (out == img).all()
    import pytest as _pytest

    with _pytest.raises(DecoderNotAvailable):
        ppm_decode(b"P6\n5 3\n255\n" + img.tobytes()[:-1])  # truncated
    with _pytest.raises(DecoderNotAvailable):
        ppm_decode(b"\x89PNG....")  # not PPM


def test_png_decode_roundtrip():
    import numpy as np

    from esper_tv_spark.operators.multimodal import png_decode, png_encode

    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_decode_all_filters():
    """Handcrafted IDAT exercising every PNG filter type (1=Sub, 2=Up,
    3=Average, 4=Paeth) — the encoder only emits filter 0, so the decoder's
    filter arms need an independently-built stream."""
    import struct
    import zlib

    import numpy as np

    from esper_tv_spark.operators.multimodal import _PNG_SIG, png_decode

    h, w, stride, bpp = 4, 3, 9, 3
    rng = np.random.RandomState(7)
    target = rng.randint(0, 256, size=(h, stride)).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r, ftype in enumerate([1, 2, 3, 4]):
        cur = target[r]
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(ftype)
        raw += bytes(line.astype(np.uint8))
        prev = cur

    def chunk(ct, d):
        return struct.pack(">I", len(d)) + ct + d + struct.pack(">I", zlib.crc32(ct + d) & 0xFFFFFFFF)

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(payload).reshape(h, stride), target.astype(np.uint8))


def test_malformed_payloads_raise_decoder_not_available():
    import struct

    import pytest as _pytest

    from esper_tv_spark.operators.multimodal import (
        _PNG_SIG,
        DecoderNotAvailable,
        png_decode,
        ppm_decode,
    )

    ppm_bad = [b"P6", b"P6\n", b"P6\n4 x\n255\n", b"P6\n#only a comment", b"P6\n4 4\n65535\n"]
    png_bad = [
        b"",
        b"notapng",
        _PNG_SIG,  # no chunks
        _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0) + b"\x00" * 4,  # RGBA unsupported
        _PNG_SIG + struct.pack(">I", 99) + b"IHDR",  # truncated chunk
    ]
    for payload in ppm_bad:
        with _pytest.raises(DecoderNotAvailable):
            ppm_decode(payload)
    for payload in png_bad:
        with _pytest.raises(DecoderNotAvailable):
            png_decode(payload)


def test_png_asset_table_decodes_in_spark(spark):
    """End-to-end: real PNG payloads through the mapInPandas decode stage."""
    from esper_tv_spark.operators.multimodal import decode_stats, make_png_asset_table

    stats = decode_stats(make_png_asset_table(spark, n=20)).orderBy("asset_id").collect()
    assert len(stats) == 20
    for r in stats:
        a = r["asset_id"]
        w, h = 4 + a % 5, 4 + (a * 3) % 5
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        want_mean = sum((a * 11 + i * 17) % 256 for i in range(w * h * 3)) / (w * h * 3)
        assert abs(r["mean_luma"] - want_mean) < 1e-9


def test_png_zero_dims_and_bomb_rejected():
    import struct
    import zlib

    import pytest as _pytest

    from esper_tv_spark.operators.multimodal import _PNG_SIG, DecoderNotAvailable, png_decode

    def chunk(ct, d):
        return struct.pack(">I", len(d)) + ct + d + struct.pack(">I", zlib.crc32(ct + d) & 0xFFFFFFFF)

    def png(w, h, raw):
        return (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    # zero-dimension IHDR must raise, not return an empty image with NaN stats
    with _pytest.raises(DecoderNotAvailable):
        png_decode(png(0, 4, b"\x00" * 4))
    # oversized-declared dims refuse before allocating
    with _pytest.raises(DecoderNotAvailable):
        png_decode(png(100_000, 100_000, b""))
    # decompression bomb: stream inflates past the geometry-implied size
    with _pytest.raises(DecoderNotAvailable):
        png_decode(png(2, 2, b"\x00" * 1_000_000))
