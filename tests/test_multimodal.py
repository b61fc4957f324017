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
    # the vectorized fast path must agree on EVERY filter arm (its whole
    # contract is wall-only: cumsum-Sub / add-Up closed forms, loop 3/4)
    from esper_tv_spark.operators.multimodal import png_decode_fast

    assert np.array_equal(
        png_decode_fast(payload).reshape(h, stride), target.astype(np.uint8)
    )


def test_png_fast_decoder_parity_and_hook():
    """png_decode_fast is bit-identical to png_decode on filter-0 and
    Sub-filtered encodes of random images, and install_fast_decoders
    routes decode through it via the public set_decoder seam (and
    restores cleanly)."""
    import numpy as np

    from esper_tv_spark.operators import multimodal as mm

    rng = np.random.RandomState(11)
    for _ in range(8):
        h, w = int(rng.randint(3, 30)), int(rng.randint(3, 30))
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ft in (0, 1):
            p = mm.png_encode(img, filter_type=ft)
            assert np.array_equal(mm.png_decode(p), img)
            assert np.array_equal(mm.png_decode_fast(p), img)
    img = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    p = mm.png_encode(img, filter_type=1)
    prev = mm.install_fast_decoders()
    try:
        assert mm.get_decoder() is mm._sniff_decode_fast
        assert np.array_equal(mm.get_decoder()(p), img)
    finally:
        mm.set_decoder(prev)
    assert mm.get_decoder() is prev


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


def test_jpeg_decode_const_blocks_closed_form():
    """The DC-only fixture decodes to per-block constant pixels equal to the
    documented closed-form roundtrip (the q86 oracle's math)."""
    import numpy as np

    from esper_tv_spark.operators.multimodal import jpeg_decode, jpeg_encode_const_blocks

    for a in (0, 7, 41, 199):
        bw, bh = 1 + a % 3, 1 + (a * 5) % 3
        cols = np.array(
            [[(a * 11 + b * 29) % 256, (a * 13 + b * 31) % 256, (a * 17 + b * 37) % 256]
             for b in range(bw * bh)],
            dtype=np.uint8,
        )
        img = jpeg_decode(jpeg_encode_const_blocks(cols, bw, bh))
        assert img.shape == (bh * 8, bw * 8, 3)
        for b in range(bw * bh):
            by, bx = b // bw, b % bw
            block = img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8].reshape(-1, 3)
            assert (block == block[0]).all()
            r, g, bl = cols[b].astype(float)
            y = 0.299 * r + 0.587 * g + 0.114 * bl
            cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * bl
            cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * bl
            rt = lambda v: 128.0 + np.floor(8.0 * (v - 128.0) + 0.5) / 8.0
            y2, cb2, cr2 = rt(y), rt(cb), rt(cr)
            exp = [
                int(np.clip(np.floor(x + 0.5), 0, 255))
                for x in (
                    y2 + 1.402 * (cr2 - 128),
                    y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128),
                    y2 + 1.772 * (cb2 - 128),
                )
            ]
            assert list(block[0]) == exp


def test_jpeg_decode_general_ac_coefficients():
    """Hand-assembled scan with a nonzero AC coefficient exercises the
    general run/size Huffman path + matrix IDCT (the fixture is DC-only);
    decoded pixels must match an independent direct IDCT."""
    import struct

    import numpy as np

    from esper_tv_spark.operators.multimodal import jpeg_decode

    # grayscale 8x8, qtable all ones; DC table = standard (size symbols),
    # AC table: 1-bit codes for EOB(0x00)=0 -> impossible with also (0,1);
    # use 2-symbol table: EOB '0', (run 0,size 1) '10'
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [1, 1] + [0] * 14
    ac_vals = [0x00, 0x04]  # EOB '0'; (run 0, size 4) '10'

    def seg(marker, data):
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    # scan bits: DC size 4 ('101'), bits 1010 (=10); AC (0,4) code '10',
    # bits 1010 (=+10); EOB '0'; pad 1s
    # => 101 1010 10 1010 0 11 -> 10110101 01010011
    scan = bytes([0b10110101, 0b01010011])
    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    img = jpeg_decode(payload)
    # independent IDCT: F(0,0)=10 (DC), F(0,1)=1 (zigzag pos 1)
    f = np.zeros((8, 8))
    f[0, 0], f[0, 1] = 10.0, 10.0
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    exp = np.clip(np.floor(a.T @ f @ a + 128.0 + 0.5), 0, 255).astype(np.uint8)
    assert (img[:, :, 0] == exp).all() and (img[:, :, 1] == exp).all()
    assert not (img[:, :, 0] == img[0, 0, 0]).all()  # AC term varies across x


def test_jpeg_malformed_and_unsupported_raise():
    import struct

    import pytest as _pytest

    from esper_tv_spark.operators.multimodal import DecoderNotAvailable, jpeg_decode

    def seg(marker, data):
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    with _pytest.raises(DecoderNotAvailable):
        jpeg_decode(b"")
    with _pytest.raises(DecoderNotAvailable):
        jpeg_decode(b"\xff\xd8\xff\xd9")  # no SOF/SOS
    # progressive (SOF2) refused
    with _pytest.raises(DecoderNotAvailable):
        jpeg_decode(b"\xff\xd8" + seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])))
    # chroma subsampling refused
    with _pytest.raises(DecoderNotAvailable):
        jpeg_decode(
            b"\xff\xd8" + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
        )


def test_jpeg_asset_table_decodes_in_spark(spark):
    from pyspark.sql import functions as F

    from esper_tv_spark.operators.multimodal import decode_stats, make_jpeg_asset_table

    assets = make_jpeg_asset_table(spark, n=24)
    out = decode_stats(assets).orderBy("asset_id").collect()
    assert len(out) == 24
    for r in out:
        a = r["asset_id"]
        assert r["width"] == (1 + a % 3) * 8 and r["height"] == (1 + (a * 5) % 3) * 8
        assert r["n_pixels"] == r["width"] * r["height"]
        assert 0.0 <= r["mean_luma"] <= 255.0


def test_wav_roundtrip_and_chunk_walk():
    s = (np.arange(24, dtype=np.int16) * 1000 - 12000).reshape(12, 2)
    p = mm.wav_encode_pcm16(s, 44100)
    d, rate = mm.wav_decode(p)
    assert rate == 44100 and d.shape == (12, 2) and (d == s).all()
    # mono 1-D input gets a channel axis
    d1, _ = mm.wav_decode(mm.wav_encode_pcm16(np.array([1, -2, 3], dtype=np.int16), 8000))
    assert d1.shape == (3, 1)
    # unknown odd-length chunk before data: spec word-alignment honored
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    spliced = p[:12] + extra + p[12:]
    spliced = b"RIFF" + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    d2, _ = mm.wav_decode(spliced)
    assert (d2 == s).all()


def test_wav_malformed_raise():
    good = mm.wav_encode_pcm16(np.zeros((4, 1), dtype=np.int16), 8000)
    for bad in (
        b"",
        b"RIFX" + good[4:],                       # wrong magic
        good[:20],                                # truncated chunk
        good[:12],                                # no fmt/data
        good.replace(b"\x01\x00\x01\x00", b"\x03\x00\x01\x00", 1),  # IEEE-float fmt
    ):
        with pytest.raises(mm.DecoderNotAvailable):
            mm.wav_decode(bad)


def test_wav_asset_table_stats_in_spark(spark):
    assets = mm.make_wav_asset_table(spark, n=12)
    out = {r["asset_id"]: r for r in mm.audio_stats(assets).collect()}
    assert len(out) == 12
    for a in range(12):
        frames = 256 + (a * 13) % 256
        channels = 1 + a % 2
        rate = 8000 + (a % 4) * 4000
        i = np.arange(frames * channels, dtype=np.int64)
        flat = ((a * 7919 + i * 104729) % 65536) - 32768
        r = out[a]
        assert r["frames"] == frames and r["channels"] == channels
        assert r["sample_rate"] == rate
        assert r["duration_ms"] == frames * 1000 // rate
        assert r["sum_abs"] == int(np.abs(flat).sum())
        assert r["peak_abs"] == int(np.abs(flat).max())


def test_avi_mjpeg_roundtrip():
    frames = []
    for f in range(3):
        cols = np.array(
            [[(5 * 11 + f * 41 + b * 29) % 256,
              (5 * 13 + f * 43 + b * 31) % 256,
              (5 * 17 + f * 47 + b * 37) % 256] for b in range(6)],
            dtype=np.uint8,
        )
        frames.append(mm.jpeg_encode_const_blocks(cols, 3, 2))
    payload = mm.avi_encode_mjpeg(frames, 24, 16, fps=24)
    out, w, h, fps = mm.avi_decode_mjpeg(payload)
    assert (w, h, fps, len(out)) == (24, 16, 24, 3)
    for f, fr in enumerate(out):
        assert fr.shape == (16, 24, 3)
        assert np.array_equal(fr, mm.jpeg_decode(frames[f]))


def test_avi_malformed_raise():
    import struct

    frame = mm.jpeg_encode_const_blocks(np.zeros((1, 3), dtype=np.uint8), 1, 1)
    good = mm.avi_encode_mjpeg([frame], 8, 8)
    # header claims 9 frames, movi holds 1
    tampered = bytearray(good)
    struct.pack_into("<I", tampered, 12 + 8 + 4 + 8 + 16, 9)
    # frame dims disagree with avih width/height
    wrong_dims = mm.avi_encode_mjpeg([frame], 16, 16)
    for bad in (b"", b"RIFF" + good[4:8] + b"WAVE", good[:40], good[:12],
                bytes(tampered), wrong_dims):
        with pytest.raises(mm.DecoderNotAvailable):
            mm.avi_decode_mjpeg(bad)


def test_avi_asset_table_stats_in_spark(spark):
    assets = mm.make_avi_asset_table(spark, n=10)
    out = {r["asset_id"]: r for r in mm.video_stats(assets).collect()}
    assert len(out) == 10
    for a in range(10):
        bw, bh = 1 + a % 3, 1 + (a * 5) % 3
        nf = 1 + (a * 3) % 4
        r = out[a]
        assert (r["width"], r["height"], r["n_frames"]) == (bw * 8, bh * 8, nf)
        assert r["n_pixels"] == bw * 8 * bh * 8 * nf
        # closed-form mean: replay the DC-rounding roundtrip per block/frame
        total = 0.0
        for f in range(nf):
            for b in range(bw * bh):
                rgb = np.array(
                    [(a * 11 + f * 41 + b * 29) % 256,
                     (a * 13 + f * 43 + b * 31) % 256,
                     (a * 17 + f * 47 + b * 37) % 256], dtype=np.float64)
                y = 0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]
                cb = 128 - 0.168736 * rgb[0] - 0.331264 * rgb[1] + 0.5 * rgb[2]
                cr = 128 + 0.5 * rgb[0] - 0.418688 * rgb[1] - 0.081312 * rgb[2]
                y, cb, cr = (128.0 + np.floor(8.0 * (v - 128.0) + 0.5) / 8.0
                             for v in (y, cb, cr))
                rr = min(255, max(0, np.floor(y + 1.402 * (cr - 128) + 0.5)))
                gg = min(255, max(0, np.floor(
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
                bb = min(255, max(0, np.floor(y + 1.772 * (cb - 128) + 0.5)))
                total += 64 * (rr + gg + bb)
        assert abs(r["mean_luma"] - total / (bw * 8 * bh * 8 * 3 * nf)) < 1e-9


def test_video_frame_stride_sampling(spark):
    assets = mm.make_avi_asset_table(spark, n=9)
    rows = mm.video_frame_stats(assets, every_n=2).collect()
    # only even frame_nos survive; full decode agrees on the kept frames
    full = {(r["asset_id"], 0): r["mean_luma"]
            for r in mm.video_frame_stats(assets, every_n=1).collect()
            if r["frame_no"] == 0}
    for r in rows:
        assert r["frame_no"] % 2 == 0
        if r["frame_no"] == 0:
            assert r["mean_luma"] == full[(r["asset_id"], 0)]
    want = sum(len(range(0, 1 + (a * 3) % 4, 2)) for a in range(9))
    assert len(rows) == want


def test_frame_sample_uses_real_n_frames_for_avi(spark):
    assets = mm.make_avi_asset_table(spark, n=8)
    rows = mm.frame_sample(assets, every_n=2).collect()
    want = sum(len(range(0, 1 + (a * 3) % 4, 2)) for a in range(8))
    assert len(rows) == want
    for r in rows:
        assert r["frame_no"] % 2 == 0


def test_frame_sample_empty_or_null_n_frames_yields_zero_rows(spark):
    # n_frames = 0 or NULL must yield no frames for that asset, not kill
    # the query with 'Illegal sequence boundaries' (sequence(0, -1, +n))
    rows = [
        (0, bytearray(b""), (8, 8, 24, 0, "avi-mjpeg")),     # empty video
        (1, bytearray(b""), (8, 8, 24, None, "avi-mjpeg")),  # unknown count
        (2, bytearray(b""), (8, 8, 24, 3, "avi-mjpeg")),     # normal
    ]
    assets = spark.createDataFrame(
        rows, f"asset_id long, payload binary, meta struct<{mm.VIDEO_META_SCHEMA}>"
    )
    got = mm.frame_sample(assets, every_n=1).collect()
    assert sorted((r["asset_id"], r["frame_no"]) for r in got) == [
        (2, 0), (2, 1), (2, 2)
    ]
