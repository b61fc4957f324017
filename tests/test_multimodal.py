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
