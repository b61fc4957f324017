"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference keeps pixels outside the query engine (frameserver HTTP fetch,
/root/reference/app/esper/prelude.py:125-136; Scanner kernels for per-frame
compute, shot_detection.py:69-82). For a training-data pipeline we bring the
*columns* into the engine — `binary` payload + a metadata struct — and run
decode / feature-extract / resize / frame-sample as Arrow-batched
`mapInPandas` stages.

The actual codec calls are STUBBED (Pillow/ffmpeg are not in this
container): `set_decoder` installs a real decoder when available; the
default `_fake_decode` is deterministic so the Spark-side plumbing — schema,
batch shape, partitioning, null handling — is fully real and tested. A
production deploy swaps one function, not the pipeline.

Scale notes: binary payloads make wide rows — keep them in their own table
keyed by asset id (join metadata on demand), partition by content-size
buckets so Arrow batches stay bounded, and set
spark.sql.execution.arrow.maxRecordsPerBatch low for jumbo blobs.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, format string"
DECODED_SCHEMA = "asset_id long, width int, height int, n_pixels long, mean_luma double"
EMBED_DIM = 16


class DecoderNotAvailable(NotImplementedError):
    pass


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: derives a small 'image' from the
    payload hash. Raises like a real decoder on empty payloads."""
    if not payload:
        raise DecoderNotAvailable("empty payload (real decoder also rejects)")
    h = hashlib.sha256(payload).digest()
    w = 4 + h[0] % 4
    ht = 4 + h[1] % 4
    rng = np.frombuffer((h * ((w * ht * 3) // len(h) + 1))[: w * ht * 3], dtype=np.uint8)
    return rng.reshape(ht, w, 3)


def ppm_decode(payload: bytes) -> np.ndarray:
    """REAL decoder for binary PPM (P6) images, pure numpy — PPM is an
    uncompressed format, so no codec library is needed. Parses the
    magic/width/height/maxval header (with `#` comments), then reshapes the
    raw RGB bytes to (h, w, 3). Raises DecoderNotAvailable on anything that
    is not a P6 payload (the caller may fall back to another decoder)."""
    if not payload or not payload.startswith(b"P6"):
        raise DecoderNotAvailable("not a binary PPM (P6) payload")
    # header = 4 whitespace-separated tokens: magic, width, height, maxval;
    # comments run '#'..newline. After maxval exactly ONE whitespace byte
    # precedes the raw pixel data.
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i >= len(payload):
            raise DecoderNotAvailable("truncated PPM header")
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    try:
        w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    except ValueError as e:
        raise DecoderNotAvailable(f"malformed PPM header tokens: {e}") from e
    if w <= 0 or h <= 0:
        raise DecoderNotAvailable(f"non-positive PPM dimensions {w}x{h}")
    if maxval != 255:
        raise DecoderNotAvailable(f"unsupported maxval {maxval}")
    body = payload[i : i + w * h * 3]
    if len(body) != w * h * 3:
        raise DecoderNotAvailable("truncated PPM body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_decode(payload: bytes) -> np.ndarray:
    """REAL decoder for 8-bit truecolor (color type 2) non-interlaced PNG,
    pure Python: chunk walk -> IHDR geometry -> zlib-inflate concatenated
    IDAT -> per-scanline unfilter (None/Sub/Up/Average/Paeth, the five
    filters of the PNG spec) -> (h, w, 3) uint8. PNG's container + DEFLATE
    + filter model are public-spec knowledge (RFC 2083); zlib ships with
    CPython, so no codec library is needed. Anything outside the supported
    subset raises DecoderNotAvailable so callers can fall back
    (mirrors the reference serving real frames, app/esper/prelude.py:125-136).
    """
    import zlib

    if not payload or not payload.startswith(_PNG_SIG):
        raise DecoderNotAvailable("not a PNG payload")
    i, n = len(_PNG_SIG), len(payload)
    w = h = None
    idat = bytearray()
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) != length:
            raise DecoderNotAvailable("truncated PNG chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise DecoderNotAvailable("bad IHDR length")
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise DecoderNotAvailable(
                    f"unsupported PNG subset: depth={depth} color={color} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length  # len + type + data + crc (crc not verified)
    if w is None or not idat:
        raise DecoderNotAvailable("missing IHDR or IDAT")
    if w <= 0 or h <= 0:
        raise DecoderNotAvailable(f"non-positive PNG dimensions {w}x{h}")
    bpp, stride = 3, 3 * w
    expected = h * (1 + stride)
    if expected > 256 * 1024 * 1024:
        raise DecoderNotAvailable(f"PNG dimensions {w}x{h} exceed decode cap")
    try:
        # cap the inflate at the geometry-implied size: a decompression
        # bomb (tiny IDAT, huge ratio) fails here as DecoderNotAvailable
        # instead of exhausting executor memory
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if d.unconsumed_tail or len(d.decompress(b"", 1)) > 0:
            raise DecoderNotAvailable("decompressed size mismatch")
    except zlib.error as e:
        raise DecoderNotAvailable(f"bad IDAT stream: {e}") from e
    if len(raw) != expected:
        raise DecoderNotAvailable("decompressed size mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = raw[r * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (1 + stride) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized, no within-row dependency
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise DecoderNotAvailable(f"unknown PNG filter {ftype}")
        img[r] = cur.astype(np.uint8)
        prev = cur
    return img.reshape(h, w, 3)


def png_encode(img: np.ndarray) -> bytes:
    """Minimal 8-bit RGB PNG writer (filter 0 on every scanline) — used to
    build REAL PNG fixtures whose pixels are closed-form so a SQL oracle can
    recompute decoded stats independently."""
    import zlib

    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def make_png_asset_table(spark, n: int = 200) -> DataFrame:
    """Synthetic asset table with REAL PNG payloads whose pixels are a
    closed-form function of asset_id — width = 4 + id % 5, height =
    4 + (id * 3) % 5, byte i = (id * 11 + i * 17) % 256 — so decoded stats
    are independently computable by a SQL oracle (the decode is a REAL
    chunk-walk + inflate + unfilter parse, not a stub)."""
    rows = []
    for a in range(n):
        w, h = 4 + a % 5, 4 + (a * 3) % 5
        body = np.array(
            [(a * 11 + i * 17) % 256 for i in range(w * h * 3)], dtype=np.uint8
        ).reshape(h, w, 3)
        rows.append((a, bytearray(png_encode(body)), (w, h, "png")))
    return spark.createDataFrame(
        rows, f"asset_id long, payload binary, meta struct<{IMAGE_META_SCHEMA}>"
    )


def _sniff_decode(payload: bytes) -> np.ndarray:
    """Default decoder: real PPM for P6 payloads, real PNG for PNG
    signatures, deterministic fake otherwise (the container has no codec
    libs for JPEG)."""
    if payload.startswith(b"P6"):
        return ppm_decode(payload)
    if payload.startswith(_PNG_SIG):
        return png_decode(payload)
    return _fake_decode(payload)


_decoder: Callable[[bytes], np.ndarray] = _sniff_decode


def set_decoder(fn: Callable[[bytes], np.ndarray]) -> None:
    """Install a real decoder (e.g. PIL-based) when the codec libs exist."""
    global _decoder
    _decoder = fn


def make_asset_table(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table: (asset_id, payload binary,
    meta struct) — the fixture for the multimodal pipeline."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 7)
        rows.append((i, bytearray(payload), (8, 8, "fake")))
    return spark.createDataFrame(
        rows, f"asset_id long, payload binary, meta struct<{IMAGE_META_SCHEMA}>"
    )


def make_ppm_asset_table(spark, n: int = 200) -> DataFrame:
    """Synthetic asset table with REAL binary-PPM payloads whose pixels are
    a closed-form function of asset_id — width = 4 + id % 5, height =
    4 + (id*3) % 5, byte i = (id*7 + i*13) % 256 — so decoded stats
    (dimensions, mean) are independently computable by a SQL oracle. This
    upgrades the multimodal decode pipeline from rows-only to
    hash-matched: the decode is a REAL format parse, not a stub."""
    rows = []
    for a in range(n):
        w, h = 4 + a % 5, 4 + (a * 3) % 5
        body = bytes((a * 7 + i * 13) % 256 for i in range(w * h * 3))
        payload = b"P6\n%d %d\n255\n" % (w, h) + body
        rows.append((a, bytearray(payload), (w, h, "ppm")))
    return spark.createDataFrame(
        rows, f"asset_id long, payload binary, meta struct<{IMAGE_META_SCHEMA}>"
    )


def decode_stats(assets: DataFrame) -> DataFrame:
    """Decode every payload and emit per-image stats — the canonical
    mapInPandas decode stage (Arrow batches in, Arrow batches out; the
    decoder runs vectorized per batch, never per-row over py4j)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "width": [], "height": [], "n_pixels": [], "mean_luma": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = _decoder(bytes(payload))
                out["asset_id"].append(aid)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["n_pixels"].append(int(img.shape[0] * img.shape[1]))
                out["mean_luma"].append(float(img.astype(np.float64).mean()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=DECODED_SCHEMA)


def embed_assets(assets: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Feature-extract stage: payload -> embedding array<double>. The fake
    embedder hashes the payload into a deterministic unit vector; a real
    model slots into the same batch signature (and would batch tensors)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                h = hashlib.sha256(bytes(payload)).digest()
                raw = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype=np.float64)
                v = np.nan_to_num(raw, nan=0.5)
                v = (v % 1000.0) - 500.0
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).tolist())
                ids.append(aid)
            yield pd.DataFrame({"asset_id": ids, "embedding": vecs})

    return assets.mapInPandas(batches, schema="asset_id long, embedding array<double>")


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video -> sampled frame rows (asset_id, frame_no). The explode stays
    JVM-side (sequence); only actual pixel decode would hit Python."""
    n_frames = F.coalesce(F.col("meta.width"), F.lit(0)) * F.lit(8)  # stub frame count
    return videos.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_no"),
    )


def resize_plan(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage plumbing: passes payloads through the decode stub and
    emits the target geometry + scale factors (a real impl writes resized
    bytes; same schema contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"asset_id": [], "scale_x": [], "scale_y": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = _decoder(bytes(payload))
                rows["asset_id"].append(aid)
                rows["scale_x"].append(target_w / img.shape[1])
                rows["scale_y"].append(target_h / img.shape[0])
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema="asset_id long, scale_x double, scale_y double")
