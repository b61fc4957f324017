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
    w, h, stride, raw = _png_inflate(payload)
    bpp = 3
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


def png_decode_fast(payload: bytes) -> np.ndarray:
    """The set_decoder FAST PATH for the same PNG subset: identical parse,
    but the unfilter vectorizes the two filters with a closed form —
    Sub (1) is a per-channel running sum, so `cumsum` over uint8 (whose
    overflow IS the mod-256 the spec wants) unfilters a whole scanline in
    one numpy op, and Up (2) adds the previous row elementwise; None (0)
    is a copy.  Average/Paeth (3/4) fall back to the reference decoder's
    sequential loop (their predictor mixes both neighbors, so there is no
    scan-free closed form).  Same answers by construction — pytest pins
    bit-parity against `png_decode` per filter type — this function only
    changes WALL: it is what a 100 TB decode run would install via
    `set_decoder` when a native codec is unavailable (and the measured
    stand-in for one when it is: the bench's decoder_hook row prices the
    seam itself)."""
    w, h, stride, raw = _png_inflate(payload)
    bpp = 3
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (1 + stride) + 1
        )
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: per-channel cumsum, uint8 wrap == mod 256
            cur = line.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraparound
        elif ftype in (3, 4):
            icur = np.zeros(stride, dtype=np.int32)
            iline = line.astype(np.int32)
            iprev = prev.astype(np.int32)
            for x in range(stride):
                a = icur[x - bpp] if x >= bpp else 0
                b = iprev[x]
                if ftype == 3:
                    icur[x] = (iline[x] + (a + b) // 2) & 0xFF
                else:
                    c = iprev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    icur[x] = (iline[x] + pred) & 0xFF
            cur = icur.astype(np.uint8)
        else:
            raise DecoderNotAvailable(f"unknown PNG filter {ftype}")
        img[r] = cur
        prev = cur
    return img.reshape(h, w, 3)


def _png_inflate(payload: bytes) -> "tuple[int, int, int, bytes]":
    """Shared PNG front half: chunk walk -> IHDR geometry -> bounded
    zlib-inflate of the concatenated IDAT.  Returns (w, h, stride, raw)."""
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
    return w, h, stride, raw


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal 8-bit RGB PNG writer — used to build REAL PNG fixtures whose
    pixels are closed-form so a SQL oracle can recompute decoded stats
    independently.  `filter_type` 0 (None, the default every fixture uses)
    or 1 (Sub) — Sub-filtered fixtures exercise the sequential unfilter
    path that separates the default decoder from the vectorized fast one."""
    import zlib

    h, w, _ = img.shape
    if filter_type == 0:
        raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    elif filter_type == 1:
        lines = []
        for r in range(h):
            row = img[r].reshape(-1).astype(np.int16)
            filt = row.copy()
            filt[3:] = (row[3:] - row[:-3]) & 0xFF
            lines.append(b"\x01" + filt.astype(np.uint8).tobytes())
        raw = b"".join(lines)
    else:
        raise ValueError(f"unsupported encode filter {filter_type}")

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


# --------------------------------------------------------------------------
# baseline JPEG (ITU T.81, public spec) — pure Python/numpy
# --------------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix() -> np.ndarray:
    """8-point DCT-III basis: row u of A holds C(u)/2 * cos((2x+1)u pi/16),
    so spatial = A.T @ coefs @ A (the standard separable JPEG IDCT)."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_IDCT_A = _idct_matrix()


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00 byte
    stuffing removed on the fly; surfaces RSTn markers to the caller."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.bit = buf, pos, 0

    def read_bit(self) -> int:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt != 0x00:
                raise DecoderNotAvailable(f"marker 0x{nxt:02x} inside entropy data")
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RSTn); returns the marker byte."""
        if self.bit:
            self.bit = 0
            self.pos += 1
        while self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.buf[self.pos + 1]
        self.pos += 2
        return m


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical JPEG code assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise DecoderNotAvailable("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map `size`-bit magnitude bits to the signed value."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(payload: bytes) -> np.ndarray:
    """REAL decoder for baseline sequential JPEG (SOF0), pure numpy: marker
    walk -> DQT/DHT/SOF0/SOS parse -> Huffman-decode interleaved MCUs
    (general DC categories and AC run/size incl. ZRL and EOB, restart
    markers honored) -> dequant -> dezigzag -> separable matrix IDCT ->
    level shift -> YCbCr-to-RGB (3-component) or grayscale replicated to
    RGB. Supported subset: 8-bit precision, 1x1 sampling (no chroma
    subsampling), no progressive/arithmetic coding; anything else raises
    DecoderNotAvailable so callers can fall back — same contract as
    ppm_decode/png_decode. Entirely public-spec (ITU T.81 + JFIF)."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise DecoderNotAvailable("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    w = h = None
    comps: list[tuple[int, int, int]] = []  # (comp_id, qtab_id, sampling)
    scan: list[tuple[int, int, int]] = []  # (comp_id, dc_tab, ac_tab)
    dri = 0
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise DecoderNotAvailable("marker sync lost")
        m = payload[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        data = payload[i + 4 : i + 2 + seglen]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(data):
                pq_tq = data[j]
                if pq_tq >> 4 != 0:
                    raise DecoderNotAvailable("16-bit quant tables unsupported")
                qt[pq_tq & 0xF] = np.array(list(data[j + 1 : j + 65]), dtype=np.int32)
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(data):
                tc_th = data[j]
                bits = list(data[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(data[j + 17 : j + 17 + nv])
                huff[(tc_th >> 4, tc_th & 0xF)] = _build_huffman(bits, vals)
                j += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = data[0], *struct.unpack(">HH", data[1:5]), data[5]
            if prec != 8:
                raise DecoderNotAvailable(f"precision {prec} unsupported")
            for c in range(nc):
                cid, samp, tq = data[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise DecoderNotAvailable("chroma subsampling unsupported")
                comps.append((cid, tq, samp))
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecoderNotAvailable(f"non-baseline SOF 0x{m:02x} unsupported")
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", data[0:2])
        elif m == 0xDA:  # SOS
            ns = data[0]
            for c in range(ns):
                cid, tabs = data[1 + 2 * c], data[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            i = i + 2 + seglen
            break
        i += 2 + seglen
    if w is None or not scan:
        raise DecoderNotAvailable("missing SOF0 or SOS")
    if len(scan) != len(comps):
        raise DecoderNotAvailable("partial scans unsupported")
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in comps]
    qtab_of = {cid: qt[tq] for cid, tq, _ in comps}
    order = [cid for cid, _, _ in scan]
    r = _BitReader(payload, i)
    pred = {cid: 0 for cid in order}
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and mcu and mcu % dri == 0:
                m2 = r.align_to_marker()
                if not (0xD0 <= m2 <= 0xD7):
                    raise DecoderNotAvailable(f"expected RST, got 0x{m2:02x}")
                pred = {cid: 0 for cid in order}
            for (cid, dc_t, ac_t) in scan:
                if (0, dc_t) not in huff or (1, ac_t) not in huff:
                    raise DecoderNotAvailable("missing Huffman table")
                size = _huff_decode(r, huff[(0, dc_t)])
                diff = _extend(r.read_bits(size), size)
                pred[cid] += diff
                coefs = np.zeros(64, dtype=np.int64)
                coefs[0] = pred[cid]
                k = 1
                while k < 64:
                    rs = _huff_decode(r, huff[(1, ac_t)])
                    run, sz = rs >> 4, rs & 0xF
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise DecoderNotAvailable("AC run past block end")
                    coefs[k] = _extend(r.read_bits(sz), sz)
                    k += 1
                deq = coefs * qtab_of[cid].astype(np.int64)
                if not deq[1:].any():
                    # DC-only block: the IDCT is exactly the constant DC/8
                    # (a dyadic division, no float error) — the matrix
                    # product would carry ~1e-14 of rounding that can flip
                    # a floor(x+0.5) pixel landing exactly on a boundary
                    spatial = np.full((8, 8), float(deq[0]) / 8.0 + 128.0)
                else:
                    block = np.zeros((8, 8))
                    for z, pos in enumerate(_ZIGZAG):
                        block[pos // 8, pos % 8] = deq[z]
                    spatial = _IDCT_A.T @ block @ _IDCT_A + 128.0
                p = planes[order.index(cid)]
                p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial
            mcu += 1
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        g = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = planes
    rr = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bb = y + 1.772 * (cb - 128.0)
    out = np.stack([rr, gg, bb], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F >> (7 - ((8 - self.nbits) % 8)), (8 - self.nbits) % 8)


# standard DC luminance Huffman spec (T.81 Annex K.3.1) — also used here for
# chroma; a tiny 1-bit AC table (EOB only) is sufficient for DC-only fixtures
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [1] + [0] * 15
_AC_VALS = [0x00]


def _dc_codes() -> dict[int, tuple[int, int]]:
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(_DC_BITS[length - 1]):
            codes[_DC_VALS[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def jpeg_encode_const_blocks(colors: np.ndarray, bw: int, bh: int) -> bytes:
    """Minimal baseline JPEG encoder for CLOSED-FORM fixtures: each 8x8
    block is one constant RGB color (`colors` is (bh*bw, 3) uint8, row
    major), quant tables all ones, 4:4:4, DC-only blocks (AC coefficients
    of a constant block are exactly zero, so the encode is lossless up to
    the documented DC rounding — which is what lets a SQL oracle recompute
    the decoded pixels independently)."""
    w, h = bw * 8, bh * 8
    colors = colors.astype(np.float64)
    y = 0.299 * colors[:, 0] + 0.587 * colors[:, 1] + 0.114 * colors[:, 2]
    cb = 128.0 - 0.168736 * colors[:, 0] - 0.331264 * colors[:, 1] + 0.5 * colors[:, 2]
    cr = 128.0 + 0.5 * colors[:, 0] - 0.418688 * colors[:, 1] - 0.081312 * colors[:, 2]
    dc = _dc_codes()
    wtr = _BitWriter()
    pred = [0, 0, 0]
    for b in range(bw * bh):
        for ci, plane in enumerate((y, cb, cr)):
            # DC coefficient of a constant block v: 8 * (v - 128); qtable 1
            coef = int(np.floor(8.0 * (plane[b] - 128.0) + 0.5))
            diff = coef - pred[ci]
            pred[ci] = coef
            mag, size = abs(diff), 0
            while mag >> size:
                size += 1
            code, length = dc[size]
            wtr.write(code, length)
            if size:
                bits = diff if diff >= 0 else diff + (1 << size) - 1
                wtr.write(bits & ((1 << size) - 1), size)
            wtr.write(0, 1)  # EOB (1-bit code 0 in the tiny AC table)
    wtr.flush()

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(wtr.out) + b"\xff\xd9"


def make_jpeg_asset_table(spark, n: int = 200) -> DataFrame:
    """Synthetic asset table with REAL baseline-JPEG payloads whose decoded
    pixels are closed-form: image is (1 + id%3) x (1 + (id*5)%3) blocks of
    8x8, block b's constant RGB = ((id*11 + b*29) % 256, (id*13 + b*31) %
    256, (id*17 + b*37) % 256). With all-ones quant tables the decode
    roundtrip is RGB -> YCbCr -> DC-quantize (floor(8v-1024+0.5)/8) ->
    YCbCr' -> RGB' clamp — every step scalar math a SQL oracle replays."""
    rows = []
    for a in range(n):
        bw, bh = 1 + a % 3, 1 + (a * 5) % 3
        cols = np.array(
            [
                [(a * 11 + b * 29) % 256, (a * 13 + b * 31) % 256, (a * 17 + b * 37) % 256]
                for b in range(bw * bh)
            ],
            dtype=np.uint8,
        )
        rows.append((a, bytearray(jpeg_encode_const_blocks(cols, bw, bh)), (bw * 8, bh * 8, "jpeg")))
    return spark.createDataFrame(
        rows, f"asset_id long, payload binary, meta struct<{IMAGE_META_SCHEMA}>"
    )


def _sniff_decode(payload: bytes) -> np.ndarray:
    """Default decoder: real PPM for P6 payloads, real PNG for PNG
    signatures, real baseline JPEG for SOI payloads, deterministic fake
    otherwise."""
    if payload.startswith(b"P6"):
        return ppm_decode(payload)
    if payload.startswith(_PNG_SIG):
        return png_decode(payload)
    if payload.startswith(b"\xff\xd8"):
        return jpeg_decode(payload)
    return _fake_decode(payload)


_decoder: Callable[[bytes], np.ndarray] = _sniff_decode


def set_decoder(fn: Callable[[bytes], np.ndarray]) -> None:
    """Install a real decoder (e.g. PIL-based) when the codec libs exist."""
    global _decoder
    _decoder = fn


def get_decoder() -> Callable[[bytes], np.ndarray]:
    """The currently installed decoder (for save/restore around a hook)."""
    return _decoder


def _sniff_decode_fast(payload: bytes) -> np.ndarray:
    """The shipped set_decoder payload: same sniffing contract as the
    default, with the PNG branch routed through the vectorized unfilter
    (png_decode_fast).  This is the decoder a production deployment of
    THIS container installs; a PIL/libjpeg deployment replaces it with
    the same one-line set_decoder call."""
    if payload.startswith(b"P6"):
        return ppm_decode(payload)
    if payload.startswith(_PNG_SIG):
        return png_decode_fast(payload)
    if payload.startswith(b"\xff\xd8"):
        return jpeg_decode(payload)
    return _fake_decode(payload)


def install_fast_decoders() -> Callable[[bytes], np.ndarray]:
    """Install `_sniff_decode_fast` via the public seam and return the
    PREVIOUS decoder so callers can restore it — the bench's decoder_hook
    row uses exactly this to price the hook path against the default."""
    prev = get_decoder()
    set_decoder(_sniff_decode_fast)
    return prev


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
    JVM-side (sequence); only actual pixel decode would hit Python.
    Uses the real `meta.n_frames` when the asset table carries one (AVI
    assets do); image-style metadata falls back to the width-derived
    stub count."""
    fields = videos.schema["meta"].dataType.fieldNames()
    if "n_frames" in fields:
        n_frames = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    else:
        n_frames = F.coalesce(F.col("meta.width"), F.lit(0)) * F.lit(8)  # stub frame count
    # empty/NULL-frame-count assets must yield zero rows, not kill the
    # query: sequence(0, -1, +n) raises 'Illegal sequence boundaries'.
    return videos.filter(n_frames >= F.lit(1)).select(
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


# ---------------------------------------------------------------------------
# Audio: real WAV (RIFF/PCM) codec — the fourth modality with a REAL format
# parse (PPM/PNG/JPEG cover images; WAV covers audio).  The RIFF container
# and PCM encoding are public (Microsoft/IBM 1991 spec); parsing needs only
# struct + numpy, no codec library.  Reference parity: the reference treats
# audio as opaque rows next to video (app/esper: audio tracks referenced by
# path only); here the payload column is decodable in-engine.
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = "sample_rate int, channels int, format string"
AUDIO_STATS_SCHEMA = (
    "asset_id long, sample_rate int, channels int, frames bigint, "
    "duration_ms bigint, sum_abs bigint, peak_abs int"
)


def wav_encode_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Encode (frames, channels) int16 samples as a canonical RIFF/WAVE
    PCM payload (16-byte fmt chunk, little-endian interleaved data)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for RIFF/WAVE PCM16: walks the chunk list (skipping
    unknown chunks, honoring the spec's even-byte chunk padding), validates
    the fmt chunk (PCM, 16-bit), and returns ((frames, channels) int16,
    sample_rate).  Raises DecoderNotAvailable on anything that is not a
    PCM16 WAV — same contract as ppm/png/jpeg_decode."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecoderNotAvailable("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    rate = channels = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body_at = pos + 8
        if body_at + clen > end:
            raise DecoderNotAvailable("truncated chunk %r" % cid)
        if cid == b"fmt ":
            if clen < 16:
                raise DecoderNotAvailable("short fmt chunk")
            audio_format, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body_at
            )
            if audio_format != 1 or bits != 16:
                raise DecoderNotAvailable(
                    "unsupported WAV encoding (format=%d bits=%d)" % (audio_format, bits)
                )
            if channels < 1 or rate < 1:
                # a zero would crash the frame-divisibility check /
                # duration math far from here — same contract: malformed
                # payloads raise DecoderNotAvailable, never a bare
                # ZeroDivisionError that kills the whole decode stage
                raise DecoderNotAvailable(
                    "degenerate fmt chunk (channels=%d rate=%d)" % (channels, rate)
                )
        elif cid == b"data":
            data = payload[body_at : body_at + clen]
        pos = body_at + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise DecoderNotAvailable("missing fmt or data chunk")
    if len(data) % (2 * channels):
        raise DecoderNotAvailable("data chunk is not whole frames")
    flat = np.frombuffer(data, dtype="<i2")
    return flat.reshape(-1, channels), int(rate)


def make_wav_asset_table(spark, n: int = 200) -> DataFrame:
    """Synthetic audio asset table with REAL PCM16 WAV payloads whose
    samples are a closed form of asset_id: frames = 256 + (id*13) % 256,
    channels = 1 + id % 2, rate = 8000 + (id % 4) * 4000, flat sample i =
    ((id*7919 + i*104729) % 65536) - 32768 — so decoded stats are
    independently computable by a SQL oracle (the q46/q84/q86 pattern,
    extended to the audio modality)."""
    rows = []
    for a in range(n):
        frames = 256 + (a * 13) % 256
        channels = 1 + a % 2
        rate = 8000 + (a % 4) * 4000
        i = np.arange(frames * channels, dtype=np.int64)
        flat = ((a * 7919 + i * 104729) % 65536) - 32768
        payload = wav_encode_pcm16(flat.astype(np.int16).reshape(frames, channels), rate)
        rows.append((a, bytearray(payload), (rate, channels, "wav")))
    return spark.createDataFrame(
        rows, f"asset_id long, payload binary, meta struct<{AUDIO_META_SCHEMA}>"
    )


def audio_stats(assets: DataFrame) -> DataFrame:
    """Decode every WAV payload and emit exact integer per-asset stats
    (duration, L1 energy, peak) — Arrow-batched like decode_stats; all
    outputs are integers so oracle hash parity needs no float care."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in
                   ("asset_id", "sample_rate", "channels", "frames",
                    "duration_ms", "sum_abs", "peak_abs")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                samples, rate = wav_decode(bytes(payload))
                frames, channels = samples.shape
                absval = np.abs(samples.astype(np.int64))
                out["asset_id"].append(aid)
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["frames"].append(frames)
                out["duration_ms"].append(frames * 1000 // rate)
                out["sum_abs"].append(int(absval.sum()))
                out["peak_abs"].append(int(absval.max()) if absval.size else 0)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Video: real MJPEG-in-AVI codec — the FIFTH real format parse, upgrading the
# video modality from metadata-only plumbing to actual frame decode.  The AVI
# RIFF container (Microsoft 1992 spec) is a chunk list like WAV: LIST 'hdrl'
# (avih main header + one 'strl' stream list) + LIST 'movi' ('00dc' compressed
# video chunks, each a complete baseline JPEG) + 'idx1' index.  Parsing needs
# only struct; frame pixels come from the repo's own jpeg_decode, so the whole
# path is a real two-level format parse with no codec library.  Reference
# parity: the reference stores videos as paths + frame metadata and serves
# pixels through an external frame server (app/esper/prelude.py:125-136);
# here the video payload itself is a decodable binary column.
# ---------------------------------------------------------------------------

VIDEO_META_SCHEMA = "width int, height int, fps int, n_frames int, format string"
VIDEO_STATS_SCHEMA = (
    "asset_id long, width int, height int, n_frames int, n_pixels bigint, mean_luma double"
)


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _riff_list(ltype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + body)


def avi_encode_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 24) -> bytes:
    """Encode complete per-frame JPEG payloads as a canonical MJPEG AVI:
    RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh('vids'/'MJPG'),
    strf(BITMAPINFOHEADER) } }, LIST movi { '00dc' chunks }, idx1 }.
    Chunks are word-aligned per the RIFF spec."""
    n = len(frames)
    us_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, n, 0, 1, max((len(f) for f in frames), default=0),
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI4H", 0, 0, 0, 0, 1, fps, 0, n, 0, -1, 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the ckid within the movi list
        movi_body += _riff_chunk(b"00dc", f)
    movi = _riff_chunk(b"LIST", movi_body)
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
            for off, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_walk(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, list_type_or_None, body_start, body_len) for each
    chunk in [pos, end); raises DecoderNotAvailable on truncation."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body_at = pos + 8
        if body_at + clen > end:
            raise DecoderNotAvailable("truncated AVI chunk %r" % cid)
        if cid == b"LIST":
            yield cid, buf[body_at : body_at + 4], body_at + 4, clen - 4
        else:
            yield cid, None, body_at, clen
        pos = body_at + clen + (clen & 1)


def avi_decode_mjpeg(payload: bytes) -> tuple[list[np.ndarray], int, int, int]:
    """REAL decoder for MJPEG AVI: validates the RIFF/'AVI ' container,
    parses the avih main header (width/height/total_frames/us_per_frame),
    walks LIST 'movi' collecting '00dc'/'00db' video chunks, and decodes
    each through the repo's baseline jpeg_decode.  Frame dimensions are
    validated against the header and the frame count against avih —
    anything malformed raises DecoderNotAvailable (the ppm/png/jpeg/wav
    contract).  Returns (frames, width, height, fps)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise DecoderNotAvailable("not a RIFF/AVI payload")
    width = height = total = us_per_frame = None
    frames: list[np.ndarray] = []
    for cid, ltype, at, clen in _riff_walk(payload, 12, len(payload)):
        if cid == b"LIST" and ltype == b"hdrl":
            for c2, l2, at2, len2 in _riff_walk(payload, at, at + clen):
                if c2 == b"avih":
                    if len2 < 40:
                        raise DecoderNotAvailable("short avih header")
                    vals = struct.unpack_from("<10I", payload, at2)
                    us_per_frame, total, width, height = vals[0], vals[4], vals[8], vals[9]
        elif cid == b"LIST" and ltype == b"movi":
            for c2, _l2, at2, len2 in _riff_walk(payload, at, at + clen):
                if c2 in (b"00dc", b"00db"):
                    frames.append(jpeg_decode(payload[at2 : at2 + len2]))
    if width is None:
        raise DecoderNotAvailable("missing avih header")
    if total is not None and total != len(frames):
        raise DecoderNotAvailable(
            "frame count mismatch: header %d, movi %d" % (total, len(frames))
        )
    for fr in frames:
        if fr.shape[1] != width or fr.shape[0] != height:
            raise DecoderNotAvailable(
                "frame is %dx%d, header says %dx%d"
                % (fr.shape[1], fr.shape[0], width, height)
            )
    fps = 1_000_000 // us_per_frame if us_per_frame else 0
    return frames, int(width), int(height), int(fps)


def make_avi_asset_table(spark, n: int = 150) -> DataFrame:
    """Synthetic video asset table with REAL MJPEG-AVI payloads whose
    decoded pixels are closed-form: asset is (1 + id%3) x (1 + (id*5)%3)
    blocks of 8x8 per frame, 1 + (id*3)%4 frames; frame f block b's
    constant RGB = ((id*11 + f*41 + b*29) % 256, (id*13 + f*43 + b*31) %
    256, (id*17 + f*47 + b*37) % 256).  Each frame is an independent
    const-block JPEG (the q86 closed-form roundtrip applies per frame), so
    a SQL oracle replays the full container+codec decode."""
    rows = []
    for a in range(n):
        bw, bh = 1 + a % 3, 1 + (a * 5) % 3
        nf = 1 + (a * 3) % 4
        frames = []
        for f in range(nf):
            cols = np.array(
                [
                    [
                        (a * 11 + f * 41 + b * 29) % 256,
                        (a * 13 + f * 43 + b * 31) % 256,
                        (a * 17 + f * 47 + b * 37) % 256,
                    ]
                    for b in range(bw * bh)
                ],
                dtype=np.uint8,
            )
            frames.append(jpeg_encode_const_blocks(cols, bw, bh))
        payload = avi_encode_mjpeg(frames, bw * 8, bh * 8, fps=24)
        rows.append((a, bytearray(payload), (bw * 8, bh * 8, 24, nf, "avi-mjpeg")))
    return spark.createDataFrame(
        rows, f"asset_id long, payload binary, meta struct<{VIDEO_META_SCHEMA}>"
    )


FRAME_STATS_SCHEMA = "asset_id long, frame_no int, width int, height int, mean_luma double"


def avi_iter_frames(payload: bytes):
    """Yield (frame_no, jpeg_bytes) for each video chunk WITHOUT decoding —
    the container walk is cheap; callers decode only the frames they keep.
    Validates the container the same way as avi_decode_mjpeg."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise DecoderNotAvailable("not a RIFF/AVI payload")
    n = 0
    for cid, ltype, at, clen in _riff_walk(payload, 12, len(payload)):
        if cid == b"LIST" and ltype == b"movi":
            for c2, _l2, at2, len2 in _riff_walk(payload, at, at + clen):
                if c2 in (b"00dc", b"00db"):
                    yield n, payload[at2 : at2 + len2]
                    n += 1


def video_frame_stats(assets: DataFrame, every_n: int = 1) -> DataFrame:
    """Stride-sampled per-frame decode: walk each AVI's movi list and
    decode ONLY frames with frame_no % every_n == 0 — the reference's
    frame-sampling pattern (decode cost proportional to frames KEPT, not
    frames stored).  Emits one row per sampled frame; Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("asset_id", "frame_no", "width", "height", "mean_luma")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for fno, jpg in avi_iter_frames(bytes(payload)):
                    if fno % every_n:
                        continue
                    img = jpeg_decode(jpg)
                    out["asset_id"].append(aid)
                    out["frame_no"].append(fno)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["mean_luma"].append(float(img.astype(np.float64).mean()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=FRAME_STATS_SCHEMA)


def video_stats(assets: DataFrame) -> DataFrame:
    """Decode every AVI payload (container walk + per-frame JPEG decode)
    and emit per-video stats — Arrow-batched like decode_stats; mean_luma
    is the mean over all frames' RGB samples."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {
                k: []
                for k in ("asset_id", "width", "height", "n_frames", "n_pixels", "mean_luma")
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames, w, h, _fps = avi_decode_mjpeg(bytes(payload))
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["n_pixels"].append(int(w) * int(h) * len(frames))
                stack = np.stack(frames).astype(np.float64)
                out["mean_luma"].append(float(stack.mean()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=VIDEO_STATS_SCHEMA)
