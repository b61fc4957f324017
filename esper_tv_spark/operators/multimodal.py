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


_decoder: Callable[[bytes], np.ndarray] = _fake_decode


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
