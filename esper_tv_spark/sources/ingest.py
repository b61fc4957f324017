"""Batch ingest utilities.

Mirrors the reference's offline ingest (/root/reference/app/esper/
ingest.py:21-43, 71-109): video files arrive as paths; channel/date/show
are parsed from the filename (ingest.py:154-160); per-video metadata
(fps/frames/dims) comes from ffprobe. Here:

- `parse_video_paths` is pure regexp_extract column work (codegen'd);
- `probe_videos` is the ffprobe boundary — gated: a real prober can be
  installed, the default derives deterministic fake metadata so the
  pipeline is testable without media libs;
- `ingest_csv` is the explicit-schema CSV path (the reference inferSchema'd
  every load, spark.py:38-40 — inference is a full extra pass at scale and
  type-unstable, so we require a schema);
- `decode_keypoints` unpacks the reference's Pose binary blobs
  (float32 triples, base_models.py:286-332) into array<array<float>>
  columns via one vectorized pandas_udf (numpy frombuffer per cell).

The streaming twin of this module is streaming/ingest.py: same parse
expressions over a file-arrival source.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

# <CHANNEL>_<YYYYMMDD>_<HHMMSS>_<show name>.mp4  (ingest.py:154-160)
_PATH_RE = r"([A-Z]+)_(\d{8})_(\d{6})_(.*)\.mp4$"


def parse_video_paths(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Extract (channel_name, air_date, air_time, show_name) from video
    paths — regexp_extract, pushdown-friendly."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    return (
        df.withColumn("channel_name", F.regexp_extract(base, _PATH_RE, 1))
        .withColumn(
            "air_datetime",
            # try_: non-matching paths yield NULL instead of an ANSI error
            F.try_to_timestamp(
                F.concat(
                    F.regexp_extract(base, _PATH_RE, 2),
                    F.lit(" "),
                    F.regexp_extract(base, _PATH_RE, 3),
                ),
                F.lit("yyyyMMdd HHmmss"),
            ),
        )
        .withColumn("show_name", F.regexp_extract(base, _PATH_RE, 4))
    )


def _fake_probe(path: str) -> tuple[float, int, int, int]:
    """Deterministic fake ffprobe: (fps, num_frames, width, height) from the
    path hash. Swap via probe_videos(prober=...)."""
    h = abs(hash(path))
    fps = [25.0, 29.97, 59.94][h % 3]
    return fps, int(fps * (600 + h % 3000)), 640, 480


def probe_videos(
    df: DataFrame,
    path_col: str = "path",
    prober: Callable[[str], tuple[float, int, int, int]] = _fake_probe,
) -> DataFrame:
    """Annotate fps/num_frames/width/height per video path. The prober runs
    in an Arrow-batched mapInPandas (the reference shelled out to ffprobe
    per file on the driver, ingest.py:21-43 — here it parallelizes across
    executors; a real prober does I/O per path, so partition count bounds
    concurrency)."""
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [prober(p) for p in pdf[path_col]]
            pdf = pdf.copy()
            pdf["fps"] = [m[0] for m in meta]
            pdf["num_frames"] = [m[1] for m in meta]
            pdf["width"] = [m[2] for m in meta]
            pdf["height"] = [m[3] for m in meta]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += ", fps double, num_frames long, width int, height int"
    return df.mapInPandas(batches, schema=schema)


def ingest_csv(spark: SparkSession, path: str, schema: StructType, header: bool = True) -> DataFrame:
    """CSV load with an explicit schema (no inferSchema pass)."""
    return spark.read.csv(path, schema=schema, header=header)


def decode_keypoints(df: DataFrame, blob_col: str = "keypoints", n_coords: int = 3) -> DataFrame:
    """Pose blob -> array of (x, y, score) triples.

    The reference stores pose keypoints as a float32 binary blob and decodes
    with np.frombuffer().reshape(n/3, 3) per access
    (base_models.py:286-332). One vectorized pandas_udf decodes a whole
    Arrow batch; downstream spatial predicates then use higher-order
    functions on the array column instead of re-decoding."""

    @F.pandas_udf("array<array<float>>")
    def decode(blobs: pd.Series) -> pd.Series:
        def one(b):
            if b is None or len(b) == 0:
                return []
            a = np.frombuffer(bytes(b), dtype=np.float32)
            return a.reshape(len(a) // n_coords, n_coords).tolist()

        return blobs.map(one)

    return df.withColumn(f"{blob_col}_decoded", decode(F.col(blob_col)))


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines load with an EXPLICIT schema and corrupt-record
    accounting: returns (good_rows, bad_rows).

    At 100 TB, schema inference is a full extra pass over the data and a
    correctness hazard (a batch where a field happens to be all-null flips
    the inferred type) — always pass the schema. Malformed lines are kept
    rather than silently dropped: the bad frame carries the raw line for
    quarantine/audit, the same no-silent-truncation discipline as
    oversized_lsh_buckets.

    Parsing is text-scan + from_json with an embedded corrupt column —
    NOT spark.read.json's internal _corrupt_record, which cannot be
    filtered on without caching the whole scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    """
    from pyspark.sql.types import StringType

    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    raw = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value", full, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col}
        ).alias("__j"),
    )
    good = raw.where(F.col(f"__j.{corrupt_col}").isNull()).select(
        *[F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = raw.where(F.col(f"__j.{corrupt_col}").isNotNull()).select(
        F.col("value").alias(corrupt_col)
    )
    return good, bad
