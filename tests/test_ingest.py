"""Ingest utilities: path parsing, probe plumbing, blob decode, CSV."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from esper_tv_spark.sources import ingest


def test_parse_video_paths(spark):
    df = spark.createDataFrame(
        [
            ("tvnews/videos/CNN_20160115_230000_some_show.mp4",),
            ("FOXNEWS_20170301_120000_another show.mp4",),
            ("not_a_video.txt",),
        ],
        "path string",
    )
    out = {r["path"]: r for r in ingest.parse_video_paths(df).collect()}
    r = out["tvnews/videos/CNN_20160115_230000_some_show.mp4"]
    assert r["channel_name"] == "CNN" and r["show_name"] == "some_show"
    assert r["air_datetime"].strftime("%Y%m%d %H%M%S") == "20160115 230000"
    r2 = out["FOXNEWS_20170301_120000_another show.mp4"]
    assert r2["channel_name"] == "FOXNEWS" and r2["show_name"] == "another show"
    assert out["not_a_video.txt"]["channel_name"] == "" and out["not_a_video.txt"]["air_datetime"] is None


def test_probe_videos_plumbing(spark):
    df = spark.createDataFrame([("a.mp4",), ("b.mp4",)], "path string")
    out = {r["path"]: r for r in ingest.probe_videos(df).collect()}
    assert len(out) == 2
    for r in out.values():
        assert r["fps"] in (25.0, 29.97, 59.94) and r["num_frames"] > 0
    # custom prober is honored
    fixed = ingest.probe_videos(df, prober=lambda p: (30.0, 900, 100, 50)).first()
    assert (fixed["fps"], fixed["num_frames"], fixed["width"], fixed["height"]) == (30.0, 900, 100, 50)


def test_decode_keypoints_roundtrip(spark):
    kp = np.arange(18 * 3, dtype=np.float32)  # 18 body keypoints
    df = spark.createDataFrame([(1, bytearray(kp.tobytes())), (2, bytearray(b""))], "id long, keypoints binary")
    out = {r["id"]: r["keypoints_decoded"] for r in ingest.decode_keypoints(df).collect()}
    assert len(out[1]) == 18 and out[1][0] == [0.0, 1.0, 2.0]
    assert out[1][17][2] == pytest.approx(53.0)
    assert out[2] == []


def test_ingest_csv_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,foo\n2,bar\n")
    schema = StructType([StructField("a", IntegerType()), StructField("b", StringType())])
    df = ingest.ingest_csv(spark, p, schema)
    assert [tuple(r) for r in df.orderBy("a").collect()] == [(1, "foo"), (2, "bar")]
    assert df.schema == schema


def test_write_derived_table_idempotent_and_crash_safe(spark, tmp_path):
    """Batch label write-back: a committed job never double-writes, and
    data without a ledger row (crash before commit) is invisible."""
    import os

    from esper_tv_spark.sources.catalog import read_derived_table, write_derived_table

    base = str(tmp_path / "derived")
    df = spark.createDataFrame([(1, 0.9), (2, 0.7)], "id long, p double")
    assert write_derived_table(df, base, job="j1") is True
    assert write_derived_table(df, base, job="j1") is False  # committed -> skip
    got = {(r["id"], r["p"]) for r in read_derived_table(spark, base).collect()}
    assert got == {(1, 0.9), (2, 0.7)}

    # simulate crash-before-commit: data directory exists, no ledger row
    df2 = spark.createDataFrame([(3, 0.5)], "id long, p double")
    df2.write.mode("overwrite").parquet(os.path.join(base, "data", "job=j2"))
    got = {r["id"] for r in read_derived_table(spark, base).collect()}
    assert got == {1, 2}  # j2 invisible until committed
    assert write_derived_table(df2, base, job="j2") is True
    got = {r["id"] for r in read_derived_table(spark, base).collect()}
    assert got == {1, 2, 3}
