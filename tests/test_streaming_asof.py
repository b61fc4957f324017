"""Streaming as-of enrichment == batch asof_join when batches replay in
event-time order."""

import os

from pyspark.sql import functions as F

from esper_tv_spark.operators.asof import asof_join
from esper_tv_spark.streaming import file_stream
from esper_tv_spark.streaming.asof import streaming_asof_enrich

SF = "/root/testdata/sf0.001"


def _intervals(spark, event_type):
    from esper_tv_spark.session import normalize_ts

    ev = normalize_ts(spark.read.parquet(os.path.join(SF, "events.parquet")), "ts")
    return ev.where(F.col("event_type") == event_type).select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    )


def test_stream_asof_equals_batch(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    left = _intervals(spark, "purchase").select("user_id", "event_id", "t")
    right = _intervals(spark, "view").select("user_id", "t")

    # split by GLOBAL event time so per-key order holds across batches
    cut = left.select(F.expr("percentile(t, 0.5)")).collect()[0][0]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    for src, df in ((lsrc, left), (rsrc, right)):
        df.where(F.col("t") <= cut).coalesce(1).write.parquet(src)
        df.where(F.col("t") > cut).coalesce(1).write.parquet(src, mode="append")

    out = streaming_asof_enrich(
        file_stream(spark, lsrc, left.schema, max_files_per_trigger=1),
        file_stream(spark, rsrc, right.schema, max_files_per_trigger=1),
        ["user_id"],
        ts_col="t",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("asofm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r)
        for r in spark.table("asofm").select("user_id", "event_id", "t", "t_r").collect()
    )
    want = sorted(
        tuple(r)
        for r in asof_join(left, right, ["user_id"], ts_left="t", ts_right="t")
        .select("user_id", "event_id", "t", "t_r")
        .collect()
    )
    assert got == want and len(got) > 0
