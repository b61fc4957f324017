"""Stream-stream interval overlap join == batch overlap_join."""

import os

from pyspark.sql import functions as F

from esper_tv_spark.operators import intervals as iv
from esper_tv_spark.session import normalize_ts
from esper_tv_spark.streaming import file_stream
from esper_tv_spark.streaming.interval_join import streaming_overlap_join

SF = "/root/testdata/sf0.001"


def _intervals(spark, event_type):
    ev = normalize_ts(spark.read.parquet(os.path.join(SF, "events.parquet")), "ts")
    return ev.where(F.col("event_type") == event_type).select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("start"),
        # dilate durations so the synthetic events actually overlap (raw
        # values are seconds-scale vs hours-scale gaps)
        (F.unix_micros("ts") + F.round(F.col("value") * 2e8).cast("long")).alias("end"),
    )


def test_stream_overlap_join_equals_batch(spark, tmp_path):
    a = _intervals(spark, "view")
    b = _intervals(spark, "error")
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.parquet(src_a)
    b.write.parquet(src_b)

    out = streaming_overlap_join(
        file_stream(spark, src_a, a.schema),
        file_stream(spark, src_b, b.schema),
        ["user_id"],
        max_len="24 hours",
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["a_user_id"], r["a_event_id"], r["b_event_id"], r["overlap_length"])
        for r in spark.table("ssij").collect()
    )

    batch = iv.overlap_join(
        a.drop("ts"), b.drop("ts"), ["user_id"], clip=False
    )
    want = sorted(
        (r["a_user_id"], r["a_event_id"], r["b_event_id"], r["overlap_length"])
        for r in batch.collect()
    )
    assert got == want
    assert len(want) > 0
