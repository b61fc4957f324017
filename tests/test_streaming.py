"""Structured Streaming: file source -> windowed aggs -> ledger sink.

Checks the one-logical-definition/two-modes property: the streaming result
over a file source equals the same aggregation run in batch."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from esper_tv_spark.streaming import (
    file_stream,
    session_agg,
    tumbling_agg,
    write_with_ledger,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    from esper_tv_spark.session import normalize_ts

    df = spark.read.parquet(os.path.join(SF, "events.parquet"))
    return normalize_ts(df, "ts")


def run_stream_to_memory(spark, stream_df, name):
    q = stream_df.writeStream.format("memory").queryName(name).outputMode("complete").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_stream_equals_batch(spark, events_batch, tmp_path):
    src = str(tmp_path / "events_src")
    events_batch.write.parquet(src)
    stream = file_stream(spark, src, events_batch.schema)
    aggs = [F.count(F.lit(1)).alias("n")]
    stream_out = run_stream_to_memory(
        spark, tumbling_agg(stream, "ts", "1 hour", ["event_type"], aggs, watermark="1 hour"), "tumb"
    )
    batch_out = tumbling_agg(events_batch, "ts", "1 hour", ["event_type"], aggs)
    got = sorted(tuple(r) for r in stream_out.collect())
    want = sorted(tuple(r) for r in batch_out.collect())
    assert got == want and len(got) > 0


def test_session_stream_equals_batch(spark, events_batch, tmp_path):
    src = str(tmp_path / "events_src2")
    events_batch.write.parquet(src)
    stream = file_stream(spark, src, events_batch.schema)
    aggs = [F.count(F.lit(1)).alias("n")]
    stream_out = run_stream_to_memory(
        spark,
        session_agg(stream, "ts", "30 minutes", ["user_id"], aggs, watermark="1 hour"),
        "sess",
    )
    batch_out = session_agg(events_batch, "ts", "30 minutes", ["user_id"], aggs)
    got = sorted(tuple(r) for r in stream_out.collect())
    want = sorted(tuple(r) for r in batch_out.collect())
    assert got == want and len(got) > 0


def test_ledger_sink_idempotent(spark, events_batch, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    events_batch.limit(100).write.parquet(src)

    stream = file_stream(spark, src, events_batch.schema)
    q = write_with_ledger(stream.select("event_id", "user_id"), out, ledger, ckpt).start()
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    epochs1 = {r["epoch_id"] for r in spark.read.parquet(ledger).collect()}
    assert n1 == 100 and len(epochs1) >= 1

    # restart with a FRESH checkpoint (simulates replay of the same epochs):
    # the ledger must dedupe and the sink must not double-write
    shutil.rmtree(ckpt)
    stream2 = file_stream(spark, src, events_batch.schema)
    q2 = write_with_ledger(stream2.select("event_id", "user_id"), out, ledger, str(tmp_path / "ckpt2")).start()
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1  # replayed epoch skipped via ledger


def test_ledger_sink_crash_before_commit(spark, events_batch, tmp_path):
    """Crash AFTER the epoch data write but BEFORE the ledger append: the
    replay must overwrite the epoch directory, not re-append (ADVICE r1)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    events_batch.limit(100).write.parquet(src)

    # simulate the half-committed state: epoch 0 data exists, no ledger row
    stale = events_batch.limit(37).select("event_id", "user_id").withColumn(
        "__epoch", F.lit(0)
    )
    stale.write.parquet(out + "/epoch=0")

    stream = file_stream(spark, src, events_batch.schema)
    q = write_with_ledger(
        stream.select("event_id", "user_id"), out, ledger, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100  # stale rows replaced, not added


def test_stateful_coalesce_stream_equals_batch(spark, events_batch, tmp_path):
    """coalesce_stream (applyInPandasWithState) emits exactly the CLOSED
    intervals of the batch coalesce — every merged interval per user except
    the final one, which stays open in state."""
    from pyspark.sql import Window

    from esper_tv_spark.operators.intervals import coalesce
    from esper_tv_spark.streaming import coalesce_stream

    iv = events_batch.select(
        "user_id",
        F.unix_micros("ts").alias("start"),
        (F.unix_micros("ts") + F.lit(600_000_000)).alias("end"),
    )
    src = str(tmp_path / "iv_src")
    iv.write.parquet(src)
    stream = file_stream(spark, src, iv.schema)
    out = coalesce_stream(stream, "user_id", "start", "end", gap=0)
    q = (
        out.writeStream.format("memory")
        .queryName("coal")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("coal").collect())

    batch = coalesce(iv, ["user_id"], gap=0)
    w = Window.partitionBy("user_id")
    closed = batch.withColumn("max_start", F.max("start").over(w)).where(
        F.col("start") < F.col("max_start")
    )
    want = sorted(
        tuple(r) for r in closed.select("user_id", "start", "end", "n_merged").collect()
    )
    assert got == want and len(got) > 0


def test_sliding_stream_equals_batch(spark, events_batch, tmp_path):
    from esper_tv_spark.streaming import sliding_agg

    src = str(tmp_path / "events_src3")
    events_batch.write.parquet(src)
    stream = file_stream(spark, src, events_batch.schema)
    aggs = [F.count(F.lit(1)).alias("n")]
    stream_out = run_stream_to_memory(
        spark,
        sliding_agg(stream, "ts", "2 hours", "1 hour", ["event_type"], aggs, watermark="1 hour"),
        "slide",
    )
    batch_out = sliding_agg(events_batch, "ts", "2 hours", "1 hour", ["event_type"], aggs)
    got = sorted(tuple(r) for r in stream_out.collect())
    want = sorted(tuple(r) for r in batch_out.collect())
    assert got == want and len(got) > 0


def test_stateful_coalesce_timeout_flushes_open_intervals(spark, events_batch, tmp_path):
    """coalesce_stream_timeout emits, beyond the supersession-closed set,
    every OPEN interval whose merge horizon the event-time watermark has
    passed — so stream output equals batch coalesce restricted to intervals
    closed-or-expired under the final watermark."""
    from pyspark.sql import Window

    from esper_tv_spark.operators.intervals import coalesce
    from esper_tv_spark.streaming import coalesce_stream_timeout

    iv = events_batch.select(
        "user_id",
        "ts",
        F.unix_micros("ts").alias("start"),
        (F.unix_micros("ts") + F.lit(600_000_000)).alias("end"),
    )
    # three time-ordered files so the watermark advances between
    # micro-batches: first half, second half, and one far-future sentinel
    # row (its batch runs with the watermark derived from files 0-1,
    # firing the expired timeouts)
    median_ts = iv.approxQuantile("start", [0.5], 0.0)[0]
    src = str(tmp_path / "iv_to_src")
    iv.where(F.col("start") <= median_ts).coalesce(1).write.parquet(src)
    iv.where(F.col("start") > median_ts).coalesce(1).write.parquet(src, mode="append")
    max_ts_us = iv.agg(F.max("start")).collect()[0][0]
    sentinel_user = iv.orderBy("user_id").first()["user_id"]
    sentinel_us = max_ts_us + 10 * 86_400 * 1_000_000
    spark.createDataFrame(
        [(sentinel_user, sentinel_us)], "user_id long, sentinel long"
    ).select(
        "user_id",
        F.timestamp_micros(F.col("sentinel")).alias("ts"),
        F.col("sentinel").alias("start"),
        (F.col("sentinel") + F.lit(600_000_000)).alias("end"),
    ).coalesce(1).write.parquet(src, mode="append")

    stream = file_stream(spark, src, iv.schema, max_files_per_trigger=1)
    out = coalesce_stream_timeout(
        stream, "user_id", "ts", "start", "end", gap=0, watermark="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("coal_to")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table("coal_to").collect())

    # batch expectation over the SAME data (incl. sentinel row)
    sent = spark.createDataFrame(
        [(sentinel_user, sentinel_us, sentinel_us + 600_000_000)],
        "user_id long, start long, end long",
    )
    batch = coalesce(
        iv.select("user_id", "start", "end").unionByName(sent), ["user_id"], gap=0
    )
    w = Window.partitionBy("user_id")
    batch = batch.withColumn("max_start", F.max("start").over(w))
    # the final no-data micro-batch (noDataMicroBatches, on by default) runs
    # with watermark = sentinel - 10s, which is past every merge horizon
    # except the sentinel interval's own: everything else must be emitted
    closed_or_expired = batch.where(F.col("start") < F.lit(sentinel_us))
    want = sorted(
        tuple(r)
        for r in closed_or_expired.select("user_id", "start", "end", "n_merged").collect()
    )
    n_closed_only = batch.where(F.col("start") < F.col("max_start")).count()
    assert got == want and len(got) > n_closed_only
