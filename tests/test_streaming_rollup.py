"""Incremental rollup: the maintained snapshot equals a batch groupBy of
everything ingested; replay commits are no-ops."""

import os

from pyspark.sql import functions as F

from esper_tv_spark.streaming import file_stream
from esper_tv_spark.streaming.rollup import incremental_rollup, read_rollup

SF = "/root/testdata/sf0.001"
METRICS = {
    "n": ("count", None),
    "qty": ("sum", "l_quantity"),
    "max_price": ("max", "l_extendedprice"),
}


def _run(spark, src, state, ckpt):
    li_schema = spark.read.parquet(os.path.join(SF, "lineitem.parquet")).schema
    stream = file_stream(spark, src, li_schema, max_files_per_trigger=1)
    q = incremental_rollup(stream, ["l_returnflag"], METRICS, state, ckpt).start()
    q.awaitTermination(180)


def test_rollup_equals_batch_groupby(spark, tmp_path):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    src = str(tmp_path / "src")
    li.where("l_orderkey % 2 = 0").coalesce(1).write.parquet(src)
    li.where("l_orderkey % 2 = 1").coalesce(1).write.parquet(src, mode="append")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    _run(spark, src, state, ckpt)
    got = sorted(map(tuple, read_rollup(spark, state).collect()))
    want = sorted(
        map(
            tuple,
            li.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("qty"),
                F.max("l_extendedprice").alias("max_price"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0
    # two micro-batches -> two committed versions (time travel retained)
    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(state) if d.startswith("v=")
    )
    assert len(versions) == 2

    # replay from a fresh checkpoint: every epoch is already committed, the
    # snapshot must not change (no double counting)
    _run(spark, src, state, str(tmp_path / "ckpt2"))
    again = sorted(map(tuple, read_rollup(spark, state).collect()))
    assert again == got


def test_streaming_count_min_sketch(spark, tmp_path):
    """A streaming CMS is just cm_cells ∘ incremental_rollup: the maintained
    cell table equals the batch sketch of everything ingested."""
    from esper_tv_spark.functions.sketches import build_count_min, cm_cells

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select("doc_id", "source")
    src = str(tmp_path / "cms_src")
    docs.where("doc_id % 2 = 0").coalesce(1).write.parquet(src)
    docs.where("doc_id % 2 = 1").coalesce(1).write.parquet(src, mode="append")

    stream = file_stream(spark, src, docs.schema, max_files_per_trigger=1)
    cells = cm_cells(stream, "source", depth=4, width=64)
    state, ckpt = str(tmp_path / "cms_state"), str(tmp_path / "cms_ckpt")
    q = incremental_rollup(cells, ["d", "bucket"], {"cnt": ("count", None)}, state, ckpt).start()
    q.awaitTermination(180)

    got = sorted(map(tuple, read_rollup(spark, state).collect()))
    want = sorted(map(tuple, build_count_min(docs, "source", depth=4, width=64).collect()))
    assert got == want and len(got) > 0


def test_vacuum_rollup_keeps_latest(spark, tmp_path):
    """vacuum drops old snapshot versions + ledger rows; the readable view
    (max committed) survives and still has the full accumulated state."""
    import os

    from esper_tv_spark.streaming.rollup import read_rollup, vacuum_rollup

    state = str(tmp_path / "state")
    # fabricate three committed versions the way the sink writes them
    for epoch, n in [(0, 1), (1, 2), (2, 3)]:
        spark.createDataFrame([("k", n)], "key string, cnt long").write.mode(
            "overwrite"
        ).parquet(os.path.join(state, f"v={epoch}"))
        spark.createDataFrame([(epoch,)], "epoch_id long").write.mode("append").parquet(
            os.path.join(state, "_ledger")
        )
    dropped = vacuum_rollup(spark, state, keep=1)
    assert dropped == [0, 1]
    assert not os.path.exists(os.path.join(state, "v=0"))
    assert read_rollup(spark, state).collect()[0]["cnt"] == 3
    assert vacuum_rollup(spark, state, keep=1) == []  # idempotent
