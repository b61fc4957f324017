"""File-manifest pruning: per-file stats + Z-order layout -> point/range
queries open a fraction of the files, with results identical to a full scan."""

import os

from pyspark.sql import functions as F

from esper_tv_spark.plans.zorder import write_zordered
from esper_tv_spark.sources.manifest import (
    build_manifest,
    prune_files,
    read_pruned,
    write_manifest,
)

SF = "/root/testdata/sf0.001"


def _layout(spark, tmp_path):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    path = str(tmp_path / "li_z")
    write_zordered(li, path, ["l_orderkey", "l_partkey"], n_files=16)
    return li, path


def test_manifest_stats_and_hidden_dir(spark, tmp_path):
    li, path = _layout(spark, tmp_path)
    write_manifest(spark, path, ["l_orderkey", "l_partkey"])
    m = spark.read.parquet(os.path.join(path, "_manifest"))
    assert m.count() == 16
    assert m.agg(F.sum("row_count")).collect()[0][0] == li.count()
    # _manifest is invisible to the data scan (underscore convention)
    assert spark.read.parquet(path).count() == li.count()


def test_pruned_read_matches_full_scan(spark, tmp_path):
    li, path = _layout(spark, tmp_path)
    write_manifest(spark, path, ["l_orderkey", "l_partkey"])
    m = spark.read.parquet(os.path.join(path, "_manifest"))

    for preds in (
        {"l_orderkey": (100, 140)},
        {"l_partkey": (50, 55)},
        {"l_orderkey": (None, 300), "l_partkey": (10, 20)},
        {"l_orderkey": (10**9, None)},  # empty result
    ):
        files = prune_files(m, preds)
        got = sorted(map(tuple, read_pruned(spark, path, preds, m).collect()))
        cond = F.lit(True)
        for c, (lo, hi) in preds.items():
            if lo is not None:
                cond = cond & (F.col(c) >= lo)
            if hi is not None:
                cond = cond & (F.col(c) <= hi)
        want = sorted(map(tuple, li.where(cond).collect()))
        assert got == want
        assert len(files) <= 16


def test_zorder_manifest_prunes_on_both_columns(spark, tmp_path):
    _, path = _layout(spark, tmp_path)
    m = build_manifest(spark, path, ["l_orderkey", "l_partkey"])
    # narrow point-ish ranges on EITHER z-ordered column must skip most files
    for preds in ({"l_orderkey": (100, 110)}, {"l_partkey": (42, 44)}):
        assert len(prune_files(m, preds)) < 16 / 2
