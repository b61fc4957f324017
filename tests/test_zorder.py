"""Z-order clustering: every clustered column must have narrow per-file
min/max footprints (the file-skipping evidence), unlike a single-column
sort which only prunes on the leading column."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from esper_tv_spark.plans.zorder import write_zordered, zorder_key


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    """(min, max) of `col` per parquet file via footer statistics."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((mn, mx))
    return spans


def _avg_coverage(spans, lo, hi) -> float:
    width = hi - lo
    return sum((mx - mn) / width for mn, mx in spans) / len(spans)


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    # two independent dimensions: day bucket and user id
    from esper_tv_spark.session import normalize_ts

    df = (
        normalize_ts(spark.read.parquet("/root/testdata/sf0.01/events.parquet"), "ts")
        .select(
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
            "user_id",
            "event_id",
        )
    )
    lo_d, hi_d, lo_u, hi_u = df.agg(
        F.min("day"), F.max("day"), F.min("user_id"), F.max("user_id")
    ).collect()[0]

    z_path = str(tmp_path / "zord")
    lin_path = str(tmp_path / "linear")
    write_zordered(df, z_path, ["day", "user_id"], bits=10, n_files=16)
    # baseline: classic single-column sort layout
    df.repartitionByRange(16, "day").sortWithinPartitions("day").write.parquet(lin_path)

    z_day = _avg_coverage(_file_spans(z_path, "day"), lo_d, hi_d)
    z_user = _avg_coverage(_file_spans(z_path, "user_id"), lo_u, hi_u)
    lin_day = _avg_coverage(_file_spans(lin_path, "day"), lo_d, hi_d)
    lin_user = _avg_coverage(_file_spans(lin_path, "user_id"), lo_u, hi_u)

    # linear layout: perfect on day, useless on user_id
    assert lin_day < 0.2 and lin_user > 0.8
    # z-order: meaningfully narrow on BOTH columns — a point predicate on
    # either column skips most files
    assert z_day < 0.5 and z_user < 0.5
    # totals preserved
    n = spark.read.parquet(z_path).count()
    assert n == df.count()


def test_zorder_key_is_deterministic_expression(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("a"), (F.col("id") * 7 % 101).alias("b")
    )
    stats = {"a": (0, 36), "b": (0, 100)}
    k1 = df.select(zorder_key(df, ["a", "b"], bits=8, stats=stats).alias("z")).collect()
    k2 = df.select(zorder_key(df, ["a", "b"], bits=8, stats=stats).alias("z")).collect()
    assert k1 == k2
    # distinct inputs spread across the key space
    zs = {r["z"] for r in k1}
    assert len(zs) > 500
