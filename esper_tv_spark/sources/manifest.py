"""Iceberg/Delta-style file manifest: per-file column stats, pruned at plan
time so a point/range query opens only the files whose [min, max] envelope
intersects the predicate.

Parquet footer min/max gives ROW-GROUP skipping, but the driver still lists
and opens every file to read its footer — at 100 TB (hundreds of thousands
of files) that listing is the bottleneck. Table formats fix this by storing
file-level stats in a tiny side table (Iceberg manifest files, the Delta
log): one row per data file, pruned with an ordinary filter BEFORE any data
file is touched. This module builds that layer from public Spark
primitives. Combined with plans/zorder.py (which makes every file's
envelope narrow on all clustered columns) a selective predicate on any
clustered column prunes most of the table without a directory-partition
explosion.

The stats scan here recomputes min/max from data with one distributed agg
per file (``input_file_name()`` group); a production writer would collect
the same numbers from the parquet footers it just wrote. The manifest is
written once per commit and is ~10^5 smaller than the data, so reading it
on the driver is not a scale concern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIRNAME = "_manifest"


def build_manifest(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """One row per data file under `path`: (file, row_count, min_<c>,
    max_<c>, nulls_<c> for each stat column). One shuffle, keyed by file —
    i.e. grouped exactly how the scan is already partitioned, so the
    "shuffle" moves only the per-task partial aggregates."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def write_manifest(spark: SparkSession, path: str, cols: list[str]) -> str:
    """Materialize the manifest next to the data (like `_delta_log/` /
    an Iceberg manifest list). Returns the manifest path."""
    mpath = os.path.join(path, MANIFEST_DIRNAME)
    build_manifest(spark, path, cols).coalesce(1).write.mode("overwrite").parquet(mpath)
    return mpath


def prune_files(
    manifest: DataFrame, predicates: dict[str, tuple[object, object]]
) -> list[str]:
    """Files whose stats envelope intersects every predicate range.

    `predicates` maps column -> (lo, hi) inclusive bounds (None = open
    end). A file survives `c in [lo, hi]` iff max_c >= lo and min_c <= hi;
    files where the column is entirely null survive only open-ended
    predicates (SQL comparisons are null-rejecting). Conservative by
    construction: never drops a file that could hold a matching row.
    """
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        has_vals = F.col(f"nulls_{c}") < F.col("row_count")
        rng = F.lit(True)
        if lo is not None:
            rng = rng & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            rng = rng & (F.col(f"min_{c}") <= F.lit(hi))
        cond = cond & has_vals & rng
    return [r["file"] for r in manifest.where(cond).select("file").collect()]


def read_pruned(
    spark: SparkSession,
    path: str,
    predicates: dict[str, tuple[object, object]],
    manifest: DataFrame | None = None,
) -> DataFrame:
    """Scan only the files that can match, then apply the residual range
    filter (file skipping is conservative; the filter is still required
    for exactness — same contract as Iceberg's split planning). Returns an
    empty frame of the right schema when nothing survives."""
    if manifest is None:
        manifest = spark.read.parquet(os.path.join(path, MANIFEST_DIRNAME))
    files = prune_files(manifest, predicates)
    full = spark.read.parquet(path)
    base = spark.read.schema(full.schema).parquet(*files) if files else full.limit(0)
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
    return base.where(cond)
