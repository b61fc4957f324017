"""Distributed sketches: count-min, heavy hitters, and cardinality.

At 100 TB you cannot afford an exact groupBy on an unbounded key domain
just to answer "roughly how often does X occur" or "what are the hot
keys". Sketches bound the state: a count-min sketch is a fixed
(depth x width) grid regardless of key cardinality, mergeable across
partitions by plain cell-wise addition — i.e. exactly a Spark partial
aggregate. Everything here is expression-only and deterministic (md5-based
bucket hashing), so a SQL oracle can reproduce the sketch bit-for-bit —
the estimates are approximate with respect to the TRUE counts, but exact
with respect to the algorithm.

Design notes:
- build_count_min materializes the sketch as (d, w_bucket, cnt) rows —
  depth*width rows total, NOT per-key state. The groupBy shuffles at most
  depth*width distinct cells per partition (map-side combine), which is
  the textbook mergeability argument run through Catalyst.
- cm_estimate joins candidate keys against the sketch: d rows per key,
  min over counters = the classic CM upper-bound estimate.
- heavy_hitters_exact is the verification twin (exact top-k by count)
  used in tests to measure CM overestimation on skewed data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket(col, d: int, width: int):
    """Row-d bucket of a key: first 15 hex chars of md5(d|key) mod width —
    identical arithmetic in DuckDB/Trino (conv/from_hex + mod)."""
    h = F.md5(F.concat(F.lit(f"{d}|"), col.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(width))


def cm_cells(df: DataFrame, key_col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Per-occurrence (d, bucket) cell hits — the pure projection half of
    the sketch. Runs identically on a batch frame or a stream; aggregate it
    yourself (streaming: feed to streaming/rollup.incremental_rollup with a
    count metric for an incrementally-maintained sketch)."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _bucket(F.col(key_col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return df.select(F.inline(rows))


def build_count_min(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of key frequencies: (d, bucket, cnt) rows,
    depth*width cells max. One shuffle bounded by the sketch size, never by
    key cardinality."""
    return (
        cm_cells(df, key_col, depth, width)
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Estimated count per candidate key: min over the key's depth
    counters (the CM upper bound; error <= 2N/width w.p. 1-2^-depth).
    The sketch side is depth*width rows — always broadcastable."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _bucket(F.col(key_col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probes = keys.select(F.col(key_col), F.inline(rows))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def heavy_hitters_exact(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Exact top-k keys by count — the verification twin of the sketch
    path (and the small-data fallback)."""
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(key_col))
        .limit(k)
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch, engine-portable.

    HLL (approx_count_distinct) cannot be oracle-checked — every engine
    implements a different HLL. KMV can: hash each distinct value to a
    uniform in (0,1] via md5 (same arithmetic as the count-min buckets),
    keep the k smallest per group, and estimate |distinct| = (k-1)/h_k
    where h_k is the k-th smallest hash. Groups with fewer than k distinct
    values report their exact count. Deterministic -> the estimate is
    exact with respect to the algorithm and a SQL engine reproduces it
    bit-for-bit.

    Mergeable (the 100 TB property): the k smallest hashes of a UNION are
    the k smallest of the concatenated per-part sketches, so partial
    sketches combine by union + re-truncate — asserted in tests. The
    shuffle carries at most k rows per group, never the distinct set.

    Output: group_cols + (n_kept, est_distinct rounded at 4dp)."""
    gc = group_cols or []
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    hashed = df.select(*gc, F.col(key_col)).distinct().withColumn("__h", h)
    w = Window.partitionBy(*[F.col(c) for c in gc]).orderBy(F.col("__h").asc())
    kept = hashed.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    return (
        kept.groupBy(*gc)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("__h").alias("__hk"))
        .withColumn(
            "est_distinct",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                F.round((F.lit(float(k - 1))) / F.col("__hk"), 4)
            ),
        )
        .drop("__hk")
    )
