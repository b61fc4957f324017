"""SparkSession factory.

The reference wires a standalone cluster by hand with ~0.9x host RAM
(/root/reference/app/esper/spark.py:19-31). We instead centralize one
builder with the settings that matter at scale:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (every pandas UDF / applyInPandas crossing is Arrow-batched)
- UTC session timezone (deterministic date/time semantics vs the oracle)
- shuffle partitions sized from the env (local test default 32; a real
  cluster overrides via spark.sql.shuffle.partitions / AQE advisory size)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Runtime-settable SQL confs every contract query needs regardless of who
# built the SparkSession.  The driver's correctness harness uses a bare
# `SparkSession.builder.getOrCreate()` (none of get_spark's builder confs),
# so each table read re-asserts these.  Verified runtime-settable on a bare
# Spark 4.1.2 session.
RUNTIME_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS); Spark has no nanosecond
    # timestamp type, so read as long nanos and rebuild micros downstream.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB treats naive parquet timestamps as UTC wall-clock; Spark's
    # hour()/date extraction uses the session timezone — pin it to UTC so
    # both engines agree.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Make any session (including a bare driver-built one) contract-safe."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked down on some managed runtime — reads may still work
    return spark


def normalize_ts(df, col: str = "ts"):
    """Normalize an event-time column to microsecond TimestampType (LTZ),
    whatever parquet representation the data generator used:

    - long nanos (TIMESTAMP(NANOS) under nanosAsLong) -> exact integer
      nanos->micros conversion, then timestamp_micros;
    - TIMESTAMP_NTZ (naive micros) -> cast to LTZ, interpreting the
      wall-clock in the pinned UTC session timezone — exactly how DuckDB
      treats a naive parquet timestamp, so oracles agree;
    - TIMESTAMP (already LTZ) -> unchanged.
    """
    from pyspark.sql import functions as F

    t = dict(df.dtypes).get(col)
    if t in ("bigint", "long"):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if t == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def get_spark(
    app_name: str = "esper-tv-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read as long and rebuild micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # broadcast-hinted map-side tables are collected through the
        # driver; the 1g default rejects the legitimate multi-GB lookup
        # tables the scale rehearsals broadcast (vector attach in the SRP
        # index probe) — this is a cap, not an allocation
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_MAX_RESULT_SIZE", "8g"))
        # faulthandler in every Python worker: zero cost until a worker
        # dies, and then the executor log carries the real Python-side
        # traceback instead of "exited unexpectedly (crashed)" — the r9
        # bench tail had exactly that spam with no diagnosis possible
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
