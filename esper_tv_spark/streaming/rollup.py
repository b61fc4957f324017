"""Incrementally-maintained rollup: a materialized groupBy kept current by
a stream, one snapshot version per micro-batch.

The batch way to keep "counts per key over everything ingested so far" is
to rescan the corpus per refresh — a full 100 TB pass for each update. The
streaming way holds the whole aggregate in operator state (complete output
mode), which pins every group in executor memory forever. This sits in
between, the Delta/Iceberg MERGE idiom built from parquet primitives:

- each micro-batch computes its PARTIAL aggregate (map-side combinable,
  sized by the batch, not the corpus),
- merges it with the previous snapshot (union + re-aggregate: one shuffle
  over |keys| + |batch keys| rows),
- writes snapshot `v=<epoch>` and commits it to a ledger; the latest
  COMMITTED version is the readable view.

Replayed epochs (crash/restart) overwrite their own snapshot directory and
re-commit — idempotent, same discipline as ingest.write_with_ledger. Old
versions are retained for time travel; `vacuum_rollup` enforces a
retention window. Aggregates must be mergeable: count/sum/min/max
(avg = sum+count).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _committed(spark: SparkSession, ledger_dir: str) -> list[int]:
    """Committed epochs from the ledger; [] ONLY for a ledger that does not
    exist yet. Any other read failure (FS hiccup, partial file) propagates
    and fails the batch — swallowing it would merge against nothing and
    silently reset the rollup to this batch's partial."""
    try:
        return [
            r[0]
            for r in spark.read.parquet(ledger_dir).select("epoch_id").collect()
        ]
    except AnalysisException as e:
        cond = (
            e.getCondition()
            if hasattr(e, "getCondition")
            else getattr(e, "getErrorClass", lambda: None)()
        )
        if cond == "PATH_NOT_FOUND" or "Path does not exist" in str(e):
            return []
        raise


def read_rollup(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest committed snapshot (empty-schema error if none yet)."""
    versions = _committed(spark, os.path.join(state_dir, "_ledger"))
    if not versions:
        raise FileNotFoundError(f"no committed rollup snapshot under {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"v={max(versions)}"))


def incremental_rollup(
    stream: DataFrame,
    group_cols: list[str],
    metrics: dict[str, tuple[str, str]],
    state_dir: str,
    checkpoint_dir: str,
):
    """writeStream query maintaining groupBy(group_cols) with `metrics` =
    {out_name: (agg, col)}, agg in count/sum/min/max ('count' ignores col).

    Returns the DataStreamWriter (caller .start()s it); read the view back
    with read_rollup."""
    for name, (agg, _) in metrics.items():
        if agg not in _MERGE:
            raise ValueError(f"{name}: agg {agg!r} is not mergeable (use {sorted(_MERGE)})")

    partial_aggs = [
        (
            F.count(F.lit(1)) if agg == "count" else getattr(F, agg)(col)
        ).alias(name)
        for name, (agg, col) in metrics.items()
    ]
    merge_aggs = [_MERGE[agg](name).alias(name) for name, (agg, _) in metrics.items()]
    ledger_dir = os.path.join(state_dir, "_ledger")

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _committed(spark, ledger_dir)
        if epoch_id in committed:
            return
        partial = batch_df.groupBy(*group_cols).agg(*partial_aggs)
        if committed:
            prev = spark.read.parquet(os.path.join(state_dir, f"v={max(committed)}"))
            partial = prev.unionByName(partial).groupBy(*group_cols).agg(*merge_aggs)
        partial.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={epoch_id}"))
        spark.createDataFrame([(epoch_id,)], "epoch_id long").write.mode("append").parquet(
            ledger_dir
        )

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def vacuum_rollup(spark: SparkSession, state_dir: str, keep: int = 3) -> list[int]:
    """Retention for the versioned snapshots: keep the latest `keep`
    COMMITTED versions (time travel window), delete older snapshot
    directories AND their ledger rows — ledger first would break readers
    (read_rollup resolves max(committed)), so directories go first and the
    ledger is compacted last (rewritten via overwrite; a crash in between
    leaves dangling ledger rows pointing at deleted dirs, which the next
    vacuum re-compacts — read_rollup only ever reads the MAX version,
    which is always retained). Returns the versions dropped."""
    import shutil

    ledger_dir = os.path.join(state_dir, "_ledger")
    versions = sorted(_committed(spark, ledger_dir))
    drop = versions[:-keep] if keep > 0 else versions
    if not drop:
        return []
    for v in drop:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)
    kept = [(v,) for v in versions[len(drop):]]
    tmp = ledger_dir + ".compact"
    spark.createDataFrame(kept, "epoch_id long").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(ledger_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    return drop
