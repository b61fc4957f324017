"""Input-stat-driven shuffle sizing.

A static `spark.sql.shuffle.partitions` cannot be right across three
decades of data: the sf100 rehearsal showed the Jaccard-verify shingle
shuffle (~100GB working set) at the session default of 32 partitions is
3GB+/task — a single 128GB host GC-thrashes indefinitely — while 256
partitions (~400MB/task) completes in ~20min. AQE can *coalesce* small
partitions at runtime but can never *split* beyond the initial number, so
the one knob that must be sized from the data is
`spark.sql.adaptive.coalescePartitions.initialPartitionNum`.

`advise_shuffle_partitions` sets it from the INPUT FILE SIZES (an
os.stat walk — no Spark job, same zero-cost stance as the parquet-footer
row counts used for SRP plane sizing) times a caller-supplied blowup
factor for operators whose intermediates outgrow their inputs (shingle
sets ~10x over raw text, plus parquet decompression). Over-advising is
safe by construction: AQE coalesces unused partitions back down, which is
exactly the documented AQE pattern (set initial high, let runtime
shrink). The helper therefore only ever RAISES the number — never below
the session's configured parallelism.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

_INITIAL_KEY = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def input_bytes(paths: list[str] | str) -> int:
    """Total on-disk bytes of the given files/directories (recursive)."""
    if isinstance(paths, str):
        paths = [paths]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def advise_shuffle_partitions(
    spark: SparkSession,
    paths: list[str] | str,
    blowup: float = 3.0,
    target_task_bytes: int = 256 * 1024 * 1024,
    max_partitions: int = 4096,
) -> int:
    """Size AQE's initial shuffle-partition count from input bytes.

    n = clamp(ceil(on_disk_bytes * blowup / target_task_bytes),
              session shuffle.partitions .. max_partitions)

    `blowup` covers decompression plus operator amplification (e.g. ~30
    for shingle-set builds: ~3x parquet decompression x ~10x set-over-text
    growth). Sets `initialPartitionNum` for the session and returns the
    value; AQE's coalescer shrinks any query that doesn't need it."""
    floor_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    need = math.ceil(input_bytes(paths) * blowup / target_task_bytes)
    n = min(max_partitions, max(floor_n, need))
    try:
        prev = int(spark.conf.get(_INITIAL_KEY))
    except Exception:
        prev = 0
    if n > prev:
        spark.conf.set(_INITIAL_KEY, str(n))
    return max(n, prev)
