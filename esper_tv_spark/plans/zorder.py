"""Z-order (Morton-curve) multi-column clustering for the lakehouse layout.

A single-column sort gives parquet min/max file skipping on ONE column; a
query that filters on the other column scans everything. Interleaving the
bits of several columns' bucket ranks produces a space-filling-curve key —
range-partitioning and sorting on it yields files whose min/max footprint is
narrow on EVERY participating column, so predicates on any of them prune
files (the Delta/Iceberg OPTIMIZE ZORDER layout, built here from public
Spark primitives: width_bucket + bit shifts + repartitionByRange).

The reference's lakehouse plan partitions canonical shows by
(date, channel) directories (SURVEY §7.10 / reference spark layout); Z-order
complements that below the partition level, where directory keys would
explode into millions of tiny files at 100 TB. All arithmetic is
whole-stage-codegen expressions; the only driver-side work is a tiny
min/max stats job per clustered column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    stats: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton key interleaving `bits` bits of each column's bucket rank.

    Each column is ranked into 2^bits equi-width buckets over its
    [min, max] range (pass precomputed `stats` to skip the stats job —
    at scale these come from table metadata, not a scan). Columns must be
    numeric / date / timestamp (cast dates to days, timestamps to epoch
    seconds before calling).
    """
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    if stats is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        row = df.agg(*aggs).collect()[0]
        stats = {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}

    n_buckets = 1 << bits
    ranks: list[Column] = []
    for c in cols:
        mn, mx = stats[c]
        if mx == mn:
            ranks.append(F.lit(0).cast("long"))
            continue
        # width_bucket returns 1..n+1; clamp into 0..n-1
        r = F.width_bucket(F.col(c).cast("double"), F.lit(float(mn)), F.lit(float(mx)), F.lit(n_buckets)) - F.lit(1)
        ranks.append(F.least(F.greatest(r, F.lit(0)), F.lit(n_buckets - 1)).cast("long"))

    # interleave: output bit (i * n_cols + j) takes bit i of column j's rank
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 32,
    mode: str = "overwrite",
    stats: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write `df` as parquet clustered on the Z-order of `cols`:
    range-partition by the Morton key into `n_files` tasks and sort within
    each, so every output file covers a compact hyper-rectangle and parquet
    min/max stats prune on ANY clustered column."""
    z = zorder_key(df, cols, bits=bits, stats=stats)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
