"""N-set interval boolean algebra in one shuffle: the coverage sweep.

The reference composes interval set operations pairwise — each rekall
``minus`` / ``set_union`` / ``filter_against`` chain walks the per-video
Python IntervalLists again (commercial_detection_rekall.py:193-213), and our
relational ``intervals.minus`` likewise costs a coalesce + range-join +
window per subtraction.  But every *set-level* boolean combination of N
interval sets (A ∧ ¬B ∧ ¬C, A ∨ B, ...) is answerable from one pass over the
boundary events:

1. tag every interval start/end as a ±1 event for its set,
2. one shuffle partitions events by key; per distinct position, running sums
   give the coverage count of each set,
3. a segment [pos, next_pos) has constant coverage; evaluate the boolean
   expression on the counts and merge adjacent true segments.

The whole pipeline is ONE exchange: the explicit ``repartition(key)`` feeds
the per-position aggregate (HashPartitioning(key) satisfies the
ClusteredDistribution of groupBy(key, pos)), the windows reuse the same
partitioning with a local sort, and the run-merge groupBy keys on
(key, run_id) which key-partitioning also satisfies.  At 100 TB this replaces
J join-shaped subtractions with J·0 joins + 1 shuffle — the classic
event-sweep ("stabbing count") rewrite of interval algebra.

Semantics note: the sweep operates on *sets* — per-interval identity and
payload of the inputs are not preserved (output segments are maximal true
runs).  For identity-preserving subtraction use ``intervals.minus``.  The
boolean ``expr`` receives {name: coverage-count Column} and must be False
when all counts are zero (otherwise the result is unbounded outside the
event horizon; segments after the last event are dropped).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_boolean_sweep(
    sets: Mapping[str, DataFrame],
    key_cols: list[str],
    expr: Callable[[dict[str, Column]], Column],
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Maximal segments (key..., start, end) where ``expr`` over the coverage
    counts of the named interval sets holds.

    ``sets`` maps a name to a DataFrame with ``key_cols + [start, end]``
    columns; ``expr`` maps {name: count Column} to a boolean Column, e.g.::

        interval_boolean_sweep(
            {"video": spans, "black": black, "nc": non_commercial},
            ["video_id"],
            lambda c: (c["video"] > 0) & (c["black"] == 0) & (c["nc"] == 0),
        )

    Zero/negative-length input intervals contribute cancelling events and are
    effectively ignored.
    """
    names = list(sets)
    if not names:
        raise ValueError("interval_boolean_sweep needs at least one set")

    def events_of(name: str, df: DataFrame) -> DataFrame:
        # drop zero/inverted intervals: a (+1 at end, -1 at start) pair from
        # an inverted input would drive the coverage count negative
        ev = df.where(F.col(end) > F.col(start)).select(
            *key_cols,
            F.explode(
                F.array(
                    F.struct(F.col(start).alias("__pos"), F.lit(1).alias("__d")),
                    F.struct(F.col(end).alias("__pos"), F.lit(-1).alias("__d")),
                )
            ).alias("__ev"),
        )
        return ev.select(
            *key_cols,
            F.col("__ev.__pos").alias("__pos"),
            *[
                (F.col("__ev.__d") if n == name else F.lit(0)).alias(f"__d{i}")
                for i, n in enumerate(names)
            ],
        )

    events = reduce(
        lambda x, y: x.unionByName(y),
        [events_of(n, df) for n, df in sets.items()],
    )
    # the ONE shuffle; everything below reuses HashPartitioning(key_cols)
    events = events.repartition(*[F.col(k) for k in key_cols])
    per_pos = events.groupBy(*key_cols, "__pos").agg(
        *[F.sum(f"__d{i}").alias(f"__d{i}") for i in range(len(names))]
    )

    w = Window.partitionBy(*key_cols).orderBy("__pos")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    cur = per_pos
    for i in range(len(names)):
        cur = cur.withColumn(f"__c{i}", F.sum(F.col(f"__d{i}")).over(w_run))
    counts = {n: F.col(f"__c{i}") for i, n in enumerate(names)}
    cur = cur.withColumn("__t", expr(counts).cast("boolean"))
    cur = cur.withColumn("__next", F.lead("__pos").over(w))
    # merge runs of consecutive equal-truth segments: a truth flip starts a
    # new run; run ids survive the filter below because false rows consumed
    # their increments
    prev_t = F.lag("__t").over(w)
    cur = cur.withColumn(
        "__run",
        F.sum(
            F.when(prev_t.isNull() | (prev_t != F.col("__t")), 1).otherwise(0)
        ).over(w_run),
    )
    return (
        cur.where(F.col("__t") & F.col("__next").isNotNull())
        .groupBy(*key_cols, "__run")
        .agg(F.min("__pos").alias(start), F.max("__next").alias(end))
        .drop("__run")
    )


def sweep_minus(
    a: DataFrame,
    b_sets: list[DataFrame],
    key_cols: list[str],
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Set-level A \\ (B1 ∪ B2 ∪ ...) via the sweep: segments covered by A
    and by none of the B sets.  Equivalent to chained ``intervals.minus``
    when per-interval identity of A does not matter (the minus output is
    coalesced into maximal segments)."""
    sets = {"__a": a.select(*key_cols, start, end)}
    for i, b in enumerate(b_sets):
        sets[f"__b{i}"] = b.select(*key_cols, start, end)
    n_b = len(b_sets)

    def expr(c: dict[str, Column]) -> Column:
        cond = c["__a"] > 0
        for i in range(n_b):
            cond = cond & (c[f"__b{i}"] == 0)
        return cond

    return interval_boolean_sweep(sets, key_cols, expr, start, end)
