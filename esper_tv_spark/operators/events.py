"""Event-sequence analytics over event streams/tables.

The reference's event layer stops at per-interval set algebra (rekall) and
per-user aggregates; product analytics on the same substrate needs ordered
per-entity sequence operators — the classic one is the strict-order funnel
("of the users who signed up, how many later clicked, and of those how many
later purchased?").

Spark-first shape: ONE shuffle.  Events are grouped per entity, sorted
inside the row with `array_sort`, and the stage automaton runs as an
`aggregate` (fold) higher-order function — all JVM-side, whole-stage
codegen, no UDF, no self-join per step.  The classic SQL encoding (k-1
correlated min-joins, one shuffle + join per step) is what the DuckDB
oracle replays; the fold is provably equivalent for strict (>) chaining
because greedy earliest-advance is optimal for monotone funnels.

At 100 TB: the groupBy(entity) shuffle is the whole cost and it is
perfectly partial-aggregatable (collect_list combines map-side); per-entity
event counts bound row size — for entities with unbounded histories, add a
time-window filter before calling (the operator composes with any
pre-filter).  Skewed entities behave like any single hot group (AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Strict-order funnel: per entity, stage i is reached when an event of
    type ``steps[i]`` occurs STRICTLY after the (greedily earliest)
    stage-(i-1) event — and, with ``max_gap_seconds``, no later than that
    many seconds after it (the product-analytics "conversion window",
    applied per step).  Returns one row per step:
    (step 1..k, step_name, users) where users = entities reaching >= step.

    Without a window, greedy-earliest chaining maximizes reach (standard
    exchange argument: any valid chain can be shifted earlier step by
    step), so the fold's answer equals the "exists a strictly increasing
    chain" semantics the per-step min-join SQL computes.  WITH a window the
    semantics are explicitly greedy (the Amplitude/Mixpanel convention:
    anchor at the FIRST qualifying occurrence of each step) — a user who
    misses the window from the earliest anchor but would convert from a
    later one does not count, and the min-join SQL replays exactly that.
    Ties (same timestamp across steps) do NOT advance the funnel — strict
    > — which also makes the result independent of sort-tie order, so no
    tiebreak column is needed.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])

    ev = events.where(F.col(type_col).isin(list(steps)))
    per_entity = ev.groupBy(by).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
        ).alias("evs")
    )

    ts_type = events.schema[ts_col].dataType
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast(ts_type).alias("last")
    )

    def advance(acc, x):
        matches = x["et"] == F.element_at(steps_arr, acc["stage"] + 1)
        in_range = (acc["stage"] == 0) | (x["ts"] > acc["last"])
        if max_gap_seconds is not None:
            in_range = in_range & (
                (acc["stage"] == 0)
                | (x["ts"] <= acc["last"] + F.expr(f"INTERVAL {int(max_gap_seconds)} SECOND"))
            )
        cond = (acc["stage"] < k) & matches & in_range
        return F.when(
            cond,
            F.struct((acc["stage"] + 1).alias("stage"), x["ts"].alias("last")),
        ).otherwise(acc)

    stages = per_entity.select(
        F.aggregate("evs", init, advance)["stage"].alias("stage")
    )
    counts = stages.groupBy("stage").agg(F.count(F.lit(1)).alias("c"))

    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], schema="step INT, step_name STRING"
    )
    # k-row dim x (k+1)-row counts: trivially broadcast, the >= join is the
    # cumulative "reached at least step i" sum
    return (
        steps_df.join(counts, counts["stage"] >= steps_df["step"], "left")
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("users"))
    )


def gap_fill(
    events: DataFrame,
    bucket: str = "1 hour",
    by: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    round_digits: int = 6,
    value_decimals: int = 2,
) -> DataFrame:
    """Dense time-bucket rollup with gap fill + LOCF — the hypertable
    `time_bucket_gapfill` / `locf` shape (TimescaleDB semantics,
    re-expressed relationally).  The reference rolls events up per interval
    but leaves empty buckets ABSENT; downstream charting/feature pipelines
    need a dense, regular series with carried-forward values.

    Semantics: bucket events by ``date_trunc`` to `bucket` granularity, per
    `by` group; build the DENSE global spine [min_bucket, max_bucket] (one
    `sequence` on the global extrema — no per-group spine, so groups align
    for downstream joins); left-join per-(group, bucket) aggregates; absent
    buckets get cnt = 0 and value carried forward from the last non-empty
    bucket (last_value IGNORE NULLS window), NULL before a group's first
    observation.  avg rounds to `round_digits` for cross-engine stability.

    Shape (and why it scales): the aggregate is one partial-aggregated
    groupBy(group, bucket); the spine is built from one 2-row global
    min/max aggregate, cross-joined to the DISTINCT group dims (broadcast —
    dims are small by definition), so the dense frame never shuffles wide;
    the LOCF window partitions by group and orders by bucket — one shuffle
    on the group key.  Buckets-per-series is bounded by the time range, not
    the event count, so the filled frame is O(groups x buckets) regardless
    of input scale.  For month-scale ranges at hour grain that is ~720 rows
    per group; for unbounded retention, window the input first.
    """
    from esper_tv_spark.functions.aggregates import exact_avg

    b = F.date_trunc(_bucket_unit(bucket), F.col(ts_col)).alias("bucket")
    # exact_avg (scaled-bigint sum): a float avg's accumulation order is
    # partition-dependent, and the last ulp diverges across engines —
    # caught by the sf0.1 DuckDB gate on this exact query (1/3600 rows)
    agg = (
        events.groupBy(F.col(by).alias("grp"), b)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.round(exact_avg(value_col, value_decimals), round_digits) + F.lit(0.0)).alias(
                "avg_val"
            ),
        )
    )
    ext = events.select(
        F.date_trunc(_bucket_unit(bucket), F.min(ts_col)).alias("lo"),
        F.date_trunc(_bucket_unit(bucket), F.max(ts_col)).alias("hi"),
    )
    spine = ext.select(
        F.explode(F.expr(f"sequence(lo, hi, interval {bucket})")).alias("bucket")
    )
    dims = events.select(F.col(by).alias("grp")).distinct()
    dense = spine.crossJoin(F.broadcast(dims))

    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        dense.join(agg, ["grp", "bucket"], "left")
        .select(
            F.col("grp").alias(by),
            "bucket",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            F.last("avg_val", ignorenulls=True).over(w).alias("avg_val_locf"),
            F.col("cnt").isNull().alias("filled"),
        )
    )
    return filled


def _bucket_unit(bucket: str) -> str:
    """'1 hour' -> 'hour' for date_trunc; only unit-1 buckets are supported
    by the date_trunc fast path (arbitrary widths would need epoch
    arithmetic — add when a use-case lands)."""
    n, unit = bucket.split()
    if n != "1":
        raise ValueError("gap_fill supports unit-width buckets ('1 hour', '1 day')")
    return unit.rstrip("s")


def cohort_retention(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix — the third classic product-analytics shape
    next to funnels (`funnel`) and sessions (q17): entities are cohorted
    by the period of their FIRST event, and each (cohort, period-offset)
    cell counts the distinct entities still active that many periods
    later.  Cell (c, 0) is the cohort's size.

    Output: (cohort_start timestamp, period_offset long, users long).

    Shape: one groupBy(entity) min for the cohort assignment, one join
    back (broadcast when the entity dim fits, shuffle-hash otherwise —
    both sides are keyed on the entity), one partial-aggregated
    count_distinct on (cohort, offset).  The offset is integer epoch
    arithmetic on date_trunc'd boundaries — exact, engine-portable, no
    calendar functions beyond the truncation itself.  The matrix is
    O(cohorts x offsets) regardless of event count.
    """
    per = {"week": 7 * 86400, "day": 86400}.get(granularity)
    if per is None:
        raise ValueError("granularity must be 'week' or 'day'")
    first = events.groupBy(F.col(by).alias("_e")).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("cohort_start")
    )
    act = events.select(
        F.col(by).alias("_e"), F.date_trunc(granularity, F.col(ts_col)).alias("_b")
    ).join(first, "_e")
    offset = (
        (F.unix_timestamp("_b") - F.unix_timestamp("cohort_start")) / F.lit(per)
    ).cast("long")
    return (
        act.groupBy("cohort_start", offset.alias("period_offset"))
        .agg(F.count_distinct("_e").alias("users"))
    )
