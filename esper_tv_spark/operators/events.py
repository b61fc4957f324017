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
