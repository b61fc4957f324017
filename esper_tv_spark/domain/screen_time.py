"""Probability-weighted screen-time analytics — the reference's flagship
workload (the BASELINE.md query family).

get_screen_time_with_spark (/root/reference/app/esper/spark_identity.py:12-85)
computes, for one identity, E[screen time] and Var[screen time] per group
under a Bernoulli model: each 3-second face track counts with its label
probability. The reference deduplicates multiple identity labels per face
with a driver-side dict scan + membership UDF (spark_identity.py:36-50);
here that is a row_number window. The E/Var sums are
functions.aggregates.weighted_sum_var — scaled-int exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esper_tv_spark.functions.aggregates import argmax_per_group, weighted_sum_var


def screen_time(
    face_identities: DataFrame,
    identity_id: int,
    group_col: str,
    prob_col: str = "identity_probability",
    duration_col: str = "duration",
    date_range: tuple[str, str] | None = None,
) -> DataFrame:
    """E/Var of screen time for `identity_id` grouped by `group_col`.

    Matches spark_identity.py:12-85 step for step:
    date filter -> identity filter -> per-face argmax dedup -> weighted agg.
    Returns (group_col, expected_sum, variance_sum) in seconds.
    """
    df = face_identities.where(F.col("identity_id") == identity_id)
    if date_range is not None:
        df = df.where(
            (F.col("time") >= F.lit(date_range[0]).cast("timestamp"))
            & (F.col("time") < F.lit(date_range[1]).cast("timestamp"))
        )
    deduped = argmax_per_group(df, ["face_id"], prob_col, ["face_identity_id"])
    return weighted_sum_var(deduped, [group_col], duration_col, prob_col)
