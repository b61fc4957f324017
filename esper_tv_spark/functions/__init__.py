from esper_tv_spark.functions.aggregates import (
    argmax_per_group,
    count_distinct_over_column,
    exact_avg,
    exact_sum,
    exact_sum_sql,
    exact_avg_sql,
    percentile_rank,
    sum_distinct_over_column,
    weighted_sum_var,
)

__all__ = [
    "argmax_per_group",
    "count_distinct_over_column",
    "exact_avg",
    "exact_sum",
    "exact_sum_sql",
    "exact_avg_sql",
    "percentile_rank",
    "sum_distinct_over_column",
    "weighted_sum_var",
]
