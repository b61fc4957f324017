from esper_tv_spark.plans.banding import choose_band_width
from esper_tv_spark.plans.introspect import (
    count_shuffles,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "choose_band_width",
    "count_shuffles",
    "has_broadcast_join",
    "physical_plan",
    "pushed_filters",
    "read_schemas",
]
