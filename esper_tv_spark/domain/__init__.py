from esper_tv_spark.domain import builders, composites, fixtures, screen_time

__all__ = ["builders", "composites", "fixtures", "screen_time"]
