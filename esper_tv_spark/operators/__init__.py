from esper_tv_spark.operators import dedup, intervals, similarity, text

__all__ = ["dedup", "intervals", "similarity", "text"]
