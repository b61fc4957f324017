"""esper_tv_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of scanner-research/esper-tv.

Everything here is idiomatic Spark (DataFrame / Spark SQL / Catalyst /
Structured Streaming): declarative plans, broadcast dimension joins, window
functions for per-key sequential logic, banded range joins for interval
algebra, and Arrow-batched pandas UDFs only where built-in operators cannot
express the semantics.

Layout:
  session      — SparkSession factory tuned for the engine
  sources/     — parquet catalog, CSV/ingest, streaming file sources
  operators/   — interval algebra, dedup, similarity, text operators
  functions/   — aggregate helpers, scalar function library
  plans/       — banding heuristics, plan introspection utilities
  streaming/   — structured-streaming ingest + windowing helpers
"""

from esper_tv_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
