"""Stream-stream interval overlap join — two unbounded interval streams,
overlapping pairs per key, via Spark's NATIVE watermarked stream-stream
join (no custom state code at all).

The batch operator (operators/intervals.interval_join) declares
`a.start < b.end AND b.start < a.end` per key; the streaming twin adds
exactly what Structured Streaming needs to bound state: a watermark on
each side's event-time column and a time-range condition relating the two
event times, from which Spark derives when a buffered row can never match
again and evicts it. This is the Spark-first shape: declare the join,
let the engine manage state — an applyInPandasWithState re-implementation
would re-own eviction for no benefit.

The range bound is implied by the data: if every interval is at most
`max_len` long and two intervals overlap, their START times differ by
less than `max_len`. Rows longer than max_len can silently miss matches —
enforce upstream (split_intervals caps length) or widen max_len.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    start: str = "start",
    end: str = "end",
    max_len: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping (a, b) interval pairs per key across two streams.

    `ts_col` must be the event-time TIMESTAMP of the interval's start on
    BOTH sides (the watermark column); `start`/`end` stay integer
    epoch-micros like the batch library. `max_len` bounds interval length
    (state eviction horizon); `watermark` bounds disorder. Output columns
    are prefixed a_/b_ exactly like the batch interval_join, plus the
    clipped overlap columns of overlap_join.

    State bound: each side buffers only rows within
    watermark + max_len of the stream head — independent of stream length.
    Fed time-ordered batches, output == batch overlap_join row-for-row
    (asserted in tests/test_streaming_interval_join.py).
    """
    pa = a.select([F.col(c).alias(f"a_{c}") for c in a.columns]).withWatermark(
        f"a_{ts_col}", watermark
    )
    pb = b.select([F.col(c).alias(f"b_{c}") for c in b.columns]).withWatermark(
        f"b_{ts_col}", watermark
    )
    cond = None
    for k in key_cols:
        c = F.col(f"a_{k}") == F.col(f"b_{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(f"a_{start}") < F.col(f"b_{end}"))
        & (F.col(f"b_{start}") < F.col(f"a_{end}"))
        # the event-time range condition Spark uses to size/evict state
        & (F.col(f"b_{ts_col}") >= F.col(f"a_{ts_col}") - F.expr(f"INTERVAL {max_len}"))
        & (F.col(f"b_{ts_col}") <= F.col(f"a_{ts_col}") + F.expr(f"INTERVAL {max_len}"))
    )
    j = pa.join(pb, cond, "inner")
    j = j.withColumn(
        "overlap_start", F.greatest(F.col(f"a_{start}"), F.col(f"b_{start}"))
    ).withColumn("overlap_end", F.least(F.col(f"a_{end}"), F.col(f"b_{end}")))
    return j.withColumn("overlap_length", F.col("overlap_end") - F.col("overlap_start"))
