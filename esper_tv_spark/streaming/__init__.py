from esper_tv_spark.streaming.dedup import streaming_exact_dedup
from esper_tv_spark.streaming.ingest import (
    file_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
    write_with_ledger,
)
from esper_tv_spark.streaming.interval_join import streaming_overlap_join
from esper_tv_spark.streaming.stateful import coalesce_stream, coalesce_stream_timeout

__all__ = [
    "file_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "write_with_ledger",
    "coalesce_stream",
    "coalesce_stream_timeout",
    "streaming_exact_dedup",
    "streaming_overlap_join",
]
