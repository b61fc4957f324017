"""Streaming as-of enrichment: annotate each arriving left event with the
most recent right event seen for its key — the unbounded twin of
operators/asof.asof_join (trades enriched with the latest quote, frames
with the latest annotation), without Spark's stream-stream join watermark
buffering.

Shape: union the two streams with a side tag (a streaming union is just a
source merge — no shuffle), group by key, and keep ONE right row per key in
applyInPandasWithState state. Each micro-batch is sorted by (event time,
side) with right rows first at a tie (inclusive as-of, matching
asof_join); left rows emit with the latest right at their position.

State is O(#keys), independent of stream length. Correctness across
micro-batches assumes per-key event-time monotonicity BETWEEN batches
(file/log sources replaying in order); within a batch any order is fine.
Fed time-ordered batches, output == batch asof_join row-for-row (asserted
in tests/test_streaming_asof.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructField, StructType


def streaming_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Enrich streaming `left` rows with the latest `right` row per key at
    or before their timestamp. Output: left columns, right payload columns
    with `suffix`, and the matched right timestamp `<ts_col><suffix>`
    (null until a right row has been seen for the key)."""
    l_payload = [c for c in left.columns if c not in {*key_cols, ts_col}]
    r_payload = [c for c in right.columns if c not in {*key_cols, ts_col}]

    lhs = left.select(
        *key_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in r_payload],
    )
    rhs = right.select(
        *key_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        *[F.col(c).alias(f"{c}{suffix}") for c in r_payload],
    )
    u = lhs.unionByName(rhs)

    out_fields = (
        [left.schema[c] for c in key_cols]
        + [StructField(ts_col, left.schema[ts_col].dataType)]
        + [left.schema[c] for c in l_payload]
        + [StructField(f"{c}{suffix}", right.schema[c].dataType) for c in r_payload]
        + [StructField(f"{ts_col}{suffix}", right.schema[ts_col].dataType)]
    )
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]
    state_fields = [StructField("__rts", right.schema[ts_col].dataType)] + [
        StructField(f"{c}{suffix}", right.schema[c].dataType) for c in r_payload
    ]
    state_schema = StructType(state_fields)
    r_out = [f"{c}{suffix}" for c in r_payload]

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = list(state.get) if state.exists else None
        # applyInPandasWithState splits a group into ~10k-row Arrow chunks
        # with no global order; concat them ALL before sorting so the
        # "within a batch any order is fine" contract holds for keys larger
        # than one chunk. State stays O(1); the per-key batch data was
        # already the memory bound.
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["__ts", "__side"], kind="mergesort")
            out_rows = []
            # (not itertuples: leading-underscore names get positionalized)
            for rd in pdf.to_dict("records"):
                if rd["__side"] == 0:
                    last = [rd["__ts"]] + [rd[c] for c in r_out]
                else:
                    rec = {k: rd.get(k) for k in out_cols}
                    rec[ts_col] = rd["__ts"]
                    for kc, kv in zip(key_cols, key):
                        rec[kc] = kv
                    if last is not None:
                        rec[f"{ts_col}{suffix}"] = last[0]
                        for c, v in zip(r_out, last[1:]):
                            rec[c] = v
                    else:
                        rec[f"{ts_col}{suffix}"] = None
                    out_rows.append(rec)
            if out_rows:
                yield pd.DataFrame(out_rows, columns=out_cols)
        if last is not None:
            state.update(tuple(last))

    return u.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
