"""Custom stateful streaming operators (applyInPandasWithState).

The built-in session_window covers the plain sessionize case
(streaming/ingest.session_agg). What it cannot express is rekall coalesce
with *payload semantics* — per-merged-interval row counts, min/max payload
carry-through — i.e. the `coalesce(payload_plus)` idiom
(/root/reference/app/esper/rekall_query.py:217,
commercial_detection_rekall.py:135-138) applied to an unbounded stream.

`coalesce_stream` keeps one open interval per key in state and emits an
interval as soon as a new row starts more than `gap` after it closes. The
state is O(1) per key regardless of stream length; keys (video/user) are
the shuffle axis, exactly like the batch interval library.

Ordering contract: within a micro-batch rows are sorted here; across
batches rows are assumed non-decreasing in `start` per key (pair the
source with a watermark and drop-late policy to enforce it). A late row
that still overlaps the open interval merges correctly; a late row older
than the open interval extends it backwards (start = min) rather than
splitting history — same clamping the batch `coalesce` window applies.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def coalesce_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
    gap: int = 0,
) -> DataFrame:
    """Streaming interval coalesce with n_merged payload, per key.

    Emits CLOSED intervals (superseded by a later-starting row); the open
    interval per key stays in state until a later row closes it. Output:
    (key, start, end, n_merged).
    """
    out_schema = f"{key_col} long, {start_col} long, {end_col} long, n_merged long"
    state_schema = "s long, e long, n long"

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_s, cur_e, n = state.get
        else:
            cur_s = None
            cur_e = n = 0
        closed: list[tuple] = []
        # concat ALL Arrow chunks before sorting: applyInPandasWithState
        # splits a group into ~10k-row chunks with no cross-chunk order, so
        # per-chunk sorts would process large keys out of order
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([start_col, end_col])
            for s, e in zip(pdf[start_col], pdf[end_col]):
                s, e = int(s), int(e)
                if cur_s is None:
                    cur_s, cur_e, n = s, e, 1
                elif s <= cur_e + gap:
                    cur_s = min(cur_s, s)
                    cur_e = max(cur_e, e)
                    n += 1
                else:
                    closed.append((key[0], cur_s, cur_e, n))
                    cur_s, cur_e, n = s, e, 1
        if cur_s is not None:
            state.update((cur_s, cur_e, n))
        if closed:
            yield pd.DataFrame(closed, columns=[key_col, start_col, end_col, "n_merged"])

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def coalesce_stream_timeout(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    gap: int = 0,
    watermark: str = "10 seconds",
) -> DataFrame:
    """coalesce_stream + event-time timeout: open intervals are emitted once
    the watermark passes their close time, not only on supersession.

    `ts_col` must be the event-time TIMESTAMP of the interval START (the
    watermark bound applies to arrivals: once watermark W has passed, no
    future row starts before W, so an open interval with end + gap < W can
    never be merged again and is safe to emit). `start`/`end` stay integer
    epoch-micros like the batch library; `gap` is in micros.

    Stream output therefore equals batch `coalesce` restricted to intervals
    whose close time the watermark has passed — the strongest equivalence an
    unbounded stream can offer (NoTimeout variant only ever emits CLOSED
    intervals, leaving one open per key forever).
    """
    out_schema = f"{key_col} long, {start_col} long, {end_col} long, n_merged long"
    state_schema = "s long, e long, n long"

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed end+gap of the open interval: no future row
            # can merge with it (rows older than the watermark are dropped)
            cur_s, cur_e, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], cur_s, cur_e, n)],
                columns=[key_col, start_col, end_col, "n_merged"],
            )
            return
        if state.exists:
            cur_s, cur_e, n = state.get
        else:
            cur_s = None
            cur_e = n = 0
        closed: list[tuple] = []
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([start_col, end_col])
            for s, e in zip(pdf[start_col], pdf[end_col]):
                s, e = int(s), int(e)
                if cur_s is None:
                    cur_s, cur_e, n = s, e, 1
                elif s <= cur_e + gap:
                    cur_s = min(cur_s, s)
                    cur_e = max(cur_e, e)
                    n += 1
                else:
                    closed.append((key[0], cur_s, cur_e, n))
                    cur_s, cur_e, n = s, e, 1
        if cur_s is not None:
            state.update((cur_s, cur_e, n))
            # fire when the watermark passes the merge horizon; CEIL the
            # micros->ms conversion (flooring could fire up to ~2ms before
            # the watermark truly passes end+gap in micros, splitting an
            # on-time row into a new interval); clamp above the current
            # watermark (a timeout timestamp at or before it is rejected by
            # the state store)
            horizon_ms = -((cur_e + gap) // -1000)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(horizon_ms, wm + 1))
        if closed:
            yield pd.DataFrame(closed, columns=[key_col, start_col, end_col, "n_merged"])

    return stream.withWatermark(ts_col, watermark).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
