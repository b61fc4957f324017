"""Result shaping: DataFrame -> the widget result-JSON groups.

Mirrors qs_to_result's output contract (/root/reference/app/query/widget.py:
134-307 + views.py:76): {"result": [{"type": "flat"|"contains", "elements":
[...]}], "count": N, "type": kind}. Grouping "contains" collects rows per
(video, start) group the way track results group frames.

Presentation layer only — runs limit() before collect so the driver pull is
bounded (the reference slices querysets the same way, widget.py:159)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def to_result_json(
    df: DataFrame,
    kind: str = "flat",
    group_cols: list[str] | None = None,
    limit: int = 100,
) -> dict:
    limited = df.limit(limit)
    rows = [r.asDict(recursive=True) for r in limited.collect()]
    if group_cols:
        groups: dict = {}
        for r in rows:
            key = tuple(r[c] for c in group_cols)
            groups.setdefault(key, []).append(r)
        result = [
            {"type": "contains", "key": list(k), "elements": v} for k, v in sorted(groups.items())
        ]
    else:
        result = [{"type": "flat", "elements": [r]} for r in rows]
    out = {"result": result, "count": len(rows), "type": kind}
    json.dumps(out, default=str)  # guarantee serializability early
    return out


# --------------------------------------------------------------------------
# per-model-class materializers (widget.py:151-287's dispatch)
# --------------------------------------------------------------------------


def frame_result(df: DataFrame, video_col: str = "video_id", frame_col: str = "frame_no", limit: int = 100, stride: int = 1) -> dict:
    """Frame-class results (widget.py:152-162): one element per frame in
    deterministic (video, number) order, stride-sliced, empty objects list.
    Ordering/limit/stride run in the PLAN (orderBy+limit -> TakeOrdered),
    only `limit` rows reach the driver."""
    from pyspark.sql import functions as F

    rows = (
        df.where((F.col(frame_col) % stride) == 0)
        .orderBy(video_col, frame_col)
        .limit(limit)
        .collect()
    )
    result = [
        {"type": "flat", "elements": [{"video": r[video_col], "min_frame": r[frame_col], "objects": []}]}
        for r in rows
    ]
    out = {"result": result, "count": len(result), "type": "Frame"}
    json.dumps(out, default=str)
    return out


def bbox_result(
    df: DataFrame,
    video_col: str = "video_id",
    frame_col: str = "frame_no",
    bbox_cols: tuple = ("bbox_x1", "bbox_y1", "bbox_x2", "bbox_y2"),
    id_col: str = "id",
    limit: int = 100,
) -> dict:
    """Bbox-attached results (Face/Object classes, widget.py:165-287
    'frame_major' path): group detections per frame, one element per frame
    with its objects list. The frame cut (first `limit` frames in (video,
    number) order) and the per-frame object collection both happen engine-
    side: collect_list over a groupBy, then TakeOrdered — the driver never
    sees ungrouped detections, unlike the reference's two-pass queryset
    loop."""
    from pyspark.sql import functions as F

    obj = F.struct(F.col(id_col).alias("id"), *[F.col(c).alias(c) for c in bbox_cols])
    grouped = (
        df.groupBy(video_col, frame_col)
        .agg(F.sort_array(F.collect_list(obj)).alias("objects"))
        .orderBy(video_col, frame_col)
        .limit(limit)
    )
    rows = [r.asDict(recursive=True) for r in grouped.collect()]
    result = [
        {
            "type": "contains",
            "elements": [
                {"video": r[video_col], "min_frame": r[frame_col], "objects": r["objects"]}
            ],
        }
        for r in rows
    ]
    out = {"result": result, "count": len(result), "type": "Face"}
    json.dumps(out, default=str)
    return out


def track_result(
    df: DataFrame,
    video_col: str = "video_id",
    start_col: str = "start",
    end_col: str = "end",
    payload_cols: list[str] | None = None,
    limit: int = 100,
) -> dict:
    """Track/segment results (widget.py track-group path): one element per
    interval with min_frame/max_frame span and optional side-table payload
    metadata, ordered deterministically."""
    from pyspark.sql import functions as F

    cols = [video_col, start_col, end_col, *(payload_cols or [])]
    rows = (
        df.select(*cols).orderBy(video_col, start_col, end_col).limit(limit).collect()
    )
    result = [
        {
            "type": "contains",
            "elements": [
                {
                    "video": r[video_col],
                    "min_frame": r[start_col],
                    "max_frame": r[end_col],
                    "metadata": {c: r[c] for c in (payload_cols or [])},
                }
            ],
        }
        for r in rows
    ]
    out = {"result": result, "count": len(result), "type": "FaceTrack"}
    json.dumps(out, default=str)
    return out
