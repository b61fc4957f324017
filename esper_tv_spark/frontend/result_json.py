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
