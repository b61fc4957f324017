"""Statistical validation operators — the reference's correctness
methodology (SURVEY §5) as engine primitives.

/root/reference/app/esper/validation.py establishes correctness by
comparing ML labels to hand labels:

- face detection P/R via per-frame greedy IoU>0.5 matching
  (validation.py:84-133, IoU at 51-64)
- label confusion matrices on matched pairs (validation.py:136-198)
- speaking-time accuracy via overlap-weighted confusion of auto vs hand
  segments, computed with a driver-side sort-merge sweep
  (validation.py:295-341)

Here: the greedy per-frame matching is the one genuinely sequential step
(cogrouped applyInPandas, parallel across frames); everything downstream —
P/R, confusion, overlap-weighted confusion — is joins + aggregations. The
segment-overlap confusion is a pure range join + sum(clipped length),
replacing the driver sweep entirely.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esper_tv_spark.operators.intervals import overlap_join

BBOX = ["bbox_x1", "bbox_y1", "bbox_x2", "bbox_y2"]


def _iou_py(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def match_detections(
    auto: DataFrame,
    hand: DataFrame,
    key_col: str = "frame_id",
    id_col: str = "id",
    iou_threshold: float = 0.5,
) -> DataFrame:
    """Greedy per-frame IoU matching (validation.py:84-133): pairs are taken
    best-IoU-first until one side is exhausted; only IoU > threshold counts.
    Returns (key, auto_id, hand_id, iou). Cogrouped applyInPandas — the
    greedy choice is order-dependent within a frame, frames parallelize."""

    def match(key, a_pdf: pd.DataFrame, h_pdf: pd.DataFrame) -> pd.DataFrame:
        pairs = []
        for _, ar in a_pdf.iterrows():
            for _, hr in h_pdf.iterrows():
                iou = _iou_py(
                    [ar[c] for c in BBOX], [hr[c] for c in BBOX]
                )
                if iou > iou_threshold:
                    pairs.append((iou, ar[id_col], hr[id_col]))
        pairs.sort(key=lambda p: (-p[0], p[1], p[2]))
        used_a, used_h, out = set(), set(), []
        for iou, aid, hid in pairs:
            if aid in used_a or hid in used_h:
                continue
            used_a.add(aid)
            used_h.add(hid)
            out.append((key[0], aid, hid, iou))
        return pd.DataFrame(out, columns=[key_col, "auto_id", "hand_id", "iou"])

    return (
        auto.groupBy(key_col)
        .cogroup(hand.groupBy(key_col))
        .applyInPandas(match, schema=f"{key_col} long, auto_id long, hand_id long, iou double")
    )


def precision_recall(auto: DataFrame, hand: DataFrame, matches: DataFrame) -> dict:
    """P/R from a match table: precision = matched/|auto|,
    recall = matched/|hand| (validation.py:120-133)."""
    n_match = matches.count()
    n_auto = auto.count()
    n_hand = hand.count()
    return {
        "n_matched": n_match,
        "n_auto": n_auto,
        "n_hand": n_hand,
        "precision": n_match / n_auto if n_auto else 0.0,
        "recall": n_match / n_hand if n_hand else 0.0,
    }


def label_confusion(
    matches: DataFrame,
    auto_labels: DataFrame,
    hand_labels: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Confusion counts over matched pairs (validation.py:136-198):
    (auto_label, hand_label, n)."""
    a = auto_labels.select(F.col(id_col).alias("auto_id"), F.col(label_col).alias("auto_label"))
    h = hand_labels.select(F.col(id_col).alias("hand_id"), F.col(label_col).alias("hand_label"))
    return (
        matches.join(a, "auto_id")
        .join(h, "hand_id")
        .groupBy("auto_label", "hand_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def segment_overlap_confusion(
    auto_segments: DataFrame,
    hand_segments: DataFrame,
    key_cols: list[str],
    label_col: str = "label",
) -> DataFrame:
    """Overlap-weighted confusion of labeled time segments
    (validation.py:295-341's sort-merge sweep, fully relational): for every
    (auto_label, hand_label), the total time auto spends overlapping hand.
    Inputs: (key..., start, end, label)."""
    a = auto_segments.withColumnRenamed(label_col, "auto_label")
    h = hand_segments.withColumnRenamed(label_col, "hand_label")
    j = overlap_join(a, h, key_cols, clip=False)
    return (
        j.groupBy(F.col("a_auto_label").alias("auto_label"), F.col("b_hand_label").alias("hand_label"))
        .agg(F.sum("overlap_length").alias("overlap_total"))
    )
