"""Validation operators vs hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from esper_tv_spark.domain import validation as val


@pytest.fixture(scope="module")
def detections(spark):
    # frame 1: auto a1 matches hand h1 (same box), a2 matches nothing;
    # frame 2: a3 and a4 both overlap h2, a3 has higher IoU -> greedy picks a3
    auto = spark.createDataFrame(
        [
            (1, 1, 0.1, 0.1, 0.3, 0.3),
            (2, 1, 0.6, 0.6, 0.8, 0.8),
            (3, 2, 0.1, 0.1, 0.3, 0.3),
            (4, 2, 0.12, 0.12, 0.32, 0.32),
        ],
        "id long, frame_id long, bbox_x1 double, bbox_y1 double, bbox_x2 double, bbox_y2 double",
    )
    hand = spark.createDataFrame(
        [
            (10, 1, 0.1, 0.1, 0.3, 0.3),
            (11, 2, 0.1, 0.1, 0.3, 0.3),
        ],
        "id long, frame_id long, bbox_x1 double, bbox_y1 double, bbox_x2 double, bbox_y2 double",
    )
    return auto, hand


def test_greedy_iou_matching(spark, detections):
    auto, hand = detections
    m = val.match_detections(auto, hand)
    rows = {(r["auto_id"], r["hand_id"]): r["iou"] for r in m.collect()}
    assert set(rows) == {(1, 10), (3, 11)}
    assert rows[(1, 10)] == pytest.approx(1.0)
    pr = val.precision_recall(auto, hand, m)
    assert pr["precision"] == pytest.approx(2 / 4)
    assert pr["recall"] == pytest.approx(1.0)


def test_label_confusion(spark, detections):
    auto, hand = detections
    m = val.match_detections(auto, hand)
    auto_labels = spark.createDataFrame([(1, "M"), (3, "F")], "id long, label string")
    hand_labels = spark.createDataFrame([(10, "M"), (11, "M")], "id long, label string")
    cm = {(r["auto_label"], r["hand_label"]): r["n"] for r in val.label_confusion(m, auto_labels, hand_labels).collect()}
    assert cm == {("M", "M"): 1, ("F", "M"): 1}


def test_segment_overlap_confusion(spark):
    auto = spark.createDataFrame(
        [(1, 0, 10, "sp1"), (1, 10, 20, "sp2")], "video_id long, start long, end long, label string"
    )
    hand = spark.createDataFrame(
        [(1, 0, 12, "sp1"), (1, 12, 20, "sp2")], "video_id long, start long, end long, label string"
    )
    got = {
        (r["auto_label"], r["hand_label"]): r["overlap_total"]
        for r in val.segment_overlap_confusion(auto, hand, ["video_id"]).collect()
    }
    assert got == {("sp1", "sp1"): 10, ("sp2", "sp1"): 2, ("sp2", "sp2"): 8}
