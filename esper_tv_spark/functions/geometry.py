"""Normalized-bbox geometry (resolution-independent spatial predicates).

Reference: bbox pattern with x1/x2/y1/y2 normalized to [0,1]
(/root/reference/app/query/base_models.py:219-237), IoU matching
(validation.py:51-64), "same row" / frame-side predicates
(panels_rekall.py:41-53, other_queries.py:514-553). All plain column
arithmetic — fully codegen'd, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def height(y1: Column, y2: Column) -> Column:
    return y2 - y1


def width(x1: Column, x2: Column) -> Column:
    return x2 - x1


def area(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    return (x2 - x1) * (y2 - y1)


def midpoint_x(x1: Column, x2: Column) -> Column:
    return (x1 + x2) / F.lit(2.0)


def iou(
    ax1: Column, ay1: Column, ax2: Column, ay2: Column,
    bx1: Column, by1: Column, bx2: Column, by2: Column,
) -> Column:
    """Intersection-over-union (validation.py:51-64 uses IoU>0.5 matching)."""
    ix = F.greatest(F.lit(0.0), F.least(ax2, bx2) - F.greatest(ax1, bx1))
    iy = F.greatest(F.lit(0.0), F.least(ay2, by2) - F.greatest(ay1, by1))
    inter = ix * iy
    union = area(ax1, ay1, ax2, ay2) + area(bx1, by1, bx2, by2) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def same_row(ay1: Column, by1: Column, eps: float = 0.05) -> Column:
    """|y1_a - y1_b| < eps (panels_rekall.py:41-53)."""
    return F.abs(ay1 - by1) < F.lit(eps)


def left_of(ax2: Column, bx1: Column) -> Column:
    return ax2 <= bx1


def on_left_half(x2: Column) -> Column:
    """Frame-side test, e.g. x2 < 0.5 (other_queries.py:514-553)."""
    return x2 < F.lit(0.5)
