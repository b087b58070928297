"""Box-geometry column expressions (SURVEY §2.7 X1-X3, X5, X8, X14).

Everything here is a pure Catalyst column expression — whole-stage
codegen applies, no Python in the hot path. Boxes are the MOT
`(left, top, width, height)` quadruple of doubles; corner form
`(x1, y1, x2, y2)` is derived on the fly (reference detection.py:324-331).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def box_corners(left: Column, top: Column, width: Column, height: Column) -> tuple[Column, Column, Column, Column]:
    """`(x1,y1,x2,y2)` corner form from `(l,t,w,h)` (reference detection.py:324-331)."""
    return left, top, left + width, top + height


def box_area(width: Column, height: Column) -> Column:
    return width * height


def iou(
    l1: Column, t1: Column, w1: Column, h1: Column,
    l2: Column, t2: Column, w2: Column, h2: Column,
) -> Column:
    """Intersection-over-union of two `(l,t,w,h)` boxes.

    Matches reference helpers.py:533-569: returns 0.0 for disjoint or
    degenerate (zero-area-union) pairs.
    """
    xa = F.greatest(l1, l2)
    ya = F.greatest(t1, t2)
    xb = F.least(l1 + w1, l2 + w2)
    yb = F.least(t1 + h1, t2 + h2)
    inter = F.greatest(xb - xa, F.lit(0.0)) * F.greatest(yb - ya, F.lit(0.0))
    union = w1 * h1 + w2 * h2 - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def containment_ratio(
    l1: Column, t1: Column, w1: Column, h1: Column,
    l2: Column, t2: Column, w2: Column, h2: Column,
) -> Column:
    """Intersection area / area of the *smaller* box (≠ IoU).

    Reference detection.py:1263-1302 — used by nested-box removal: a
    ratio near 1 means one box is (nearly) contained in the other.
    """
    xa = F.greatest(l1, l2)
    ya = F.greatest(t1, t2)
    xb = F.least(l1 + w1, l2 + w2)
    yb = F.least(t1 + h1, t2 + h2)
    inter = F.greatest(xb - xa, F.lit(0.0)) * F.greatest(yb - ya, F.lit(0.0))
    smaller = F.least(w1 * h1, w2 * h2)
    return F.when(smaller > 0, inter / smaller).otherwise(F.lit(0.0))


def center_distance(
    l1: Column, t1: Column, w1: Column, h1: Column,
    l2: Column, t2: Column, w2: Column, h2: Column,
) -> Column:
    """Euclidean distance between box centers (reference feature_extraction.py:228-252)."""
    dx = (l1 + w1 / 2) - (l2 + w2 / 2)
    dy = (t1 + h1 / 2) - (t2 + h2 / 2)
    return F.sqrt(dx * dx + dy * dy)


def size_similarity(w1: Column, h1: Column, w2: Column, h2: Column) -> Column:
    """`min(areaA, areaB) / max(areaA, areaB)` with 0-guard.

    Reference feature_extraction.py:300-332.
    """
    a1 = w1 * h1
    a2 = w2 * h2
    return F.when(
        F.greatest(a1, a2) > 0, F.least(a1, a2) / F.greatest(a1, a2)
    ).otherwise(F.lit(0.0))


def grid_cell(coord: Column, cell_size: float = 100.0) -> Column:
    """Grid-bucket key `floor(coord / cell)` (reference tracking.py:502-507).

    The derived bucketing column that turns the reference's in-memory
    spatial grid index into a distributed equi-join key.
    """
    return F.floor(coord / F.lit(float(cell_size))).cast("long")
