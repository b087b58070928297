"""Order-sensitive greedy operators (SURVEY §2.5 W3, W4, W7).

These are the reference's sequential algorithms whose results depend on
score-descending processing order with mutation of the candidate set —
not expressible as monotone relational ops (SURVEY §7.4). They run as
Arrow-batched grouped-map functions (`applyInPandas`) keyed by frame:
frames are independent, so parallelism is across frames, and each group
is small (detections of one frame).

Determinism: Spark partitions are unordered, so every greedy loop pins
an explicit total order (score desc, then id asc) before processing —
replicating the reference's stable-sort behavior (detection.py:1246,
tracking.py:1108-1110) with an explicit tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _iou_matrix(boxes: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (l, t, w, h) boxes — vectorized numpy."""
    l, t, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x1, y1, x2, y2 = l, t, l + w, t + h
    area = w * h
    xa = np.maximum(x1[:, None], x1[None, :])
    ya = np.maximum(y1[:, None], y1[None, :])
    xb = np.minimum(x2[:, None], x2[None, :])
    yb = np.minimum(y2[:, None], y2[None, :])
    inter = np.clip(xb - xa, 0, None) * np.clip(yb - ya, 0, None)
    union = area[:, None] + area[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def nms(
    detections: DataFrame,
    iou_threshold: float = 0.45,
    group_cols: tuple[str, ...] = ("sequence", "frame"),
    id_col: str = "obj_id",
) -> DataFrame:
    """Exact greedy non-maximum suppression per frame.

    Replicates reference detection.py:1223-1261: sort by conf desc
    (tie: id asc), repeatedly keep the best and drop every remaining box
    with IoU > threshold against it. Output schema = input schema.
    """
    schema = detections.schema

    def _nms_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["conf", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        boxes = pdf[["bb_left", "bb_top", "bb_width", "bb_height"]].to_numpy(float)
        iou = _iou_matrix(boxes)
        n = len(pdf)
        alive = np.ones(n, dtype=bool)
        keep = []
        for i in range(n):
            if not alive[i]:
                continue
            keep.append(i)
            alive[iou[i] > iou_threshold] = False
            alive[i] = False
        return pdf.iloc[keep]

    return detections.groupBy(*group_cols).applyInPandas(_nms_group, schema=schema)


def remove_nested(
    detections: DataFrame,
    containment_threshold: float = 0.75,
    conf_split: float = 0.5,
    group_cols: tuple[str, ...] = ("sequence", "frame"),
    id_col: str = "obj_id",
) -> DataFrame:
    """Nested-box removal with confidence classes.

    Replicates reference detection.py:1120-1198: when the intersection /
    smaller-box-area ratio ≥ threshold, drop one box per precedence — a
    high-confidence box always beats a low-confidence one; among
    same-class boxes the higher score wins (processing order: score
    desc, id asc).
    """
    schema = detections.schema

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["conf", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        boxes = pdf[["bb_left", "bb_top", "bb_width", "bb_height"]].to_numpy(float)
        conf = pdf["conf"].to_numpy(float)
        area = boxes[:, 2] * boxes[:, 3]
        l, t = boxes[:, 0], boxes[:, 1]
        x2, y2 = l + boxes[:, 2], t + boxes[:, 3]
        n = len(pdf)
        alive = np.ones(n, dtype=bool)
        for i in range(n):  # i = higher precedence (sorted first)
            if not alive[i]:
                continue
            for j in range(i + 1, n):
                if not alive[j]:
                    continue
                xa, ya = max(l[i], l[j]), max(t[i], t[j])
                xb, yb = min(x2[i], x2[j]), min(y2[i], y2[j])
                inter = max(xb - xa, 0.0) * max(yb - ya, 0.0)
                smaller = min(area[i], area[j])
                if smaller <= 0 or inter / smaller < containment_threshold:
                    continue
                hi_i, hi_j = conf[i] >= conf_split, conf[j] >= conf_split
                if hi_i and not hi_j:
                    alive[j] = False
                elif hi_j and not hi_i:
                    alive[i] = False
                else:
                    alive[j] = False  # same class → earlier (higher conf) wins
                if not alive[i]:
                    break
        return pdf.iloc[np.flatnonzero(alive)]

    return detections.groupBy(*group_cols).applyInPandas(_group, schema=schema)


def greedy_assignment(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str,
    group_cols: tuple[str, ...] = ("sequence", "frame"),
) -> DataFrame:
    """Global greedy 1:1 assignment per frame.

    Replicates reference _matching_pure_greedy (tracking.py:1037-1133):
    sort candidate pairs by score desc (tie: left id, right id), assign
    greedily skipping already-used left/right ids.
    """
    schema = pairs.schema

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [score_col, left_col, right_col],
            ascending=[False, True, True],
            kind="mergesort",
        )
        used_l: set = set()
        used_r: set = set()
        keep = []
        for idx, row in enumerate(pdf.itertuples(index=False)):
            lv = getattr(row, left_col)
            rv = getattr(row, right_col)
            if lv in used_l or rv in used_r:
                continue
            used_l.add(lv)
            used_r.add(rv)
            keep.append(idx)
        return pdf.iloc[keep]

    return pairs.groupBy(*group_cols).applyInPandas(_group, schema=schema)
