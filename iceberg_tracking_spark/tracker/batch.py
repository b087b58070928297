"""Batch multi-object tracker: per-sequence `applyInPandas` (SURVEY §2.9 T1-T7).

The reference's tracking loop (tracking.py:711-854) is a keyed stateful
sequential computation over the ordered frame axis: per frame —
predict → spatial-index candidates → match → update → age/delete →
create → emit. Sequences are independent, so the distributed form is
`detections.groupBy("sequence").applyInPandas(track_one_sequence)`:
parallel across sequences, faithful sequential semantics within one.
The streaming form (transformWithStateInPandas) lives in
streaming/tracker.py and shares this per-frame step.

Determinism: frames processed in sorted order; candidate pairs scored
and greedily matched in (score desc, track_id asc, det_id asc) order —
a pinned total order replacing the reference's stable-sort ties
(SURVEY §7.4 note 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .kalman import KalmanBoxTracker

TRACKS_OUT_SCHEMA = (
    "sequence string, frame string, track_id int, det_id int, "
    "bb_left double, bb_top double, bb_width double, bb_height double, conf double"
)


@dataclass
class TrackerConfig:
    """Mirrors the reference's tracking config defaults
    (tracking.py:126-152)."""

    distance_threshold: float = 100.0
    size_threshold: float = 0.3          # min size similarity gate
    score_threshold: float = 0.3         # min combined score to match
    max_age: int = 3                     # frames a track survives unmatched
    min_hits: int = 1                    # frames before a track is emitted
    min_track_length: int = 2            # post-filter: drop shorter tracks
    min_box_area: float = 100.0          # size gate at track creation
    cell_size: float = 100.0             # spatial grid cell
    radius_tolerance: float = 0.2        # search radius = max(2σ, dist_thr*(1+tol))
    w_distance: float = 0.5
    w_size: float = 0.5
    emit_unmatched_predictions: bool = False


@dataclass
class _Track:
    track_id: int
    kf: KalmanBoxTracker
    time_since_update: int = 0
    hits: int = 0
    history: list = field(default_factory=list)


class SequenceTracker:
    """Sequential per-sequence tracking loop — the applyInPandas payload.

    Pure Python/numpy: no Spark imports, so it is unit-testable without
    a session and reusable by the streaming wrapper.
    """

    def __init__(self, config: TrackerConfig | None = None) -> None:
        self.cfg = config or TrackerConfig()
        self.tracks: list[_Track] = []
        self.next_id = 1

    # -- per-frame step (reference _track_frame, tracking.py:764-854) --
    def step(self, frame: str, dets: np.ndarray, det_ids: np.ndarray, confs: np.ndarray):
        """Process one frame. dets: (n,4) [l,t,w,h]. Returns emitted rows."""
        cfg = self.cfg
        # 1. predict all tracks
        for tr in self.tracks:
            tr.kf.predict()
        # 2. candidate pairs via grid-cell pruning + radius gate
        pairs = []  # (score, track_idx, det_idx)
        if len(self.tracks) and len(dets):
            cx = dets[:, 0] + dets[:, 2] / 2.0
            cy = dets[:, 1] + dets[:, 3] / 2.0
            cell = cfg.cell_size
            grid: dict[tuple[int, int], list[int]] = {}
            for j in range(len(dets)):
                grid.setdefault((int(cx[j] // cell), int(cy[j] // cell)), []).append(j)
            for i, tr in enumerate(self.tracks):
                tx, ty, tw, th = tr.kf.x[0], tr.kf.x[1], tr.kf.x[4], tr.kf.x[5]
                radius = max(
                    tr.kf.position_uncertainty(),
                    cfg.distance_threshold * (1.0 + cfg.radius_tolerance),
                )
                reach = int(np.ceil(radius / cell))
                gx, gy = int(tx // cell), int(ty // cell)
                for ox in range(-reach, reach + 1):
                    for oy in range(-reach, reach + 1):
                        for j in grid.get((gx + ox, gy + oy), ()):
                            dist = float(np.hypot(cx[j] - tx, cy[j] - ty))
                            if dist > radius:
                                continue
                            # gated similarity (reference tracking.py:857-927):
                            # cheap size gate first, distances after
                            area_t = tw * th
                            area_d = dets[j, 2] * dets[j, 3]
                            size_sim = (
                                min(area_t, area_d) / max(area_t, area_d)
                                if max(area_t, area_d) > 0
                                else 0.0
                            )
                            if size_sim < cfg.size_threshold:
                                continue
                            dist_sim = 1.0 - min(dist / cfg.distance_threshold, 1.0)
                            score = cfg.w_distance * dist_sim + cfg.w_size * size_sim
                            if score >= cfg.score_threshold:
                                pairs.append((score, i, j))
        # 3. greedy 1:1 assignment, pinned total order
        pairs.sort(key=lambda p: (-p[0], self.tracks[p[1]].track_id, det_ids[p[2]]))
        used_t: set[int] = set()
        used_d: set[int] = set()
        matches: list[tuple[int, int]] = []
        for score, i, j in pairs:
            if i in used_t or j in used_d:
                continue
            used_t.add(i)
            used_d.add(j)
            matches.append((i, j))
        # 4. update matched
        emitted = []
        for i, j in matches:
            tr = self.tracks[i]
            l, t, w, h = dets[j]
            tr.kf.update(l + w / 2.0, t + h / 2.0, w, h)
            tr.time_since_update = 0
            tr.hits += 1
            if tr.hits >= self.cfg.min_hits:
                emitted.append(
                    (frame, tr.track_id, int(det_ids[j]), l, t, w, h, float(confs[j]))
                )
            tr.history.append(frame)
        # 5. age + delete (reference tracking.py:815-823)
        matched_idx = {i for i, _ in matches}
        for i, tr in enumerate(self.tracks):
            if i not in matched_idx:
                tr.time_since_update += 1
        self.tracks = [
            tr for tr in self.tracks if tr.time_since_update <= self.cfg.max_age
        ]
        # 6. create new tracks from unmatched dets (size gate,
        #    reference tracking.py:825-839; monotone id counter)
        for j in range(len(dets)):
            if j in used_d:
                continue
            l, t, w, h = dets[j]
            if w * h < self.cfg.min_box_area:
                continue
            kf = KalmanBoxTracker(l + w / 2.0, t + h / 2.0, w, h)
            tr = _Track(track_id=self.next_id, kf=kf, hits=1)
            self.next_id += 1
            tr.history.append(frame)
            self.tracks.append(tr)
            if self.cfg.min_hits <= 1:
                emitted.append(
                    (frame, tr.track_id, int(det_ids[j]), l, t, w, h, float(confs[j]))
                )
        return emitted


def frame_order(frames) -> list:
    """Deterministic temporal order for frame ids.

    MOT frame ids are strings that are USUALLY zero-padded numerics but
    may arrive unpadded ('2' vs '10' — reference helpers.py:368-373
    pads on load, raw feeds do not). Plain lexicographic sort would run
    frame '10' before '2' and scramble the Kalman timeline, so digit
    strings order by integer VALUE (a (len, lex) key would still
    misorder padded '000010' vs unpadded '100'), tie-broken by the raw
    spelling so coexisting '2'/'002' keep a total order; non-digit
    stems follow in lexicographic order.
    """
    def k(s):
        s = str(s)
        return (0, int(s), s) if s.isdigit() else (1, 0, s)

    return sorted(set(frames), key=k)


def track_one_sequence_pdf(pdf: pd.DataFrame, cfg: TrackerConfig) -> pd.DataFrame:
    """Run the sequential tracker over one sequence's detections."""
    seq = pdf["sequence"].iloc[0]
    tracker = SequenceTracker(cfg)
    out_rows = []
    for frame in frame_order(pdf["frame"]):
        fd = pdf[pdf["frame"] == frame].sort_values("obj_id")
        dets = fd[["bb_left", "bb_top", "bb_width", "bb_height"]].to_numpy(float)
        emitted = tracker.step(
            frame, dets, fd["obj_id"].to_numpy(), fd["conf"].to_numpy(float)
        )
        out_rows.extend(emitted)
    out = pd.DataFrame(
        out_rows,
        columns=[
            "frame", "track_id", "det_id",
            "bb_left", "bb_top", "bb_width", "bb_height", "conf",
        ],
    )
    out.insert(0, "sequence", seq)
    # post-filter: drop tracks shorter than min_track_length
    # (reference tracking.py:1152-1174)
    if len(out) and cfg.min_track_length > 1:
        counts = out.groupby("track_id")["frame"].transform("count")
        out = out[counts >= cfg.min_track_length]
    return out.astype(
        {
            "track_id": "int32",
            "det_id": "int32",
            "bb_left": "float64",
            "bb_top": "float64",
            "bb_width": "float64",
            "bb_height": "float64",
            "conf": "float64",
        }
    )


def track_sequences(
    detections: DataFrame, config: TrackerConfig | None = None
) -> DataFrame:
    """Distributed tracking: one applyInPandas group per sequence.

    At 100 TB the parallel unit is the sequence (the reference's too —
    its only parallelism was across DataLoader workers); detections
    shuffle once on `sequence`, each group runs the sequential loop.
    Heavily skewed sequence sizes are the known limit — mitigate
    upstream by splitting ultra-long sequences at quiet gaps.
    """
    cfg = config or TrackerConfig()

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return track_one_sequence_pdf(pdf, cfg)

    return detections.groupBy("sequence").applyInPandas(
        _apply, schema=TRACKS_OUT_SCHEMA
    )
