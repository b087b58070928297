"""Edge-input robustness: empty relations, in-batch disorder, and the
calibration→tracker feed-through.

Empty inputs are the normal state of a 100 TB pipeline's first and last
partitions (a new sequence, a filtered-out day); every algorithmic core
must return an empty, correctly-typed result rather than crash inside
an Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from iceberg_tracking_spark.operators.joins import asof_join
from iceberg_tracking_spark.operators.nms import greedy_assignment, nms
from iceberg_tracking_spark.plans.eval_metrics import clear_identity_metrics
from iceberg_tracking_spark.tracker.batch import TrackerConfig, track_sequences

from .test_tracker import make_sequence

DET_DDL = (
    "sequence string, frame string, obj_id int, bb_left double, bb_top double, "
    "bb_width double, bb_height double, conf double"
)


def test_nms_empty_input(spark):
    empty = spark.createDataFrame([], DET_DDL)
    out = nms(empty, iou_threshold=0.5)
    assert out.count() == 0
    assert "obj_id" in out.columns


def test_tracker_empty_input(spark):
    empty = spark.createDataFrame([], DET_DDL)
    out = track_sequences(empty, TrackerConfig())
    assert out.count() == 0
    assert "track_id" in out.columns


def test_greedy_assignment_empty_input(spark):
    empty = spark.createDataFrame(
        [], "sequence string, frame string, gt_id int, det_id int, score double"
    )
    out = greedy_assignment(
        empty, "gt_id", "det_id", "score", group_cols=("sequence", "frame")
    )
    assert out.count() == 0


def test_eval_metrics_no_matches(spark):
    # GT and tracks on disjoint frames: everything is FN/FP, no crash,
    # ratios well-defined where defined.
    gt = spark.createDataFrame(
        [("s0", 1, 1, 0.0, 0.0, 10.0, 10.0)],
        "sequence string, frame long, gt_id int, l double, t double, w double, h double",
    )
    tr = spark.createDataFrame(
        [("s0", 99, 7, 500.0, 500.0, 10.0, 10.0)],
        "sequence string, frame long, track_id int, l double, t double, w double, h double",
    )
    row = clear_identity_metrics(gt, tr).collect()[0]
    assert row["tp"] == 0 and row["fn"] == 1 and row["fp"] == 1
    assert row["idtp"] == 0 and row["mt"] == 0 and row["ml"] == 1


def test_asof_join_no_prior_rows(spark):
    # Every left row precedes every right row → inner as-of drops all.
    left = spark.createDataFrame([(1, 5)], "k long, t long")
    right = spark.createDataFrame([(1, 10, "x")], "k long, rt long, v string")
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt", right_cols=["v"]
    )
    assert out.count() == 0


def test_tracker_handles_shuffled_input_rows(spark):
    """Row order within the detections DataFrame must not matter: the
    tracker sorts frames internally (frame-ordered loop), so a shuffled
    input yields the identical track set."""
    pdf = make_sequence("s0", n_frames=25)
    ordered = spark.createDataFrame(pdf)
    shuffled = spark.createDataFrame(
        pdf.sample(frac=1.0, random_state=13).reset_index(drop=True)
    )
    a = (
        track_sequences(ordered, TrackerConfig()).orderBy("frame", "track_id")
        .toPandas()
    )
    b = (
        track_sequences(shuffled, TrackerConfig()).orderBy("frame", "track_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_calibration_feeds_tracker_config(spark, sf_dir):
    """M10 feed-through (reference tracking.py:610-613): the calibration
    query's thresholds parameterize the tracker and produce a working
    run — the distance threshold is the observed max GT step, so every
    true continuation is within the search radius."""
    from iceberg_tracking_spark.plans.registry import QUERIES

    cal = QUERIES["q_calibration"].fn(spark, sf_dir).collect()[0]
    assert cal["distance_threshold"] > 0
    assert 0.0 <= cal["size_threshold"] <= 1.0
    cfg = TrackerConfig(
        distance_threshold=float(cal["distance_threshold"]),
        size_threshold=max(0.05, float(cal["size_threshold"]) * 0.5),
    )
    det = spark.createDataFrame(make_sequence("s0", n_frames=20))
    tracks = track_sequences(det, cfg)
    assert tracks.select(F.countDistinct("track_id")).first()[0] == 3
