"""CLEAR + Identity tracking metrics as one DataFrame job (SURVEY §3.3,
§7.2 minimum slice).

Re-expresses the reference's eval pipeline (eval.py:117-508) as a pure
relational program: IoU theta-join + per-GT argmax (J2/X1) → conditional
counts (A8) → lag windows for ID-switch/fragmentation (W8) →
gaps-and-islands for IDTP (A12) → coverage buckets (A9). Zero UDFs,
zero state — every step is Catalyst-native and shuffle-bounded by
(sequence, frame) and (sequence, gt_id) keys.

Reference quirks preserved (SURVEY §7.4 note 3): matching is per-GT
argmax, so one track row may match several GTs in a frame; IDTP is the
longest *contiguous* single-track segment per GT trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import iou


def clear_identity_metrics(
    gt: DataFrame, tracks: DataFrame, iou_threshold: float = 0.5
) -> DataFrame:
    """Compute CLEAR + Identity metrics per sequence.

    gt:     (sequence, frame:long, gt_id, l, t, w, h)
    tracks: (sequence, frame:long, track_id, l, t, w, h)
    Returns one row per sequence:
      n_gt, n_det, tp, fn, fp, clr_re, clr_pr, loca,
      idsw, frag, mt, pt, ml, idtp, idf1
    """
    g = gt.select(
        "sequence", "frame", "gt_id",
        F.col("l").alias("g_l"), F.col("t").alias("g_t"),
        F.col("w").alias("g_w"), F.col("h").alias("g_h"),
    )
    tr = tracks.select(
        "sequence", "frame", "track_id",
        F.col("l").alias("t_l"), F.col("t").alias("t_t"),
        F.col("w").alias("t_w"), F.col("h").alias("t_h"),
    )
    pairs = g.join(tr, ["sequence", "frame"]).withColumn(
        "iou",
        iou(
            F.col("g_l"), F.col("g_t"), F.col("g_w"), F.col("g_h"),
            F.col("t_l"), F.col("t_t"), F.col("t_w"), F.col("t_h"),
        ),
    ).filter(F.col("iou") >= F.lit(iou_threshold))
    # Best track per (sequence, frame, gt): hash-aggregate argmax
    # (score = (iou, -track_id) struct → deterministic tie-break,
    # map-side combine on the pair explosion — no sort window).
    # The matches relation feeds THREE independent aggregation branches
    # (match/switch stats, coverage, islands). Without materialization
    # Catalyst would recompute the IoU join + argmax once per branch —
    # persist it (tiny: one row per matched GT per frame). The cache is
    # intentionally NOT unpersisted here: the result DataFrame is lazy
    # and the branches re-execute on every downstream action. Long-lived
    # sessions calling this repeatedly should unpersist via
    # spark.catalog.clearCache() between runs; Spark's LRU handles the
    # rest.
    from ..operators.windows import argmax_agg

    matches = argmax_agg(
        pairs,
        ["sequence", "frame", "gt_id"],
        F.struct(F.col("iou"), (-F.col("track_id")).alias("_neg_tr")),
        {"track_id": F.col("track_id"), "iou": F.col("iou")},
    ).persist()

    counts = (
        gt.groupBy("sequence").agg(F.count(F.lit(1)).alias("n_gt"))
        .join(
            tracks.groupBy("sequence").agg(F.count(F.lit(1)).alias("n_det")),
            "sequence",
            "outer",
        )
    )

    # TP/LocA + ID switches + fragmentation in ONE pass: lag over each
    # GT's matched timeline (reference eval.py:291-316), then a single
    # per-sequence aggregate.
    w_gt = Window.partitionBy("sequence", "gt_id").orderBy("frame")
    lagged = matches.select(
        "sequence", "gt_id", "frame", "track_id", "iou",
        F.lag("track_id").over(w_gt).alias("prev_track"),
        F.lag("frame").over(w_gt).alias("prev_frame"),
    )
    match_stats = lagged.groupBy("sequence").agg(
        F.count(F.lit(1)).alias("tp"),
        F.round(F.avg("iou"), 6).alias("loca"),
        F.sum(
            F.when(
                F.col("prev_track").isNotNull()
                & (F.col("prev_track") != F.col("track_id")),
                1,
            ).otherwise(0)
        ).alias("idsw"),
        F.sum(
            F.when(
                F.col("prev_frame").isNotNull()
                & (F.col("frame") > F.col("prev_frame") + 1),
                1,
            ).otherwise(0)
        ).alias("frag"),
    )

    # MT/PT/ML coverage buckets (reference eval.py:319-349).
    gt_frames = gt.groupBy("sequence", "gt_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    matched_frames = matches.groupBy("sequence", "gt_id").agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    coverage = (
        gt_frames.join(matched_frames, ["sequence", "gt_id"], "left")
        .withColumn(
            "ratio",
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("double")
            / F.col("n_frames"),
        )
    )
    cov_stats = coverage.groupBy("sequence").agg(
        F.sum(F.when(F.col("ratio") >= 0.8, 1).otherwise(0)).alias("mt"),
        F.sum(
            F.when((F.col("ratio") >= 0.2) & (F.col("ratio") < 0.8), 1).otherwise(0)
        ).alias("pt"),
        F.sum(F.when(F.col("ratio") < 0.2, 1).otherwise(0)).alias("ml"),
    )

    # IDTP: per GT, longest contiguous run matched to one track
    # (gaps-and-islands; reference eval.py:355-418). A run breaks on a
    # frame gap OR a track change — dense-rank by frame minus
    # row_number within (gt, track) is gap-sensitive via frame arithmetic.
    w_tr = Window.partitionBy("sequence", "gt_id", "track_id").orderBy("frame")
    runs = (
        matches.withColumn(
            "grp", F.col("frame") - F.row_number().over(w_tr)
        )
        .groupBy("sequence", "gt_id", "track_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    idtp_per_gt = runs.groupBy("sequence", "gt_id").agg(
        F.max("run_len").alias("best_run")
    )
    idtp_stats = idtp_per_gt.groupBy("sequence").agg(
        F.sum("best_run").alias("idtp")
    )

    out = (
        counts.join(match_stats, "sequence", "left")
        .join(cov_stats, "sequence", "left")
        .join(idtp_stats, "sequence", "left")
        .na.fill(
            {"tp": 0, "idsw": 0, "frag": 0, "mt": 0, "pt": 0, "ml": 0, "idtp": 0}
        )
    )
    return out.select(
        "sequence",
        "n_gt",
        "n_det",
        "tp",
        (F.col("n_gt") - F.col("tp")).alias("fn"),
        (F.col("n_det") - F.col("tp")).alias("fp"),
        F.round(F.col("tp").cast("double") / F.col("n_gt"), 6).alias("clr_re"),
        F.round(F.col("tp").cast("double") / F.col("n_det"), 6).alias("clr_pr"),
        "loca",
        "idsw",
        "frag",
        "mt",
        "pt",
        "ml",
        "idtp",
        F.round(
            2.0 * F.col("idtp") / (F.col("n_gt") + F.col("n_det")), 6
        ).alias("idf1"),
    )
