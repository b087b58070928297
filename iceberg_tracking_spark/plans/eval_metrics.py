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
    gt: DataFrame,
    tracks: DataFrame,
    iou_threshold: float = 0.5,
    prefilter_cell: float | None = None,
) -> DataFrame:
    """Compute CLEAR + Identity metrics per sequence.

    gt:     (sequence, frame:long, gt_id, l, t, w, h)
    tracks: (sequence, frame:long, track_id, l, t, w, h)
    Returns one row per sequence:
      n_gt, n_det, tp, fn, fp, clr_re, clr_pr, loca,
      idsw, frag, mt, pt, ml, idtp, idf1

    `prefilter_cell`: when the caller can bound box extents below this
    cell size, the per-frame GT×track pairing routes through the
    LOSSLESS grid prefilter (operators/joins.grid_cell_join — centers
    of overlapping boxes are within one cell), replacing the O(n²)
    frame explosion with cell-bounded candidates. None (default) keeps
    the exact all-pairs join for unbounded inputs.
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
    if prefilter_cell is not None:
        from ..operators.joins import grid_cell_join

        g2 = g.withColumn("_gcx", F.col("g_l") + F.col("g_w") / 2).withColumn(
            "_gcy", F.col("g_t") + F.col("g_h") / 2
        )
        t2 = tr.withColumn("_tcx", F.col("t_l") + F.col("t_w") / 2).withColumn(
            "_tcy", F.col("t_t") + F.col("t_h") / 2
        )
        paired = grid_cell_join(
            g2, t2, "_gcx", "_gcy", "_tcx", "_tcy",
            cell_size=float(prefilter_cell),
            extra_on=[("sequence", "sequence"), ("frame", "frame")],
        )
    else:
        paired = g.join(tr, ["sequence", "frame"])
    pairs = paired.withColumn(
        "iou",
        iou(
            F.col("g_l"), F.col("g_t"), F.col("g_w"), F.col("g_h"),
            F.col("t_l"), F.col("t_t"), F.col("t_w"), F.col("t_h"),
        ),
    ).filter(F.col("iou") >= F.lit(iou_threshold))
    # Best track per (sequence, frame, gt): hash-aggregate argmax
    # (score = (iou, -track_id) struct → deterministic tie-break,
    # map-side combine on the pair explosion — no sort window).
    from ..operators.windows import argmax_agg

    matches = argmax_agg(
        pairs,
        ["sequence", "frame", "gt_id"],
        F.struct(F.col("iou"), (-F.col("track_id")).alias("_neg_tr")),
        {"track_id": F.col("track_id"), "iou": F.col("iou")},
    )

    counts = (
        gt.groupBy("sequence").agg(F.count(F.lit(1)).alias("n_gt"))
        .join(
            tracks.groupBy("sequence").agg(F.count(F.lit(1)).alias("n_det")),
            "sequence",
            "outer",
        )
    )

    # The expensive matches relation is consumed ONCE, by a single
    # linear pipeline — no persist/cache to manage (a previous version
    # persisted `matches` for three aggregation branches and leaked the
    # cache in long-lived sessions). The pipeline folds TP/LocA,
    # ID-switch, fragmentation, coverage, and IDTP into run-level
    # algebra (reference eval.py:291-418):
    #
    # 1. One window pass per GT timeline marks run boundaries — a run
    #    breaks on a track change OR a frame gap. Within a run every
    #    row has prev_track == track and frame == prev_frame + 1, so
    #    the reference's row-level lag counts are exactly the boundary
    #    transitions: idsw = adjacent-run pairs with a track change,
    #    frag = adjacent-run pairs with a frame gap.
    # 2. Runs aggregate to (run_len, sum_iou, min/max frame) — the
    #    groupBy reuses the window's (sequence, gt_id) partitioning
    #    (ClusteredDistribution is satisfied by the superset key), so
    #    no extra shuffle.
    # 3. Per-GT and per-sequence rollups derive every metric:
    #    tp = Σ run_len, loca = Σ sum_iou / tp, idtp = Σ max(run_len),
    #    coverage ratio = Σ run_len / n_frames.
    w_gt = Window.partitionBy("sequence", "gt_id").orderBy("frame")
    w_run = w_gt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boundary = (
        F.lag("track_id").over(w_gt).isNull()
        | (F.lag("track_id").over(w_gt) != F.col("track_id"))
        | (F.col("frame") != F.lag("frame").over(w_gt) + 1)
    )
    run_rows = matches.select(
        "sequence", "gt_id", "frame", "track_id", "iou",
        F.sum(boundary.cast("int")).over(w_run).alias("run_id"),
    )
    runs = run_rows.groupBy("sequence", "gt_id", "run_id").agg(
        F.first("track_id").alias("track_id"),  # constant within a run
        F.count(F.lit(1)).alias("run_len"),
        F.sum("iou").alias("sum_iou"),
        F.min("frame").alias("min_frame"),
        F.max("frame").alias("max_frame"),
    )
    w_seq_runs = Window.partitionBy("sequence", "gt_id").orderBy("run_id")
    run_trans = runs.select(
        "sequence", "gt_id", "run_len", "sum_iou",
        F.when(
            F.lag("track_id").over(w_seq_runs).isNotNull()
            & (F.lag("track_id").over(w_seq_runs) != F.col("track_id")),
            1,
        ).otherwise(0).alias("idsw_flag"),
        F.when(
            F.lag("max_frame").over(w_seq_runs).isNotNull()
            & (F.col("min_frame") > F.lag("max_frame").over(w_seq_runs) + 1),
            1,
        ).otherwise(0).alias("frag_flag"),
    )
    per_gt = run_trans.groupBy("sequence", "gt_id").agg(
        F.sum("run_len").alias("n_matched"),
        F.max("run_len").alias("best_run"),
        F.sum("sum_iou").alias("sum_iou"),
        F.sum("idsw_flag").alias("idsw_gt"),
        F.sum("frag_flag").alias("frag_gt"),
    )

    # MT/PT/ML coverage needs every GT, matched or not (reference
    # eval.py:319-349) — left join from the per-GT frame totals.
    gt_frames = gt.groupBy("sequence", "gt_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    per_gt_full = gt_frames.join(
        per_gt, ["sequence", "gt_id"], "left"
    ).withColumn(
        "ratio",
        F.coalesce(F.col("n_matched"), F.lit(0)).cast("double")
        / F.col("n_frames"),
    )
    seq_stats = per_gt_full.groupBy("sequence").agg(
        F.sum("n_matched").alias("tp"),
        F.round(F.sum("sum_iou") / F.sum("n_matched"), 6).alias("loca"),
        F.sum("idsw_gt").alias("idsw"),
        F.sum("frag_gt").alias("frag"),
        F.sum(F.when(F.col("ratio") >= 0.8, 1).otherwise(0)).alias("mt"),
        F.sum(
            F.when((F.col("ratio") >= 0.2) & (F.col("ratio") < 0.8), 1).otherwise(0)
        ).alias("pt"),
        F.sum(F.when(F.col("ratio") < 0.2, 1).otherwise(0)).alias("ml"),
        F.sum("best_run").alias("idtp"),
    )

    out = counts.join(seq_stats, "sequence", "left").na.fill(
        {"tp": 0, "idsw": 0, "frag": 0, "mt": 0, "pt": 0, "ml": 0, "idtp": 0}
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
