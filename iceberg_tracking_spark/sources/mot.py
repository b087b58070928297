"""MOT-Challenge CSV source/sink (SURVEY §2.1 S1, S2, S11, S12, S14).

The reference parses `frame,id,l,t,w,h,conf,x,y,z` lines one at a time,
skipping malformed rows (reference helpers.py:339-395) and zero-padding
numeric frame ids to six digits (reference helpers.py:368-373). Here the
same semantics are a schema'd CSV scan in PERMISSIVE mode with a
`_corrupt_record` column, plus an `lpad` normalization — fully
distributed and pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MOT_CSV_SCHEMA


def normalize_frame(col: F.Column) -> F.Column:
    """Zero-pad numeric frame ids to width 6; pass strings through.

    Mirrors reference helpers.py:368-373 (`f"{int(frame):06d}"` when the
    id parses as an int, else the raw image stem).
    """
    as_int = col.cast("int")
    return F.when(as_int.isNotNull(), F.format_string("%06d", as_int)).otherwise(col)


def read_mot_csv(
    spark: SparkSession,
    path: str,
    sequence: str | None = None,
    drop_malformed: bool = True,
) -> DataFrame:
    """Read a MOT det/gt/track CSV into the canonical detections shape.

    Malformed rows land in `_corrupt_record` (PERMISSIVE mode) and are
    dropped by default — the reference logs-and-skips them
    (helpers.py:387-394).
    """
    df = (
        spark.read.schema(MOT_CSV_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    if drop_malformed:
        df = df.filter(
            F.col("_corrupt_record").isNull()
            & F.col("obj_id").isNotNull()
            & F.col("bb_width").isNotNull()
        )
    df = df.drop("_corrupt_record").withColumn("frame", normalize_frame(F.col("frame")))
    if sequence is not None:
        df = df.withColumn("sequence", F.lit(sequence))
    return df


def write_mot_csv(df: DataFrame, path: str, sort: bool = True) -> None:
    """Write detections/tracks in MOT format `frame,id,l,t,w,h,conf,1,-1,-1`.

    The reference re-sorts the output file by (id, frame) — note: id
    first, despite its own docstring (helpers.py:330 vs :299-301); we
    replicate the code's behavior. Output is a directory of CSV parts
    (distributed sink); coalesce(1) only for small fixture files.
    """
    id_col = "obj_id" if "obj_id" in df.columns else (
        "track_id" if "track_id" in df.columns else None
    )
    if id_col is None:
        raise ValueError(
            "write_mot_csv needs an 'obj_id' (detections) or 'track_id' "
            f"(tracks) column; got {df.columns}"
        )
    out = df.select(
        "frame",
        F.col(id_col).alias("obj_id"),
        "bb_left",
        "bb_top",
        "bb_width",
        "bb_height",
        "conf",
        F.coalesce(F.col("mot_x"), F.lit(1)).alias("mot_x")
        if "mot_x" in df.columns
        else F.lit(1).alias("mot_x"),
        F.coalesce(F.col("mot_y"), F.lit(-1)).alias("mot_y")
        if "mot_y" in df.columns
        else F.lit(-1).alias("mot_y"),
        F.coalesce(F.col("mot_z"), F.lit(-1)).alias("mot_z")
        if "mot_z" in df.columns
        else F.lit(-1).alias("mot_z"),
    )
    if sort:
        out = out.orderBy(F.col("obj_id"), F.col("frame"))
    out.write.mode("overwrite").csv(path)
