"""Relational operators transplanted from the reference's Python loops.

  * sessionize      — gap-based session merge: the reference's
                      `merge_close_segments` (/root/reference/api/
                      routes.py:523-580) as lag -> gap-flag -> running-sum
                      window (SURVEY.md W1/A4).
  * best_per_group  — argmax row per group (best thumbnail per video,
                      /root/reference/api/routes.py:582-602; W4).
  * ordered_lookup  — rank-preserving id lookup join (the reference's
                      `ORDER BY CASE id ...`, /root/reference/src/
                      repository/__init__.py:42-79; J2/T6): carry an explicit
                      rank column through a broadcast join instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_seconds(ts_col: str):
    """Microsecond-precision epoch seconds as double; NTZ timestamps are
    interpreted as UTC (sessions must match DuckDB's epoch())."""
    return (
        F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / F.lit(1e6)
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Assign session ids: a new session starts when the time since the
    previous event in the same key exceeds gap_seconds.

    Returns the input plus `session_id` (long, dense per key starting 0).
    Scale: one shuffle on key_col; windows run within partitions.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    ts = _epoch_seconds(ts_col)
    prev = F.lag(ts).over(w)
    new_flag = F.when(prev.isNull() | (ts - prev > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new", new_flag).withColumn(
        "session_id", F.sum("_new").over(w) - 1
    ).drop("_new")


def session_stats(
    df: DataFrame, key_col: str, ts_col: str, gap_seconds: float
) -> DataFrame:
    """Per-session aggregates: (key, session_id, n_events, start/end epoch,
    duration_s) — the reference's merged-segment output shape."""
    s = sessionize(df, key_col, ts_col, gap_seconds)
    ts = _epoch_seconds(ts_col)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).cast("long").alias("start_s"),
        F.max(ts).cast("long").alias("end_s"),
        (F.max(ts) - F.min(ts)).cast("long").alias("duration_s"),
    )


def best_per_group(df: DataFrame, key_col: str, order_col: str, tiebreak_col: str) -> DataFrame:
    """Keep the single best row per group (order_col desc, tiebreak asc)."""
    w = Window.partitionBy(key_col).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def ordered_lookup(ids_in_rank_order: list[int], table: DataFrame, id_col: str) -> DataFrame:
    """Fetch rows for ids, preserving the input rank; error if any missing
    (the reference raises on missing ids, repository/__init__.py:60-64)."""
    spark = table.sparkSession
    ranks = spark.createDataFrame(
        [(int(i), r) for r, i in enumerate(ids_in_rank_order)], f"{id_col} long, rank int"
    )
    out = table.join(F.broadcast(ranks), id_col, "right")
    return out.orderBy("rank")
