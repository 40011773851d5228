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


def tolerance_merge(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    rank_col: str,
    score_col: str,
    pts_tolerance: float,
    rank_tolerance: int,
) -> DataFrame:
    """Rank/time-tolerance result merging — the reference's `merge0`
    (/root/reference/search.py:281-363, defaults :717-740): within one key
    (the reference's filename), hits that are close in BOTH timestamp
    (<= pts_tolerance seconds) and retrieval rank (<= rank_tolerance) chain
    into one merged hit spanning [start_s, end_s], keeping the best rank and
    score.

    Output: (key, merge_id, n_hits, start_s, end_s, best_rank, best_score).
    Scale: one shuffle on key_col; both windows run within partitions.

    The window orders by (ts, rank): the rank tiebreak makes the chaining
    deterministic when a key has two hits at the identical timestamp —
    ORDER BY ts alone leaves the adjacent-row rank deltas (and therefore
    the merge groups) an accident of partitioning.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, rank_col)
    ts = _epoch_seconds(ts_col)
    prev_ts = F.lag(ts).over(w)
    prev_rank = F.lag(F.col(rank_col)).over(w)
    new_flag = F.when(
        prev_ts.isNull()
        | (ts - prev_ts > pts_tolerance)
        | (F.abs(F.col(rank_col) - prev_rank) > rank_tolerance),
        1,
    ).otherwise(0)
    g = df.withColumn("_new", new_flag).withColumn(
        "merge_id", F.sum("_new").over(w) - 1
    )
    return g.groupBy(key_col, "merge_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min(ts).alias("start_s"),
        F.max(ts).alias("end_s"),
        F.min(rank_col).alias("best_rank"),
        F.max(score_col).alias("best_score"),
    )


def _interval_buckets(start: str, end: str, bucket_seconds: float):
    """Fixed time buckets an interval covers: floor(start/bs)..floor(end/bs)
    inclusive — the bucketing contract shared by overlap_join and
    overlap_antijoin (one owner: any fix to bucket semantics reaches both)."""
    return F.explode(
        F.sequence(
            F.floor(F.col(start) / bucket_seconds).cast("long"),
            F.floor(F.col(end) / bucket_seconds).cast("long"),
        )
    )


def overlap_antijoin(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    a_id_col: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Interval-overlap NOT-IN: drop rows of `a` whose [a_start, a_end]
    overlaps ANY [b_start, b_end] of `b` under the same key — the reference's
    segment-granular `apply_subtract` (/root/reference/search.py:161-190),
    which removes hits overlapping the NOT-IN result's segments.

    Scale shape: a naive theta-join (t1.start <= t2.end AND t2.start <= t1.end)
    is a per-key cross product. Instead each interval explodes to the fixed
    time buckets it covers (sequence + explode, JVM-side), the join is an
    EQUI-join on (key, bucket) — shuffle-partitionable, AQE-skew-splittable —
    and the exact overlap predicate filters the candidates. Matched a-ids are
    then removed with a left_anti join. Buckets add duplicates, not misses:
    any true overlap shares at least one bucket, so the result is exact.
    """
    bs = float(bucket_seconds)
    ab = a.select(
        F.col(key_col).alias("_k"), F.col(a_id_col).alias("_aid"),
        F.col(a_start).alias("_as"), F.col(a_end).alias("_ae"),
    ).withColumn("_bkt", _interval_buckets("_as", "_ae", bs))
    bb = b.select(
        F.col(key_col).alias("_k"),
        F.col(b_start).alias("_bs"), F.col(b_end).alias("_be"),
    ).withColumn("_bkt", _interval_buckets("_bs", "_be", bs))
    matched = (
        ab.join(bb, ["_k", "_bkt"])
        .where((F.col("_as") <= F.col("_be")) & (F.col("_bs") <= F.col("_ae")))
        .select(F.col("_aid").alias(a_id_col))
        .distinct()
    )
    return a.join(matched, a_id_col, "left_anti")


def overlap_join(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Interval-overlap INNER join: all (a, b) row pairs under the same key
    whose intervals intersect — the reference's AND-merge / eval-overlap
    pairing on (filename, overlapping segment)
    (/root/reference/search.py:393-445 merge1; the evaluation harness
    matches predicted to ground-truth segments the same way).

    Same scale shape as overlap_antijoin: intervals explode to fixed time
    buckets, the join is an EQUI-join on (key, bucket), the exact overlap
    predicate filters candidates, and duplicate bucket matches collapse with
    one distinct. Never a per-key cross product.

    The two sides may share column names (the natural shape: both are
    segment tables with start/end columns) — every b column whose name
    collides with an a column is prefixed `b_` in the output, so the join
    never hits AMBIGUOUS_REFERENCE and both sides' values survive.
    """
    bs = float(bucket_seconds)
    a_cols = set(a.columns)
    bb = b.withColumnRenamed(key_col, "_k")
    b_start_eff, b_end_eff = b_start, b_end
    for c in b.columns:
        if c != key_col and c in a_cols:
            if f"b_{c}" in a_cols or f"b_{c}" in b.columns:
                raise ValueError(
                    f"cannot disambiguate shared column {c!r}: 'b_{c}' "
                    "already exists"
                )
            bb = bb.withColumnRenamed(c, f"b_{c}")
            if c == b_start:
                b_start_eff = f"b_{c}"
            if c == b_end:
                b_end_eff = f"b_{c}"
    ab = a.withColumn("_bkt_a", _interval_buckets(a_start, a_end, bs))
    bb = bb.withColumn("_bkt_b", _interval_buckets(b_start_eff, b_end_eff, bs))
    return (
        ab.join(bb, (F.col(key_col) == F.col("_k")) & (F.col("_bkt_a") == F.col("_bkt_b")))
        .where(
            (F.col(a_start) <= F.col(b_end_eff))
            & (F.col(b_start_eff) <= F.col(a_end))
        )
        .drop("_bkt_a", "_bkt_b", "_k")
        .distinct()
    )


def best_per_group(df: DataFrame, key_col: str, order_col: str, tiebreak_col: str) -> DataFrame:
    """Keep the single best row per group (order_col desc, tiebreak asc)."""
    w = Window.partitionBy(key_col).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def ordered_lookup(
    ids_in_rank_order: list[int], table: DataFrame, id_col: str, strict: bool = False
) -> DataFrame:
    """Fetch rows for ids, preserving the input rank.

    Missing ids yield NULL-filled rows by default; with strict=True the call
    raises KeyError instead (the reference raises on missing ids,
    repository/__init__.py:60-64 — strict mode mirrors that contract; the
    lenient default keeps the operator lazy/plan-only).

    Plan shape: the id list is pushed into the table scan as an isin
    predicate (parquet min/max row-group pruning — the big table is never
    shuffled), the <=len(ids) matching rows get a broadcast hint, and the
    tiny ranks relation LEFT-joins them so missing ids surface as NULL rows.
    (A right-outer join with broadcast(ranks) reads the same but Spark
    cannot broadcast the row-preserving side of an outer join — the hint
    was silently dropped and the whole table went through a SortMergeJoin.)
    """
    spark = table.sparkSession
    from ..session import local_rows_df

    ranks = local_rows_df(
        spark,
        [(int(i), r) for r, i in enumerate(ids_in_rank_order)],
        f"{id_col} long, rank int",
    )
    vals = [int(i) for i in ids_in_rank_order]
    matched = table.filter(F.col(id_col).isin(vals) if vals else F.lit(False))
    matched = matched.withColumn("_present", F.lit(1))
    out = ranks.join(F.broadcast(matched), id_col, "left")
    if strict:
        missing = [r[id_col] for r in out.filter(F.col("_present").isNull()).collect()]
        if missing:
            raise KeyError(f"ids not found in {id_col}: {sorted(missing)}")
    return out.drop("_present").orderBy("rank")
