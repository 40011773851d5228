"""Metadata CSV import: validated, reject-counted, searchable.

Mirrors the reference's `metadata.py import` flow
(/root/reference/metadata.py:111-256) Spark-first:

  * CSV with a header row is read by Spark's CSV source (the reference uses
    csv.DictReader with a sniffed dialect, :144-176); all user columns stay
    TEXT exactly as the reference stores them (:216-224).
  * Template column composition: the reserved output columns are composed
    under a prefix (`__metadata_id`, `__key`, `__starttime`, `__stoptime` —
    the reference's WISE_COLNAME_PREFIX scheme, :165-171).
  * `HH:MM:SS(.f)` or plain-seconds time strings convert via `time2sec_col`
    (reference `time2sec`, :171-172) — a JVM-side expression, no UDF.
  * Validation join (reference `get_valid_metadata`, :179-210): a row is
    valid iff its key exists in the doc table (missing keys are rejected and
    counted) and, when a limit column is given, its [start, stop) range is
    sane: start >= 0, start < limit, stop >= start. (The reference's
    condition at :195 has an and/or precedence bug that makes the timestamp
    check nearly unreachable; we implement the documented intent.)
  * Rejects come back as a DataFrame with a `reject_reason` column plus a
    tiny per-reason count relation — the scale-safe analog of the
    reference's driver-side `missing_filename_list` (bounded output, no
    unbounded driver list).

At 100 TB the validation join is a plain equi-join on the key: Catalyst
broadcasts whichever side is small; neither side is collected.

The valid relation is immediately searchable: feed it to
`wise_spark.index.build_index(valid, id_col=..., text_col=<metadata col>)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PREFIX = "__"


def col_or_template(spec: str) -> F.Column:
    """A column spec that contains {name} placeholders composes a derived
    column from the named CSV columns (reference:
    /root/reference/metadata.py:263-268 get_csv_row_col_value, used for
    e.g. filename templates '{dir}/{file}.MP4'); otherwise it is a plain
    column reference."""
    import re

    if "{" in spec and "}" in spec:
        names = re.findall(r"\{(\w+)\}", spec)
        # escape literal '%' BEFORE inserting %s placeholders — format_string
        # is printf-style, so an unescaped '%' in the template literal (e.g.
        # '{dir}/{file}%20v2.MP4') would mis-format or throw
        fmt = re.sub(r"\{\w+\}", "%s", spec.replace("%", "%%"))
        return F.format_string(fmt, *[F.col(n) for n in names])
    return F.col(spec)


def _spec_columns(spec: str) -> list[str]:
    import re

    if "{" in spec and "}" in spec:
        return re.findall(r"\{(\w+)\}", spec)
    return [spec]


def time2sec_col(c) -> F.Column:
    """'HH:MM:SS(.f)' | 'MM:SS' | plain seconds -> double seconds (JVM-side).
    try_cast (not cast): malformed fields become NULL — the import layer
    turns those into 'unparseable_time' rejects instead of an ANSI-mode
    job abort on the first bad row."""
    parts = F.split(c, ":")
    n = F.size(parts)
    h = F.element_at(parts, 1).try_cast("double")
    m = F.element_at(parts, 2).try_cast("double")
    s = F.element_at(parts, 3).try_cast("double")
    return (
        F.when(n == 3, h * 3600 + m * 60 + s)
        .when(n == 2, h * 60 + m)
        .otherwise(c.try_cast("double"))
    )


def import_metadata_csv(
    spark: SparkSession,
    csv_path: str,
    docs: DataFrame,
    key_col: str = "doc_id",
    limit_col: str | None = None,
    col_key: str = "filename",
    col_id: str = "metadata_id",
    col_start: str | None = "starttime",
    col_stop: str | None = "stoptime",
    metadata_cols: list[str] | None = None,
) -> dict:
    """Import a metadata CSV validated against `docs`.

    Returns {'valid': DataFrame, 'rejects': DataFrame, 'reject_counts':
    DataFrame}. `valid` columns: __metadata_id, __key (cast to the doc key
    type), __starttime, __stoptime (when time columns are given) + the
    requested passthrough metadata columns (TEXT).
    """
    metadata_cols = metadata_cols or []
    raw = spark.read.option("header", True).csv(csv_path)
    for spec in (col_key, col_id, *(x for x in (col_start, col_stop) if x)):
        for c in _spec_columns(spec):
            if c not in raw.columns:
                raise ValueError(f"CSV is missing required column {c!r}")
    key_type = dict(docs.dtypes)[key_col]
    sel = [
        col_or_template(col_id).alias(f"{PREFIX}metadata_id"),
        col_or_template(col_key).try_cast(key_type).alias(f"{PREFIX}key"),
    ]
    if col_start:
        sel.append(time2sec_col(col_or_template(col_start)).alias(f"{PREFIX}starttime"))
        sel.append(col_or_template(col_start).alias(f"{PREFIX}src_start"))
    if col_stop:
        sel.append(time2sec_col(col_or_template(col_stop)).alias(f"{PREFIX}stoptime"))
        sel.append(col_or_template(col_stop).alias(f"{PREFIX}src_stop"))
    sel += [F.col(c) for c in metadata_cols]
    meta = raw.select(*sel)

    doc_side = docs.select(
        F.col(key_col).alias(f"{PREFIX}key"),
        F.lit(1).alias(f"{PREFIX}matched"),
        *( [F.col(limit_col).cast("double").alias(f"{PREFIX}limit")] if limit_col else [] ),
    )
    joined = meta.join(doc_side, f"{PREFIX}key", "left")

    reason = F.when(
        F.col(f"{PREFIX}key").isNull() | F.col(f"{PREFIX}matched").isNull(),
        F.lit("missing_key"),
    )
    # a non-null source time that casts to NULL is a REJECT, not a silently
    # valid row with NULL times (the reference raises on unparseable
    # timestamps, /root/reference/metadata.py:277-288)
    for src, parsed in ((f"{PREFIX}src_start", f"{PREFIX}starttime"),
                        (f"{PREFIX}src_stop", f"{PREFIX}stoptime")):
        if (col_start if "start" in src else col_stop):
            reason = reason.when(
                F.col(src).isNotNull() & F.col(parsed).isNull(),
                F.lit("unparseable_time"),
            )
    if limit_col and col_start and col_stop:
        reason = reason.when(
            (F.col(f"{PREFIX}starttime") < 0)
            | (F.col(f"{PREFIX}starttime") >= F.col(f"{PREFIX}limit"))
            | (F.col(f"{PREFIX}stoptime") < F.col(f"{PREFIX}starttime")),
            F.lit("malformed_segment"),
        )
    flagged = joined.withColumn("reject_reason", reason)

    out_cols = [c for c in meta.columns if not c.startswith(f"{PREFIX}src_")]
    valid = flagged.filter(F.col("reject_reason").isNull()).select(*out_cols)
    rejects = flagged.filter(F.col("reject_reason").isNotNull()).select(
        *out_cols, "reject_reason"
    )
    reject_counts = rejects.groupBy("reject_reason").agg(
        F.count(F.lit(1)).alias("n")
    )
    return {"valid": valid, "rejects": rejects, "reject_counts": reject_counts}
