"""Display formatters vs the reference's python implementations
(/root/reference/search.py:551-599) — property-checked over ranges."""

from __future__ import annotations

from pyspark.sql import functions as F

from wise_spark.query.display import (
    clamp_str_col,
    format_merged_ranks_col,
    format_timestamp_col,
    to_hhmmss_col,
)


def ref_to_hhmmss(sec):
    hh = int(sec / (60 * 60))
    ds = sec - hh * 60 * 60
    mm = int(ds / 60)
    ds = ds - mm * 60
    ss = int(ds)
    ms = int((ds - ss) * 100)
    return "%02d:%02d:%02d.%02d" % (hh, mm, ss, ms)


def ref_clamp(text, mx):
    return "..." + text[len(text) - mx:] if len(text) > mx else text


def ref_merged_ranks(lst):
    lst = sorted(lst)
    n = len(lst)
    if n > 4:
        return "%d,%d,...,%d,%d (%d)" % (lst[0], lst[1], lst[-2], lst[-1], n)
    return ",".join(str(x) for x in lst)


def test_to_hhmmss_matches_reference(spark):
    secs = [0.0, 1.25, 59.99, 61.5, 3599.01, 3600.0, 86399.55, 90000.125]
    df = spark.createDataFrame([(s,) for s in secs], "sec double")
    got = [r["h"] for r in
           df.select(to_hhmmss_col(F.col("sec")).alias("h")).collect()]
    assert got == [ref_to_hhmmss(s) for s in secs]


def test_clamp_str_matches_reference(spark):
    texts = ["", "short", "x" * 10, "abcdefghijklmnop"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["c"] for r in
           df.select(clamp_str_col(F.col("t"), 10).alias("c")).collect()]
    assert got == [ref_clamp(t, 10) for t in texts]


def test_format_timestamp(spark):
    df = spark.createDataFrame([(12.34, 56.78)], "a double, b double")
    row = df.select(
        format_timestamp_col(F.col("a")).alias("one"),
        format_timestamp_col(F.col("a"), F.col("b")).alias("pair"),
        format_timestamp_col(F.col("a"), human_readable=True).alias("hr"),
    ).collect()[0]
    assert row["one"] == "12.3"
    assert row["pair"] == "12.3 - 56.8"
    assert row["hr"] == ref_to_hhmmss(12.34)


def test_format_merged_ranks_matches_reference(spark):
    cases = [[3], [9, 1], [4, 2, 3, 1], [10, 2, 8, 4, 6], list(range(20, 0, -1))]
    df = spark.createDataFrame([(c,) for c in cases], "r array<long>")
    got = [x["m"] for x in
           df.select(format_merged_ranks_col(F.col("r")).alias("m")).collect()]
    assert got == [ref_merged_ranks(c) for c in cases]
