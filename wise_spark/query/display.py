"""Display formatters (JVM-side Column expressions, no UDFs).

Reference parity (SURVEY.md section 2 C2-C4):
  * to_hhmmss_col     — /root/reference/search.py:551-558 to_hhmmss
  * clamp_str_col     — /root/reference/search.py:560-565 clamp_str
  * format_timestamp_col — /root/reference/search.py:567-584 format_timestamp
  * format_merged_ranks_col — /root/reference/search.py:586-599
    format_merged_ranks

Every formatter is a pure Column expression: display formatting of a
billion-row result must stay inside whole-stage codegen, not drop to a
python worker per row.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_hhmmss_col(sec: Column) -> Column:
    """double seconds -> 'HH:MM:SS.cc' (centiseconds, truncating — exactly
    the reference's int() arithmetic, search.py:551-558)."""
    hh = F.floor(sec / 3600).cast("long")
    ds = sec - hh * 3600
    mm = F.floor(ds / 60).cast("long")
    ds = ds - mm * 60
    ss = F.floor(ds).cast("long")
    ms = F.floor((ds - ss) * 100).cast("long")
    return F.format_string("%02d:%02d:%02d.%02d", hh, mm, ss, ms)


def clamp_str_col(text: Column, max_chars: int) -> Column:
    """Keep the LAST max_chars characters, '...'-prefixed when clamped
    (reference search.py:560-565)."""
    return F.when(
        F.length(text) > max_chars,
        F.concat(F.lit("..."), F.substring(text, -max_chars, max_chars)),
    ).otherwise(text)


def format_timestamp_col(
    pts: Column, pts_end: Column | None = None, human_readable: bool = False
) -> Column:
    """One timestamp or a [start, end] pair -> display string (reference
    search.py:567-584: '%.1f' seconds, or hhmmss when human_readable)."""
    def one(c: Column) -> Column:
        return to_hhmmss_col(c) if human_readable else F.format_string("%.1f", c)

    if pts_end is not None:
        return F.when(pts_end.isNotNull(),
                      F.concat(one(pts), F.lit(" - "), one(pts_end))
                      ).otherwise(one(pts))
    return one(pts)


def format_merged_ranks_col(ranks: Column) -> Column:
    """array<long> of merged ranks -> 'a,b,...,y,z (N)' elided display
    (reference search.py:586-599: full CSV up to 4 ranks, else first two +
    last two + count)."""
    s = F.array_sort(ranks)
    n = F.size(s)
    full = F.array_join(F.transform(s, lambda x: x.cast("string")), ",")
    elided = F.format_string(
        "%d,%d,...,%d,%d (%d)",
        F.element_at(s, 1), F.element_at(s, 2),
        F.element_at(s, -2), F.element_at(s, -1), n,
    )
    return F.when(n > 4, elided).otherwise(full)
