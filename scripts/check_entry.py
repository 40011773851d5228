"""Driver-mimic: run every __spark_entry__ query on Spark AND its DuckDB
oracle on the same parquet tables; compare row count, sorted column names,
and values (rows sorted column-name-wise, exact equality after the entries'
own rounding). Usage:

    python scripts/check_entry.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from wise_spark.session import get_spark  # noqa: E402


def duck_run(sf_dir: str, sql: str):
    """Return (pandas_df, arrow_schema). The arrow schema is what the driver
    hashes — an uncast DuckDB HUGEINT (decimal128) breaks the hash even when
    values match, so the dtype check below is load-bearing."""
    con = duckdb.connect()
    for t in E.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    tb = con.execute(sql).arrow()
    return tb.to_pandas(), tb.schema


def dtype_errs(name: str, spark_schema, duck_schema) -> list[str]:
    """Flag numeric-kind mismatches between Spark's arrow output and the
    oracle's (int vs decimal vs float); string/binary/list nuances are fine."""
    import pyarrow as pa

    def kind(t: "pa.DataType") -> str:
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_decimal(t):
            return "decimal"
        return "other"

    sp = {f.name: f.type for f in spark_schema}
    du = {f.name: f.type for f in duck_schema}
    out = []
    for c in sorted(set(sp) & set(du)):
        if kind(sp[c]) != kind(du[c]):
            out.append(
                f"{name}.{c}: arrow dtype kind mismatch spark={sp[c]} vs oracle={du[c]}"
                " (driver hash will fail even if values match)"
            )
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (bytes, bytearray))
        ).any():
            # null-safe: inspecting only row 0 missed None-first binary
            # columns (one side normalized, the other not) and bytes(None)
            # crashed the whole run on a bytes-first column with a later None
            df[c] = df[c].map(lambda v: bytes(v) if v is not None else None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"]
    if len(got) != len(want):
        errs.append(f"{name}: rows {len(got)} != {len(want)}")
        return errs
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
            a = gv.astype(float).to_numpy()
            b = wv.astype(float).to_numpy()
            bad = ~(np.isclose(a, b, rtol=0, atol=0, equal_nan=True))
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                errs.append(f"{name}.{c}: {bad.sum()} mismatches, first {a[i]!r} vs {b[i]!r} at row {i}")
        else:
            neq = (gv.astype(str) != wv.astype(str)).to_numpy()
            if neq.any():
                i = int(np.flatnonzero(neq)[0])
                errs.append(f"{name}.{c}: {neq.sum()} mismatches, first {gv.iloc[i]!r} vs {wv.iloc[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs, sqls = E.queries(), E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd/stale name used to filter out EVERY query and exit 0
        # with "all entries match" — a broken entry shipped believed-verified
        print(f"unknown entry name(s): {sorted(unknown)}", file=sys.stderr)
        print(f"known: {sorted(qs)}", file=sys.stderr)
        return 2
    spark = get_spark(master="local[8]", app_name="check_entry", shuffle_partitions=8)
    failures = []
    try:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            try:
                sdf = fn(spark, sf_dir)
                stb = sdf.toArrow()
                got = stb.to_pandas()
            except Exception as ex:  # noqa: BLE001
                failures.append(f"{name}: SPARK ERROR {type(ex).__name__}: {ex}")
                print(f"FAIL  {name} (spark error)", flush=True)
                continue
            if name not in sqls:
                print(f"rows-only  {name}: {len(got)} rows", flush=True)
                continue
            try:
                want, duck_schema = duck_run(sf_dir, sqls[name])
            except Exception as ex:  # noqa: BLE001
                failures.append(f"{name}: DUCKDB ERROR {type(ex).__name__}: {ex}")
                print(f"FAIL  {name} (duckdb error)", flush=True)
                continue
            try:
                errs = compare(name, got, want) + dtype_errs(
                    name, stb.schema, duck_schema)
            except Exception as ex:  # noqa: BLE001 — a compare crash must
                # not abort the run with no failure summary
                errs = [f"{name}: COMPARE ERROR {type(ex).__name__}: {ex}"]
            if errs:
                failures.extend(errs)
                print(f"FAIL  {name}: {errs[0]}", flush=True)
            else:
                print(f"ok    {name}: {len(got)} rows", flush=True)
    finally:
        spark.stop()
    if failures:
        print("\n== FAILURES ==")
        for f in failures:
            print(" -", f)
        return 1
    print("all entries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
