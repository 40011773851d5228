"""Round-6 optimization harness — extra benchmarks, NOT the frozen bench.py.

Modes:
  headline  — run the frozen bench.run_headline (same session, same warmup,
              same order, same .count() methodology) and print its map.
              Iteration tool: lets a code change be measured against the
              exact driver methodology without paying the scaling section.
  isolate   — per-query noop-sink timing (guide §1.4): N repeats per query
              in one warmed session, so first-execution costs (plan
              compilation, codegen, corpus build) are separable from
              steady-state compute. Prints per-query [t0, t1, ...].
  plans     — write .explain('formatted') for every declared query to
              plans/r06/<name>_{suffix}.txt.

Usage: python bench_extra.py {headline|isolate|plans} [names...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), WISE_PLAN_SUFFIX (default 'after').
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _env():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return sf_dir, cpus


def _session(sf_dir: str, cpus: int):
    """Same session + warmup + index-prebuild contract as bench.run_headline."""
    import bench
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    spark = bench._local_spark(cpus)
    spark.range(100_000, numPartitions=cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).select(F.sum("id")).collect()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(1).count()
    E._get_index(spark, sf_dir)
    return spark


def run_headline():
    import bench

    sf_dir, cpus = _env()
    t0 = time.time()
    out = bench.run_headline(sf_dir, cpus)
    wall = round(time.time() - t0, 2)
    print(json.dumps({"queries": out, "sum_s": round(sum(out.values()), 2),
                      "wall_s": wall}))


def run_isolate(names: list[str], repeats: int = 3):
    import __spark_entry__ as E

    sf_dir, cpus = _env()
    spark = _session(sf_dir, cpus)
    qs = E.queries()
    names = names or list(qs)
    out: dict[str, list[float]] = {}
    for name in names:
        if name not in qs:
            continue
        times = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"  {name}: {times}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


def run_plans(names: list[str]):
    import __spark_entry__ as E

    sf_dir, cpus = _env()
    suffix = os.environ.get("WISE_PLAN_SUFFIX", "after")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = _session(sf_dir, cpus)
    qs = E.queries()
    names = names or list(qs)
    for name in names:
        if name not in qs:
            continue
        try:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"  wrote {name}_{suffix}.txt", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    rest = sys.argv[2:]
    if mode == "headline":
        run_headline()
    elif mode == "isolate":
        run_isolate(rest)
    elif mode == "plans":
        run_plans(rest)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
