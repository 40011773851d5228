"""Profile one declared query: run it N times with event logging enabled,
then summarize per-job/per-stage wall + task time from the event log.

Usage: python scripts/profile_query.py <query_name> [repeats]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main():
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    import __spark_entry__ as E
    from wise_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        master="local[32]", app_name=f"profile_{name}",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    spark.range(100_000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long").select(F.sum("id")).collect()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(1).count()
    E._get_index(spark, sf_dir)
    qs = E.queries()
    for i in range(repeats):
        spark.sparkContext.setJobDescription(f"RUN{i}:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"RUN{i}: {time.time()-t0:.3f}s", file=sys.stderr)
    spark.stop()

    # parse the event log
    ev = []
    for root, _dirs, files in os.walk(EVDIR):
        ev.extend(os.path.join(root, f) for f in files
                  if "events" in f and not f.startswith("."))
    ev.sort(key=os.path.getmtime)
    jobs = {}
    stages = {}
    for line in open(ev[-1]):
        try:
            e = json.loads(line)
        except ValueError:
            continue
        et = e.get("Event")
        if et == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "desc": (e.get("Properties") or {}).get(
                    "spark.job.description", ""),
                "t0": e["Submission Time"], "stages": e["Stage IDs"],
            }
        elif et == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["ms"] = (
                    e["Completion Time"] - jobs[e["Job ID"]]["t0"])
        elif et == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "tasks": si["Number of Tasks"],
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
            }
    for jid in sorted(jobs):
        j = jobs[jid]
        if "ms" not in j:
            continue
        print(f"job {jid:3d} {j['ms']:6d}ms  {j['desc'][:60]}")
        for sid in sorted(j["stages"]):
            if sid in stages:
                s = stages[sid]
                print(f"    stage {sid:3d} {s['ms']:6d}ms {s['tasks']:3d}t  {s['name']}")


if __name__ == "__main__":
    main()
