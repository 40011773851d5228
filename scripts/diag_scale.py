"""Event-log diagnosis of the 1 -> 4 executor scaling gap.

Mirrors bench.py's scale_worker (same MiniCluster, pinning, warmup, job)
but enables spark.eventLog and afterwards prints, per stage: wall
(submission -> completion), task count, sum of executor run time, sum of
executor CPU time, GC, deserialize, result-serialization, shuffle write,
fetch wait — plus the gaps BETWEEN stages (driver-side serial time).

Usage: python scripts/diag_scale.py <cores> [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER_CPUS = {1: "4", 2: "4-5", 4: "4-7", 8: "4-11"}


def main() -> None:
    if sys.argv[1] == "--parse-only":
        parse(int(sys.argv[2]), float(sys.argv[3]), float(sys.argv[4]), {})
        return
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    from pyspark.sql import functions as F

    from wise_spark.cluster import MiniCluster
    from wise_spark.index import build_index

    corpus_path = os.path.join(tempfile.gettempdir(), f"wise_bench_corpus_{n_docs}")
    idx_dir = f"/dev/shm/wise_diag_idx_{cores}"
    warm_dir = f"/dev/shm/wise_diag_warm_{cores}"
    evt_dir = f"/tmp/wise_eventlog_{cores}"
    for d in (idx_dir, warm_dir, evt_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(evt_dir, exist_ok=True)
    cluster_dir = os.path.join(tempfile.gettempdir(), f"wise_diag_cluster_{cores}")
    shutil.rmtree(cluster_dir, ignore_errors=True)
    MiniCluster.cleanup_stale()

    with MiniCluster(cores=cores, worker_cpus=WORKER_CPUS[cores],
                     work_dir=cluster_dir, port=7300 + cores,
                     local_dirs=f"/dev/shm/wise_diag_local_{cores}") as mc:
        spark = mc.session(
            executor_cores=1, executor_mem_gb=4,
            shuffle_partitions=2 * cores,
            app_name=f"wise_diag_{cores}",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{evt_dir}",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            },
        )
        docs = spark.read.parquet(corpus_path)
        docs.count()
        warm_docs = int(os.environ.get("WISE_DIAG_WARM_DOCS", "0")) or n_docs
        build_index(docs.filter(F.col("doc_id") < warm_docs), warm_dir,
                    url_col="url", n_shards=32, n_buckets=32, n_waves=1)
        shutil.rmtree(warm_dir, ignore_errors=True)
        mark = time.time()  # events after this are the timed build
        t0 = time.time()
        build_index(docs, idx_dir, url_col="url", n_shards=32, n_buckets=32,
                    n_waves=1)
        build_s = time.time() - t0
        stage_s = {
            f"{r['stage']}:{r['unit']}": round(r["wall_ms"] / 1000, 2)
            for r in spark.read.parquet(os.path.join(idx_dir, "lineage")).collect()
        }
        spark.stop()
    print(f"MARK {mark} BUILD {build_s} STAGES {stage_s}")
    parse(cores, mark, build_s, stage_s)


def parse(cores: int, mark: float, build_s: float, stage_s: dict) -> None:
    evt_dir = f"/tmp/wise_eventlog_{cores}"
    # rolling (v2) event logs are directories of events_* files
    files = []
    for root, _, fns in os.walk(evt_dir):
        for fn in fns:
            if fn.startswith("events_") or fn.startswith("app-"):
                files.append(os.path.join(root, fn))
    stages = {}   # id -> dict
    mark_ms = mark * 1000
    events = []
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    events.append(json.loads(line))
                except ValueError:
                    continue
    # pass 1: stages; pass 2: task metrics (TaskEnd precedes StageCompleted)
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sub = si.get("Submission Time", 0)
            if sub < mark_ms:
                continue
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "tasks": si["Number of Tasks"],
                "sub": sub,
                "done": si.get("Completion Time", 0),
                "run": 0, "cpu": 0, "gc": 0, "deser": 0,
                "rser": 0, "shw": 0, "fetch": 0, "n": 0,
                "input_mb": 0, "out_mb": 0,
                "first_launch": None, "last_finish": 0,
            }
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            if sid not in stages:
                continue
            st = stages[sid]
            ti = e.get("Task Info", {})
            tm = e.get("Task Metrics") or {}
            st["n"] += 1
            st["run"] += tm.get("Executor Run Time", 0)
            st["cpu"] += tm.get("Executor CPU Time", 0) / 1e6
            st["gc"] += tm.get("JVM GC Time", 0)
            st["deser"] += tm.get("Executor Deserialize Time", 0)
            st["rser"] += tm.get("Result Serialization Time", 0)
            swm = tm.get("Shuffle Write Metrics") or {}
            st["shw"] += swm.get("Shuffle Write Time", 0) / 1e6
            srm = tm.get("Shuffle Read Metrics") or {}
            st["fetch"] += srm.get("Fetch Wait Time", 0)
            im = tm.get("Input Metrics") or {}
            st["input_mb"] += im.get("Bytes Read", 0) / 1e6
            om = tm.get("Output Metrics") or {}
            st["out_mb"] += om.get("Bytes Written", 0) / 1e6
            lt = ti.get("Launch Time", 0)
            ft = ti.get("Finish Time", 0)
            if st["first_launch"] is None or lt < st["first_launch"]:
                st["first_launch"] = lt
            st["last_finish"] = max(st["last_finish"], ft)

    # TaskEnd events for late-finishing stages can appear after
    # StageCompleted; the per-task sums above already include them.
    print(f"\n=== cores={cores} build={build_s:.2f}s stages={stage_s} ===")
    print(f"{'stage':<62}{'tasks':>6}{'wall':>8}{'run_sum':>9}{'cpu_sum':>9}"
          f"{'gc':>6}{'deser':>7}{'shw':>7}{'fetch':>7}{'in_mb':>8}{'out_mb':>8}")
    order = sorted(stages.items(), key=lambda kv: kv[1]["sub"])
    prev_done = None
    for sid, st in order:
        wall = (st["done"] - st["sub"]) / 1000
        if prev_done is not None:
            gap = (st["sub"] - prev_done) / 1000
            if gap > 0.05:
                print(f"{'  -- driver gap --':<62}{'':>6}{gap:>8.2f}")
        prev_done = st["done"]
        print(f"{st['name']:<62}{st['tasks']:>6}{wall:>8.2f}"
              f"{st['run'] / 1000:>9.2f}{st['cpu'] / 1000:>9.2f}"
              f"{st['gc'] / 1000:>6.2f}{st['deser'] / 1000:>7.2f}"
              f"{st['shw'] / 1000:>7.2f}{st['fetch'] / 1000:>7.2f}"
              f"{st['input_mb']:>8.1f}{st['out_mb']:>8.1f}")
    total_wall = sum((st["done"] - st["sub"]) / 1000 for _, st in order)
    print(f"sum stage walls: {total_wall:.2f}s vs build {build_s:.2f}s "
          f"(driver/serial residue {build_s - total_wall:.2f}s)")


if __name__ == "__main__":
    main()
