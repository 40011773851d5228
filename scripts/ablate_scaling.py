"""Ablation harness for the segments-stage anti-scaling (VERDICT r2 item 2).

Runs the full index build on the pinned mini-cluster at a given core count
with config knobs from env, prints one JSON line with build wall + per-stage
walls. Parent script interleaves configs/levels.

Usage: python scripts/ablate_scaling.py <cores> [n_docs]
Env knobs: WISE_WAVE_CONCURRENCY (0|1|auto), WISE_SEG_PARTITIONS (int),
           WISE_N_WAVES (int, default 2), WISE_WARM_DOCS (int).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER_CPUS = {2: "4-5", 4: "4-7", 8: "4-11", 16: "4-19"}
EXECUTOR_CORES = {2: 2, 8: 2, 4: 4, 16: 4}


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    n_waves = int(os.environ.get("WISE_N_WAVES", "2"))
    warm_docs = int(os.environ.get("WISE_WARM_DOCS", "100000"))

    from pyspark.sql import functions as F

    from wise_spark.cluster import MiniCluster
    from wise_spark.index import build_index

    corpus_path = os.path.join(tempfile.gettempdir(), f"wise_bench_corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        from wise_spark.data import corpus_df
        from wise_spark.session import get_spark

        spark = get_spark(master="local[16]", app_name="gen", shuffle_partitions=32)
        corpus_df(spark, n_docs, partitions=64).select(
            "doc_id", "url", "text"
        ).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    idx_dir = f"/dev/shm/wise_abl_idx_{cores}"
    warm_dir = f"/dev/shm/wise_abl_warm_{cores}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(warm_dir, ignore_errors=True)
    cluster_dir = os.path.join(tempfile.gettempdir(), f"wise_abl_cluster_{cores}")
    shutil.rmtree(cluster_dir, ignore_errors=True)
    MiniCluster.cleanup_stale()
    with MiniCluster(cores=cores, worker_cpus=WORKER_CPUS[cores],
                     work_dir=cluster_dir, port=7300 + cores,
                     executor_cores=EXECUTOR_CORES[cores],
                     local_dirs=f"/dev/shm/wise_abl_local_{cores}") as mc:
        spark = mc.session(
            executor_cores=EXECUTOR_CORES[cores],
            executor_mem_gb=4,
            shuffle_partitions=2 * cores,
            app_name=f"wise_abl_{cores}",
        )
        docs = spark.read.parquet(corpus_path)
        docs.count()
        if warm_docs:
            build_index(docs.filter(F.col("doc_id") < warm_docs), warm_dir,
                        url_col="url", n_shards=32, n_buckets=32,
                        n_waves=n_waves)
            shutil.rmtree(warm_dir, ignore_errors=True)
        def cpu_stat():
            f = open("/proc/stat").readline().split()
            return int(f[8]), sum(map(int, f[1:]))

        s0, tot0 = cpu_stat()
        t0 = time.time()
        build_index(docs, idx_dir, url_col="url", n_shards=32, n_buckets=32,
                    n_waves=n_waves)
        build_s = time.time() - t0
        s1, tot1 = cpu_stat()
        steal_pct = round(100 * (s1 - s0) / max(1, tot1 - tot0), 2)
        stage_s = {
            f"{r['stage']}:{r['unit']}": round(r["wall_ms"] / 1000, 2)
            for r in spark.read.parquet(os.path.join(idx_dir, "lineage")).collect()
        }
        spark.stop()
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(cluster_dir, ignore_errors=True)
    shutil.rmtree(f"/dev/shm/wise_abl_local_{cores}", ignore_errors=True)
    print(json.dumps({
        "cores": cores, "n_docs": n_docs,
        "conc": os.environ.get("WISE_WAVE_CONCURRENCY", "auto"),
        "p2": os.environ.get("WISE_SEG_PARTITIONS", "auto"),
        "waves": n_waves,
        "build_s": round(build_s, 2),
        "docs_per_sec": round(n_docs / build_s, 1),
        "steal_pct": steal_pct,
        "stage_s": stage_s,
    }), flush=True)


if __name__ == "__main__":
    main()
