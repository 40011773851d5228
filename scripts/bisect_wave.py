"""Bisect one segments wave: scan+pack vs pack+shuffle+merge+write, at a
given core count on the pinned mini-cluster. Prints one JSON line.

Usage: python scripts/bisect_wave.py <cores> [n_docs]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER_CPUS = {2: "4-5", 8: "4-11"}


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    from pyspark.sql import functions as F

    from wise_spark.cluster import MiniCluster
    from wise_spark.index.build import (
        PARTIAL_SCHEMA,
        SEGMENT_SCHEMA,
        _merge_partition_fn,
        _pack_partition_fn,
    )

    corpus_path = os.path.join(tempfile.gettempdir(), f"wise_bench_corpus_{n_docs}")
    idx_dir = f"/dev/shm/wise_bisect_{cores}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    for f in glob.glob("/tmp/pack_prof_*"):
        os.remove(f)
    wd = os.path.join(tempfile.gettempdir(), f"wise_bisect_cluster_{cores}")
    shutil.rmtree(wd, ignore_errors=True)
    MiniCluster.cleanup_stale()
    out: dict = {"cores": cores}
    with MiniCluster(cores=cores, worker_cpus=WORKER_CPUS[cores],
                     work_dir=wd, port=7600 + cores, executor_cores=2,
                     local_dirs=f"/dev/shm/wise_bisect_local_{cores}") as mc:
        spark = mc.session(
            executor_cores=2, executor_mem_gb=4,
            shuffle_partitions=2 * cores, app_name=f"bisect_{cores}",
            extra_conf={"spark.executorEnv.SPARK_GRAFT_PROFILE_PACK": "1"},
        )
        from wise_spark.index import build_index

        # Stage A once (tokens checkpoint), untimed for this bisect
        tok_dir = os.path.join(idx_dir, "tok")
        docs = spark.read.parquet(corpus_path)
        docs.count()
        sel = [F.col("doc_id").cast("long").alias("doc_id"),
               F.col("text").alias("text")]
        from wise_spark.index.build import TOKENS_WAVE_SCHEMA, _doc_tokens_fn

        tf = docs.select(*sel).mapInPandas(
            _doc_tokens_fn("doc_id", "text", None, 32, 2),
            schema=TOKENS_WAVE_SCHEMA,
        )
        t0 = time.time()
        tf.write.mode("overwrite").partitionBy("wave").parquet(tok_dir)
        out["tokens_s"] = round(time.time() - t0, 2)

        tf_all = spark.read.parquet(tok_dir)
        wave0 = tf_all.filter(F.col("wave") == 0).drop("url")
        out["scan_partitions"] = wave0.rdd.getNumPartitions()

        # ---- A: pack only (no shuffle): count() of partial rows -----------
        # warm run then timed run, to separate first-touch from steady state
        partial = wave0.mapInPandas(_pack_partition_fn(32), schema=PARTIAL_SCHEMA)
        for tag in ("pack_cold_s", "pack_warm_s"):
            t0 = time.time()
            n_partial = partial.count()
            out[tag] = round(time.time() - t0, 2)
        out["n_partial_rows"] = n_partial

        # worker-side pack profile
        profs = []
        for f in glob.glob("/tmp/pack_prof_*"):
            profs.append(open(f).read().strip())
        out["pack_prof"] = profs[:20]

        # ---- B: full wave variants ----------------------------------------
        p2 = 16
        segs = partial.repartition(p2, "shard", "bucket").mapInPandas(
            _merge_partition_fn(100.0), schema=SEGMENT_SCHEMA,
        )
        for tag in ("merge_count_cold_s", "merge_count_warm_s"):
            t0 = time.time()
            segs.count()
            out[tag] = round(time.time() - t0, 2)
        t0 = time.time()
        segs.write.mode("overwrite").parquet(os.path.join(idx_dir, "seg_flat"))
        out["write_flat_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        segs.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(idx_dir, "seg_part"))
        out["write_partby_s"] = round(time.time() - t0, 2)
        spark.stop()
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(wd, ignore_errors=True)
    shutil.rmtree(f"/dev/shm/wise_bisect_local_{cores}", ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
