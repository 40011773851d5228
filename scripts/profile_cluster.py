"""Bisect multi-executor anti-scaling: JVM compute / pandas UDF / write.

Usage: taskset -c 0-3 python scripts/profile_cluster.py <cores 4|16>
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

WORKER_CPUS = {4: "4-7", 16: "4-19"}


def main() -> None:
    cores = int(sys.argv[1])
    from wise_spark.cluster import MiniCluster

    MiniCluster.cleanup_stale()
    corpus = os.path.join(tempfile.gettempdir(), "wise_bench_corpus_100000")
    wd = os.path.join(tempfile.gettempdir(), f"mc_bisect_{cores}")
    shutil.rmtree(wd, ignore_errors=True)
    with MiniCluster(cores=cores, worker_cpus=WORKER_CPUS[cores],
                     work_dir=wd, port=7400 + cores,
                     executor_cores=4) as mc:
        spark = mc.session(executor_cores=4, executor_mem_gb=10,
                           shuffle_partitions=2 * cores, app_name=f"bisect_{cores}")
        spark.range(10).count()  # warm executors

        t0 = time.time()
        spark.range(0, 3_000_000_000, 1, 64).selectExpr("sum(id * 2)").collect()
        t_jvm = time.time() - t0

        docs = spark.read.parquet(corpus).select("doc_id", "text")
        docs.count()

        def heavy(batches):
            import re
            for pdf in batches:
                n = 0
                for t in pdf["text"]:
                    n += len(re.findall(r"[a-z0-9]+", t.lower()))
                yield pd.DataFrame({"n": [n]})

        t0 = time.time()
        docs.mapInPandas(heavy, schema="n long").agg(F.sum("n")).collect()
        t_udf = time.time() - t0

        out = os.path.join(tempfile.gettempdir(), f"mc_bisect_out_{cores}")
        t0 = time.time()
        spark.range(0, 50_000_000, 1, 64).withColumn(
            "s", F.md5(F.col("id").cast("string"))
        ).write.mode("overwrite").parquet(out)
        t_write = time.time() - t0
        shutil.rmtree(out, ignore_errors=True)

        t0 = time.time()
        docs.groupBy(F.pmod("doc_id", F.lit(256)).alias("g")).agg(
            F.sum(F.length("text"))
        ).collect()
        t_shuffle = time.time() - t0

        print(f"cores={cores} jvm={t_jvm:.2f}s udf={t_udf:.2f}s "
              f"write={t_write:.2f}s shuffle={t_shuffle:.2f}s")
        spark.stop()


if __name__ == "__main__":
    main()
