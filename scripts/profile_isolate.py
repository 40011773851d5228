"""Isolate scaling behavior: pure-JVM ops vs pandas-UDF vs parquet write.

Usage: taskset -c 0-N python scripts/profile_isolate.py <cores>
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = 100_000
    from wise_spark.session import get_spark

    corpus_path = os.path.join(tempfile.gettempdir(), f"wise_bench_corpus_{n_docs}")
    spark = get_spark(
        master=f"local[{cores}]", app_name=f"iso_{cores}",
        shuffle_partitions=2 * cores, extra_conf={"spark.driver.memory": "24g"},
    )
    docs = spark.read.parquet(corpus_path)
    docs.count()

    # 1. pure-JVM tokenize + explode + count (no python at all)
    t0 = time.time()
    jvm_tf = (
        docs.select(
            F.col("doc_id"),
            F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("term"),
        )
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    n1 = jvm_tf.count()
    t_jvm = time.time() - t0

    # 2. same again (warm)
    t0 = time.time()
    jvm_tf.count()
    t_jvm2 = time.time() - t0

    # 3. cache the tf relation, then time write alone
    tf_cached = jvm_tf.persist(StorageLevel.MEMORY_AND_DISK)
    tf_cached.count()
    out = os.path.join(tempfile.gettempdir(), f"iso_out_{cores}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    tf_cached.write.mode("overwrite").parquet(out)
    t_write_cached = time.time() - t0

    # 4. write again (page cache warm)
    t0 = time.time()
    tf_cached.write.mode("overwrite").parquet(out)
    t_write_cached2 = time.time() - t0

    print(f"cores={cores} rows={n1}")
    print(f"  jvm-tokenize-count   {t_jvm:7.2f}s")
    print(f"  jvm-tokenize-count2  {t_jvm2:7.2f}s")
    print(f"  write-cached         {t_write_cached:7.2f}s")
    print(f"  write-cached2        {t_write_cached2:7.2f}s")
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
