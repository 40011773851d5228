"""Decompose stage-A (tokens) cost: UDF only vs +explode vs +write.

Usage: taskset -c 0-1 python scripts/profile_tokens.py 2
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from wise_spark.analyzer.tokenizer import term_counts_udf
    from wise_spark.session import get_spark

    corpus_path = os.path.join(tempfile.gettempdir(), f"wise_bench_corpus_{n_docs}")
    spark = get_spark(
        master=f"local[{cores}]", app_name=f"ptok_{cores}",
        shuffle_partitions=2 * cores, extra_conf={"spark.driver.memory": "24g"},
    )
    docs = spark.read.parquet(corpus_path)
    docs.count()  # warm

    tc = term_counts_udf()
    t0 = time.time()
    n = docs.select(tc(F.col("text")).alias("tc")).select(
        F.sum("tc.doclen")
    ).collect()[0][0]
    t_udf = time.time() - t0

    counted = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), tc(F.col("text")).alias("tc")
    )
    tf = (
        counted.select("doc_id", F.col("tc.doclen").cast("long").alias("doclen"),
                       F.explode("tc.counts").alias("kv"))
        .select("doc_id", F.col("kv.term").alias("term"),
                F.col("kv.tf").cast("long").alias("tf"), "doclen")
        .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(32)).cast("int"))
    )
    t0 = time.time()
    rows = tf.count()
    t_explode = time.time() - t0

    out = os.path.join(tempfile.gettempdir(), f"ptok_out_{cores}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    tf.repartition(32, "shard").write.mode("overwrite").partitionBy("shard").parquet(out)
    t_write = time.time() - t0

    t0 = time.time()
    tf.write.mode("overwrite").parquet(out + "_noshuf")
    t_write_noshuf = time.time() - t0

    print(f"cores={cores} docs={n_docs} tokens={n} tf_rows={rows}")
    print(f"  udf-only    {t_udf:7.2f}s")
    print(f"  +explode    {t_explode:7.2f}s")
    print(f"  +shuf+write {t_write:7.2f}s")
    print(f"  +write-noshuf {t_write_noshuf:5.2f}s")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out + "_noshuf", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
