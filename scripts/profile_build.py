"""Per-stage build profiling at one parallelism level (run via taskset).

Usage: taskset -c 0-1 python scripts/profile_build.py 2 100000
Prints stage wall_ms from lineage plus total build wall.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from wise_spark.data import corpus_df
    from wise_spark.index import build_index
    from wise_spark.session import get_spark

    corpus_path = os.path.join(tempfile.gettempdir(), f"wise_bench_corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark = get_spark(master="local[32]", app_name="gen", shuffle_partitions=64)
        corpus_df(spark, n_docs, partitions=64).select("doc_id", "url", "text").write.mode(
            "overwrite"
        ).parquet(corpus_path)
        spark.stop()

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"profile_{cores}",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.driver.memory": "24g"},
    )
    idx_dir = os.path.join(tempfile.gettempdir(), f"wise_profile_idx_{cores}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    docs = spark.read.parquet(corpus_path)
    t_sess = time.time()
    docs.count()  # warm the session (scheduler, file listing)
    warm_s = time.time() - t_sess
    t0 = time.time()
    build_index(docs, idx_dir, url_col="url", n_shards=32, n_buckets=32,
                n_salts=4, n_waves=2)
    build_s = time.time() - t0
    lin = spark.read.parquet(os.path.join(idx_dir, "lineage")).collect()
    print(f"cores={cores} n_docs={n_docs} warm={warm_s:.2f}s build={build_s:.2f}s "
          f"({n_docs / build_s:.0f} docs/s)")
    staged = 0
    for r in sorted(lin, key=lambda r: (r["stage"], r["unit"])):
        print(f"  {r['stage']:10s} {r['unit']:8s} {r['wall_ms'] / 1000:8.2f}s")
        staged += r["wall_ms"] / 1000
    print(f"  {'unattributed':19s} {build_s - staged:8.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
