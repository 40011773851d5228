"""Test: flat mapInPandas tokens stage vs nested-UDF+explode.

Usage: taskset -c 0-N python scripts/profile_flat.py <cores>
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def flat_tokens_fn(n_shards: int):
    from itertools import chain

    from wise_spark.analyzer.tokenizer import tokenize_text

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            toks_per_doc = [tokenize_text(t) for t in pdf["text"]]
            lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                               count=len(toks_per_doc))
            doc_ids = pdf["doc_id"].to_numpy(np.int64)
            rep_ids = np.repeat(doc_ids, lens)
            rep_dls = np.repeat(lens, lens)
            flat = pd.DataFrame(
                {
                    "doc_id": rep_ids,
                    "term": list(chain.from_iterable(toks_per_doc)),
                    "doclen": rep_dls,
                }
            )
            out = (
                flat.groupby(["doc_id", "term"], sort=False, as_index=False)
                .agg(tf=("term", "size"), doclen=("doclen", "first"))
            )
            out["tf"] = out["tf"].astype(np.int64)
            out["shard"] = (out["doc_id"] % n_shards).astype(np.int32)
            yield out[["doc_id", "term", "tf", "doclen", "shard"]]

    return gen


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = 100_000
    from wise_spark.session import get_spark

    corpus_path = os.path.join(tempfile.gettempdir(), f"wise_bench_corpus_{n_docs}")
    spark = get_spark(
        master=f"local[{cores}]", app_name=f"flat_{cores}",
        shuffle_partitions=2 * cores, extra_conf={"spark.driver.memory": "24g"},
    )
    docs = spark.read.parquet(corpus_path).select("doc_id", "text")
    docs.count()

    tf = docs.mapInPandas(
        flat_tokens_fn(32),
        schema="doc_id long, term string, tf long, doclen long, shard int",
    )
    t0 = time.time()
    n = tf.count()
    t_count = time.time() - t0

    out = os.path.join(tempfile.gettempdir(), f"flat_out_{cores}")
    t0 = time.time()
    tf.withColumn("wave", (F.col("shard") % 2).cast("int")).write.mode(
        "overwrite"
    ).partitionBy("wave").parquet(out)
    t_write = time.time() - t0

    print(f"cores={cores} rows={n}")
    print(f"  flat-map-count       {t_count:7.2f}s")
    print(f"  flat-map-write(wave) {t_write:7.2f}s")
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
