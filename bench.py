"""Benchmark driver. Prints ONE JSON line on stdout; progress goes to stderr.

Two parts:
  1. Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
     on local[$SPARK_GRAFT_CPUS]: per-query wall seconds.
  2. Scaling evidence (north_rule: throughput efficiency >= 0.8 from N to 4N
     executors, evidenced here as local[8] vs local[32] on IDENTICAL input —
     the deterministic synthetic webtext corpus): full index-build docs/sec
     at both parallelism levels + query p50/p99 — also written to BENCH.md.

Partition counts scale with cores (2x) exactly as a real cluster resize
would; the input corpus bytes are identical (counter-hashed generation).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _spark(cores: int):
    from wise_spark.session import get_spark

    return get_spark(
        master=f"local[{cores}]",
        app_name=f"wise_bench_{cores}",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.driver.memory": "24g"},
    )


def run_headline(sf_dir: str, cores: int) -> dict[str, float]:
    import __spark_entry__ as E

    spark = _spark(cores)
    names = [
        "ft_bm25_topk_any", "ft_bm25_topk_all", "ft_bm25_wand", "ft_not_in",
        "ft_and_merge", "ft_or_merge", "ft_term_df",
        "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "ann_cosine_topk", "rel_sessionize", "rel_pricing_summary",
    ]
    qs = E.queries()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        log(f"  headline {name}: {out[name]}s ({n} rows)")
    spark.stop()
    return out


def run_scaling(n_docs: int, cores_list: list[int], queries: list[str], k: int = 10):
    """Build the index over the same synthetic corpus at each parallelism
    level; report build docs/sec and query latency p50/p99."""
    from wise_spark.data import corpus_df
    from wise_spark.index import FtsIndex, build_index

    results = {}
    for cores in cores_list:
        spark = _spark(cores)
        idx_dir = os.path.join(tempfile.gettempdir(), f"wise_bench_idx_{cores}")
        shutil.rmtree(idx_dir, ignore_errors=True)
        docs = corpus_df(spark, n_docs, partitions=2 * cores).select(
            "doc_id", "url", "text"  # doc_id = dense deterministic generation id
        )
        t0 = time.time()
        build_index(
            docs, idx_dir, url_col="url",
            n_shards=max(8, 2 * cores), n_buckets=2 * cores, n_salts=4,
            n_waves=2,
        )
        build_s = time.time() - t0
        idx = FtsIndex.load(spark, idx_dir)
        lat: list[float] = []
        for q in queries:
            t0 = time.time()
            idx.topk(q, k=k, mode="any", method="wand").collect()
            lat.append(time.time() - t0)
        results[cores] = {
            "build_s": round(build_s, 2),
            "docs_per_sec": round(n_docs / build_s, 1),
            "query_p50_s": round(statistics.median(lat), 3),
            "query_p99_s": round(
                sorted(lat)[max(0, int(len(lat) * 0.99) - 1)], 3
            ),
            "n_queries": len(lat),
        }
        log(f"  scaling local[{cores}]: {results[cores]}")
        spark.stop()
        shutil.rmtree(idx_dir, ignore_errors=True)
    return results


def write_bench_md(n_docs: int, scaling: dict, efficiency: float) -> None:
    lo, hi = sorted(scaling)
    md = f"""# BENCH — wise_spark

## Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N)

Same job (full inverted-index build over the identical deterministic
synthetic corpus, {n_docs} docs) at two parallelism levels; partition counts
scale with cores as a real cluster resize would.

| parallelism | build wall (s) | build docs/sec | query p50 (s) | query p99 (s) |
|---|---|---|---|---|
| local[{lo}] | {scaling[lo]['build_s']} | {scaling[lo]['docs_per_sec']} | {scaling[lo]['query_p50_s']} | {scaling[lo]['query_p99_s']} |
| local[{hi}] | {scaling[hi]['build_s']} | {scaling[hi]['docs_per_sec']} | {scaling[hi]['query_p50_s']} | {scaling[hi]['query_p99_s']} |

**Scaling efficiency ({lo} -> {hi} cores):**
throughput_ratio / core_ratio = {scaling[hi]['docs_per_sec']}/{scaling[lo]['docs_per_sec']} / {hi // lo}
= **{efficiency:.3f}**
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    log(f"== headline queries @ {sf_dir} on local[{cpus}] ==")
    t_all0 = time.time()
    headline = run_headline(sf_dir, cpus)

    log(f"== scaling: index build over {n_docs} synthetic docs ==")
    from wise_spark.data.queries import reference_queries

    qset = [q for _, q in reference_queries(n=20)]
    scaling = run_scaling(n_docs, [8, 32], qset)
    eff = (scaling[32]["docs_per_sec"] / scaling[8]["docs_per_sec"]) / 4.0
    write_bench_md(n_docs, scaling, eff)

    total = round(time.time() - t_all0, 2)
    out = {
        "metric": "headline suite wall + index-build scaling (see scaling_*)",
        "value": round(sum(headline.values()), 3),
        "unit": "sec",
        "queries": headline,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "scaling_docs": n_docs,
        "scaling_build_docs_per_sec_8": scaling[8]["docs_per_sec"],
        "scaling_build_docs_per_sec_32": scaling[32]["docs_per_sec"],
        "scaling_query_p50_s_32": scaling[32]["query_p50_s"],
        "scaling_query_p99_s_32": scaling[32]["query_p99_s"],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "total_bench_s": total,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
