"""Raw kernel scaling probe — NO Spark: does the stage-A tokenize kernel
itself scale across pinned cores, or is the box's DRAM/vCPU bandwidth the
wall?

Runs the exact per-doc work of _doc_tokens_fn (tokenize -> Counter ->
pack) over slices of the bench corpus in 1 vs K pinned processes, each
process doing the SAME amount of work. Perfect scaling => t_K == t_1.

Usage: python scripts/profile_kernel_scaling.py [n_docs_per_proc] [cpus]
       (default 50000 docs/proc, cpus "4,5,6,7")
"""

from __future__ import annotations

import os
import sys
import time
import multiprocessing as mp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_texts(n_total: int) -> list[str]:
    import pyarrow.dataset as ds

    path = "/tmp/wise_bench_corpus_500000"
    t = ds.dataset(path).head(n_total, columns=["text"])
    return t.column("text").to_pylist()


def kernel(texts: list[str]) -> int:
    """The per-doc work of _doc_tokens_fn, minus Arrow/parquet I/O."""
    from collections import Counter

    import numpy as np

    from wise_spark.analyzer.tokenizer import tokenize_text

    acc = 0
    for text in texts:
        toks = tokenize_text(text)
        if not toks:
            continue
        c = Counter(toks)
        s = "\x00".join(c.keys())
        tfs = np.fromiter(c.values(), dtype=np.int32, count=len(c))
        acc += len(s) + int(tfs.sum())
    return acc


def worker(texts, cpu, q):
    os.sched_setaffinity(0, {cpu})
    kernel(texts[:512])  # warm imports/JIT-ish paths
    t0 = time.time()
    kernel(texts)
    q.put(time.time() - t0)


def run(slices, cpus) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(s, c, q))
        for s, c in zip(slices, cpus)
    ]
    for p in procs:
        p.start()
    walls = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return max(walls)


def main() -> None:
    per_proc = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "4,5,6,7").split(",")]
    k = len(cpus)
    texts = load_texts(per_proc * k)
    slices = [texts[i * per_proc:(i + 1) * per_proc] for i in range(k)]
    t1 = run(slices[:1], cpus[:1])
    tk = run(slices, cpus)
    print(f"1 proc: {t1:.2f}s ({per_proc / t1:.0f} docs/s)")
    print(f"{k} procs: {tk:.2f}s ({per_proc * k / tk:.0f} docs/s aggregate)")
    print(f"scaling efficiency (t1/tk): {t1 / tk:.3f}")


if __name__ == "__main__":
    main()
