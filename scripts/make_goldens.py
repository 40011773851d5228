"""Generate the golden top-k CSV (FIXTURES.md section 3) from the pandas
oracle over the deterministic synthetic corpus — the analog of the
reference's inline golden CSVs compared with cmp
(/root/reference/tests/test-kinetics-6.sh:121-230).

    python scripts/make_goldens.py  ->  tests/goldens/golden_topk.csv
"""

from __future__ import annotations

import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wise_spark.data.corpus import corpus_pandas  # noqa: E402
from wise_spark.data.queries import reference_queries  # noqa: E402
from wise_spark.oracle import PandasBM25Oracle  # noqa: E402

N_DOCS, VOCAB, K = 300, 2000, 10


def main() -> None:
    pdf = corpus_pandas(np.arange(N_DOCS), seed=42, vocab_size=VOCAB)
    oracle = PandasBM25Oracle(pdf)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden_topk.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query_id", "mode", "rank", "doc_id", "url", "score"])
        for qid, qtext in reference_queries(vocab_size=VOCAB, n=60):
            for mode in ("all", "any"):
                top = oracle.topk(qtext, k=K, mode=mode)
                for rank, row in top.iterrows():
                    d = int(row["doc_id"])
                    w.writerow([qid, mode, rank, d, pdf["url"].iloc[d], repr(row["score"])])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
