"""Golden end-to-end check (reference pattern: byte-compared golden CSVs,
/root/reference/tests/test-kinetics-6.sh:121-230): the engine's index-backed
top-k over the deterministic corpus must reproduce the committed goldens
exactly — doc ids, ranks, and scores to full float64 repr precision."""

from __future__ import annotations

import csv
import os
from collections import defaultdict

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_topk.csv")


@pytest.fixture(scope="module")
def golden():
    out = defaultdict(list)
    with open(GOLDEN) as f:
        for row in csv.DictReader(f):
            out[(row["query_id"], row["mode"])].append(row)
    return out


@pytest.fixture(scope="module")
def built_index(spark, corpus_sdf, tmp_path_factory):
    from wise_spark.index import FtsIndex, build_index

    d = str(tmp_path_factory.mktemp("golden_idx"))
    build_index(corpus_sdf, d, url_col="url", n_shards=8, n_buckets=8, n_waves=2)
    return FtsIndex.load(spark, d, cache=True)


def test_engine_reproduces_goldens(built_index, golden):
    from wise_spark.data.queries import reference_queries

    queries = dict(reference_queries(vocab_size=2000, n=60))
    # spot-check a representative slice (full sweep is the oracle's job;
    # this is the byte-precision end-to-end gate)
    picks = ["q001", "q005", "q012", "q014", "q020", "q024", "q031", "q040", "q055"]
    for qid in picks:
        for mode in ("all", "any"):
            rows = golden.get((qid, mode), [])
            got = built_index.topk(queries[qid], k=10, mode=mode, method="wand").collect()
            assert len(got) == len(rows), (qid, mode, len(got), len(rows))
            for want, g in zip(rows, got):
                assert int(want["doc_id"]) == g["doc_id"], (qid, mode, want["rank"])
                assert abs(float(want["score"]) - g["score"]) < 1e-12, (qid, mode)
