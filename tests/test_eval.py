"""Eval harness (mAP/recall) + interval overlap join, vs hand-computed truth.

mAP semantics: /root/reference/scripts/eval/EpicKitchens-100/
retrieval_eval.py:29-68 (Wray formulation, num_rel from the full truth).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wise_spark.eval import (
    average_precision,
    mean_average_precision,
    ndcg_at_k,
    recall_at_k,
)


@pytest.fixture()
def ranked_results(spark):
    # q0: ranked docs [1, 2, 3, 4]; q1: [10, 11]
    rows = [(0, 1, 0), (0, 2, 1), (0, 3, 2), (0, 4, 3), (1, 10, 0), (1, 11, 1)]
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank long")


@pytest.fixture()
def truth(spark):
    # q0 relevant: {1, 3, 99} (99 never retrieved); q1 relevant: {11}
    # q2 relevant: {7} but q2 has no results at all
    rows = [(0, 1), (0, 3), (0, 99), (1, 11), (2, 7)]
    return spark.createDataFrame(rows, "query_id long, doc_id long")


def test_average_precision_hand_computed(spark, ranked_results, truth):
    ap = {r["query_id"]: r["ap"] for r in average_precision(ranked_results, truth).collect()}
    # q0: hits at k=1 (p=1/1) and k=3 (p=2/3); num_rel=3 -> (1 + 2/3)/3
    assert ap[0] == pytest.approx((1.0 + 2.0 / 3.0) / 3.0)
    # q1: hit at k=2 (p=1/2); num_rel=1 -> 0.5
    assert ap[1] == pytest.approx(0.5)
    # q2: nothing retrieved -> 0
    assert ap[2] == 0.0


def test_map_and_recall(spark, ranked_results, truth):
    m = mean_average_precision(ranked_results, truth).collect()[0]
    assert m["n_queries"] == 3
    assert m["map"] == pytest.approx(((1 + 2 / 3) / 3 + 0.5 + 0.0) / 3)
    rec = {r["query_id"]: r["recall"] for r in recall_at_k(ranked_results, truth, 2).collect()}
    assert rec[0] == pytest.approx(1.0 / 3.0)  # only doc 1 within top-2
    assert rec[1] == pytest.approx(1.0)
    assert rec[2] == 0.0


def test_duplicate_truth_pairs_do_not_corrupt_metrics(spark, ranked_results, truth):
    """truth is a SET: a duplicated (query_id, doc_id) pair (e.g. from a
    non-distinct relevance join) used to fan out the join and double-count
    n_rel, silently inflating/deflating every metric."""
    dup = truth.union(truth.limit(2))  # duplicate (0,1) and (0,3)
    want = {r["query_id"]: r["ap"] for r in average_precision(ranked_results, truth).collect()}
    got = {r["query_id"]: r["ap"] for r in average_precision(ranked_results, dup).collect()}
    assert got == pytest.approx(want)
    want_r = {r["query_id"]: r["recall"] for r in recall_at_k(ranked_results, truth, 2).collect()}
    got_r = {r["query_id"]: r["recall"] for r in recall_at_k(ranked_results, dup, 2).collect()}
    assert got_r == pytest.approx(want_r)


def test_ndcg_hand_computed(spark, ranked_results, truth):
    import math

    log2 = lambda x: math.log2(x)  # noqa: E731
    nd = {r["query_id"]: r["ndcg"] for r in ndcg_at_k(ranked_results, truth, 2).collect()}
    # q0 top-2 = [1, 2], rel = [1, 0] -> DCG = 1/log2(2) = 1
    # IDCG@2 with n_rel=3 -> 1/log2(2) + 1/log2(3)
    assert nd[0] == pytest.approx(1.0 / (1.0 + 1.0 / log2(3)))
    # q1 top-2 = [10, 11], rel = [0, 1] -> DCG = 1/log2(3); IDCG (n_rel=1) = 1
    assert nd[1] == pytest.approx(1.0 / log2(3))
    # q2: nothing retrieved -> 0
    assert nd[2] == 0.0
    # perfect ranking scores exactly 1.0
    perfect = spark.createDataFrame(
        [(0, 1, 0), (0, 3, 1), (0, 99, 2)], "query_id long, doc_id long, rank long"
    )
    t0 = truth.filter(F.col("query_id") == 0)
    assert ndcg_at_k(perfect, t0, 3).collect()[0]["ndcg"] == pytest.approx(1.0)


def test_overlap_join_matches_brute_force(spark):
    from wise_spark.pipeline.relational import overlap_join

    import itertools
    import random

    rng = random.Random(11)
    a_rows = [
        ("k%d" % rng.randint(0, 2), i, float(s), float(s + rng.randint(0, 20)))
        for i, s in enumerate(rng.sample(range(0, 5000), 60))
    ]
    b_rows = [
        ("k%d" % rng.randint(0, 2), 100 + i, float(s), float(s + rng.randint(0, 30)))
        for i, s in enumerate(rng.sample(range(0, 5000), 40))
    ]
    a = spark.createDataFrame(a_rows, "key string, a_id long, a_start double, a_end double")
    b = spark.createDataFrame(b_rows, "key string, b_id long, b_start double, b_end double")
    got = {
        (r["a_id"], r["b_id"])
        for r in overlap_join(
            a, b, "key", "a_start", "a_end", "b_start", "b_end",
            bucket_seconds=600.0,
        ).collect()
    }
    want = {
        (ar[1], br[1])
        for ar, br in itertools.product(a_rows, b_rows)
        if ar[0] == br[0] and ar[2] <= br[3] and br[2] <= ar[3]
    }
    assert got == want and len(want) > 0
