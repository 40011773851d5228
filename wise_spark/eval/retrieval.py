"""Retrieval evaluation: Recall@K, mean Average Precision, nDCG@K.

Metric semantics follow the reference's evaluation harness
(/root/reference/scripts/eval/EpicKitchens-100/retrieval_eval.py:29-68,
the Wray mAP formulation):

    AP(q) = sum_k p(k) * rel(k) / num_rel(q)

where p(k) is precision at k within q's ranked list, rel(k) the binary
relevance of the k-th item, and num_rel(q) the TOTAL number of relevant
items for q (from the truth relation, not just those retrieved) — so a
top-k list is penalized for relevant items it never returns, exactly like
the reference's full similarity-matrix evaluation.

Inputs are relations, not matrices (the reference materializes an NxM numpy
matrix — fine for 3843x9668, impossible at web scale):
  * results: (query_id, doc_id, rank)   rank 0- or 1-based, dense per query
  * truth:   (query_id, doc_id)         the relevant pairs

Every window below partitions by query_id and runs over one query's ranked
list (<= k rows) — bounded, skew-free state; the joins are equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _truth_pairs(truth: DataFrame) -> DataFrame:
    """`truth` is a SET of relevant pairs — enforce it. A duplicate
    (query_id, doc_id) would fan out the _with_rel join (two k-positions
    for one retrieved doc) and double-count n_rel, silently corrupting
    every metric; the dedup is one shuffle over a tiny relation."""
    return truth.select("query_id", "doc_id").dropDuplicates(
        ["query_id", "doc_id"]
    )


def _n_rel(truth: DataFrame) -> DataFrame:
    return _truth_pairs(truth).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )


def _with_rel(results: DataFrame, truth: DataFrame) -> DataFrame:
    t = _truth_pairs(truth).withColumn("rel", F.lit(1))
    return (
        results.select("query_id", "doc_id", "rank")
        .join(t, ["query_id", "doc_id"], "left")
        .fillna(0, subset=["rel"])
    )


def average_precision(results: DataFrame, truth: DataFrame) -> DataFrame:
    """(query_id, ap, n_rel, n_retrieved_rel). Queries present in `truth`
    but missing from `results` score ap = 0 (never-retrieved)."""
    n_rel = _n_rel(truth)
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = Window.partitionBy("query_id").orderBy("rank")
    scored = (
        _with_rel(results, truth)
        .withColumn("k", F.row_number().over(pos))
        .withColumn("cum_rel", F.sum("rel").over(w))
        .withColumn("pk_rel", F.col("rel") * F.col("cum_rel") / F.col("k"))
    )
    per_q = scored.groupBy("query_id").agg(
        F.sum("pk_rel").alias("ap_num"),
        F.sum("rel").alias("n_retrieved_rel"),
    )
    return (
        n_rel.join(per_q, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("ap_num"), F.lit(0.0)) / F.col("n_rel")).alias("ap"),
            "n_rel",
            F.coalesce(F.col("n_retrieved_rel"), F.lit(0)).alias("n_retrieved_rel"),
        )
    )


def mean_average_precision(results: DataFrame, truth: DataFrame) -> DataFrame:
    """One row: (map, n_queries). Mean over every query in `truth`."""
    return average_precision(results, truth).agg(
        F.avg("ap").alias("map"), F.count(F.lit(1)).alias("n_queries")
    )


def ndcg_at_k(results: DataFrame, truth: DataFrame, k: int) -> DataFrame:
    """(query_id, ndcg) — normalized discounted cumulative gain at k with
    binary relevance (standard Järvelin-Kekäläinen formulation):

        DCG@k  = sum_{i<=k} rel(i) / log2(i + 1)      (i is 1-based rank)
        IDCG@k = sum_{i<=min(k, n_rel)} 1 / log2(i + 1)

    The ideal DCG uses the TOTAL relevant count from `truth` (like the mAP
    above): a top-k list is penalized for relevant items it never returned.
    Queries in `truth` with no retrieved rows score 0. Same plan shape as
    average_precision — one bounded per-query window (<= k rows), equi-joins
    only, no matrices."""
    n_rel = _n_rel(truth)
    pos = Window.partitionBy("query_id").orderBy("rank")
    dcg = (
        _with_rel(results, truth)
        .withColumn("k", F.row_number().over(pos))
        .filter(F.col("k") <= k)
        .groupBy("query_id")
        .agg(F.sum(F.col("rel") / F.log2(F.col("k") + 1)).alias("dcg"))
    )
    # IDCG is a closed-form per-query scalar: sum_{i=1..m} 1/log2(i+1) with
    # m = min(k, n_rel) — computed with a sequence+aggregate, no second
    # ranked relation needed
    m = F.least(F.lit(k), F.col("n_rel"))
    idcg = F.aggregate(
        F.sequence(F.lit(1), m),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return (
        n_rel.join(dcg, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg).alias("ndcg"),
        )
    )


def recall_at_k(results: DataFrame, truth: DataFrame, k: int) -> DataFrame:
    """(query_id, recall) with recall = |retrieved@k ∩ relevant| / |relevant|."""
    n_rel = _n_rel(truth)
    pos = Window.partitionBy("query_id").orderBy("rank")
    hits = (
        _with_rel(results, truth)
        .withColumn("k", F.row_number().over(pos))
        .filter(F.col("k") <= k)
        .groupBy("query_id")
        .agg(F.sum("rel").alias("n_hit"))
    )
    return n_rel.join(hits, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel")).alias("recall"),
    )
