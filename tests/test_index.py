"""Index build + WAND/TAAT rank-identity vs naive scorer and oracles;
resume-from-checkpoint; lineage metrics.

The oracle-parity pattern is the reference's own
(/root/reference/docs/Search-Index-Evaluation.md:79-86: exhaustive engine
validates the fast engine), except ours must be rank-IDENTICAL, not
recall@k."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest

from wise_spark.data.queries import reference_queries
from wise_spark.index import FtsIndex, build_index
from wise_spark.oracle import PandasBM25Oracle

QUERIES = [q for _, q in reference_queries(vocab_size=2000, n=20)]


@pytest.fixture(scope="module")
def index(spark, corpus_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fts_index"))
    meta = build_index(
        corpus_sdf, d, url_col="url", n_shards=8, n_buckets=8, n_salts=3, n_waves=3
    )
    return FtsIndex(spark, d, meta)


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    return PandasBM25Oracle(corpus_pdf)


def _check(got_pdf, want_pdf, k, msg):
    got = got_pdf.reset_index(drop=True)
    want = want_pdf.head(k).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), msg
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9, err_msg=msg)


def test_meta_exact_stats(index, oracle):
    assert index.meta.n_docs == oracle.n_docs
    assert abs(index.meta.avgdl - oracle.avgdl) < 1e-9
    assert index.meta.n_terms == len(oracle.df)
    # exact df for a few terms
    terms = list(oracle.df)[:25]
    got = index.term_stats(terms)
    for t in terms:
        assert got[t] == oracle.df[t], t


@pytest.mark.parametrize("mode", ["all", "any"])
@pytest.mark.parametrize("method", ["wand", "taat"])
def test_topk_rank_identity(index, oracle, mode, method):
    k = 15
    for q in QUERIES:
        got = index.topk(q, k=k, mode=mode, method=method).toPandas()
        want = oracle.score_all(q, mode)
        _check(got, want, k, f"{method}/{mode}: {q}")


def test_wand_pruning_still_exact_low_cutoff(index, oracle, monkeypatch):
    """Force the real WAND loop (not the TAAT fallback) and re-check."""
    import wise_spark.index.wand as w

    monkeypatch.setattr(w, "TAAT_CUTOFF", 0)
    for q in QUERIES[:10]:
        got = index.topk(q, k=10, mode="any", method="wand").toPandas()
        want = oracle.score_all(q, "any")
        _check(got, want, 10, f"forced-wand: {q}")


def test_score_all_matches_oracle(index, oracle):
    q = QUERIES[3]
    got = (
        index.score_all(q, "any")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = oracle.score_all(q, "any").sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)


def test_lineage_metrics(index):
    lin = index.lineage().toPandas()
    assert set(lin["stage"]) >= {"tokens", "doc_map", "segments", "terms"}
    seg = lin[lin["stage"] == "segments"]
    assert len(seg) == 3  # n_waves
    assert (seg["status"] == "done").all()
    assert seg["rows"].sum() > 0 and seg["bytes"].sum() > 0
    # total postings across waves == sum of df over all terms
    terms = index._terms.toPandas()
    assert seg["rows"].sum() == terms["df"].sum()


def test_resume_skips_completed_and_is_identical(spark, corpus_sdf, tmp_path, index):
    """Kill after wave 1 of 3 -> rerun with resume -> identical index content."""
    d = str(tmp_path / "idx_resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            corpus_sdf, d, url_col="url", n_shards=8, n_buckets=8, n_salts=3,
            n_waves=3, fail_after_waves=1,
        )
    # resume: completes the remaining waves without redoing wave-0
    import os
    import time

    seg_dir = os.path.join(d, "segments")
    before = {
        p: os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(seg_dir)
        for p in fs
        if p.endswith(".parquet")
    }
    time.sleep(1.1)
    meta2 = build_index(
        corpus_sdf, d, url_col="url", n_shards=8, n_buckets=8, n_salts=3, n_waves=3
    )
    after = {
        p: os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(seg_dir)
        for p in fs
        if p.endswith(".parquet")
    }
    for f, t in before.items():
        assert after[f] == t, f"wave-0 file {f} was rewritten on resume"

    # logical identity with the cleanly-built module index
    idx2 = FtsIndex(spark, d, meta2)
    a = index._segments.select("term", "shard", "n", "docids", "tfs", "doclens").toPandas()
    b = idx2._segments.select("term", "shard", "n", "docids", "tfs", "doclens").toPandas()
    key = ["term", "shard"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_hydrate_joins_back_urls(index):
    res = index.topk(QUERIES[0], k=5, mode="any")
    hyd = index.hydrate(res).toPandas()
    assert len(hyd) == res.count()
    assert hyd["url"].notna().all()


def test_hydrate_pushes_isin_into_doc_map_scan(index):
    """hydrate must prune the doc_map scan with doc_id IN (hit ids) — at
    10^12 docs an unpruned hydrate is a full doc_map pass per query. Assert
    the pushed filter is visible in the physical plan AND values survive."""
    res = index.topk(QUERIES[0], k=5, mode="any")
    hyd = index.hydrate(res)
    plan = hyd._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id" in plan or "doc_id IN" in plan, plan[:3000]
    got = hyd.toPandas()
    want = {r["doc_id"]: r["score"] for r in res.collect()}
    assert {int(r.doc_id): r.score for r in got.itertuples()} == want
    assert got["url"].notna().all()
