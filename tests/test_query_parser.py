"""Golden parse trees + execution semantics, mirroring the reference's
parser test cases (/root/reference/src/search/test_query_parser.py:10-177)."""

from __future__ import annotations

import pytest

from wise_spark.query.parser import (
    ParsedQuery,
    QueryParseError,
    execute,
    parse_query,
)

TARGETS = ["audio", "video", "metadata", "text"]


def test_single_query_default_target():
    p = parse_query("wash hands")
    assert len(p.subqueries) == 1
    s = p.subqueries[0]
    assert s.query_strs == ["wash hands"] and s.target == "text" and s.link == "in"
    assert p.merge_ops == []


def test_in_target():
    p = parse_query("wash hands in video", TARGETS)
    s = p.subqueries[0]
    assert s.query_strs == ["wash hands"]
    assert s.target == "video" and s.link == "in"


def test_not_in_and_chain():
    # reference example: 'wash hands in video and cut in metadata'
    p = parse_query("wash hands in video and cut in metadata", TARGETS)
    assert [s.target for s in p.subqueries] == ["video", "metadata"]
    assert p.merge_ops == ["and"]
    p2 = parse_query("music in audio and singing not in metadata", TARGETS)
    assert [s.link for s in p2.subqueries] == ["in", "not in"]


def test_case_insensitive_keywords():
    p = parse_query("cooking IN video AND music In audio", TARGETS)
    assert [s.target for s in p.subqueries] == ["video", "audio"]
    assert p.merge_ops == ["and"]


def test_quoted_queries():
    p = parse_query("'frying in pan' in video", TARGETS)
    assert p.subqueries[0].query_strs == ["frying in pan"]
    p2 = parse_query('"music and sound" in audio', TARGETS)
    assert p2.subqueries[0].query_strs == ["music and sound"]


def test_vec_ops_plus_minus():
    p = parse_query("cooking + frying - burning in video", TARGETS)
    s = p.subqueries[0]
    assert s.query_strs == ["cooking", "frying", "burning"]
    assert s.vec_ops == ["+", "-"]
    assert s.target == "video"


def test_file_prefix():
    p = parse_query("@queries.csv in metadata", TARGETS)
    s = p.subqueries[0]
    assert s.query_types == ["file"] and s.query_strs == ["queries.csv"]


def test_or_chain():
    p = parse_query("music in audio or singing in metadata or noise not in metadata", TARGETS)
    assert p.merge_ops == ["or", "or"]
    assert [s.link for s in p.subqueries] == ["in", "in", "not in"]


def test_parse_errors():
    with pytest.raises(QueryParseError):
        parse_query("'unterminated in video", TARGETS)
    with pytest.raises(QueryParseError):
        parse_query("cooking in kitchen", TARGETS)  # unknown target
    with pytest.raises(QueryParseError):
        parse_query("cooking in video xor music in audio", TARGETS)


def test_execute_semantics(spark):
    """AND = score-sum intersection; OR = union-max; NOT-IN subtracts;
    '-' subtracts 0.2x (reference negative_weight, config.py:14)."""
    rels = {
        "a": {1: 1.0, 2: 2.0, 3: 3.0},
        "b": {2: 10.0, 3: 20.0, 4: 40.0},
        "c": {3: 0.5},
    }

    def scorer_for(field):
        def run(q, mode):
            rel = rels[q]
            return spark.createDataFrame(
                [(k, v) for k, v in rel.items()], "doc_id long, score double"
            )
        return run

    scorers = {"text": scorer_for("text")}
    got = execute(parse_query("a in text and b in text", ["text"]), scorers)
    out = {r["doc_id"]: r["score"] for r in got.collect()}
    assert out == {2: 12.0, 3: 23.0}

    got = execute(parse_query("a in text or b in text", ["text"]), scorers)
    out = {r["doc_id"]: r["score"] for r in got.collect()}
    assert out == {1: 1.0, 2: 10.0, 3: 20.0, 4: 40.0}

    got = execute(parse_query("a in text and b not in text", ["text"]), scorers)
    out = {r["doc_id"]: r["score"] for r in got.collect()}
    assert out == {1: 1.0}

    got = execute(parse_query("a - c in text", ["text"]), scorers)
    out = {r["doc_id"]: r["score"] for r in got.collect()}
    assert out == {1: 1.0, 2: 2.0, 3: 3.0 - 0.2 * 0.5}

    got = execute(parse_query("a + b in text", ["text"]), scorers)
    out = {r["doc_id"]: r["score"] for r in got.collect()}
    assert out == {1: 1.0, 2: 12.0, 3: 23.0, 4: 40.0}


def test_quoted_multiword_is_phrase():
    p = parse_query("'frying in pan' in video", TARGETS)
    assert p.subqueries[0].query_types == ["phrase"]
    p2 = parse_query("'single' in video", TARGETS)
    assert p2.subqueries[0].query_types == ["text"]


def test_dangling_vec_op_rejected():
    import pytest
    from wise_spark.query.parser import QueryParseError

    with pytest.raises(QueryParseError, match="dangling"):
        parse_query("foo +", TARGETS)
    with pytest.raises(QueryParseError):
        parse_query("foo + in video", TARGETS)


def test_implicit_target_flag():
    p = parse_query("bare words only", TARGETS)
    assert p.subqueries[0].implicit_target is True
    p2 = parse_query("cooking in video", TARGETS)
    assert p2.subqueries[0].implicit_target is False


def test_page_slice_semantics(spark):
    """page() mirrors the reference /search paging contract
    (/root/reference/api/routes.py:1214-1216,1377-1381)."""
    import pytest

    from wise_spark.query.search import page

    scores = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(50)], "doc_id long, score double"
    )
    rows = page(scores, start=5, end=10).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [5, 6, 7, 8, 9]
    assert [r["rank"] for r in rows] == [5, 6, 7, 8, 9]
    # end clamps to result size implicitly (fewer rows than requested)
    assert page(scores, start=40, end=100).count() == 10
    with pytest.raises(ValueError):
        page(scores, start=981, end=1000)
    with pytest.raises(ValueError):
        page(scores, start=0, end=1001)
    with pytest.raises(ValueError):
        page(scores, start=30, end=20)
