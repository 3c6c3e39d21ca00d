"""Default-operator switch (upstream ``QueryParser(group=AndGroup|
OrGroup)``): juxtaposed terms bind with the chosen default group while
explicit operators keep their meaning."""

import pytest

from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query


def test_orgroup_juxtaposition():
    q = parse_query("big data query", group="or")
    assert isinstance(q, Q.Or)
    assert [c.text for c in q.children] == ["big", "data", "query"]


def test_andgroup_default_unchanged():
    q = parse_query("big data query")
    assert isinstance(q, Q.And)
    assert parse_query("big data query", group="and") == q


def test_orgroup_explicit_and_binds_tighter():
    # upstream: "a AND b c" under OrGroup = Or(And(a, b), c)
    q = parse_query("big AND data query", group="or")
    assert isinstance(q, Q.Or)
    assert isinstance(q.children[0], Q.And)
    assert q.children[1] == Q.Term("query")


def test_orgroup_explicit_or_flattens():
    q = parse_query("big data OR query", group="or")
    assert isinstance(q, Q.Or)
    assert [c.text for c in q.children] == ["big", "data", "query"]


def test_orgroup_parens():
    # inside parens juxtaposition still uses the default operator; the
    # nested Or then flattens in normalize() (score-equivalent: sum of
    # sums) so the result is one flat union
    q = parse_query("(big data) query", group="or")
    assert isinstance(q, Q.Or)
    assert [c.text for c in q.children] == ["big", "data", "query"]


def test_group_rejects_unknown():
    with pytest.raises(ValueError):
        parse_query("big", group="xor")


def test_orgroup_search_end_to_end(spark, sf0001_documents):
    from whoosh_spark import InvertedIndex, Searcher

    s = Searcher(InvertedIndex.build(sf0001_documents))
    got = s.search(parse_query("big data query", group="or"),
                   limit=10).collect()
    want = s.search(Q.Or([Q.Term("big"), Q.Term("data"), Q.Term("query")]),
                    limit=10).collect()
    assert [(r.doc_id, r.score) for r in got] == \
        [(r.doc_id, r.score) for r in want]
    assert got
