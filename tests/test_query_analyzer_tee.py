"""Query-time analyzer selection (MultiFilter tee,
``src/whoosh/analysis/filters.py::MultiFilter ≈L60``): the parser can run
the index's own chain — or a different one — over plain words and phrases."""

from __future__ import annotations

import pytest

from whoosh_spark.index import InvertedIndex
from whoosh_spark.query.parser import parse_query
from whoosh_spark.search import Searcher


@pytest.fixture(scope="module")
def stem_searcher(spark):
    rows = [
        (0, "the runner was running many runs today"),
        (1, "a walker walks and walked slowly"),
        (2, "nothing relevant here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return Searcher(InvertedIndex.build(docs, analyzer="stemming"))


def test_stemmed_query_matches_stemmed_index(stem_searcher):
    # index stores "run"; the default query chain would look up "running"
    q_std = parse_query("running")
    assert stem_searcher.search(q_std, limit=5).count() == 0
    q_stem = parse_query("running", analyzer="stemming")
    ids = [r["doc_id"] for r in stem_searcher.search(q_stem, limit=5).collect()]
    assert ids == [0]


def test_stemmed_phrase_tee(stem_searcher):
    # phrase words run through the tee'd chain too
    q = parse_query('"runner running"~2', analyzer="stemming")
    ids = [r["doc_id"] for r in stem_searcher.search(q, limit=5).collect()]
    assert ids == [0]


def test_callable_tee():
    calls = []

    def chain(text):
        calls.append(text)
        return [text.upper()], [0]

    q = parse_query("hello world", analyzer=chain)
    assert calls == ["hello", "world"]
    assert sorted(t for t in q.terms()) == ["HELLO", "WORLD"]


def test_default_unchanged():
    q = parse_query("Running the tests")
    assert sorted(q.terms()) == ["running", "tests"]  # stopword dropped


def test_inmemory_build_records_analyzer(stem_searcher):
    # review regression: InvertedIndex.build sets ix.analyzer so
    # Searcher.parse tees automatically for in-memory indexes too
    assert stem_searcher.ix.analyzer == "stemming"
    ids = [r["doc_id"] for r in
           stem_searcher.search(stem_searcher.parse("running"), limit=5).collect()]
    assert ids == [0]
