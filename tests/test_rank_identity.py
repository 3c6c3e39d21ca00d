"""Oracle rank-identity suite (BASELINE.md "rank identity" row):
for the reference query set (FIXTURES.md §B), top-k doc ids AND float64
scores from the Spark engine must match the pure-Python oracle
(rtol ≤ 1e-9), tie-break score DESC / doc_id ASC."""

from __future__ import annotations

import pytest

from whoosh_spark.query import ast as Q

K = 10


# ix / searcher / py come from conftest (session-scoped, sf0.001 corpus)

# hot/rare/stop-adjacent terms per FIXTURES.md documents vocab
QUERIES = {
    "term_hot": Q.Term("data"),
    "term_rare": Q.Term("vector"),
    "term_upper_analyzed": Q.Term("DATA"),  # query-time analysis
    "term_stopword": Q.Term("the"),  # → NullQuery → empty
    "and_hot_rare": Q.And([Q.Term("data"), Q.Term("vector")]),
    "and_hot_hot": Q.And([Q.Term("data"), Q.Term("query")]),
    "or_rare_rare": Q.Or([Q.Term("vector"), Q.Term("window")]),
    "or_hot_rare": Q.Or([Q.Term("data"), Q.Term("vector")]),
    "or_minmatch": Q.Or([Q.Term("vector"), Q.Term("window"), Q.Term("hash")], minmatch=2),
    "andnot": Q.AndNot(Q.Term("data"), Q.Term("vector")),
    "andmaybe": Q.AndMaybe(Q.Term("data"), Q.Term("vector")),
    "require": Q.Require(Q.Term("data"), Q.Term("vector")),
    "dismax": Q.DisMax([Q.Term("data"), Q.Term("vector")], tiebreak=0.5),
    "not": Q.Not(Q.Term("data")),
    "every": Q.Every(),
    "phrase2": Q.Phrase(["big", "data"]),
    "phrase3": Q.Phrase(["big", "data", "query"]),
    "phrase_slop2": Q.Phrase(["big", "data"], slop=2),
    "phrase_with_stop": Q.Phrase(["big", "the", "data"]),  # stop dropped at parse
    "prefix": Q.Prefix("quer"),
    "wildcard": Q.Wildcard("d*a"),
    "fuzzy": Q.Fuzzy("dat", maxdist=1),
    "term_range": Q.TermRange("da", "dz"),
    "boost": Q.Or([Q.Term("data", boost=2.0), Q.Term("vector", boost=0.5)]),
    "nested": Q.And([Q.Or([Q.Term("data"), Q.Term("query")]), Q.Term("join")]),
}


def _spark_topk(searcher, q, k=K):
    return [(int(r["doc_id"]), float(r["score"])) for r in searcher.search(q, limit=k).collect()]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_rank_identity(searcher, py, name):
    q = QUERIES[name]
    got = _spark_topk(searcher, q)
    exp = py.search(q, K)
    assert [g[0] for g in got] == [e[0] for e in exp], f"{name}: doc ids differ\n{got}\n{exp}"
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9), f"{name}: score differs at doc {g[0]}"


def test_full_ranking_not_just_topk(searcher, py):
    q = Q.Or([Q.Term("data"), Q.Term("query"), Q.Term("join")])
    got = _spark_topk(searcher, q, k=10_000)
    exp = py.search(q, limit=None)
    assert len(got) == len(exp)
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_stopword_query_empty(searcher):
    assert _spark_topk(searcher, Q.Term("the")) == []


def test_filter_and_mask(searcher, py, sf0001_documents):
    q = Q.Term("data")
    flt = Q.Filter("lang = 'en'")
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in searcher.search(q, limit=K, filter=flt).collect()]
    en_docs = {int(r["doc_id"]) for r in sf0001_documents.where("lang = 'en'").collect()}
    exp = [(d, s) for d, s in py.search(q, limit=None) if d in en_docs][:K]
    assert got == pytest.approx(exp)

    masked = [(int(r["doc_id"]), float(r["score"]))
              for r in searcher.search(q, limit=K, mask=flt).collect()]
    exp_m = [(d, s) for d, s in py.search(q, limit=None) if d not in en_docs][:K]
    assert masked == pytest.approx(exp_m)
