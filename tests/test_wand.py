"""Block-max WAND exactness: pruned top-k ≡ exhaustive top-k (BASELINE.md
"WAND exactness"; reference semantics ``collectors.py::TopCollector``
optimize path + ``W3LeafMatcher.skip_to_quality``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark.execution import wand as W
from whoosh_spark.query import ast as Q

# ix / searcher come from conftest (session-scoped, sf0.001 corpus)


def _rows(df, k=10):
    return [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in df.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    ]


TERM_SETS = [
    ["data"],                       # hot
    ["vector"],                     # rare
    ["then"],                       # stop-adjacent hot (NOT in stop list)
    ["data", "vector"],             # hot + rare
    ["data", "query", "table"],     # all hot
    ["vector", "window", "hash"],   # rares
    ["data", "nosuchterm123"],      # partial miss
    ["nosuchterm123"],              # full miss
]


@pytest.mark.parametrize("terms", TERM_SETS, ids=["-".join(t) for t in TERM_SETS])
def test_wand_equals_exhaustive(ix, searcher, terms):
    q = Q.Term(terms[0]) if len(terms) == 1 else Q.Or([Q.Term(t) for t in terms])
    exhaustive = _rows(searcher.ev.evaluate(q))
    pruned = _rows(W.wand_topk(ix, terms, 10))
    assert pruned == exhaustive


def test_wand_forced_pruning(ix, searcher, monkeypatch):
    """Force the pruned path even for small posting sets."""
    monkeypatch.setattr(W, "MIN_BLOCKS_FOR_WAND", 0)
    for terms in TERM_SETS[:6]:
        q = Q.Term(terms[0]) if len(terms) == 1 else Q.Or([Q.Term(t) for t in terms])
        assert _rows(W.wand_topk(ix, terms, 10)) == _rows(searcher.ev.evaluate(q)), terms


def test_wand_k_exceeds_matches(ix, searcher, monkeypatch):
    monkeypatch.setattr(W, "MIN_BLOCKS_FOR_WAND", 0)
    q = Q.Term("vector")
    assert _rows(W.wand_topk(ix, ["vector"], 10_000), k=10_000) == _rows(
        searcher.ev.evaluate(q), k=10_000
    )


def test_search_uses_wand_and_matches(searcher):
    """End-to-end: search(optimize=True) ≡ search(optimize=False)."""
    q = Q.Or([Q.Term("data"), Q.Term("vector"), Q.Term("then")])
    a = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in searcher.search(q, limit=10, optimize=True).collect()]
    b = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in searcher.search(q, limit=10, optimize=False).collect()]
    assert a == b


def test_wand_not_used_with_filter(searcher):
    """filter/sort/collapse paths must bypass WAND (unsupported contexts)."""
    q = Q.Term("data")
    res = searcher.search(q, limit=5, filter=Q.Filter("lang = 'en'"))
    assert res.count() <= 5


DISMAX_SETS = [
    (["data", "vector"], 0.0),
    (["data", "vector"], 0.5),
    (["data", "query", "table"], 0.3),
    (["vector", "window", "hash"], 1.0),
]


@pytest.mark.parametrize("terms,tb", DISMAX_SETS,
                         ids=[f"{'-'.join(t)}@{tb}" for t, tb in DISMAX_SETS])
def test_wand_dismax_equals_exhaustive(ix, searcher, terms, tb, monkeypatch):
    """mode="max" (DisjunctionMax) pruning is exact, forced-pruned included."""
    q = Q.DisMax([Q.Term(t) for t in terms], tiebreak=tb)
    exhaustive = _rows(searcher.ev.evaluate(q))
    assert _rows(W.wand_topk(ix, terms, 10, mode="max", tiebreak=tb)) == exhaustive
    monkeypatch.setattr(W, "MIN_BLOCKS_FOR_WAND", 0)
    assert _rows(W.wand_topk(ix, terms, 10, mode="max", tiebreak=tb)) == exhaustive


def test_search_routes_dismax_through_wand(searcher):
    q = Q.DisMax([Q.Term("data"), Q.Term("vector")], tiebreak=0.5)
    assert searcher._wand_terms(q) == (["data", "vector"], "max", 0.5, None)
    via_search = _rows(searcher.search(q, limit=10))
    assert via_search == _rows(searcher.ev.evaluate(q))
    # duplicate children disqualify (tiebreak counts duplicates)
    qd = Q.DisMax([Q.Term("data"), Q.Term("data")], tiebreak=0.5)
    assert searcher._wand_terms(qd) is None
