"""Per-subtree WeightingQuery (``src/whoosh/query/wrappers.py::
WeightingQuery ≈L160``): one branch of a compound scored under a different
model, the rest under the searcher's default."""

from __future__ import annotations

import pytest

from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


def test_weighted_subtree_composes(ix, searcher):
    q = Q.And([Q.Weighted(Q.Term("data"), weighting="pl2"), Q.Term("vector")])
    got = {int(r["doc_id"]): float(r["score"])
           for r in searcher.search(q, limit=None).collect()}

    pl2 = {int(r["doc_id"]): float(r["score"])
           for r in Searcher(ix, weighting="pl2")
           .search(Q.Term("data"), limit=None).collect()}
    bm = {int(r["doc_id"]): float(r["score"])
          for r in searcher.search(Q.Term("vector"), limit=None).collect()}
    expect = {d: pl2[d] + bm[d] for d in set(pl2) & set(bm)}
    assert set(got) == set(expect)
    for d in got:
        assert got[d] == pytest.approx(expect[d], rel=1e-12)


def test_weighted_restores_default_model(searcher):
    # after evaluating a Weighted subtree, sibling branches still use bm25
    q = Q.Or([Q.Weighted(Q.Term("data"), weighting="frequency"),
              Q.Term("data")])
    two = {int(r["doc_id"]): float(r["score"])
           for r in searcher.search(q, limit=None).collect()}
    freq = {int(r["doc_id"]): float(r["score"])
            for r in Searcher(searcher.ix, weighting="frequency")
            .search(Q.Term("data"), limit=None).collect()}
    bm = {int(r["doc_id"]): float(r["score"])
          for r in searcher.search(Q.Term("data"), limit=None).collect()}
    for d in two:
        assert two[d] == pytest.approx(freq[d] + bm[d], rel=1e-12)
    assert searcher.ev.weighting == "bm25"


def test_weighted_normalize_and_boost(searcher):
    q = Q.Weighted(Q.Term("zzz absent"), weighting="pl2")
    # child normalizes to an And of terms; absent terms → empty result
    assert searcher.search(q.normalize(), limit=5).count() == 0
    qb = Q.Weighted(Q.Term("data"), weighting="frequency", boost=2.0)
    got = {int(r["doc_id"]): float(r["score"])
           for r in searcher.search(qb, limit=None).collect()}
    freq = {int(r["doc_id"]): float(r["score"])
            for r in Searcher(searcher.ix, weighting="frequency")
            .search(Q.Term("data"), limit=None).collect()}
    for d in got:
        assert got[d] == pytest.approx(2.0 * freq[d], rel=1e-12)


def test_weighted_wraps_expansion_leaves(ix, searcher):
    # review regression: _expand must recurse into Weighted
    from whoosh_spark.search import Searcher

    q = Q.Weighted(Q.Prefix("da"), weighting="pl2")
    got = {int(r["doc_id"]): float(r["score"])
           for r in searcher.search(q, limit=None).collect()}
    ref = {int(r["doc_id"]): float(r["score"])
           for r in Searcher(ix, weighting="pl2")
           .search(Q.Prefix("da"), limit=None, optimize=False).collect()}
    assert got == ref and got
    # estimate follows the child, not corpus size
    est = searcher.ev.estimate(Q.Weighted(Q.Term("vector"), weighting="pl2"))
    n, _ = ix.global_stats()
    assert est < n


@pytest.mark.parametrize("model", ["pl2", "dfree", "tfidf", "frequency",
                                   "reverse:bm25"])
def test_weighted_oracle_matches_spark(searcher, py, model):
    # the PyIndex score() mirror must rank-match Spark under every model
    q = Q.Weighted(Q.Or([Q.Term("data"), Q.Term("vector")]),
                   weighting=model)
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in searcher.search(q, limit=10, optimize=False).collect()]
    exp = py.search(q, 10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9)
