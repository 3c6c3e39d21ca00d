"""Collector API (collectors.py) — parity with Searcher.search() and the
custom-collector extension point.

Upstream's ``collectors.py::Collector (≈L60)`` chain is re-expressed as
DataFrame transformations; every built-in chain a user can build through
``Searcher.collector(...)`` must return rank-identical rows to the
equivalent ``Searcher.search(...)`` call, and a custom subclass must slot
into the chain without touching engine internals.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import collectors as C
from whoosh_spark.query import ast as Q
from whoosh_spark.query import parse_query
from whoosh_spark.search import TimeLimitError


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in df.select("doc_id", "score").collect()]


Q_AND = parse_query("big AND data")
Q_OR = parse_query("query OR vector")


# -- chain ≡ search() parity ---------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(limit=10),
    dict(limit=None),
    dict(limit=7, collapse="source", collapse_limit=2),
    dict(limit=8, collapse="source", collapse_limit=1,
         collapse_order="n_chars"),
    dict(limit=10, sortedby="n_chars"),
    dict(limit=10, sortedby=["lang", "n_chars"], reverse=True),
])
def test_chain_matches_search(searcher, kw):
    c = searcher.collector(**kw)
    got = searcher.search_with_collector(Q_AND, c)
    want = searcher.search(Q_AND, optimize=False, **kw)
    gr, wr = _rows(got), _rows(want)
    if kw.get("sortedby") is None:
        assert gr == wr
    else:
        # sortedby drops score from the order key; compare doc order
        assert [d for d, _ in gr] == [d for d, _ in wr]
    assert c.df is got


def test_filter_mask_chain(searcher):
    filt = parse_query("table")
    mask = parse_query("vector")
    c = searcher.collector(limit=10, filter=filt, mask=mask)
    got = searcher.search_with_collector(Q_OR, c)
    want = searcher.search(Q_OR, limit=10, filter=filt, mask=mask,
                           optimize=False)
    assert _rows(got) == _rows(want)


def test_results_object(searcher):
    c = searcher.collector(limit=5)
    searcher.search_with_collector(Q_AND, c)
    res = c.results()
    assert len(res) == 5
    assert _rows(c.df)[0][0] == res[0].doc_id


# -- side-product collectors ----------------------------------------------

def test_facet_collector_groups(searcher):
    c = searcher.collector(limit=5, groupedby="source", maptype="count")
    searcher.search_with_collector(Q_AND, c)
    facet = c
    while not isinstance(facet, C.FacetCollector):
        facet = facet.child
    got = {r["source"]: int(r["n"])
           for r in facet.groups["source"].collect()}
    want = {r["source"]: int(r["n"])
            for r in searcher.facet_counts(Q_AND, "source").collect()}
    assert got == want


def test_facet_collector_doclists(searcher):
    c = searcher.collector(limit=5, groupedby="source", maptype="list")
    searcher.search_with_collector(Q_AND, c)
    facet = c
    while not isinstance(facet, C.FacetCollector):
        facet = facet.child
    # IDENTICAL schema to the facet_doclists front door (doc_ids string + n)
    got = {r["source"]: (r["doc_ids"], int(r["n"]))
           for r in facet.groups["source"].collect()}
    want = {r["source"]: (r["doc_ids"], int(r["n"]))
            for r in searcher.facet_doclists(Q_AND, "source").collect()}
    assert got == want

    cb = searcher.collector(limit=5, groupedby="source", maptype="best")
    searcher.search_with_collector(Q_AND, cb)
    fb = cb
    while not isinstance(fb, C.FacetCollector):
        fb = fb.child
    got_b = {r["source"]: (int(r["doc_id"]), round(float(r["score"]), 9))
             for r in fb.groups["source"].collect()}
    want_b = {r["source"]: (int(r["doc_id"]), round(float(r["score"]), 9))
              for r in searcher.facet_best(Q_AND, "source").collect()}
    assert got_b == want_b


def test_terms_collector(searcher):
    c = searcher.collector(limit=5, terms=True)
    out = searcher.search_with_collector(Q_AND, c)
    ids = [int(r["doc_id"]) for r in out.collect()]
    want = searcher._matched_terms_by_doc(Q_AND, ids)
    terms = c
    while not isinstance(terms, C.TermsCollector):
        terms = terms.child
    for d in ids:
        assert terms.matched_for(d) == want.get(d, set())
        assert terms.matched_for(d)  # both query terms occur in a match


def test_terms_collector_nested_in_chain(searcher):
    # TermsCollector sits INSIDE facet/filter wrappers in the standard
    # chain — its side-product must compute via finish() propagation even
    # when it is not the outermost collector
    c = searcher.collector(limit=5, terms=True, groupedby="source",
                           filter=parse_query("table"))
    out = searcher.search_with_collector(Q_AND, c)
    ids = [int(r["doc_id"]) for r in out.collect()]
    assert ids
    terms = c
    while not isinstance(terms, C.TermsCollector):
        terms = terms.child
    want = searcher._matched_terms_by_doc(Q_AND, ids)
    for d in ids:
        assert terms.matched_for(d) == want.get(d, set())
    # every nested collector also exposes the final frame and results()
    assert terms.df is c.df
    assert len(terms.results()) == len(ids)


def test_timelimit_collector_partial_and_raise(searcher):
    base = searcher.collector(limit=10)
    c = C.TimeLimitCollector(base, timelimit=60.0, partial=True)
    searcher.search_with_collector(Q_AND, c)
    assert not c.timed_out
    want = _rows(searcher.search(Q_AND, limit=10, optimize=False))
    assert [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in c.rows] == want

    tight = C.TimeLimitCollector(searcher.collector(limit=10),
                                 timelimit=0.0, partial=True)
    searcher.search_with_collector(Q_AND, tight)
    assert tight.timed_out and tight.rows == []

    hard = C.TimeLimitCollector(searcher.collector(limit=10),
                                timelimit=0.0, partial=False)
    with pytest.raises(TimeLimitError):
        searcher.search_with_collector(Q_AND, hard)


# -- the extension point ----------------------------------------------------

class BestPerSourceCollector(C.Collector):
    """Custom terminal collector: best-scoring doc per `source` bucket,
    ordered by bucket — what a user would write to get per-site winners."""

    def collect(self, ctx, scores):
        joined = scores.join(ctx.docs.select("doc_id", "source"), "doc_id")
        best = joined.groupBy("source").agg(
            F.max_by(F.struct("doc_id", "score"),
                     F.struct(F.col("score"),
                              (-F.col("doc_id")).alias("_nd"))).alias("b"))
        return best.select("source", F.col("b.doc_id").alias("doc_id"),
                           F.col("b.score").alias("score"))

    def order_keys(self, ctx):
        return [F.col("source").asc()]


def test_custom_collector(searcher):
    c = BestPerSourceCollector()
    out = searcher.search_with_collector(Q_AND, c)
    got = [(r["source"], int(r["doc_id"]), round(float(r["score"]), 9))
           for r in out.collect()]
    # oracle: top-1 collapse per source over the full match set
    full = searcher.search(Q_AND, limit=None, optimize=False)
    joined = full.join(searcher.ix.docs.select("doc_id", "source"), "doc_id")
    want = {}
    for r in joined.collect():
        k = r["source"]
        cand = (round(-float(r["score"]), 9), int(r["doc_id"]))
        if k not in want or cand < want[k]:
            want[k] = cand
    want_rows = sorted((k, d, -s) for k, (s, d) in want.items())
    assert got == [(k, d, round(s, 9)) for k, d, s in want_rows]


def test_custom_wrapper_stacks_on_chain(searcher):
    class ScoreFloorCollector(C.WrappingCollector):
        def __init__(self, child, floor):
            super().__init__(child)
            self.floor = floor

        def collect(self, ctx, scores):
            return self.child.collect(
                ctx, scores.where(F.col("score") >= self.floor))

    base = searcher.collector(limit=None)
    exact = [(int(r["doc_id"]), float(r["score"]))
             for r in searcher.search_with_collector(Q_AND, base).collect()]
    floor = exact[len(exact) // 2][1]  # full precision — matches the filter
    c = ScoreFloorCollector(searcher.collector(limit=None), floor)
    got = _rows(searcher.search_with_collector(Q_AND, c))
    assert got == [(d, round(s, 9)) for d, s in exact if s >= floor]
    assert got and len(got) < len(exact)
