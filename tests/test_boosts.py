"""Per-posting boost weights (PositionBoosts format,
``src/whoosh/formats.py::PositionBoosts ≈L300``) via the sparse overlay
side table (boosts.py): weight = Σ occurrence boosts replaces tf in BM25."""

from __future__ import annotations

import math

import pytest

from whoosh_spark.boosts import token_boost_overlay
from whoosh_spark.config import BM25_B, BM25_K1
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher

ROWS = [
    (0, "alpha^3 beta gamma common words here"),
    (1, "alpha beta^0.5 beta gamma common words"),
    (2, "delta gamma common words appear again"),
    (3, "common words appear again without marks"),
]


@pytest.fixture(scope="module")
def bix(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    base = InvertedIndex.build(docs, analyzer="boosted")
    return base.with_boosts(token_boost_overlay(docs))


def test_overlay_is_sparse(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    ov = token_boost_overlay(docs).collect()
    got = {(r["term"], r["doc_id"]): r["w"] for r in ov}
    # only cells whose summed boost deviates from tf appear
    assert got == {("alpha", 0): 3.0, ("beta", 1): 1.5}


def test_boosted_bm25_weight_substitution(bix):
    s = Searcher(bix)
    n, avgdl = bix.global_stats()
    dl = {int(r["doc_id"]): int(r["dl"]) for r in bix.doc_lengths.collect()}
    df_alpha = 2  # docs 0 and 1

    def bm25(w, d):
        idf = math.log(n / (df_alpha + 1)) + 1.0
        return idf * (w * (BM25_K1 + 1.0)) / (
            w + BM25_K1 * ((1.0 - BM25_B) + BM25_B * d / avgdl))

    got = {int(r["doc_id"]): float(r["score"])
           for r in s.search(Q.Term("alpha"), limit=10).collect()}
    assert got[0] == pytest.approx(bm25(3.0, dl[0]), rel=1e-12)  # boosted
    assert got[1] == pytest.approx(bm25(1.0, dl[1]), rel=1e-12)  # plain


def test_boost_changes_ranking(bix):
    s = Searcher(bix)
    ids = [int(r["doc_id"]) for r in s.search(Q.Term("alpha"), limit=5).collect()]
    assert ids[0] == 0  # tf ties at 1, boost 3 wins


def test_unboosted_terms_match_plain_index(spark, bix):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    plain = Searcher(InvertedIndex.build(docs, analyzer="boosted"))
    boosted = Searcher(bix)
    a = plain.search(Q.Term("common"), limit=10).collect()
    b = boosted.search(Q.Term("common"), limit=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


def test_wand_disabled_equals_exhaustive(bix):
    s = Searcher(bix)
    q = Q.Or([Q.Term("alpha"), Q.Term("gamma")])
    opt = s.search(q, limit=3, optimize=True).collect()
    exh = s.search(q, limit=3, optimize=False).collect()
    assert [(r["doc_id"], r["score"]) for r in opt] == \
           [(r["doc_id"], r["score"]) for r in exh]
    # and the boost is visible through the compound path
    assert int(opt[0]["doc_id"]) == 0


def test_boosted_analyzer_strips_markers(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    ix = InvertedIndex.build(docs, analyzer="boosted")
    terms = {r["term"] for r in ix.term_stats.collect()}
    assert "alpha" in terms and "beta" in terms
    assert not any("^" in t for t in terms)


def test_with_deleted_keeps_boost_overlay(spark, bix):
    # review regression: snapshot clones must carry the overlay
    deleted = spark.createDataFrame([(2,)], "doc_id long")
    ix2 = bix.with_deleted(deleted)
    assert ix2.boosts is not None
    from whoosh_spark.search import Searcher
    top = Searcher(ix2).search(Q.Term("alpha"), limit=5).collect()
    assert int(top[0]["doc_id"]) == 0  # boost still applied
