"""Multi-field Schema + BM25F semantics (``src/whoosh/fields.py::Schema
≈L1200``, ``scoring.py::BM25F ≈L140`` per-field B/boost; MultifieldParser
``qparser/default.py ≈L350``).  Reference-style: tiny fixtures, inline
expected relationships."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from whoosh_spark import FieldSpec, InvertedIndex, MultiFieldIndex, Searcher
from whoosh_spark.config import BM25_K1
from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark index engine", "fast distributed spark engine for search", "en"),
        (1, "whoosh library", "pure python search library with spark notes", "en"),
        (2, "cooking pasta", "boil water add pasta and salt", "fr"),
        (3, "spark tuning", "shuffle partitions and memory tuning for spark", "en"),
        (4, "running shoes", "marathon training requires good running shoes", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, title string, body string, lang string")


@pytest.fixture(scope="module")
def mix(docs):
    return MultiFieldIndex.build(
        docs,
        fields={"title": FieldSpec("title"), "body": FieldSpec("body"),
                "lang": FieldSpec("lang")},
        default_field="body",
    )


def _hits(s, q, **kw):
    return [(int(r["doc_id"]), float(r["score"]))
            for r in s.search(q, limit=None, optimize=False, **kw)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()).collect()]


def test_fielded_term_routes_to_field(mix):
    s = Searcher(mix)
    title_hits = {d for d, _ in _hits(s, Q.Term("spark", fieldname="title"))}
    body_hits = {d for d, _ in _hits(s, Q.Term("spark", fieldname="body"))}
    assert title_hits == {0, 3}
    assert body_hits == {0, 1, 3}


def test_unfielded_equals_default_field(mix, docs):
    s = Searcher(mix)
    single = Searcher(InvertedIndex.build(docs, text_col="body"))
    assert _hits(s, Q.Term("spark")) == _hits(single, Q.Term("spark"))


def test_cross_field_and_sums_scores(mix):
    s = Searcher(mix)
    both = dict(_hits(s, Q.And([Q.Term("spark", fieldname="title"),
                                Q.Term("spark", fieldname="body")])))
    t = dict(_hits(s, Q.Term("spark", fieldname="title")))
    b = dict(_hits(s, Q.Term("spark", fieldname="body")))
    assert set(both) == {0, 3}
    for d in both:
        assert both[d] == pytest.approx(t[d] + b[d], rel=1e-12)


def test_multifield_or_parser(mix):
    s = Searcher(mix)
    q = parse_query("spark", fields=["title", "body", "lang"],
                    multifield=["title", "body"])
    got = dict(_hits(s, q))
    t = dict(_hits(s, Q.Term("spark", fieldname="title")))
    b = dict(_hits(s, Q.Term("spark", fieldname="body")))
    assert set(got) == set(t) | set(b)
    for d in got:
        assert got[d] == pytest.approx(t.get(d, 0.0) + b.get(d, 0.0), rel=1e-12)


def test_field_prefix_parsing(mix):
    q = parse_query("title:spark AND lang:en", fields=["title", "body", "lang"])
    fts = dict(q.field_terms())
    assert fts == {"title": "spark", "lang": "en"}
    # unknown field prefix stripped (legacy behavior)
    q2 = parse_query("nosuch:spark", fields=["title", "body"])
    assert q2 == Q.Term("spark")


def test_fielded_phrase(mix):
    s = Searcher(mix)
    hits = {d for d, _ in _hits(s, Q.Phrase(["running", "shoes"], fieldname="body"))}
    assert hits == {4}
    none = _hits(s, Q.Phrase(["running", "shoes"], fieldname="title"))
    # title of doc 4 is "running shoes" — present there too
    assert {d for d, _ in none} == {4}


def test_per_field_b_and_boost(docs):
    """b=0 removes length normalization; boost multiplies the field score."""
    plain = MultiFieldIndex.build(
        docs, fields={"body": FieldSpec("body")}, default_field="body")
    tuned = MultiFieldIndex.build(
        docs, fields={"body": FieldSpec("body", b=0.0, boost=3.0)},
        default_field="body")
    sp, st = Searcher(plain), Searcher(tuned)
    n, avgdl = plain.primary.global_stats()
    stats = plain.primary.stats_for_terms(["spark"])["spark"]
    idf = math.log(n / (stats["df"] + 1)) + 1.0
    got = dict(_hits(st, Q.Term("spark")))
    # with b=0 the score is idf * tf(K1+1)/(tf+K1), independent of dl
    posts = {int(r["doc_id"]): float(r["tf"])
             for r in plain.primary.postings(["spark"]).collect()}
    for d, sc in got.items():
        tf = posts[d]
        expect = 3.0 * idf * (tf * (BM25_K1 + 1)) / (tf + BM25_K1)
        assert sc == pytest.approx(expect, rel=1e-9)


def test_stemming_field(spark):
    docs = spark.createDataFrame(
        [(0, "running runner runs"), (1, "walked walking")],
        "doc_id long, text string")
    mix = MultiFieldIndex.build(
        docs, fields={"text": FieldSpec("text", analyzer="stemming")},
        default_field="text")
    terms = {r["term"] for r in mix.primary.term_stats.collect()}
    assert "run" in terms and "walk" in terms
    s = Searcher(mix)
    # query-side text is analyzed with the standard chain; search the stem
    assert {d for d, _ in _hits(s, Q.Term("run"))} == {0}


def test_wand_eligibility_with_fields(mix):
    s = Searcher(mix)
    # round 2: single-field fielded batches are WAND-eligible (field's own
    # block metadata + B/boost feed the bounds); mixed-field batches are not
    assert s._wand_terms(Q.Term("spark", fieldname="title")) == \
        (["spark"], "sum", 0.0, "title")
    assert s._wand_terms(Q.Term("spark")) == (["spark"], "sum", 0.0, None)
    assert s._wand_terms(Q.Or([Q.Term("a", fieldname="title"),
                               Q.Term("b")])) is None


def test_fielded_wand_matches_exhaustive(spark, monkeypatch):
    """WAND on a fielded term batch (non-default field, boost+B override)
    must equal the exhaustive evaluator path — MIN_BLOCKS forced to 0 so
    the fielded bound math (theta seed, survivor predicate, completion)
    actually executes at this corpus size."""
    from whoosh_spark.execution import wand as W
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex
    from whoosh_spark.query import ast as Q
    from whoosh_spark.search import Searcher

    monkeypatch.setattr(W, "MIN_BLOCKS_FOR_WAND", 0)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .withColumn("title", F.concat(F.lit("title "), F.col("text")))
    mix = MultiFieldIndex.build(
        docs,
        fields={"text": FieldSpec("text"),
                "title": FieldSpec("title", boost=2.0, b=0.5)},
        default_field="text")
    s = Searcher(mix)
    q = Q.Or([Q.Term("data", fieldname="title"),
              Q.Term("vector", fieldname="title")])
    fast = s.search(q, limit=10).collect()
    slow = s.search(q, limit=10, optimize=False).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in fast] == \
           [(r["doc_id"], round(r["score"], 9)) for r in slow]


def test_multifield_key_terms_dfr_models(mix):
    # review regression: total_field_length must delegate to the primary
    # sub-index so bo2/kl expansion models work on schema-backed searchers
    from whoosh_spark.search import Searcher

    s = Searcher(mix)
    for model in ("bo1", "bo2", "kl"):
        rows = s.key_terms([0, 1], top=3, model=model).collect()
        assert rows and all(r["keyness"] >= 0 for r in rows), model
