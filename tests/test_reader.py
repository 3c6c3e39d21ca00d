"""IndexReader adapter (``src/whoosh/reading.py::IndexReader ≈L300-900``):
term lookup, ordered lexicon, per-doc storage, corpus stats — every method
checked against direct DataFrame computations over the same index tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import FieldSpec, InvertedIndex, MultiFieldIndex, Searcher
from whoosh_spark.query import ast as Q


@pytest.fixture(scope="module")
def rdr(ix):
    return ix.reader()


def test_doc_counts_and_field_lengths(rdr, ix):
    n_docs = ix.docs.count()
    assert rdr.doc_count_all() == n_docs
    assert rdr.doc_count() == n_docs  # no deletions on the shared index
    agg = ix.doc_lengths.agg(
        F.sum("len_raw").alias("tot"), F.min("len_raw").alias("mn"),
        F.max("len_raw").alias("mx")).collect()[0]
    assert rdr.field_length() == int(agg["tot"])
    assert rdr.min_field_length() == int(agg["mn"])
    assert rdr.max_field_length() == int(agg["mx"])


def test_term_lookup(rdr, ix):
    row = (ix.term_stats.where(F.col("term") == "data")
           .collect())[0]
    assert rdr.doc_frequency("data") == int(row["df"])
    assert rdr.frequency("data") == int(row["cf"])
    assert rdr.has_term("data") and ("text", "data") in rdr
    assert not rdr.has_term("zzzabsent")
    assert rdr.doc_frequency("zzzabsent") == 0
    assert rdr.frequency("zzzabsent") == 0
    ti = rdr.term_info("data")
    assert ti.weight() == int(row["cf"])
    assert ti.doc_frequency() == int(row["df"])
    assert ti.min_id() == int(row["min_id"])
    assert ti.max_id() == int(row["max_id"])
    assert ti.max_weight() == float(row["max_weight"])
    with pytest.raises(KeyError):
        rdr.term_info("zzzabsent")


def test_lexicon_and_prefix(rdr, ix):
    expected = sorted(r["term"] for r in
                      ix.term_stats.select("term").collect())
    got = list(rdr.lexicon())
    assert got == expected
    pre = [t for t in expected if t.startswith("da")]
    assert list(rdr.expand_prefix("da")) == pre
    assert list(rdr.all_terms()) == [("text", t) for t in expected]


def test_most_frequent_and_distinctive(rdr, ix):
    top = rdr.most_frequent_terms(number=5)
    byfreq = (ix.term_stats
              .orderBy(F.col("cf").desc(), F.col("term").asc())
              .select("cf", "term").limit(5).collect())
    assert top == [(int(r["cf"]), r["term"]) for r in byfreq]
    dis = rdr.most_distinctive_terms(number=5)
    assert len(dis) == 5 and all(isinstance(s, float) for s, _ in dis)
    assert dis == sorted(dis, key=lambda p: (-p[0], p[1]))
    # cf·idf formula spot-check against the index's own idf
    s0, t0 = dis[0]
    assert abs(s0 - rdr.frequency(t0) * ix.idf(rdr.doc_frequency(t0))) < 1e-6
    pre = rdr.most_frequent_terms(number=3, prefix="da")
    assert all(t.startswith("da") for _, t in pre)


def test_postings(rdr, ix):
    got = {(int(r["doc_id"]), int(r["tf"]))
           for r in rdr.postings("vector").collect()}
    exp = {(int(r["doc_id"]), int(r["tf"]))
           for r in ix.postings(["vector"]).select("doc_id", "tf").collect()}
    assert got == exp and got
    withpos = rdr.postings("vector", with_positions=True)
    assert set(withpos.columns) == {"doc_id", "tf", "positions"}
    rowp = withpos.limit(1).collect()[0]
    assert len(rowp["positions"]) == rowp["tf"]


def test_doc_storage(rdr, ix):
    row = ix.doc_lengths.where(F.col("doc_id") == 7).collect()[0]
    assert rdr.doc_field_length(7) == int(row["dl"])
    assert rdr.doc_field_length(10**9, default=-1) == -1
    sf = rdr.stored_fields(7)
    assert sf["doc_id"] == 7 and isinstance(sf["text"], str)
    with pytest.raises(KeyError):
        rdr.stored_fields(10**9)
    first3 = []
    for d in rdr.all_stored_fields():
        first3.append(d["doc_id"])
        if len(first3) == 3:
            break
    assert first3 == [0, 1, 2]


def test_reader_deletion_aware(spark, sf0001_documents):
    ix = InvertedIndex.build(sf0001_documents)
    dead = spark.createDataFrame([(0,), (1,)], "doc_id long")
    ix2 = ix.with_deleted(dead)
    r2 = ix2.reader()
    assert r2.doc_count_all() == ix.docs.count()  # N keeps deleted (BM25)
    assert r2.doc_count() == ix.docs.count() - 2
    # postings filter through the overlay
    alive = {int(r["doc_id"]) for r in r2.postings("data").collect()}
    assert not alive & {0, 1}
    # context-manager protocol
    with ix.reader() as r:
        assert r.doc_count() > 0


def test_reader_multifield(spark):
    rows = [
        (0, "spark index engine", "fast distributed spark engine for search"),
        (1, "whoosh library", "pure python search library with spark notes"),
        (2, "cooking pasta", "boil water add pasta and salt"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, title string, body string")
    mix = MultiFieldIndex.build(
        docs, fields={"title": FieldSpec("title"), "body": FieldSpec("body")},
        default_field="body")
    r = mix.reader()
    assert r.doc_frequency("spark", "title") == 1
    assert r.doc_frequency("spark", "body") == 2
    assert r.doc_frequency("pasta", "title") == 1
    assert ("title", "pasta") in r and ("body", "water") in r
    assert list(r.expand_prefix("sp", "title")) == ["spark"]
    allt = list(r.all_terms())
    assert allt == sorted(allt)  # field-major, term-ascending within field
    assert {f for f, _ in allt} == {"body", "title"}
    with pytest.raises(KeyError):
        r.doc_frequency("spark", "no_such_field")
    # unfielded routes to the default field
    assert r.field_length() == r.field_length("body")
    # Searcher.reader() round-trip
    assert Searcher(mix).reader().doc_count() == 3


def test_existing_terms(rdr):
    # qcore.py::Query.existing_terms ≈L240 — leaf pairs present in the index
    q = Q.And([Q.Term("data"), Q.Term("zzzabsent"),
               Q.Or([Q.Phrase(["big", "zzzgone"]), Q.Fuzzy("query")])])
    got = rdr.existing_terms(q)
    assert (None, "data") in got
    assert (None, "big") in got
    # pattern leaves (Fuzzy/Wildcard/...) contribute no exact terms —
    # upstream existing_terms(expand=False) semantics
    assert all(t not in ("zzzabsent", "zzzgone", "query") for _, t in got)


def test_existing_terms_unknown_field(rdr):
    # leaves on a field the index doesn't have are absent, not an error
    q = Q.And([Q.Term("data"), Q.Term("x", fieldname="zzznofield")])
    got = rdr.existing_terms(q)
    assert (None, "data") in got
    assert all(f != "zzznofield" for f, _ in got)
