"""merge_indexes (writer.add_reader parity) + delete_by_query semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher

QUERIES = [
    Q.Term("data"),
    Q.And([Q.Term("data"), Q.Term("query")]),
    Q.Or([Q.Term("vector"), Q.Term("window")]),
    Q.Phrase(["big", "data"]),
]


def _top(searcher, q, k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in searcher.search(q, k).collect()]


@pytest.fixture(scope="module")
def halves(spark, sf0001_documents, tmp_path_factory):
    """Two half-corpus indexes whose LOCAL ids are both 0-based, so the
    merge offset (max_id_A + 1) restores exactly the original global ids."""
    base = tmp_path_factory.mktemp("merge")
    docs = sf0001_documents
    n = docs.count()
    cut = n // 2
    a = docs.where(F.col("doc_id") < cut)
    b = (docs.where(F.col("doc_id") >= cut)
         .withColumn("doc_id", F.col("doc_id") - cut))
    pa, pb = str(base / "ixa"), str(base / "ixb")
    store.write_index(a, pa, chunk_bits=8)
    store.write_index(b, pb, chunk_bits=8)
    return docs, cut, pa, pb, str(base)


def test_merge_equals_single_build(spark, halves):
    docs, cut, pa, pb, base = halves
    dst = base + "/merged"
    manifest = store.merge_indexes(spark, [pa, pb], dst)
    assert manifest["n_docs"] == docs.count()

    merged = Searcher(store.load_index(spark, dst))
    single = Searcher(InvertedIndex.build(docs, cache=False))
    for q in QUERIES:
        assert _top(merged, q) == _top(single, q), repr(q)


def test_merge_log_carries_lineage(spark, halves):
    _, _, pa, pb, base = halves
    dst = base + "/merged"
    recs = [r for r in store.build_log(dst)
            if r.get("phase") == "analyze" and "sources" in r]
    assert recs and recs[0]["sources"] == [pa, pb]
    assert recs[0]["offsets"][0] == 0 and recs[0]["offsets"][1] > 0


def test_merge_purges_source_deletions(spark, sf0001_documents, halves, tmp_path):
    docs, cut, pa, pb, _ = halves
    # delete one live doc from source B (local id), merge, and compare with
    # a single build over the corpus WITHOUT that doc — stats must exclude it
    sb = Searcher(store.load_index(spark, pb))
    victim_local = int(sb.search(Q.Term("data"), 1).collect()[0]["doc_id"])
    victim_global = victim_local + cut
    store.delete_documents(spark, pb, doc_ids=[victim_local])

    dst = str(tmp_path / "merged_del")
    manifest = store.merge_indexes(spark, [pa, pb], dst)
    assert manifest["n_docs"] == docs.count() - 1

    merged = Searcher(store.load_index(spark, dst))
    ref = Searcher(InvertedIndex.build(
        docs.where(F.col("doc_id") != victim_global), cache=False))
    for q in QUERIES[:2]:
        assert _top(merged, q) == _top(ref, q), repr(q)


def test_merge_refuses_mixed_analyzers(spark, sf0001_documents, tmp_path):
    pa = str(tmp_path / "std")
    pb = str(tmp_path / "stem")
    half = sf0001_documents.limit(40)
    store.write_index(half, pa, chunk_bits=8)
    store.write_index(half, pb, chunk_bits=8, analyzer="stemming")
    with pytest.raises(ValueError, match="analyzer mismatch"):
        store.merge_indexes(spark, [pa, pb], str(tmp_path / "out"))


def test_delete_by_query(spark, sf0001_documents, tmp_path):
    path = str(tmp_path / "ixq")
    store.write_index(sf0001_documents, path, chunk_bits=8)
    s = Searcher(store.load_index(spark, path))
    expected = s.docs_for_query(Q.Term("vector")).count()
    assert expected > 0

    n = store.delete_by_query(spark, path, Q.Term("vector"))
    assert n == expected

    s2 = Searcher(store.load_index(spark, path))
    assert s2.search(Q.Term("vector"), 10).count() == 0
    # other queries exclude the deleted docs but keep matching live ones
    live = s2.search(Q.Term("data"), limit=None)
    dead = s.docs_for_query(Q.Term("vector"))
    assert live.join(dead, "doc_id", "inner").count() == 0
    # string form goes through the parser (field syntax included)
    n2 = store.delete_by_query(spark, path, "vector")
    assert n2 == 0  # already deleted: matcher anti-joins the overlay
    rec = [r for r in store.build_log(path) if r.get("phase") == "delete"]
    assert rec and "query" in rec[0]
