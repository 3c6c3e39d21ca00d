"""Incremental segment commit (writer.commit without OPTIMIZE).

The scale contract under test: folding streamed micro-segments into the
query tables must cost O(delta)+O(vocab) — delta blocks APPEND, stats merge
additively — and the committed index must rank bit-identically to a
from-scratch batch build over the same corpus (global BM25 stats exact).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher
from whoosh_spark.streaming import stream_index

QUERIES = [
    Q.Term("data"),
    Q.And([Q.Term("data"), Q.Term("query")]),
    Q.Or([Q.Term("vector"), Q.Term("window")], minmatch=1),
    Q.Phrase(["big", "data"]),
    Q.Prefix("da"),
]


def _top(searcher, q, k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in searcher.search(q, k).collect()]


@pytest.fixture(scope="module")
def committed(spark, sf0001_documents, tmp_path_factory):
    base = tmp_path_factory.mktemp("commitseg")
    docs = sf0001_documents
    n = docs.count()
    cut = (2 * n) // 3
    head = docs.where(F.col("doc_id") < cut)
    tail = docs.where(F.col("doc_id") >= cut)
    path = str(base / "ix")
    store.write_index(head, path, chunk_bits=8)
    gen0 = json_gen = store.load_index(spark, path).manifest["generation"]

    land = str(base / "landing")
    tail.select("doc_id", "text").write.parquet(land)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(land))
    q = stream_index(stream, path, str(base / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    return docs, tail, path, gen0


def test_pending_then_committed(spark, committed):
    docs, tail, path, gen0 = committed
    pending = store.uncommitted_batches(path)
    assert pending, "streamed micro-segments should be pending before commit"

    res = store.commit_segments(spark, path, store_docs=tail)
    assert sorted(res["committed"]) == sorted(pending)
    assert res["n_new_docs"] == tail.count()
    assert store.uncommitted_batches(path) == []
    # idempotent: nothing pending → no-op
    again = store.commit_segments(spark, path)
    assert again["committed"] == [] and again["n_new_docs"] == 0


def test_commit_ranks_like_batch_build(spark, committed):
    docs, tail, path, _ = committed
    inc = Searcher(store.load_index(spark, path))
    ref = Searcher(InvertedIndex.build(docs, cache=False))
    for q in QUERIES:
        assert _top(inc, q) == _top(ref, q), repr(q)


def test_commit_updates_counters_and_log(spark, committed):
    docs, tail, path, gen0 = committed
    m = store.load_index(spark, path).manifest
    assert m["n_docs"] == docs.count()
    assert m["generation"] >= gen0
    recs = [r for r in store.build_log(path) if r.get("phase") == "commit"]
    assert recs and recs[-1]["n_blocks"] > 0
    # stored fields for the streamed docs are queryable after commit
    stored = spark.read.parquet(path + "/docs")
    assert stored.count() == docs.count()


def test_commit_then_optimize_converges(spark, committed):
    """compact_index (OPTIMIZE) over an incrementally-committed index must
    keep the exact same ranking — commits don't corrupt the merge input."""
    docs, tail, path, _ = committed
    before = Searcher(store.load_index(spark, path))
    tops = [_top(before, q) for q in QUERIES]
    store.compact_index(spark, path)
    after = Searcher(store.load_index(spark, path))
    for q, t in zip(QUERIES, tops):
        assert _top(after, q) == t, repr(q)
