"""Streaming micro-segment ingestion + soft-delete overlay semantics."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher
from whoosh_spark.streaming import compact_index, stream_index


def test_stream_ingest_then_compact_equals_batch(spark, sf0001_documents, tmp_path):
    path = str(tmp_path / "six")
    ckpt = str(tmp_path / "ckpt")
    land = str(tmp_path / "landing")
    sf0001_documents.select("doc_id", "text").write.parquet(land)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(land)
    )
    q = stream_index(stream, path, ckpt, trigger_once=True)
    q.awaitTermination(300)
    manifest = compact_index(spark, path, store_docs=sf0001_documents)
    assert manifest["n_docs"] == sf0001_documents.count()

    batch = Searcher(InvertedIndex.build(sf0001_documents, cache=False))
    streamed = Searcher(store.load_index(spark, path))
    qq = Q.And([Q.Term("data"), Q.Term("query")])
    a = [(r["doc_id"], round(r["score"], 9)) for r in batch.search(qq, 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in streamed.search(qq, 10).collect()]
    assert a == b


def test_soft_delete_overlay(spark, sf0001_documents, tmp_path):
    path = str(tmp_path / "ixdel")
    store.write_index(sf0001_documents, path, chunk_bits=8, chunks_per_commit=4)
    s = Searcher(store.load_index(spark, path))
    top = s.search(Q.Term("data"), limit=5).collect()
    victim = int(top[0]["doc_id"])

    n = store.delete_documents(spark, path, doc_ids=[victim])
    assert n == 1
    s2 = Searcher(store.load_index(spark, path))
    top2 = s2.search(Q.Term("data"), limit=5).collect()
    assert victim not in [int(r["doc_id"]) for r in top2]
    # scores of remaining docs unchanged (deleted-but-unpurged: stats intact)
    assert round(top2[0]["score"], 9) == round(top[1]["score"], 9)
    # exhaustive path also filters
    top3 = s2.search(Q.Term("data"), limit=5, optimize=False).collect()
    assert [int(r["doc_id"]) for r in top2] == [int(r["doc_id"]) for r in top3]


def test_delete_by_predicate(spark, sf0001_documents, tmp_path):
    path = str(tmp_path / "ixdel2")
    store.write_index(sf0001_documents, path, chunk_bits=8, chunks_per_commit=4)
    n = store.delete_documents(spark, path, where="lang = 'zh'")
    assert n == sf0001_documents.where("lang = 'zh'").count()
    ix = store.load_index(spark, path)
    s = Searcher(ix)
    res = s.search(Q.Every(), limit=None).join(
        ix.docs.select("doc_id", "lang"), "doc_id")
    assert res.where("lang = 'zh'").count() == 0
