"""Writer-object API parity (``src/whoosh/writing.py``): IndexWriter /
AsyncWriter / BufferedWriter as thin surfaces over the incremental-commit
machinery (micro-segments + commit_segments + upsert + compaction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher
from whoosh_spark.writing import AsyncWriter, BufferedWriter, IndexWriter


def _topk(s, q, k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in s.search(q, limit=k).collect()]


@pytest.fixture()
def docs_with_url(sf0001_documents):
    return sf0001_documents.select(
        "doc_id",
        F.concat(F.lit("u"), F.col("doc_id")).alias("url"),
        "text")


@pytest.fixture()
def base_ix(spark, tmp_path, docs_with_url):
    path = str(tmp_path / "ix")
    store.write_index(docs_with_url.where("doc_id < 400"), path,
                      store_text=True)
    return path


def test_add_commit_matches_full_rebuild(spark, base_ix, docs_with_url,
                                         sf0001_documents):
    """Docs added through the writer must score exactly like a from-scratch
    build over the union (commit_segments' bit-identity invariant)."""
    extra = docs_with_url.where("doc_id >= 400").collect()
    w = IndexWriter(spark, base_ix)
    for r in extra:
        w.add_document(doc_id=int(r["doc_id"]), url=r["url"], text=r["text"])
    res = w.commit()
    assert res["adds"] == len(extra)
    s = Searcher(store.load_index(spark, base_ix))
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    for q in (Q.Term("data"), Q.And([Q.Term("big"), Q.Term("data")]),
              Q.Phrase(["big", "data"])):
        assert _topk(s, q) == _topk(s0, q)


def test_auto_id_assignment(spark, base_ix):
    w = IndexWriter(spark, base_ix)
    w.add_document(url="u-new-1", text="freshly added data row")
    w.add_document(url="u-new-2", text="another fresh data row")
    w.commit()
    ids = [r[0] for r in spark.read.parquet(base_ix + "/doc_lengths")
           .agg(F.max("doc_id")).collect()]
    assert ids[0] == 400 + 1  # two docs above the prior max 399


def test_update_and_delete_flow(spark, base_ix):
    url = "u5"
    w = IndexWriter(spark, base_ix)
    w.update_document(url=url, text="replacement text entirely zzznewterm")
    w.delete_document(7)
    w.commit()
    s = Searcher(store.load_index(spark, base_ix))
    hits = {d for d, _ in _topk(s, Q.Term("zzznewterm"))}
    assert len(hits) == 1 and 5 not in hits  # new version got a fresh id
    assert 7 not in {d for d, _ in _topk(s, Q.Every(), k=500)}


def test_delete_by_term(spark, base_ix):
    w = IndexWriter(spark, base_ix)
    w.delete_by_term("vector")
    w.commit()
    s = Searcher(store.load_index(spark, base_ix))
    assert _topk(s, Q.Term("vector")) == []


def test_cancel_and_reuse_guard(spark, base_ix):
    w = IndexWriter(spark, base_ix)
    w.add_document(text="never committed")
    w.cancel()
    with pytest.raises(ValueError, match="committed or cancelled"):
        w.add_document(text="x")
    # nothing leaked into the index
    assert store.uncommitted_batches(base_ix) == []


def test_context_manager_commits_and_cancels(spark, base_ix):
    n0 = int(store.load_index(spark, base_ix).manifest["n_docs"])
    with IndexWriter(spark, base_ix) as w:
        w.add_document(text="ctx managed doc data")
    assert int(store.load_index(spark, base_ix).manifest["n_docs"]) == n0 + 1
    with pytest.raises(RuntimeError):
        with IndexWriter(spark, base_ix) as w:
            w.add_document(text="doomed")
            raise RuntimeError("boom")
    assert int(store.load_index(spark, base_ix).manifest["n_docs"]) == n0 + 1


def test_merge_false_leaves_segment_pending(spark, base_ix):
    w = IndexWriter(spark, base_ix)
    w.add_document(text="pending doc data")
    w.commit(merge=False)
    assert len(store.uncommitted_batches(base_ix)) == 1
    store.commit_segments(spark, base_ix)
    assert store.uncommitted_batches(base_ix) == []


def test_async_writer_joins(spark, base_ix):
    w = AsyncWriter(spark, base_ix)
    w.add_document(text="async committed data doc")
    w.commit()
    res = w.join(timeout=120)
    assert res is not None and res["adds"] == 1
    s = Searcher(store.load_index(spark, base_ix))
    assert len(_topk(s, Q.Term("async"))) == 1


def test_buffered_writer_autocommit_and_searcher(spark, base_ix):
    w = BufferedWriter(spark, base_ix, limit=3)
    for i in range(3):
        w.add_document(text=f"buffered doc number{i} data")
    # limit hit -> auto-flushed, no pending buffer
    assert not w._adds
    w.add_document(text="straggler bufferedterm data")
    s = w.searcher()  # folds the straggler before searching
    assert len(_topk(s, Q.Term("bufferedterm"))) == 1
    w.close()


def test_interleaved_writers_serialize_via_lock(spark, base_ix):
    """Two writers committing concurrently on one path must serialize:
    both documents present afterwards, distinct auto-ids, and no fold
    loses the other's micro-segment (round-5 commit-lock regression)."""
    wa = AsyncWriter(spark, base_ix)
    wa.add_document(url="u-race-a", text="racing writer alpha zzzraceterm")
    wb = IndexWriter(spark, base_ix)
    wb.add_document(url="u-race-b", text="racing writer beta zzzraceterm")
    wa.commit()       # background fold starts
    wb.commit()       # must queue behind wa's lock, then fold on top
    assert wa.join(timeout=300) is not None
    s = Searcher(store.load_index(spark, base_ix))
    hits = {d for d, _ in _topk(s, Q.Term("zzzraceterm"))}
    assert len(hits) == 2  # both docs survived, under distinct ids
    import json

    urls = {r["url"] for r in spark.read.parquet(base_ix + "/docs")
            .where(F.col("url").startswith("u-race")).collect()}
    assert urls == {"u-race-a", "u-race-b"}
    # the lock file is released after both commits
    import os

    assert not os.path.exists(base_ix + "/_writer.lock")


def test_stale_lock_is_broken(spark, base_ix, tmp_path):
    """A crashed writer's lock (old timestamp) must not wedge the index."""
    import json
    import time as _t

    from whoosh_spark import fs as FS
    from whoosh_spark.writing import LOCK_FILE

    FS.create_exclusive(FS.join(base_ix, LOCK_FILE),
                        json.dumps({"pid": 0, "ts": _t.time() - 10_000}))
    w = IndexWriter(spark, base_ix)
    w.add_document(url="u-after-crash", text="post crash data zzzcrash")
    w.commit()  # breaks the stale lock instead of timing out
    s = Searcher(store.load_index(spark, base_ix))
    assert len(_topk(s, Q.Term("zzzcrash"))) == 1


def test_busy_lock_times_out(spark, base_ix):
    import json
    import time as _t

    import pytest as _pt

    from whoosh_spark import fs as FS
    from whoosh_spark.writing import LOCK_FILE, LockError, _commit_lock

    FS.create_exclusive(FS.join(base_ix, LOCK_FILE),
                        json.dumps({"pid": 1, "ts": _t.time()}))
    with _pt.raises(LockError):
        with _commit_lock(base_ix, timeout=0.5):
            pass
    FS.remove(FS.join(base_ix, LOCK_FILE))
