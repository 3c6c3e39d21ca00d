"""Persisted-path analyzer threading + PositionBoosts overlay lifecycle:
write_index(analyzer=...) records the chain in the manifest, upsert reuses
it, store_boosts persists the overlay and survives upsert/purge."""

from __future__ import annotations

import pytest

from whoosh_spark import store
from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query
from whoosh_spark.search import Searcher

ROWS = [
    (0, "u0", "the runner was running many runs today"),
    (1, "u1", "a walker walks and walked slowly"),
    (2, "u2", "nothing relevant here at all"),
]

BOOST_ROWS = [
    (0, "u0", "alpha^3 beta gamma common words here"),
    (1, "u1", "alpha beta gamma common words again"),
    (2, "u2", "delta gamma common words appear again"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_write_index_records_analyzer(spark, tmp_path):
    p = str(tmp_path / "ix_stem")
    man = store.write_index(_df(spark, ROWS), p, analyzer="stemming")
    assert man["analyzer"] == "stemming"
    ix = store.load_index(spark, p)
    assert ix.analyzer == "stemming"
    s = Searcher(ix)
    q = parse_query("running", analyzer=ix.analyzer)  # tee to the index chain
    assert [r["doc_id"] for r in s.search(q, limit=5).collect()] == [0]
    # compaction keeps declaring the chain
    store.compact_index(spark, p)
    assert store.load_index(spark, p).analyzer == "stemming"


def test_resume_analyzer_guard(spark, tmp_path):
    p = str(tmp_path / "ix_guard")
    part = store.write_index(_df(spark, ROWS), p, chunk_bits=0,
                             chunks_per_commit=1, max_batches=1)
    assert part["status"] == "partial"
    with pytest.raises(ValueError, match="analyzer"):
        store.write_index(_df(spark, ROWS), p, chunk_bits=0,
                          chunks_per_commit=1, analyzer="stemming")


def test_store_boosts_requires_boosted_analyzer(spark, tmp_path):
    with pytest.raises(ValueError, match="boosted"):
        store.write_index(_df(spark, ROWS), str(tmp_path / "x"),
                          store_boosts=True)


def test_boosts_persist_and_survive_upsert_purge(spark, tmp_path):
    p = str(tmp_path / "ix_boost")
    store.write_index(_df(spark, BOOST_ROWS), p, analyzer="boosted",
                      store_boosts=True)
    ix = store.load_index(spark, p)
    assert ix.boosts is not None and ix.analyzer == "boosted"
    s = Searcher(ix)
    ids = [r["doc_id"] for r in s.search(Q.Term("alpha"), limit=5).collect()]
    assert ids == [0, 1] and ids[0] == 0  # boost 3 beats plain tf=1

    # upsert a doc with a HIGHER boost for the same term: overlay extends,
    # the new doc_id outranks
    newdoc = spark.createDataFrame(
        [("u9", "alpha^9 fresh words arrive")], "url string, text string")
    store.upsert_documents(spark, p, newdoc, key="url", text_col="text")
    ix2 = store.load_index(spark, p)
    top = Searcher(ix2).search(Q.Term("alpha"), limit=5).collect()
    assert int(top[0]["doc_id"]) == 3  # renumbered new doc wins with w=9

    # purge ghosts out of the overlay
    store.delete_documents(spark, p, doc_ids=[0])
    store.compact_index(spark, p, purge_deleted=True)
    ix3 = store.load_index(spark, p)
    left = {int(r["doc_id"]) for r in ix3.boosts.collect()}
    assert 0 not in left and 3 in left
    ids3 = [r["doc_id"] for r in
            Searcher(ix3).search(Q.Term("alpha"), limit=5).collect()]
    assert 0 not in ids3 and ids3[0] == 3


def test_rebuild_without_store_boosts_drops_stale_overlay(spark, tmp_path):
    p = str(tmp_path / "ix_drop")
    store.write_index(_df(spark, BOOST_ROWS), p, analyzer="boosted",
                      store_boosts=True)
    assert store.load_index(spark, p).boosts is not None
    # new generation, overlay not requested → must not attach stale rows
    # (same analyzer: the resume guard rightly forbids switching chains
    # over existing analyzed checkpoints)
    store.write_index(_df(spark, BOOST_ROWS), p, analyzer="boosted")
    assert store.load_index(spark, p).boosts is None


def test_searcher_parse_uses_schema(spark, tmp_path):
    p = str(tmp_path / "ix_parse")
    store.write_index(_df(spark, ROWS), p, analyzer="stemming")
    s = Searcher(store.load_index(spark, p))
    ids = [r["doc_id"] for r in s.search(s.parse("running"), limit=5).collect()]
    assert ids == [0]  # the tee happened automatically
