"""Persisted index store: write → load parity, resumability, lineage log.

Reference semantics: Whoosh TOC/segment commit (``src/whoosh/index.py::TOC``,
``writing.py::SegmentWriter.commit ≈L900``) and the north_rule resumable-build
requirement (BASELINE.md "resumability" row).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


def _table_hash(df, cols):
    """Order-insensitive content hash of selected columns."""
    h = (
        df.select(F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
        .collect()[0][0]
    )
    return h


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ixstore"))


def test_write_load_query_parity(spark, sf0001_documents, store_path):
    path = store_path + "/full"
    manifest = store.write_index(sf0001_documents, path, chunk_bits=7,
                                 chunks_per_commit=2)
    assert manifest["n_docs"] == sf0001_documents.count()
    assert manifest["n_terms"] > 0

    mem = Searcher(InvertedIndex.build(sf0001_documents, cache=False))
    disk = Searcher(store.load_index(spark, path))
    q = Q.And([Q.Term("data"), Q.Term("query")])
    a = [(r["doc_id"], round(r["score"], 9)) for r in mem.search(q, limit=10).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in disk.search(q, limit=10).collect()]
    assert a == b


def test_resume_after_kill_identical(spark, sf0001_documents, store_path):
    full = store_path + "/oneshot"
    part = store_path + "/resumed"
    store.write_index(sf0001_documents, full, chunk_bits=7, chunks_per_commit=2)

    # simulate kill: only 1 analyze batch commits
    r = store.write_index(sf0001_documents, part, chunk_bits=7,
                          chunks_per_commit=2, max_batches=1)
    assert r["status"] == "partial"
    assert len(store.completed_chunks(part)) == 2

    # resume to completion
    store.write_index(sf0001_documents, part, chunk_bits=7, chunks_per_commit=2)

    for tbl, cols in [
        ("blocks", ["field", "term", "bucket", "blk", "n", "min_id", "max_id",
                    "max_weight", "sum_tf", "min_len"]),
        ("term_stats", ["field", "term", "df", "cf", "max_weight", "min_id", "max_id"]),
        ("doc_lengths", ["doc_id", "len_raw", "dl"]),
    ]:
        h1 = _table_hash(spark.read.parquet(f"{full}/{tbl}"), cols)
        h2 = _table_hash(spark.read.parquet(f"{part}/{tbl}"), cols)
        assert h1 == h2, tbl

    # resumed build skipped completed chunks (lineage shows no re-analysis)
    analyzed_chunks = [c for rec in store.build_log(part)
                       if rec["phase"] == "analyze" for c in rec["chunks"]]
    assert len(analyzed_chunks) == len(set(analyzed_chunks))


def test_build_log_counters(spark, sf0001_documents, store_path):
    path = store_path + "/full"  # written by first test
    log = store.build_log(path)
    analyze_recs = [r for r in log if r["phase"] == "analyze"]
    assert analyze_recs and all(r["wall_ms"] >= 0 for r in log)
    n_docs = sum(c["n_docs"] for r in analyze_recs for c in r["counters"].values())
    assert n_docs == sf0001_documents.count()
    n_tokens = sum(c["n_tokens"] for r in analyze_recs for c in r["counters"].values())
    total_len = spark.read.parquet(path + "/field_stats").collect()[0]["total_len"]
    assert n_tokens == total_len
    assert [r["phase"] for r in log][-1] == "merge"


def test_blocks_parquet_sorted_for_pruning(spark, sf0001_documents, store_path):
    """Persisted blocks are sorted by term ⇒ parquet min/max stats prune term
    lookups (SURVEY.md §2.1 OrderedHashWriter analog)."""
    path = store_path + "/full"
    ix = store.load_index(spark, path)
    plan = ix.blocks.where(F.col("term") == "data")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "term" in plan


def test_export_to_iceberg_gates_on_runtime(spark, tmp_path):
    """No Iceberg runtime in this container: the sink swap must fail with
    an actionable error, not a deep Py4J stack."""
    import pytest

    from whoosh_spark import store

    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        store.export_to_iceberg(spark, str(tmp_path), "cat.db.ix")


def test_write_index_extends_after_upsert(spark, tmp_path):
    """Incremental write_index must tolerate string batch ids left in the
    build log by upsert/purge compactions."""
    from whoosh_spark import store

    path = str(tmp_path / "ix")
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(8)], "doc_id long, text string")
    store.write_index(docs, path)
    store.upsert_documents(
        spark, path,
        spark.createDataFrame([(100, "gamma delta")], "doc_id long, text string"),
        key="doc_id")
    # extend with new chunks — used to crash on max() over int|str batch ids
    more = spark.createDataFrame(
        [(1 << 17, "epsilon zeta")], "doc_id long, text string")
    manifest = store.write_index(docs.unionByName(more), path)
    assert manifest["status"] != "partial" if "status" in manifest else True
    ix = store.load_index(spark, path)
    assert ix.docs.where("doc_id = 131072").count() == 1


def test_failed_tail_chain_invalidates_manifest(spark, tmp_path, monkeypatch):
    """If one of the concurrent phase-2 tail chains fails mid-rebuild, the
    sibling chains may already have overwritten their tables for the NEW
    corpus while the manifest still describes the OLD generation.  The build
    must drop the manifest (load_index refuses mixed state) and a re-run
    must repair the index from the analyze checkpoints."""
    from whoosh_spark import build as B
    from whoosh_spark import store

    path = str(tmp_path / "ix")
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(8)], "doc_id long, text string")
    store.write_index(docs, path)  # healthy generation exists

    real = B.doc_lengths

    def _boom(*a, **k):
        raise RuntimeError("injected chain failure")

    monkeypatch.setattr(B, "doc_lengths", _boom)
    docs2 = spark.createDataFrame(
        [(i, f"gamma delta doc{i}") for i in range(8, 20)],
        "doc_id long, text string")
    with pytest.raises(RuntimeError, match="injected chain failure"):
        store.write_index(docs2, path)
    with pytest.raises(FileNotFoundError):
        store.load_index(spark, path)

    monkeypatch.setattr(B, "doc_lengths", real)
    manifest = store.write_index(docs2, path)  # resume rewrites the tail
    ix = store.load_index(spark, path)
    assert manifest["n_docs"] == ix.doc_lengths.count()


def test_generation_refresh_lifecycle(spark, sf0001_documents, tmp_path):
    """index.py::Index.up_to_date ≈L380 / refresh ≈L390 / latest_generation
    ≈L370: every commit (write / delete overlay / compact) stamps a
    strictly-increasing generation; a stale reader notices and refresh()
    re-opens at the newest one."""
    path = str(tmp_path / "gen_ix")
    store.write_index(sf0001_documents.limit(200), path, chunk_bits=7)
    g0 = store.latest_generation(path)
    assert g0 > 0

    ix = store.load_index(spark, path)
    assert ix.generation() == g0
    assert ix.up_to_date()
    assert ix.refresh() is ix                     # current → same object

    # in-memory build: never stale (RamStorage analog)
    mem = InvertedIndex.build(sf0001_documents.limit(50), cache=False)
    assert mem.generation() == -1
    assert mem.up_to_date() and mem.refresh() is mem

    # a soft delete bumps the generation even within the same second
    n = store.delete_documents(spark, path, doc_ids=[0, 1])
    assert n == 2
    g1 = store.latest_generation(path)
    assert g1 > g0
    assert not ix.up_to_date()
    ix2 = ix.refresh()
    assert ix2 is not ix and ix2.generation() == g1
    assert ix2.deleted is not None and ix2.deleted.count() == 2

    # zero-match delete does not bump
    assert store.delete_documents(spark, path, where="doc_id < 0") == 0
    assert store.latest_generation(path) == g1
    assert ix2.up_to_date()

    # compaction commits a new generation; refreshing picks up the purge
    store.compact_index(spark, path, purge_deleted=True)
    g2 = store.latest_generation(path)
    assert g2 > g1 and not ix2.up_to_date()
    ix3 = ix2.refresh()
    assert ix3.generation() == g2 and ix3.deleted is None


def test_searcher_refresh_lifecycle(spark, sf0001_documents, tmp_path):
    """searching.py::Searcher.up_to_date ≈L290 / refresh ≈L300: a searcher on
    a stale generation reports it and refresh() yields a new searcher on the
    latest commit (preserving weighting); a current one returns itself."""
    from whoosh_spark.multifield import MultiFieldIndex

    path = str(tmp_path / "s_gen_ix")
    store.write_index(sf0001_documents.limit(200), path, chunk_bits=7)
    s = Searcher(store.load_index(spark, path), weighting="tfidf")
    assert s.up_to_date()
    assert s.refresh() is s

    store.delete_documents(spark, path, doc_ids=[3])
    assert not s.up_to_date()
    s2 = s.refresh()
    assert s2 is not s
    assert s2.up_to_date()
    assert s2.weighting == s.weighting                  # weighting carried
    assert s2.ix.deleted is not None

    # the fresh searcher excludes the newly deleted doc
    ids2 = {r["doc_id"] for r in s2.search(Q.Every(), limit=None).collect()}
    assert 3 not in ids2

    # multi-field families delegate to their children (in-memory → current)
    mf = MultiFieldIndex.build(
        sf0001_documents.limit(50), {"text": "text"}, default_field="text"
    )
    assert mf.generation() == -1
    assert mf.up_to_date() and mf.refresh() is mf
    ms = Searcher(mf)
    assert ms.up_to_date() and ms.refresh() is ms
