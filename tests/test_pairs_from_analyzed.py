"""Round-5 pair-build fast path: the adjacent-pair analyzed stream is
DERIVED from the parent index's persisted ``analyzed/`` token segment
(positions → adjacencies, ``analysis/udfs.py::make_pairs_from_analyzed``)
instead of re-tokenizing the raw corpus.  The derived segment must be
bit-identical to the raw-text analyze path's
(``store.py::_derive_pair_analyzed``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import build as B
from whoosh_spark import store
from whoosh_spark.analysis.analyzers import make_hot_pairs_fn
from whoosh_spark.analysis.udfs import (
    ANALYZED_SCHEMA,
    make_pairs_from_analyzed,
)
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


def _rows(df):
    return sorted(
        ((int(r["doc_id"]), int(r["len_raw"]), int(r["dl"]),
          tuple(r["terms"]), tuple(int(t) for t in r["tfs"]),
          tuple(bytes(b) for b in r["pos_blobs"]))
         for r in df.collect()),
        key=lambda t: t[0])


@pytest.mark.parametrize("hot", [None, frozenset({"big", "data", "query",
                                                  "the", "scan", "table"})])
def test_kernel_matches_text_path(spark, sf0001_documents, hot):
    """Kernel-level bit identity: deriving pairs from the analyzed stream
    must reproduce the raw-text pair analyzer's output exactly — same
    entry order (first occurrence), tfs, and encoded position blobs."""
    docs = sf0001_documents.select("doc_id", "text")
    parent = B.analyzed_docs(docs, "doc_id", "text", format="positions")
    derived = parent.select(
        "doc_id", "len_raw", "dl", "terms", "tfs", "pos_blobs"
    ).mapInArrow(make_pairs_from_analyzed(hot), schema=ANALYZED_SCHEMA)
    fn = make_hot_pairs_fn(hot) if hot is not None else None
    via_text = B.analyzed_docs(
        docs, "doc_id", "text", format="positions",
        analyzer="adjacent_pairs" if hot is None else "standard",
        analyzer_fn=fn)
    assert _rows(derived) == _rows(via_text)


def test_persisted_pair_segment_bit_identical(spark, tmp_path,
                                              sf0001_documents,
                                              monkeypatch):
    """End-to-end: write_index(phrase_pairs=True) through the derive path
    produces the same pair blocks/term_stats as the raw-text path."""
    docs = sf0001_documents.select("doc_id", "text")
    p_derived = str(tmp_path / "dv")
    store.write_index(docs, p_derived, phrase_pairs=True)
    p_text = str(tmp_path / "tx")
    monkeypatch.setattr(store, "_derive_pair_analyzed",
                        lambda *a, **k: False)
    store.write_index(docs, p_text, phrase_pairs=True)

    def blocks(path):
        return sorted(
            (r["term"], int(r["bucket"]), int(r["blk"]), int(r["n"]),
             bytes(r["ids"]),
             None if r["weights"] is None else bytes(r["weights"]),
             str(r["w_const"]), int(r["min_id"]), int(r["max_id"]),
             float(r["max_weight"]), int(r["sum_tf"]))
            for r in spark.read.parquet(f"{path}/pair_index/blocks")
            .select("term", "bucket", "blk", "n", "ids", "weights",
                    "w_const", "min_id", "max_id", "max_weight",
                    "sum_tf").collect())

    def tstats(path):
        return sorted(
            (r["term"], int(r["df"]), int(r["cf"]))
            for r in spark.read.parquet(f"{path}/pair_index/term_stats")
            .select("term", "df", "cf").collect())

    assert blocks(p_derived) == blocks(p_text)
    assert tstats(p_derived) == tstats(p_text)


def test_hot_threshold_derivation_matches(spark, tmp_path, sf0001_documents,
                                          monkeypatch):
    docs = sf0001_documents.select("doc_id", "text")
    p_derived = str(tmp_path / "dv")
    store.write_index(docs, p_derived, phrase_pairs=True, pair_min_df=50)
    p_text = str(tmp_path / "tx")
    monkeypatch.setattr(store, "_derive_pair_analyzed",
                        lambda *a, **k: False)
    store.write_index(docs, p_text, phrase_pairs=True, pair_min_df=50)
    td = sorted((r["term"], int(r["df"])) for r in spark.read.parquet(
        f"{p_derived}/pair_index/term_stats").select("term", "df").collect())
    tt = sorted((r["term"], int(r["df"])) for r in spark.read.parquet(
        f"{p_text}/pair_index/term_stats").select("term", "df").collect())
    assert td == tt and td  # non-empty: the hot head exists at this df


def test_derived_segment_answers_queries(spark, tmp_path, sf0001_documents):
    path = str(tmp_path / "ix")
    store.write_index(sf0001_documents.select("doc_id", "text"), path,
                      phrase_pairs=True)
    s = Searcher(store.load_index(spark, path))
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    for q in (Q.Phrase(["big", "data"]),
              Q.Phrase(["big", "data"], scoring="freq"),
              Q.Phrase(["zzz", "absent"])):
        a = [(int(r["doc_id"]), round(float(r["score"]), 9))
             for r in s.search(q, limit=10).collect()]
        b = [(int(r["doc_id"]), round(float(r["score"]), 9))
             for r in s0.search(q, limit=10).collect()]
        assert a == b


def test_frequency_format_parent_falls_back(spark, tmp_path,
                                            sf0001_documents):
    """A frequency-format parent has no positions to invert: derivation
    declines, and the text fallback demands a corpus when none is
    reachable (store_text=False)."""
    docs = sf0001_documents.select("doc_id", "text")
    path = str(tmp_path / "ix")
    store.write_index(docs, path, format="frequency")
    with pytest.raises(ValueError, match="store_text"):
        store.build_pair_segment(spark, path)
    store.build_pair_segment(spark, path, docs=docs)
    ix = store.load_index(spark, path)
    assert ix.pairs is not None
    st = ix.pairs.stats_for_terms(["big data"])
    assert "big data" in st


def test_stale_text_path_checkpoints_dropped(spark, tmp_path,
                                             sf0001_documents,
                                             monkeypatch):
    """A partial text-path pair build (same threshold) left analyze
    batches behind; the derive path must not double-count them."""
    docs = sf0001_documents.select("doc_id", "text")
    path = str(tmp_path / "ix")
    store.write_index(docs, path)
    # simulate the partial text build: pair dir prepared + one batch
    pair_min = store._resolve_pair_min_df(spark, path, 0)
    store._prepare_pair_dir(path, pair_min)
    stale = B.analyzed_docs(docs.limit(50), "doc_id", "text",
                            analyzer="adjacent_pairs", format="frequency")
    stale.withColumn("chunk", F.lit(0)).write.mode("overwrite").parquet(
        f"{path}/pair_index/analyzed/batch=7")
    store._append_log(f"{path}/pair_index", {
        "phase": "analyze", "batch": 7, "chunks": [0],
        "analyzer": "adjacent_pairs", "posting_format": "frequency",
        "wall_ms": 0, "ts": 0})
    store.build_pair_segment(spark, path)
    ix = store.load_index(spark, path)
    # df of any pair must not exceed the doc count (double-counting would)
    mx = spark.read.parquet(f"{path}/pair_index/term_stats").agg(
        F.max("df")).collect()[0][0]
    n = spark.read.parquet(f"{path}/doc_lengths").count()
    assert mx <= n
    # and results match a clean build
    s = Searcher(ix)
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    q = Q.Phrase(["big", "data"])
    assert [int(r["doc_id"]) for r in s.search(q, limit=10).collect()] == \
        [int(r["doc_id"]) for r in s0.search(q, limit=10).collect()]
