"""Regressions for the round-4 review findings (ADVICE.md r03).

1. compact_index must vouch the pair accelerator from the segment's OWN
   records (pair_index/_pair_meta.json), not the pre-compaction outer
   manifest — a crash between the inner pair build and the outer manifest
   commit otherwise re-vouches a hot-only segment at pair_min_df=0, routing
   rare-constituent phrases to a silent empty result.
2. build_pair_segment must honor a non-default id_col (recorded in the
   manifest since this round).
3. merge_indexes' self-merge guard must canonicalize Hadoop-style
   'file:/x' and scheme-case spellings, not just the literal 'file://'.
4. The hot-pair extractor must accept a pyspark Broadcast (shipped once
   per executor) in place of a closure-captured frozenset.
"""

from __future__ import annotations

import json
import os

import pytest

from whoosh_spark import store
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


def _topk(s, q, k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in s.search(q, limit=k).collect()]


def _manifest(path):
    with open(os.path.join(path, "manifest.json")) as fh:
        return json.load(fh)


# ---- 1: crash-window pair vouching ----------------------------------------

def test_compact_vouches_pair_threshold_from_meta(spark, tmp_path,
                                                  sf0001_documents):
    """Simulate the crash window: pair segment complete (inner manifest +
    _pair_meta.json written) but the OUTER manifest never got the
    phrase_pairs commit.  A doc-set-preserving compaction must re-vouch
    with the segment's real threshold, not the stale manifest's 0."""
    docs = sf0001_documents.select("doc_id", "text")
    path = str(tmp_path / "ix")
    store.write_index(docs, path, phrase_pairs=True, pair_min_df=50)
    m = _manifest(path)
    assert m["pair_min_df"] == 50
    # wind the outer manifest back to the pre-pair-build state (the crash)
    m.pop("phrase_pairs")
    m["pair_min_df"] = 0
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(m, fh)

    store.compact_index(spark, path)
    m2 = _manifest(path)
    assert m2["phrase_pairs"] is True
    assert m2["pair_min_df"] == 50, \
        "compaction must take the threshold from _pair_meta.json"
    ix = store.load_index(spark, path)
    assert ix.pair_min_df == 50
    # rare-constituent phrase: must fall through to the positional plan and
    # match the reference ranking (the bug returned a silent empty here)
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    sh = Searcher(ix)
    stats = ix.stats_for_terms(["big", "dup"])
    assert stats["dup"]["df"] < 50, "fixture assumption: 'dup' is rare"
    q = Q.Phrase(["big", "dup"])
    assert _topk(sh, q) == _topk(s0, q)
    assert len(_topk(sh, q)) > 0


def test_compact_does_not_vouch_metaless_pair_dir(spark, tmp_path,
                                                  sf0001_documents):
    """A pair dir whose _pair_meta.json is missing has no authoritative
    threshold — compaction must refuse to vouch for it."""
    docs = sf0001_documents.select("doc_id", "text")
    path = str(tmp_path / "ix")
    store.write_index(docs, path, phrase_pairs=True, pair_min_df=50)
    os.remove(os.path.join(path, "pair_index", "_pair_meta.json"))
    store.compact_index(spark, path)
    m = _manifest(path)
    assert m["phrase_pairs"] is False and m["pair_min_df"] == 0
    assert store.load_index(spark, path).pairs is None


# ---- 2: non-default id_col through the upgrade path ------------------------

def test_build_pair_segment_nondefault_id_col(spark, tmp_path,
                                              sf0001_documents):
    docs = sf0001_documents.selectExpr("doc_id as docno", "text")
    path = str(tmp_path / "ix")
    store.write_index(docs, path, id_col="docno")
    assert _manifest(path)["id_col"] == "docno"
    # the original corpus has no 'doc_id' column — the fix reads id_col
    # from the manifest instead of hard-coding it
    store.build_pair_segment(spark, path, docs=docs)
    ix = store.load_index(spark, path)
    assert ix.pairs is not None
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    q = Q.Phrase(["big", "data"])
    assert _topk(Searcher(ix), q) == _topk(s0, q)


# ---- 3: self-merge guard canonicalization ----------------------------------

@pytest.mark.parametrize("spell", [
    lambda p: "file://" + p,
    lambda p: "file:" + p,          # Hadoop single-slash spelling
    lambda p: "FILE://" + p,        # scheme case
    lambda p: p + "/",              # trailing slash
])
def test_merge_self_merge_guard_spellings(spark, tmp_path, sf0001_documents,
                                          spell):
    docs = sf0001_documents.select("doc_id", "text")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    store.write_index(docs.where("doc_id < 50"), a)
    store.write_index(docs.where("doc_id >= 50 and doc_id < 100"), b)
    with pytest.raises(ValueError, match="must not be one of the sources"):
        store.merge_indexes(spark, [spell(a), b], a)


# ---- 4: broadcast-shipped hot set ------------------------------------------

def test_hot_pairs_fn_accepts_broadcast(spark):
    from whoosh_spark.analysis.analyzers import make_hot_pairs_fn

    bc = spark.sparkContext.broadcast(frozenset({"data", "query"}))
    fn = make_hot_pairs_fn(bc)
    toks, poss = fn("data query rareword data")
    assert toks == ["data query"] and poss == [0]
    # second call hits the resolved cell, same result
    assert fn("data query")[0] == ["data query"]


def test_persisted_hot_pair_build_uses_broadcast(spark, tmp_path,
                                                 sf0001_documents):
    """End-to-end: the persisted hot-only pair build (which now ships the
    hot set via broadcast) still produces a rank-identical accelerator."""
    docs = sf0001_documents.select("doc_id", "text")
    path = str(tmp_path / "ix")
    store.write_index(docs, path, phrase_pairs=True, pair_min_df=50)
    ix = store.load_index(spark, path)
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    q = Q.Phrase(["big", "data"])
    assert _topk(Searcher(ix), q) == _topk(s0, q)
