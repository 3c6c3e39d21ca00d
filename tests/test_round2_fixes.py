"""Regression tests for the round-1 ADVICE findings:

1. WAND survivor predicate must keep blocks whose upper bound exactly equals
   the threshold (uniform-score corpora would otherwise return empty).
2. compact_index(purge_deleted=True) must physically rewrite analyzed/ so a
   LATER compaction cannot resurrect purged docs.
3. The varint width table must cover the full 10-byte range (doc ids >= 2^42).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.codec.blocks import _varint_lens, varint_encode
from whoosh_spark.execution import wand as W
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


def test_wand_uniform_score_corpus_not_pruned_empty(spark, monkeypatch):
    """Every doc identical ⇒ every block ub == θ; survivor must use >=."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(300)],
        "doc_id long, text string")
    ix = InvertedIndex.build(docs)
    monkeypatch.setattr(W, "MIN_BLOCKS_FOR_WAND", 0)
    out = W.wand_topk(ix, ["alpha"], 10).orderBy("doc_id").limit(10).collect()
    assert [int(r["doc_id"]) for r in out[:3]] == [0, 1, 2]
    assert len(out) == 10


def test_wand_theta_tie_docs_kept(spark, monkeypatch):
    """Docs tying the kth score with SMALLER doc_id than the seed's kth must
    win the (score DESC, doc_id ASC) tie-break — strict > pruning loses them."""
    rows = [(i, "tie common") for i in range(50)]          # 50 identical docs
    rows += [(100 + i, "common filler%d" % i) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ix = InvertedIndex.build(docs)
    s = Searcher(ix)
    exhaustive = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in s.ev.evaluate(Q.Term("tie"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10).collect()
    ]
    monkeypatch.setattr(W, "MIN_BLOCKS_FOR_WAND", 0)
    pruned = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in W.wand_topk(ix, ["tie"], 10)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10).collect()
    ]
    assert pruned == exhaustive


def test_purge_then_recompact_no_resurrection(spark, tmp_path):
    """ADVICE high: after purge, analyzed/ must not still hold purged docs."""
    rows = [(i, f"u{i}", f"shared token doc{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    path = str(tmp_path / "ixp")
    store.write_index(docs, path, chunk_bits=4, chunks_per_commit=8)
    store.delete_documents(spark, path, doc_ids=[5])
    store.compact_index(spark, path, purge_deleted=True)
    ix = store.load_index(spark, path)
    assert ix.global_stats()[0] == 19
    assert Searcher(ix).search(Q.Term("doc5"), limit=None, optimize=False).count() == 0

    # a SECOND compaction with no overlay left — round 1 resurrected doc 5
    store.compact_index(spark, path)
    ix2 = store.load_index(spark, path)
    assert ix2.global_stats()[0] == 19
    assert Searcher(ix2).search(Q.Term("doc5"), limit=None, optimize=False).count() == 0


def test_varint_lens_covers_full_range():
    """Widths must match varint_encode for every magnitude up to 2^63."""
    vals = np.array(
        [0, 1, 127, 128, (1 << 14) - 1, 1 << 14, (1 << 42) - 1, 1 << 42,
         (1 << 49), (1 << 56), (1 << 62), (1 << 63) - 1],
        dtype=np.uint64)
    lens = _varint_lens(vals)
    for v, ln in zip(vals, lens):
        enc = varint_encode(np.array([v], dtype=np.uint64))
        assert len(enc) == ln, f"value {v}: table {ln} vs encoded {len(enc)}"


def test_simhash_banding_full_recall_at_radius(spark):
    """Pairs at Hamming 4..6 must be found with max_hamming=6 (round-1 bug:
    fixed 4x16 banding only guaranteed radius 3)."""
    from whoosh_spark.pipeline import dedup

    # docs sharing most tokens — simhash distances land in the 0..10 range
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" extra{i} extra{i}b") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash60(docs).collect()}
    want = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for a in sh for b in sh if a < b
        if bin(sh[a] ^ sh[b]).count("1") <= 6
    }
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dedup.simhash_near_dups(docs, max_hamming=6).collect()}
    assert got == want


@pytest.fixture(scope="module")
def ix(sf0001_documents):
    from whoosh_spark.index import InvertedIndex

    return InvertedIndex.build(sf0001_documents)


class TestReviewRound2b:
    def test_andnot_inert_b_with_missing_term(self, ix):
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        q_fast = Q.AndNot(Q.Term("data"),
                          Q.And([Q.Term("query"), Q.Term("zzz_absent")]))
        fast = s.search(q_fast, limit=None, optimize=False).count()
        plain = s.search(Q.Term("data"), limit=None, optimize=False).count()
        # b-side And with a missing term matches nothing -> AndNot == a
        assert fast == plain

    def test_empty_multiterm_empties_and_and_sequence(self, ix):
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        assert s.search(Q.And([Q.Term("data"), Q.Prefix("zzzz")]),
                        limit=None, optimize=False).count() == 0
        assert s.search(Q.Sequence([Q.Term("data"), Q.Prefix("zzzz")]),
                        limit=None, optimize=False).count() == 0

    def test_with_deleted_after_stats_cached(self, ix, spark):
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        Searcher(ix).search(Q.Term("data"), limit=1).collect()  # warm stats
        deleted = spark.createDataFrame([(0,)], "doc_id long")
        s2 = Searcher(ix.with_deleted(deleted), weighting="dfree")
        # dfree needs total_field_length() — crashed before the fix
        assert s2.search(Q.Term("data"), limit=3).count() > 0

    def test_zero_vector_ranks_last(self, spark):
        from whoosh_spark.pipeline import similarity

        rows = [(0, [0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]),
                (2, [0.5, 0.5, 0.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        top = similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=3).collect()
        assert top[0]["vec_id"] == 1 and top[-1]["vec_id"] == 0
        assert top[-1]["cos"] == 0.0
        pairs = similarity.embedding_near_dups_exact(df, tau=0.5).collect()
        assert all(0 not in (r["a"], r["b"]) for r in pairs)
