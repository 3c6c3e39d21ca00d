"""Adjacent-pair (nextword) phrase accelerator.

Design source: Williams, Zobel & Bahle, "Fast Phrase Querying with Combined
Indexes" (ACM TOIS 2004).  The pair sub-index stores one frequency posting
per doc per "a b" ordinal adjacency, so a two-word slop-1 Phrase resolves
its match set — and for scoring='freq' its tf — without decoding any
position stream.  Upstream has no such accelerator
(``src/whoosh/query/positional.py::Phrase ≈L60`` always walks positions);
results must be RANK-IDENTICAL to the positional plan either way.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.analysis.analyzers import analyze_text_adjacent_pairs
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


# ---- extractor semantics --------------------------------------------------

def test_pairs_require_ordinal_adjacency():
    # "the" is a stop word: removed but its position gap is preserved, so
    # web..index are NOT adjacent and must not form a pair
    toks, poss = analyze_text_adjacent_pairs("web the index")
    assert toks == [] and poss == []


def test_pairs_differ_from_biword_chain():
    from whoosh_spark.analysis.analyzers import analyze_text_biword

    # BiWordFilter (upstream parity) happily bridges the stop gap —
    # exactly why it cannot serve as the slop-1 certificate
    assert analyze_text_biword("web the index")[0] == ["web-index"]
    assert analyze_text_adjacent_pairs("web index")[0] == ["web index"]


def test_pairs_repeated_and_positions():
    toks, poss = analyze_text_adjacent_pairs("data data data query")
    assert toks == ["data data", "data data", "data query"]
    assert poss == [0, 1, 2]


# ---- rank identity vs the positional plan ---------------------------------

@pytest.fixture(scope="module")
def pair_ix(spark, sf0001_documents):
    return InvertedIndex.build(sf0001_documents, phrase_pairs=True)


@pytest.fixture(scope="module")
def pair_searcher(pair_ix):
    return Searcher(pair_ix)


def _topk(s, q, k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in s.search(q, limit=k).collect()]


PHRASES = [
    Q.Phrase(["big", "data"]),
    Q.Phrase(["data", "data"]),            # repeated-word pair
    Q.Phrase(["big", "data"], boost=2.5),
    Q.Phrase(["big", "data"], scoring="freq"),
    Q.Phrase(["data", "query"], scoring="freq"),
    Q.Phrase(["zzz", "absent"]),           # pair nowhere in the corpus
]


@pytest.mark.parametrize("q", PHRASES, ids=[repr(p)[:40] for p in PHRASES])
def test_pair_path_matches_positional(searcher, pair_searcher, q):
    assert _topk(pair_searcher, q) == _topk(searcher, q)


def test_pair_path_join_variant_matches(searcher, pair_searcher, monkeypatch):
    """Force the large-match-set branch (equi-join instead of in-decoder
    broadcast) and require identical results."""
    from whoosh_spark import config

    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 0)
    q = Q.Phrase(["big", "data"])
    assert _topk(pair_searcher, q) == _topk(searcher, q)


@pytest.mark.parametrize("q", [
    Q.Phrase(["big", "data"], slop=2),             # slop>1: not certified
    Q.Phrase(["big", "data", "query"]),            # 3 words: not certified
])
def test_pair_path_not_routed_and_still_correct(searcher, pair_searcher, q):
    ev = pair_searcher.ev
    assert ev._eval_phrase_paired(
        q, list(q.words), sorted(set(q.words)), ev._fkey(q.fieldname)) is None
    assert _topk(pair_searcher, q) == _topk(searcher, q)


def test_pair_plan_never_reads_positions(tmp_path, spark, sf0001_documents):
    path = str(tmp_path / "pix")
    store.write_index(sf0001_documents, path, phrase_pairs=True)
    ix = store.load_index(spark, path)
    assert ix.pairs is not None
    df = Searcher(ix).search(Q.Phrase(["big", "data"]), limit=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "positions" not in plan
    # and the results off the persisted accel index match the in-memory
    # positional plan
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    assert _topk(Searcher(ix), Q.Phrase(["big", "data"])) == \
        _topk(s0, Q.Phrase(["big", "data"]))


# ---- lifecycle: attachment + invalidation ---------------------------------

@pytest.fixture()
def persisted_pair_ix(tmp_path, spark, sf0001_documents):
    path = str(tmp_path / "ix")
    store.write_index(sf0001_documents, path, phrase_pairs=True)
    return path


def _flag(path):
    with open(os.path.join(path, "manifest.json")) as fh:
        return json.load(fh).get("phrase_pairs", False)


def test_delete_overlay_keeps_pairs_valid(spark, persisted_pair_ix,
                                          sf0001_documents):
    path = persisted_pair_ix
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    top = _topk(s0, Q.Phrase(["big", "data"]))
    store.delete_documents(spark, path, [top[0][0]])
    ix = store.load_index(spark, path)
    assert ix.pairs is not None  # soft delete filters at query time
    got = _topk(Searcher(ix), Q.Phrase(["big", "data"]))
    assert top[0][0] not in [d for d, _ in got]
    assert got == [t for t in _topk(s0, Q.Phrase(["big", "data"]), k=11)
                   if t[0] != top[0][0]][:10]


def test_upsert_invalidates_pairs(spark, persisted_pair_ix, sf0001_documents):
    path = persisted_pair_ix
    store.upsert_documents(spark, path,
                           sf0001_documents.limit(2).select("source", "text"),
                           key="source")
    assert not _flag(path)
    assert store.load_index(spark, path).pairs is None


def test_purge_compact_invalidates_but_plain_compact_keeps(
        spark, persisted_pair_ix):
    path = persisted_pair_ix
    store.compact_index(spark, path)
    assert _flag(path)
    assert store.load_index(spark, path).pairs is not None
    store.delete_documents(spark, path, [0])
    store.compact_index(spark, path, purge_deleted=True)
    assert not _flag(path)
    assert store.load_index(spark, path).pairs is None


def test_merge_indexes_drops_stale_dst_pairs(spark, tmp_path,
                                             sf0001_documents):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    dst = str(tmp_path / "dst")
    docs = sf0001_documents.select("doc_id", "text")
    store.write_index(docs.where("doc_id < 100"), a)
    store.write_index(docs.where("doc_id >= 100 and doc_id < 200"), b)
    # pre-existing accel segment at dst from an earlier generation
    store.write_index(docs.where("doc_id >= 200"), dst, phrase_pairs=True)
    store.merge_indexes(spark, [a, b], dst)
    assert not _flag(dst)
    assert store.load_index(spark, dst).pairs is None


def test_build_pair_segment_upgrades_existing_index(spark, tmp_path,
                                                    sf0001_documents):
    """The OPTIMIZE-style upgrade: attach the accelerator to an index built
    without it; results must match the positional plan."""
    path = str(tmp_path / "ix")
    docs = sf0001_documents.select("doc_id", "text")
    store.write_index(docs, path)
    assert store.load_index(spark, path).pairs is None
    # round-5: no docs needed — the pair stream derives from the index's
    # own analyzed/ token segment (store_text=False is fine)
    store.build_pair_segment(spark, path)
    ix = store.load_index(spark, path)
    assert ix.pairs is not None
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    assert _topk(Searcher(ix), Q.Phrase(["big", "data"])) == \
        _topk(s0, Q.Phrase(["big", "data"]))
    # idempotent: second call is a no-op, not a rebuild
    m = store.build_pair_segment(spark, path)
    assert m["phrase_pairs"] is True


# ---- hot-only pair segment (pair_min_df) ----------------------------------

def test_hot_pairs_extractor_filters_both_sides():
    from whoosh_spark.analysis.analyzers import make_hot_pairs_fn

    fn = make_hot_pairs_fn(frozenset({"data", "query"}))
    toks, poss = fn("data query rareword data")
    assert toks == ["data query"] and poss == [0]


def test_pair_min_df_routes_only_hot_phrases(spark, searcher,
                                             sf0001_documents):
    """With a high threshold, below-threshold phrases take the positional
    plan (router returns None); hot-hot phrases route through the pair
    segment — and both give rank-identical results."""
    ixh = InvertedIndex.build(sf0001_documents, phrase_pairs=True,
                              pair_min_df=100)
    sh = Searcher(ixh)
    dfs = {t: st["df"] for t, st in
           ixh.stats_for_terms(["big", "data", "the"]).items()}
    hot = [t for t in ("big", "data", "the") if dfs.get(t, 0) >= 100]
    cold = [t for t in ("big", "data") if dfs.get(t, 0) < 100]
    assert len(hot) >= 2, f"fixture assumption broke: dfs={dfs}"
    q_hot = Q.Phrase(hot[:2])
    assert _topk(sh, q_hot) == _topk(searcher, q_hot)
    if cold:
        q_cold = Q.Phrase([cold[0], hot[0]])
        ev = sh.ev
        ev._prime_stats(q_cold)
        assert ev._eval_phrase_paired(
            q_cold, list(q_cold.words), sorted(set(q_cold.words)),
            ev._fkey(None)) is None
        assert _topk(sh, q_cold) == _topk(searcher, q_cold)


def test_pair_min_df_persisted_roundtrip(spark, tmp_path, sf0001_documents):
    path = str(tmp_path / "ix")
    docs = sf0001_documents.select("doc_id", "text")
    store.write_index(docs, path, phrase_pairs=True, pair_min_df=50)
    ix = store.load_index(spark, path)
    assert ix.pair_min_df == 50
    assert ix.pairs is not None
    # hot-hot phrase through the persisted hot-only segment
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    q = Q.Phrase(["big", "data"])
    assert _topk(Searcher(ix), q) == _topk(s0, q)
    # the hot-only dictionary must be strictly smaller than the full one
    full = str(tmp_path / "full")
    store.write_index(docs, full, phrase_pairs=True)
    n_hot = store.load_index(spark, path).pairs.term_stats.count()
    n_full = store.load_index(spark, full).pairs.term_stats.count()
    assert 0 < n_hot < n_full


def test_fractional_pair_min_df_resolves_to_absolute(spark, tmp_path,
                                                     sf0001_documents):
    """pair_min_df in (0,1) means df >= frac*N, resolved and stored as an
    absolute df so the router needs no corpus size."""
    path = str(tmp_path / "ix")
    store.write_index(sf0001_documents.select("doc_id", "text"), path,
                      phrase_pairs=True, pair_min_df=0.1)
    ix = store.load_index(spark, path)
    n = int(ix.manifest["n_docs"])
    assert ix.pair_min_df == max(1, int(0.1 * n))
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    q = Q.Phrase(["big", "data"])
    assert _topk(Searcher(ix), q) == _topk(s0, q)


# ---- review-finding regressions -------------------------------------------

def test_build_pair_segment_nondefault_text_col(spark, tmp_path,
                                                sf0001_documents):
    """The upgrade path must honor the index's declared text column."""
    docs = sf0001_documents.selectExpr("doc_id", "text as body")
    path = str(tmp_path / "ix")
    store.write_index(docs, path, text_col="body")
    store.build_pair_segment(spark, path, docs=docs)
    ix = store.load_index(spark, path)
    assert ix.pairs is not None
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    assert _topk(Searcher(ix), Q.Phrase(["big", "data"])) == \
        _topk(s0, Q.Phrase(["big", "data"]))


def test_threshold_change_rebuilds_pair_checkpoints(spark, tmp_path,
                                                    sf0001_documents):
    """Re-opting-in with a DIFFERENT pair_min_df must not resume checkpoints
    extracted under the old hot set (they pair different tokens)."""
    docs = sf0001_documents.select("doc_id", "text")
    path = str(tmp_path / "ix")
    # first build: threshold so high nothing is hot -> empty pair dict
    store.write_index(docs, path, phrase_pairs=True, pair_min_df=10**9)
    ix = store.load_index(spark, path)
    assert ix.pairs.term_stats.count() == 0
    # rebuild at threshold 0: checkpoints must be wiped, full pairs appear
    store.write_index(docs, path, phrase_pairs=True, pair_min_df=0)
    ix2 = store.load_index(spark, path)
    assert ix2.pair_min_df == 0
    assert ix2.pairs.term_stats.count() > 0
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    assert _topk(Searcher(ix2), Q.Phrase(["big", "data"])) == \
        _topk(s0, Q.Phrase(["big", "data"]))


def test_pair_subindex_writes_no_stored_docs(spark, tmp_path,
                                             sf0001_documents):
    path = str(tmp_path / "ix")
    store.write_index(sf0001_documents.select("doc_id", "text"), path,
                      phrase_pairs=True)
    assert not os.path.exists(os.path.join(path, "pair_index", "docs"))
    assert store.load_index(spark, path).pairs is not None


def test_compact_with_uncommitted_segments_drops_pairs(spark, tmp_path,
                                                       sf0001_documents):
    """A compaction that folds pending micro-segments changes the doc set —
    it must invalidate the pair accelerator, not re-vouch for it."""
    import shutil as _sh

    docs = sf0001_documents.select("doc_id", "text")
    path = str(tmp_path / "ix")
    store.write_index(docs.where("doc_id < 400"), path, phrase_pairs=True)
    assert store.load_index(spark, path).pairs is not None
    # simulate a streamed micro-segment: analyzed batch dir + analyze log
    # record with no commit/merge after it
    from whoosh_spark import build as B

    delta = B.analyzed_docs(docs.where("doc_id >= 400"))
    bid = "stream-test"
    delta.withColumn("chunk", F.lit(-1)).write.parquet(
        os.path.join(path, "analyzed", f"batch={bid}"))
    store._append_log(path, {"phase": "analyze", "batch": bid, "chunks": [],
                             "counters": {}, "wall_ms": 0, "ts": 0})
    assert store.uncommitted_batches(path) == [bid]
    store.compact_index(spark, path)
    assert not _flag(path)
    ix = store.load_index(spark, path)
    assert ix.pairs is None
    # and the folded docs are searchable positionally
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    assert _topk(Searcher(ix), Q.Phrase(["big", "data"])) == \
        _topk(s0, Q.Phrase(["big", "data"]))


# ---- Sequence routing through the pair path -------------------------------

SEQS = [
    Q.Sequence([Q.Term("big"), Q.Term("data")]),
    Q.Sequence([Q.Term("big"), Q.Term("data")], boost=2.0),
    Q.Sequence([Q.Term("data"), Q.Term("data")]),      # dup term: slot
    # weights differ from Phrase's uniq-sum -> must NOT route
    Q.Sequence([Q.Term("big", 2.0), Q.Term("data")]),  # slot boost: no route
    Q.Sequence([Q.Term("big"), Q.Prefix("da")]),       # multiterm slot
    Q.Sequence([Q.Term("big"), Q.Term("data")], slop=2),
]


@pytest.mark.parametrize("q", SEQS, ids=[repr(s)[:45] for s in SEQS])
def test_sequence_pair_routing_matches_positional(searcher, pair_searcher, q):
    assert _topk(pair_searcher, q) == _topk(searcher, q)


def test_sequence_routes_only_plain_two_term(pair_searcher, monkeypatch):
    ev = pair_searcher.ev
    calls = []
    orig = type(ev)._eval_phrase_paired

    def spy(self, q, words, uniq, fk):
        out = orig(self, q, words, uniq, fk)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(type(ev), "_eval_phrase_paired", spy)
    ev.evaluate(Q.Sequence([Q.Term("big"), Q.Term("data")])).collect()
    assert calls == [True]  # routed through the pair plan
    calls.clear()
    ev.evaluate(Q.Sequence([Q.Term("big"), Q.Term("data")], slop=2)).collect()
    assert calls == []      # gate skipped: positional plan stands


# ---- chained pair-candidate gate (k-word slop-1, round 4) ------------------

@pytest.fixture()
def gate_on(monkeypatch):
    """Round-5 payoff model: at test-corpus scale the estimated decode
    savings never cover the gate's fixed cost, so the gate correctly
    declines.  These tests exercise the GATED plan's semantics, so they
    zero the payoff thresholds (the collect bound stays)."""
    import whoosh_spark.config as C

    monkeypatch.setattr(C, "PAIR_GATE_MIN_SAVED_ROWS", 0)
    monkeypatch.setattr(C, "PAIR_GATE_MIN_SAVED_FRAC", 0.0)
    monkeypatch.setattr(C, "PAIR_GATE_MAX_CAND_FRAC", 1.0)


PHRASES_3 = [
    Q.Phrase(["big", "data", "query"]),
    Q.Phrase(["big", "data", "data"]),          # repeated word
    Q.Phrase(["big", "data", "query"], boost=2.0),
    Q.Phrase(["big", "data", "query"], scoring="freq"),
    Q.Phrase(["big", "data", "query", "table"]),  # 4 words
    Q.Phrase(["big", "data", "zzz"]),           # absent word
]


@pytest.mark.parametrize("q", PHRASES_3,
                         ids=[" ".join(p.words) + getattr(p, "scoring", "")
                              for p in PHRASES_3])
def test_three_word_pair_gate_matches_positional(searcher, pair_searcher, q, gate_on):
    assert _topk(pair_searcher, q) == _topk(searcher, q)


def test_three_word_gate_fires_and_prunes(pair_searcher, monkeypatch, gate_on):
    """The k-word path must actually route through _pair_candidates (not
    just fall back to the positional plan)."""
    ev = pair_searcher.ev
    got = []
    orig = type(ev)._pair_candidates

    def spy(self, words, fk):
        out = orig(self, words, fk)
        got.append(out)
        return out

    monkeypatch.setattr(type(ev), "_pair_candidates", spy)
    rows = ev.evaluate(Q.Phrase(["big", "data", "query"])).collect()
    assert len(got) == 1 and got[0] is not None and len(got[0]) > 0
    # candidate set is the rarest pair's doc set: strictly fewer docs than
    # the hottest constituent's df
    st = pair_searcher.ix.stats_for_terms(["big", "data", "query"])
    assert len(got[0]) <= min(v["df"] for v in st.values())
    # and the positional verify still runs exactly over it
    assert all(int(r["doc_id"]) in set(got[0]) for r in rows)


def test_three_word_sequence_gate(searcher, pair_searcher, gate_on):
    q = Q.Sequence([Q.Term("big"), Q.Term("data"), Q.Term("query")])
    assert _topk(pair_searcher, q) == _topk(searcher, q)


def test_absent_adjacency_is_exact_empty_proof(spark):
    """Corpus where every adjacent pair of the query exists somewhere but
    the full phrase nowhere ("a b" in doc0, "b c" in doc1): the gate must
    keep candidates from pair postings and the verify must reject them —
    and when a pair is absent corpus-wide the result is empty, exactly."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta gamma delta"),
         (2, "alpha beta delta")],
        ["doc_id", "text"])
    sp = Searcher(InvertedIndex.build(docs, phrase_pairs=True))
    s0 = Searcher(InvertedIndex.build(docs))
    # pairs "alpha beta" and "beta delta" both exist, phrase only in doc2
    q = Q.Phrase(["alpha", "beta", "delta"])
    assert _topk(sp, q) == _topk(s0, q)
    assert [d for d, _ in _topk(sp, q)] == [2]
    # "delta alpha" never adjacent -> [] proof, no positional decode
    q2 = Q.Phrase(["beta", "delta", "alpha"])
    assert _topk(sp, q2) == _topk(s0, q2) == []


def test_hot_only_segment_mixed_phrase_still_exact(spark, sf0001_documents):
    """Hot-only pair segment + a phrase containing a cold word: cold pairs
    were never indexed, so their absence must NOT be taken as an empty
    proof; ranking must match the positional plan."""
    ixh = InvertedIndex.build(sf0001_documents, phrase_pairs=True,
                              pair_min_df=100)
    s0 = Searcher(InvertedIndex.build(sf0001_documents))
    sh = Searcher(ixh)
    st = ixh.stats_for_terms(["big", "data", "dup"])
    assert st["dup"]["df"] < 100 <= min(st["big"]["df"], st["data"]["df"])
    for q in (Q.Phrase(["big", "data", "dup"]),
              Q.Phrase(["dup", "big", "data"])):
        assert _topk(sh, q) == _topk(s0, q)


def test_pair_gate_payoff_measured_scenarios():
    """The round-5 payoff decision, pinned against the MEASURED scenarios
    (BENCH.md round-5 section): the adversarial 24%-selective trigram must
    decline at every scale; the selective ~3% pair fires at 5M+ and
    declines at 1M (savings below the fixed cost)."""
    from whoosh_spark.execution.evaluate import pair_gate_fires

    # adversarial "web index data": rarest pair 24% of N, constituents ~N
    assert not pair_gate_fires(240_090, [985_565, 957_348, 998_900],
                               1_000_000)
    assert not pair_gate_fires(1_200_620, [4_928_056, 4_785_533, 4_994_453],
                               5_000_000)
    assert not pair_gate_fires(2_401_940, [9_856_500, 9_570_181, 9_988_946],
                               10_000_000)
    # selective "spark crawl data": rarest pair ~3% of N
    assert not pair_gate_fires(29_500, [877_708, 685_870, 998_894],
                               1_000_000)   # saved ~2.5M < fixed cost
    assert pair_gate_fires(147_500, [4_388_541, 3_429_350, 4_994_453],
                           5_000_000)
    assert pair_gate_fires(295_011, [8_777_083, 6_858_700, 9_988_946],
                           10_000_000)
    # a genuinely rare pair in a huge corpus: collect bound governs
    assert not pair_gate_fires(2_100_000, [50_000_000, 60_000_000],
                               100_000_000)  # > MAX_DF: collect too big
    assert pair_gate_fires(1_900_000, [50_000_000, 60_000_000],
                           100_000_000)
