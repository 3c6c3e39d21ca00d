"""Hot-trigram (3-word nextword) phrase accelerator: ``phrase_trigrams=True``
attaches a frequency-format sub-index over "a b c" adjacency terms gated on
the same hot set as the pair segment, and 3-word slop-1 all-hot Phrases
resolve their match set (and phrase tf) from one term lookup — the
adversarial case the chained pair gate declines on payoff grounds.

Design source: Williams, Zobel & Bahle, "Fast Phrase Querying with Combined
Indexes", ACM TOIS 2004 (nextword/phrase-index combination)."""

import pytest

from whoosh_spark.analysis.analyzers import make_hot_trigrams_fn
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


def test_hot_trigrams_extractor():
    fn = make_hot_trigrams_fn(frozenset({"web", "index", "data", "xx"}))
    toks, poss = fn("web index data")
    assert toks == ["web index data"] and poss == [0]
    # stop-word gap breaks adjacency ("the" is stopped, leaves ordinal gap)
    toks, _ = fn("web the index data")
    assert toks == []
    # a cold constituent suppresses the trigram
    toks, _ = fn("web index cold")
    assert toks == []
    # overlapping trigrams each emit
    toks, poss = fn("web index data xx")
    assert toks == ["web index data", "index data xx"] and poss == [0, 1]


def test_build_validation():
    import pandas as pd
    from whoosh_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
    with pytest.raises(ValueError, match="pair_min_df"):
        InvertedIndex.build(docs, phrase_pairs=True, phrase_trigrams=True)
    with pytest.raises(ValueError, match="phrase_pairs"):
        InvertedIndex.build(docs, phrase_trigrams=True)


@pytest.fixture(scope="module")
def tri_searcher(spark, sf0001_documents):
    return Searcher(InvertedIndex.build(
        sf0001_documents, phrase_pairs=True, pair_min_df=0.02,
        phrase_trigrams=True))


@pytest.fixture(scope="module")
def plain_searcher(spark, sf0001_documents):
    return Searcher(InvertedIndex.build(sf0001_documents))


def _topk(s, q, k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in s.search(q, limit=k).collect()]


TRIGRAMS = [
    Q.Phrase(["big", "data", "query"]),
    Q.Phrase(["the", "big", "data"]),       # stop-gap ordinal semantics
    Q.Phrase(["data", "data", "data"]),     # repeated-word trigram
    Q.Phrase(["big", "data", "query"], boost=2.5),
    Q.Phrase(["the", "big", "data"], scoring="freq"),
    Q.Phrase(["data", "query", "table"], scoring="freq"),
    Q.Phrase(["zzz", "absent", "words"]),   # nowhere in the corpus
]


@pytest.mark.parametrize("q", TRIGRAMS, ids=[repr(p)[:44] for p in TRIGRAMS])
def test_trigram_path_matches_positional(plain_searcher, tri_searcher, q):
    assert _topk(tri_searcher, q) == _topk(plain_searcher, q)


def test_trigram_actually_routes(tri_searcher, monkeypatch):
    # the all-hot 3-word phrase must take the paired plan, not fall through
    ev = tri_searcher.ev
    q = Q.Phrase(["big", "data", "query"])
    ev._prime_stats(q)
    out = ev._eval_phrase_paired(
        q, list(q.words), sorted(set(q.words)), ev._fkey(None))
    assert out is not None


def test_cold_constituent_not_routed_and_correct(spark, sf0001_documents,
                                                 plain_searcher,
                                                 tri_searcher):
    # a below-threshold word falls back to the positional plan (where the
    # rare-slot gate covers it) — and stays rank-identical.  sf0.001's
    # vocab has no truly rare words, so pick the threshold from measured
    # dfs: "vector" cold, "big"/"data" hot
    cands = ["big", "data", "the", "query", "vector", "table"]
    stats = tri_searcher.ix.stats_for_terms(cands)
    cands = [t for t in cands if t in stats]
    by_df = sorted(cands, key=lambda t: int(stats[t]["df"]))
    cold, hot1, hot2 = by_df[0], by_df[-1], by_df[-2]
    thr = int(stats[cold]["df"]) + 1
    assert thr <= int(stats[hot2]["df"]), "fixture assumption broke"
    sh = Searcher(InvertedIndex.build(
        sf0001_documents, phrase_pairs=True, pair_min_df=thr,
        phrase_trigrams=True))
    ev = sh.ev
    q = Q.Phrase([hot1, hot2, cold], slop=1)
    ev._prime_stats(q)
    assert ev._eval_phrase_paired(
        q, list(q.words), sorted(set(q.words)), ev._fkey(None)) is None
    assert _topk(sh, q) == _topk(plain_searcher, q)


def test_slop2_not_routed(tri_searcher):
    ev = tri_searcher.ev
    q = Q.Phrase(["big", "data", "query"], slop=2)
    assert ev._eval_phrase_paired(
        q, list(q.words), sorted(set(q.words)), ev._fkey(None)) is None


def test_sequence_three_slots_routes_and_matches(plain_searcher,
                                                 tri_searcher):
    q = Q.Sequence([Q.Term("the"), Q.Term("big"), Q.Term("data")], slop=1)
    assert _topk(tri_searcher, q) == _topk(plain_searcher, q)


def test_persisted_trigram_roundtrip_and_invalidation(spark,
                                                      sf0001_documents,
                                                      plain_searcher,
                                                      tmp_path):
    import json

    from whoosh_spark import store

    path = str(tmp_path / "tix")
    man = store.write_index(sf0001_documents, path, phrase_pairs=True,
                            pair_min_df=0.02, phrase_trigrams=True)
    assert man["phrase_trigrams"] is True
    ix = store.load_index(spark, path)
    assert getattr(ix, "trigrams", None) is not None
    s = Searcher(ix)
    q = Q.Phrase(["big", "data", "query"], slop=1)
    assert _topk(s, q) == _topk(plain_searcher, q)
    # plain compaction keeps both segments (vouched by inner manifests)
    store.compact_index(spark, path)
    man2 = json.loads(open(f"{path}/manifest.json").read())
    assert man2["phrase_pairs"] and man2["phrase_trigrams"]
    assert getattr(store.load_index(spark, path), "trigrams", None) \
        is not None
    # upsert changes the doc set -> BOTH accel segments drop
    store.upsert_documents(spark, path, sf0001_documents.limit(3),
                           key="doc_id")
    man3 = json.loads(open(f"{path}/manifest.json").read())
    assert not man3.get("phrase_pairs") and not man3.get("phrase_trigrams")
    ix3 = store.load_index(spark, path)
    assert getattr(ix3, "pairs", None) is None
    assert getattr(ix3, "trigrams", None) is None


def test_build_pair_segment_trigram_upgrade(spark, sf0001_documents,
                                            plain_searcher, tmp_path):
    from whoosh_spark import store

    path = str(tmp_path / "uix")
    store.write_index(sf0001_documents, path)
    man = store.build_pair_segment(spark, path, pair_min_df=0.02,
                                   phrase_trigrams=True)
    assert man["phrase_pairs"] and man["phrase_trigrams"]
    ix = store.load_index(spark, path)
    assert getattr(ix, "trigrams", None) is not None
    q = Q.Phrase(["the", "big", "data"], slop=1)
    assert _topk(Searcher(ix), q) == _topk(plain_searcher, q)


def test_rebuild_without_trigrams_drops_stale_segment(spark,
                                                      sf0001_documents,
                                                      tmp_path):
    # review round-5: a pairs-only rebuild must drop a previous
    # generation's trigram segment, and compaction must not resurrect it
    import json
    import os

    from whoosh_spark import store

    path = str(tmp_path / "six")
    store.write_index(sf0001_documents, path, phrase_pairs=True,
                      pair_min_df=0.02, phrase_trigrams=True)
    assert os.path.isdir(f"{path}/trigram_index")
    store.write_index(sf0001_documents, path, phrase_pairs=True,
                      pair_min_df=0.02)
    assert not os.path.isdir(f"{path}/trigram_index")
    man = json.loads(open(f"{path}/manifest.json").read())
    assert man["phrase_pairs"] and not man.get("phrase_trigrams")
    store.compact_index(spark, path)
    man2 = json.loads(open(f"{path}/manifest.json").read())
    assert man2["phrase_pairs"] and not man2.get("phrase_trigrams")


def test_trigram_upgrade_skips_complete_pair_segment(spark,
                                                     sf0001_documents,
                                                     tmp_path):
    # review round-5: the trigram upgrade used to rebuild the whole pair
    # segment; with a complete same-threshold segment it must be reused
    from whoosh_spark import store
    from whoosh_spark import fs as FS

    path = str(tmp_path / "uix2")
    store.write_index(sf0001_documents, path)
    store.build_pair_segment(spark, path, pair_min_df=0.02)
    pair_log_before = FS.read_text(f"{path}/pair_index/_build_log.jsonl")
    man = store.build_pair_segment(spark, path, pair_min_df=0.02,
                                   phrase_trigrams=True)
    assert man["phrase_trigrams"]
    # the pair segment was not touched (same build log byte-for-byte)
    assert FS.read_text(f"{path}/pair_index/_build_log.jsonl") \
        == pair_log_before
    assert getattr(store.load_index(spark, path), "trigrams", None) \
        is not None


def test_trigram_join_variant_matches(plain_searcher, tri_searcher,
                                      monkeypatch):
    # force the large-match-set equi-join branch
    from whoosh_spark import config

    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 0)
    q = Q.Phrase(["the", "big", "data"])
    assert _topk(tri_searcher, q) == _topk(plain_searcher, q)
