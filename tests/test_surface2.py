"""Second-wave surface: scorers (TF_IDF/Frequency), Otherwise/Constant,
more_like, char n-grams, upsert + purge compaction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from whoosh_spark import store
from whoosh_spark.analysis.analyzers import ngram_tokens, ngram_words
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


@pytest.fixture(scope="module")
def ix(spark, sf0001_documents):
    return InvertedIndex.build(sf0001_documents)


def test_tfidf_and_frequency_scorers(spark, ix, docs_rows):
    from whoosh_spark.analysis.analyzers import analyze_text

    n = len(docs_rows)
    tf = {}
    df = 0
    for did, text in docs_rows:
        toks, _ = analyze_text(text)
        c = toks.count("data")
        if c:
            tf[did] = c
            df += 1
    idf = math.log(n / (df + 1)) + 1.0

    s_tfidf = Searcher(ix, weighting="tfidf")
    got = {r["doc_id"]: r["score"]
           for r in s_tfidf.search(Q.Term("data"), limit=None).collect()}
    assert set(got) == set(tf)
    for did in list(tf)[:20]:
        assert abs(got[did] - tf[did] * idf) < 1e-9

    s_freq = Searcher(ix, weighting="frequency")
    got_f = {r["doc_id"]: r["score"]
             for r in s_freq.search(Q.Term("data"), limit=None).collect()}
    for did in list(tf)[:20]:
        assert got_f[did] == tf[did]


def test_otherwise(ix):
    s = Searcher(ix)
    # a matches → a's results
    a_hits = s.ev.evaluate(Q.Otherwise(Q.Term("data"), Q.Term("vector"))).count()
    assert a_hits == s.ev.evaluate(Q.Term("data")).count()
    # a empty → b's results
    b_hits = s.ev.evaluate(Q.Otherwise(Q.Term("zzznope"), Q.Term("vector"))).count()
    assert b_hits == s.ev.evaluate(Q.Term("vector")).count()


def test_constant_score(ix):
    s = Searcher(ix)
    res = s.ev.evaluate(Q.Constant(Q.Term("data"), score=2.5)).collect()
    assert res and all(r["score"] == 2.5 for r in res)


def test_more_like(ix):
    s = Searcher(ix)
    out = s.more_like([0, 1], limit=5).collect()
    assert 0 < len(out) <= 5
    assert all(int(r["doc_id"]) not in (0, 1) for r in out)


def test_ngram_tokens():
    assert ngram_tokens("ab", 2, 3) == ["ab"]
    assert ngram_tokens("abcd", 2, 3) == ["ab", "bc", "cd", "abc", "bcd"]
    assert "ab" in ngram_words("AB cd.ef", 2, 2)


def test_upsert_and_purge(spark, tmp_path):
    rows = [(i, f"u{i}", f"common{i % 3} shared token doc{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    path = str(tmp_path / "ixu")
    store.write_index(docs, path, chunk_bits=4, chunks_per_commit=8)

    # update u5 with new content, add brand-new u999
    new = spark.createDataFrame(
        [("u5", "completely fresh updated content zebra"),
         ("u999", "brand new appended document zebra")],
        "url string, text string",
    )
    store.upsert_documents(spark, path, new, key="url")
    ix = store.load_index(spark, path)
    s = Searcher(ix)
    # new term findable in both docs
    hits = {int(r["doc_id"]) for r in s.search(Q.Term("zebra"), limit=None,
                                               optimize=False).collect()}
    assert len(hits) == 2
    # old doc 5 content no longer matches
    old = s.search(Q.Term("doc5"), limit=None, optimize=False).collect()
    assert [int(r["doc_id"]) for r in old] == []
    # stored docs have exactly one row for u5
    stored = spark.read.parquet(path + "/docs")
    assert stored.where("url = 'u5'").count() == 1
    n_before_purge = ix.global_stats()[0]
    assert n_before_purge == 42  # 40 originals + 2 new (deleted unpurged)

    # physical purge drops the old u5 from stats and clears the overlay
    store.compact_index(spark, path, purge_deleted=True)
    ix2 = store.load_index(spark, path)
    assert ix2.deleted is None
    assert ix2.global_stats()[0] == 41
    s2 = Searcher(ix2)
    assert s2.search(Q.Term("doc5"), limit=None, optimize=False).count() == 0
    assert s2.search(Q.Term("zebra"), limit=None, optimize=False).count() == 2


def test_sequence_matches_phrase_for_terms(ix):
    s = Searcher(ix)
    ph = {int(r["doc_id"]) for r in
          s.ev.evaluate(Q.Phrase(["big", "data"])).collect()}
    sq = {int(r["doc_id"]) for r in
          s.ev.evaluate(Q.Sequence([Q.Term("big"), Q.Term("data")])).collect()}
    assert sq == ph and ph


def test_sequence_with_prefix_slot(ix):
    s = Searcher(ix)
    # prefix slot "da*" covers "data": superset of the exact phrase docs
    ph = {int(r["doc_id"]) for r in
          s.ev.evaluate(Q.Phrase(["big", "data"])).collect()}
    sq = {int(r["doc_id"]) for r in
          s.ev.evaluate(Q.Sequence([Q.Term("big"), Q.Prefix("da")])).collect()}
    assert ph <= sq


def test_sequence_slop(ix):
    s = Searcher(ix)
    tight = s.ev.evaluate(Q.Sequence([Q.Term("big"), Q.Term("data")], slop=1)).count()
    loose = s.ev.evaluate(Q.Sequence([Q.Term("big"), Q.Term("data")], slop=3)).count()
    assert loose >= tight
