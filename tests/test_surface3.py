"""Round-2 session surface additions: multi-key sortedby, Sentence
fragmenter, more_like from raw text."""

from __future__ import annotations

from whoosh_spark.highlight import highlight, sentence_fragments
from whoosh_spark.query import ast as Q


def test_sortedby_list(searcher):
    one = searcher.search(Q.Term("data"), limit=10,
                          sortedby="n_chars").collect()
    multi = searcher.search(Q.Term("data"), limit=10,
                            sortedby=["lang", "n_chars"],
                            with_stored=["lang", "n_chars"]).collect()
    keys = [(r["lang"], r["n_chars"], r["doc_id"]) for r in multi]
    assert keys == sorted(keys)
    assert len(one) == len(multi) == 10
    rev = searcher.search(Q.Term("data"), limit=10,
                          sortedby=["lang", "n_chars"], reverse=True,
                          with_stored=["lang", "n_chars"]).collect()
    rkeys = [(r["lang"], r["n_chars"]) for r in rev]
    assert rkeys == sorted(rkeys, reverse=True)


def test_sortedby_score_facet(searcher):
    from whoosh_spark.search import SCORE

    rows = searcher.search(Q.Term("data"), limit=10,
                           sortedby=["lang", SCORE]).collect()
    # lang ASC, then score DESC (ScoreFacet keys on 0-score), then doc_id
    keys = [(r["lang"], -r["score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    rev = searcher.search(Q.Term("data"), limit=10,
                          sortedby=["lang", SCORE], reverse=True).collect()
    rkeys = [(r["lang"], -r["score"]) for r in rev]
    assert rkeys == sorted(rkeys, reverse=True)
    # pure-ScoreFacet sortedby degenerates to the default ranking
    plain = searcher.search(Q.Term("data"), limit=10).collect()
    only = searcher.search(Q.Term("data"), limit=10, sortedby=SCORE,
                           optimize=False).collect()
    assert [r["doc_id"] for r in only] == [r["doc_id"] for r in plain]


def test_sortedby_list_paging(searcher):
    full = searcher.search(Q.Term("data"), limit=10,
                           sortedby=["lang", "n_chars"]).collect()
    page2 = searcher.search(Q.Term("data"), limit=5, offset=5,
                            sortedby=["lang", "n_chars"]).collect()
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in full[5:]]


def test_sentence_fragmenter():
    text = "First sentence has data. Second one is empty! Third has data too? Tail"
    frags = sentence_fragments(text, {"data"})
    assert len(frags) == 2
    assert text[frags[0].startchar:frags[0].endchar].startswith("First")
    assert text[frags[1].startchar:frags[1].endchar].startswith("Third")
    out = highlight(text, {"data"}, fragmenter="sentence",
                    formatter=lambda t, f: t[f.startchar:f.endchar])
    assert out == "First sentence has data....Third has data too?"


def test_sentence_fragmenter_maxchars():
    text = ("word " * 100) + "needle here."
    frags = sentence_fragments(text, {"needle"}, maxchars=550)
    assert len(frags) == 1
    assert frags[0].endchar - frags[0].startchar <= 550


def test_more_like_text(searcher):
    res = searcher.more_like_text("data vector query windows", limit=5)
    assert res.count() == 5
    # unknown-vocab text → empty
    assert searcher.more_like_text("zzz qqq xxyyzz", limit=5).count() == 0
    assert searcher.more_like_text("", limit=5).count() == 0


def test_unknown_fragmenter_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fragmenter"):
        highlight("some text", {"text"}, fragmenter="sentance")


def test_estimated_length_offset_not_exact(searcher):
    res = searcher.search_hits(Q.Term("vector"), limit=50, offset=5)
    # short page via offset must NOT report the page length as exact
    full = searcher.search_hits(Q.Term("vector"), limit=None)
    if len(res) < 50:
        assert res.estimated_length() >= len(full)
