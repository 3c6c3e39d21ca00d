"""Characters format: char-offset side table + highlight-from-index equals
the re-analysis highlight path byte-for-byte (same fragmenter/formatter on
the same spans, spans from two independent routes)."""

from __future__ import annotations

import pytest

from whoosh_spark.chars import char_offsets
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher

DOCS = [
    (0, "Big data systems scan big tables with data-driven plans", "en", "s0", 56),
    (1, "the quick brown fox jumps over the lazy dog", "en", "s0", 44),
    (2, "data DATA Data — three cases of data here", "en", "s1", 41),
    (3, "no match in this one at all", "en", "s1", 27),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


@pytest.fixture(scope="module")
def searcher(docs):
    return Searcher(InvertedIndex.build(docs))


@pytest.fixture(scope="module")
def chars(docs):
    return char_offsets(docs).cache()


def test_offsets_match_tokenizer(chars):
    rows = {(r["doc_id"], r["term"]): (r["starts"], r["ends"])
            for r in chars.collect()}
    # "data" in doc 0: "data" at 4..8 and inside "data-driven" at 38..42
    s, e = rows[(0, "data")]
    assert list(zip(s, e)) == [(4, 8), (38, 42)]
    # lowercase folding: doc 2 has 4 case variants of data
    s2, _ = rows[(2, "data")]
    assert len(s2) == 4
    # stopword "the" absent
    assert (1, "the") not in rows


def test_highlight_from_index_equals_reanalysis(searcher, chars):
    q = Q.Or([Q.Term("data"), Q.Term("big")])
    via_index = searcher.highlights_from_index(q, chars, limit=4)
    via_text = searcher.highlights(q, limit=4)
    assert via_index == via_text
    assert any("<b" in frag for _, _, frag in via_index)


def test_highlight_from_index_no_match_doc(searcher, chars):
    q = Q.Term("fox")
    out = searcher.highlights_from_index(q, chars, limit=4)
    assert len(out) == 1 and out[0][0] == 1 and "fox" in out[0][2].lower()
