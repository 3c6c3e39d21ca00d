"""Parser query-time analysis + highlighting fragments/formatters
(reference: tests/test_parsing.py, tests/test_highlighting.py style)."""

from __future__ import annotations

from whoosh_spark import highlight as H
from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query


# ---- parser ---------------------------------------------------------------

def test_parse_lowercases_terms():
    q = parse_query("Web AND Data")
    assert isinstance(q, Q.And)
    assert sorted(c.text for c in q.children) == ["data", "web"]


def test_parse_stopword_vanishes():
    assert parse_query("the") is Q.NullQuery
    q = parse_query("the data")  # And(the, data) → data
    assert isinstance(q, Q.Term) and q.text == "data"


def test_parse_phrase_analyzed():
    q = parse_query('"The Big Data"')
    assert isinstance(q, Q.Phrase) and q.words == ("big", "data")
    q1 = parse_query('"The Data"')  # one surviving word → Term
    assert isinstance(q1, Q.Term) and q1.text == "data"


def test_parse_operators_and_boost():
    q = parse_query("(a1 OR b1) ANDNOT c1^2")
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.a, Q.Or) and q.b.boost == 2.0


def test_parse_range_prefix_fuzzy():
    assert isinstance(parse_query("[da TO dz]"), Q.TermRange)
    assert isinstance(parse_query("qu*"), Q.Prefix)
    assert isinstance(parse_query("dat~1"), Q.Fuzzy)


# ---- highlight ------------------------------------------------------------

TEXT = "alpha data beta gamma data delta " * 3 + "epsilon query zeta"


def test_context_fragments_hits():
    frags = H.context_fragments(TEXT, {"data"}, maxchars=60, surround=10)
    assert frags and all(f.hits for f in frags)
    s, e, t = frags[0].hits[0]
    assert TEXT[s:e] == "data" and t == "data"


def test_html_format_marks_terms():
    out = H.highlight(TEXT, {"data", "query"}, top=2)
    assert '<b class="match term0">' in out
    assert "data</b>" in out or "query</b>" in out


def test_uppercase_format():
    frags = H.whole_fragment("a data b", {"data"})
    assert H.uppercase_format("a data b", frags[0]) == "a DATA b"


def test_highlight_case_insensitive():
    out = H.highlight("The DATA rocks", {"data"}, formatter=H.uppercase_format)
    assert "DATA" in out


def test_searcher_highlights(spark, sf0001_documents):
    from whoosh_spark.index import InvertedIndex
    from whoosh_spark.search import Searcher

    s = Searcher(InvertedIndex.build(sf0001_documents))
    hits = s.highlights(parse_query("data AND query"), limit=3)
    assert len(hits) == 3
    for _did, _score, frag in hits:
        assert "match term" in frag
