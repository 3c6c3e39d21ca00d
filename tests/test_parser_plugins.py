"""Parser plugin grammar units (no Spark needed): GtLt, regex syntax,
dateparse-lite, SimpleParser plus/minus, DisMaxParser.
Reference: ``src/whoosh/qparser/plugins.py`` GtLtPlugin ≈L500, RegexPlugin
≈L450, PlusMinusPlugin ≈L550; ``qparser/default.py`` SimpleParser ≈L420,
DisMaxParser ≈L470; ``qparser/dateparse.py`` (epoch-resolved subset)."""

from __future__ import annotations

from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_dismax, parse_query, parse_simple


def test_gtlt_shapes():
    q = parse_query(">=va")
    assert isinstance(q, Q.TermRange) and q.lo == "va" and q.hi is None and q.incl_lo
    q = parse_query(">va")
    assert isinstance(q, Q.TermRange) and not q.incl_lo
    q = parse_query("<da")
    assert isinstance(q, Q.TermRange) and q.hi == "da" and not q.incl_hi and q.lo is None
    q = parse_query("<=da")
    assert q.incl_hi


def test_gtlt_fielded():
    q = parse_query("title:>=abc", fields=["title", "text"])
    assert isinstance(q, Q.TermRange) and q.fieldname == "title" and q.lo == "abc"


def test_regex_syntax():
    q = parse_query('r"^d.t.$"')
    assert isinstance(q, Q.Regex) and q.pattern == "^d.t.$"
    q = parse_query('text:r"ab+c"', fields=["text"])
    assert q.fieldname == "text" and q.pattern == "ab+c"


def test_datetime_range():
    q = parse_query("warc_ts:[2020-01-01 TO 2020-01-10]", datetime_fields=["warc_ts"])
    assert isinstance(q, Q.DateRange)
    assert q.lo == 1577836800
    # date-only inclusive upper bound = whole final day, exclusive next-day
    assert q.hi == 1578700800 and not q.incl_hi


def test_datetime_at_day():
    q = parse_query("warc_ts:2020-01-05", datetime_fields=["warc_ts"])
    assert isinstance(q, Q.DateRange)
    assert q.hi - q.lo == 86400 and not q.incl_hi


def test_datetime_gtlt():
    q = parse_query("warc_ts:>=2020-01-05", datetime_fields=["warc_ts"])
    assert isinstance(q, Q.DateRange) and q.hi is None
    q = parse_query("warc_ts:>2020-01-05", datetime_fields=["warc_ts"])
    assert q.lo == 1577836800 + 4 * 86400 + 86400  # strictly after the day


def test_datetime_and_term():
    q = parse_query("data AND warc_ts:[2020-01-01 TO 2020-01-10]",
                    datetime_fields=["warc_ts"])
    assert isinstance(q, Q.And)
    kinds = {type(c) for c in q.children}
    assert kinds == {Q.Term, Q.DateRange}


def test_simple_parser():
    q = parse_simple("data +query -vector")
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.a, Q.Require)
    assert q.a.a == Q.Term("data") and q.a.b == Q.Term("query")
    assert q.b == Q.Term("vector")


def test_simple_parser_only_plus():
    q = parse_simple("+data +query")
    assert isinstance(q, Q.And)


def test_dismax_parser():
    q = parse_dismax("data", {"text": 2.0, "lang": 1.0})
    assert isinstance(q, Q.DisMax)
    by_field = {c.fieldname: c for c in q.children}
    assert by_field["text"].boost == 2.0 and by_field["lang"].boost == 1.0


def test_dismax_parser_multiword():
    q = parse_dismax("big data", {"text": 1.0, "lang": 1.0})
    assert isinstance(q, Q.Or) and len(q.children) == 2
    assert all(isinstance(c, Q.DisMax) for c in q.children)
