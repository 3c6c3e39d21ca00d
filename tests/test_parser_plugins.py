"""Parser plugin grammar units (no Spark needed): GtLt, regex syntax,
dateparse-lite, SimpleParser plus/minus, DisMaxParser.
Reference: ``src/whoosh/qparser/plugins.py`` GtLtPlugin ≈L500, RegexPlugin
≈L450, PlusMinusPlugin ≈L550; ``qparser/default.py`` SimpleParser ≈L420,
DisMaxParser ≈L470; ``qparser/dateparse.py`` (epoch-resolved subset)."""

from __future__ import annotations

import pytest

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


class TestNaturalLanguageDates:
    BASE = __import__("datetime").datetime(2020, 2, 15, 12, 30, 45)

    def _parse(self, s):
        from whoosh_spark.query.parser import parse_query

        return parse_query(s, datetime_fields=["warc_ts"], basedate=self.BASE)

    def test_yesterday_whole_day(self):
        q = self._parse("warc_ts:yesterday")
        # 2020-02-14 UTC day
        assert (q.lo, q.hi, q.incl_hi) == (1581638400, 1581724800, False)

    def test_last_month(self):
        # "last month" has a space: range syntax keeps it one date token
        q = self._parse("warc_ts:[last month TO last month]")
        assert (q.lo, q.hi) == (1577836800, 1580515200)

    def test_month_name_and_year(self):
        q = self._parse("warc_ts:[march 2020 TO march 2020]")
        assert (q.lo, q.hi) == (1583020800, 1585699200)

    def test_bare_year(self):
        q = self._parse("warc_ts:2020")
        assert (q.lo, q.hi) == (1577836800, 1609459200)

    def test_delta_days(self):
        q = self._parse("warc_ts:-2d")       # 2020-02-13, whole day
        assert (q.lo, q.hi) == (1581552000, 1581638400)

    def test_gtlt_after_today(self):
        q = self._parse("warc_ts:>today")
        assert q.lo == 1581811200 and q.hi is None  # from 2020-02-16 on

    def test_range_nl_to_iso(self):
        q = self._parse("warc_ts:[yesterday TO 2020-03-01]")
        assert q.lo == 1581638400
        assert q.hi == 1583020800 + 86400  # date-only incl upper

    def test_now_point(self):
        q = self._parse("warc_ts:now")
        assert q.hi - q.lo == 1

    def test_iso_still_works(self):
        q = self._parse("warc_ts:2020-01-05")
        assert (q.hi - q.lo) == 86400

    def test_no_basedate_raises(self):
        from whoosh_spark.query.parser import parse_query

        with pytest.raises(ValueError):
            parse_query("warc_ts:yesterday", datetime_fields=["warc_ts"])

    def test_weekday_names(self):
        # base 2020-02-15 is a Saturday
        q = self._parse("warc_ts:[last tuesday TO last tuesday]")
        assert q.lo == 1581379200          # 2020-02-11
        q = self._parse("warc_ts:[next tuesday TO next tuesday]")
        assert q.lo == 1581984000          # 2020-02-18
        q = self._parse("warc_ts:[this sat TO this sat]")
        assert q.lo == 1581724800          # 2020-02-15 itself

    def test_exclusive_nl_bounds(self):
        # '}' excludes the whole NL span; '{' starts after it
        q = self._parse("warc_ts:{2020-02-01 TO yesterday}")
        assert q.hi == 1581638400 and q.incl_hi is False  # Feb 14 excluded
        q = self._parse("warc_ts:{yesterday TO 2020-03-01]")
        assert q.lo == 1581724800                         # starts Feb 15

    def test_iso_gt_strictness(self):
        from whoosh_spark.query.parser import parse_query

        q = parse_query("warc_ts:>2020-02-15", datetime_fields=["warc_ts"])
        assert q.lo == 1581811200 and q.incl_lo is True   # Feb 16 00:00 IN
        q = parse_query("warc_ts:>2020-02-15T10:00:00",
                        datetime_fields=["warc_ts"])
        assert q.incl_lo is False                         # instant itself OUT

    def test_year_delta_on_leap_day(self):
        from datetime import datetime

        from whoosh_spark.query.parser import parse_query

        q = parse_query("warc_ts:-1y", datetime_fields=["warc_ts"],
                        basedate=datetime(2020, 2, 29))
        assert (q.lo, q.hi) == (1546300800, 1577836800)   # all of 2019
