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


class TestFieldGroupSyntax:
    """FieldsPlugin group distribution (qparser/plugins.py::FieldsPlugin
    ≈L300): ``field:(...)`` applies the prefix to every not-already-fielded
    leaf inside the balanced group, every leaf form included."""

    FIELDS = {"text", "lang", "nchars"}

    def _p(self, s, **kw):
        return parse_query(s, fields=self.FIELDS,
                           datetime_fields={"warc_ts"}, **kw)

    def test_group_or(self):
        q = self._p("text:(data OR query)")
        assert isinstance(q, Q.Or)
        assert [c.fieldname for c in q.children] == ["text", "text"]

    def test_group_implicit_and(self):
        q = self._p("text:(data query)")
        assert isinstance(q, Q.And)
        assert all(c.fieldname == "text" for c in q.children)

    def test_nested_group_inherits(self):
        q = self._p("text:(data OR (query vector))")
        inner = q.children[1]
        assert all(c.fieldname == "text" for c in inner.children)

    def test_inner_field_wins(self):
        q = self._p("text:(data lang:en)")
        assert q.children[0].fieldname == "text"
        assert q.children[1].fieldname == "lang"

    def test_group_with_phrase_range_prefix(self):
        q = self._p('text:("big data"~2 OR jump* OR [da TO dz])')
        kinds = {type(c).__name__ for c in q.children}
        assert kinds == {"Phrase", "Prefix", "TermRange"}
        assert all(c.fieldname == "text" for c in q.children)

    def test_group_gtlt(self):
        q = self._p("nchars:(>=100 <200)")
        assert isinstance(q, Q.And)
        assert all(isinstance(c, Q.TermRange) and c.fieldname == "nchars"
                   for c in q.children)

    def test_datetime_group(self):
        q = self._p("warc_ts:(>=2020-01-01)")
        assert isinstance(q, Q.DateRange) and q.lo == 1577836800

    def test_unknown_field_group_degrades(self):
        q = self._p("bogus:(data query)")
        assert all(c.fieldname is None for c in q.children)

    def test_field_colon_without_paren_unchanged(self):
        # a trailing-colon word NOT followed by a group keeps legacy behavior
        q = self._p("text:data")
        assert q.fieldname == "text"


class TestFuzzyPrefixAndEvery:
    def test_fuzzy_prefixlength(self):
        q = parse_query("word~2/3")
        assert isinstance(q, Q.Fuzzy)
        assert (q.maxdist, q.prefixlength) == (2, 3)

    def test_fuzzy_defaults_unchanged(self):
        q = parse_query("word~")
        assert (q.maxdist, q.prefixlength) == (1, 1)
        q = parse_query("word~2")
        assert (q.maxdist, q.prefixlength) == (2, 1)

    def test_bare_tilde_degrades(self):
        assert parse_query("~2") == Q.NullQuery

    def test_star_is_every(self):
        # terms.py::Wildcard.normalize ≈L360: UNFIELDED all-star → Every;
        # a fielded star keeps the field (see TestReviewRegressions)
        for s in ("*", "**", "*:*"):
            q = parse_query(s, fields={"field"})
            assert isinstance(q, Q.Every), s

    def test_star_boost_kept(self):
        q = parse_query("*^2")
        assert isinstance(q, Q.Every) and q.boost == 2.0

    def test_prefix_still_prefix(self):
        assert isinstance(parse_query("qu*"), Q.Prefix)


class TestAliasAndCopyField:
    """FieldAliasPlugin (qparser/plugins.py ≈L350) and CopyFieldPlugin
    (≈L400) parity: alias prefixes route to the real field at the token
    level; copyfields Or-expand fielded leaves."""

    def test_alias_routes(self):
        q = parse_query("content:data", fields={"text"},
                        aliases={"content": "text"})
        assert q.fieldname == "text"

    def test_alias_group_and_range(self):
        q = parse_query("content:(data OR [da TO dz])", fields={"text"},
                        aliases={"content": "text"})
        assert all(c.fieldname == "text" for c in q.children)

    def test_alias_datetime(self):
        q = parse_query("ts:[2020-01-01 TO 2020-01-10]",
                        datetime_fields={"warc_ts"},
                        aliases={"ts": "warc_ts"})
        assert isinstance(q, Q.DateRange) and q.column == "warc_ts"

    def test_alias_non_alias_untouched(self):
        q = parse_query("text:data", fields={"text"},
                        aliases={"content": "text"})
        assert q.fieldname == "text"

    def test_copyfield_or_expansion(self):
        q = parse_query("text:data", fields={"text", "lang"},
                        copyfields={"text": "lang"})
        assert isinstance(q, Q.Or)
        assert {c.fieldname for c in q.children} == {"text", "lang"}

    def test_copyfield_unfielded_untouched(self):
        q = parse_query("data", fields={"text", "lang"},
                        copyfields={"text": "lang"})
        assert isinstance(q, Q.Term) and q.fieldname is None

    def test_copyfield_inside_compound(self):
        q = parse_query("text:data AND lang:en", fields={"text", "lang"},
                        copyfields={"text": "lang"})
        assert isinstance(q.children[0], Q.Or)
        assert isinstance(q.children[1], Q.Term)

    def test_copyfield_phrase(self):
        q = parse_query('text:"big data"', fields={"text", "lang"},
                        copyfields={"text": "lang"})
        assert isinstance(q, Q.Or)
        assert all(isinstance(c, Q.Phrase) for c in q.children)


class TestReviewRegressions:
    """Pinned from the round-3 review pass: nested fielded groups, fielded
    all-star, and copyfields over DateRange."""

    F = {"text", "lang", "nchars"}

    def test_nested_fielded_group_keeps_inner_field(self):
        q = parse_query("text:(data OR lang:(en))", fields=self.F)
        assert [c.fieldname for c in q.children] == ["text", "lang"]

    def test_unknown_inner_prefix_stays_default(self):
        # unknown prefixes strip to the DEFAULT field everywhere (legacy
        # convention) — the outer group field must not leak into them either
        q = parse_query("text:(foo:bar OR data)", fields=self.F)
        assert [c.fieldname for c in q.children] == [None, "text"]

    def test_fielded_star_keeps_field(self):
        # upstream Every(fieldname) = docs with >=1 term in the field —
        # exactly Prefix('') routed there
        q = parse_query("lang:*", fields=self.F)
        assert isinstance(q, Q.Prefix) and (q.text, q.fieldname) == ("", "lang")
        assert isinstance(parse_query("*", fields=self.F), Q.Every)

    def test_copyfields_followed_on_dateranges(self):
        q = parse_query("warc_ts:[2020-01-01 TO 2020-02-01]",
                        datetime_fields={"warc_ts"},
                        copyfields={"warc_ts": "crawl_ts"})
        assert isinstance(q, Q.Or)
        assert {c.column for c in q.children} == {"warc_ts", "crawl_ts"}

    def test_walkers_descend_weighted(self):
        from whoosh_spark.query.parser import (_apply_copyfields,
                                               _apply_multifield)

        w = Q.Weighted(Q.Term("data"), weighting="pl2")
        m = _apply_multifield(w, ["text", "lang"])
        assert isinstance(m.child, Q.Or)
        c = _apply_copyfields(Q.Weighted(Q.Term("data", fieldname="text"),
                                         weighting="pl2"), {"text": "lang"})
        assert isinstance(c.child, Q.Or)
