"""Times-of-day + combined day+time NL date grammar
(``src/whoosh/qparser/dateparse.py`` time rules — the round-3 completion of
the unambiguous-English subset)."""

from __future__ import annotations

from datetime import datetime

import pytest

from whoosh_spark.query.dateparse import nl_span

BASE = datetime(2020, 1, 13, 9, 0, 0)  # a Monday
EP_JAN13 = 1578873600  # 2020-01-13T00:00Z


def _abs(y, mo, d, h=0, mi=0, s=0):
    return int(datetime(y, mo, d, h, mi, s).replace(
        tzinfo=__import__("datetime").timezone.utc).timestamp())


# ---- bare times (within the base day, span at expressed grain) ----------
@pytest.mark.parametrize("text,lo,hi", [
    ("3pm", _abs(2020, 1, 13, 15), _abs(2020, 1, 13, 16)),
    ("12am", _abs(2020, 1, 13, 0), _abs(2020, 1, 13, 1)),
    ("12pm", _abs(2020, 1, 13, 12), _abs(2020, 1, 13, 13)),
    ("3:05pm", _abs(2020, 1, 13, 15, 5), _abs(2020, 1, 13, 15, 6)),
    ("15:30", _abs(2020, 1, 13, 15, 30), _abs(2020, 1, 13, 15, 31)),
    ("16:20:11", _abs(2020, 1, 13, 16, 20, 11),
     _abs(2020, 1, 13, 16, 20, 12)),
    ("noon", _abs(2020, 1, 13, 12), _abs(2020, 1, 13, 12, 1)),
    ("midnight", _abs(2020, 1, 13, 0), _abs(2020, 1, 13, 0, 1)),
    ("11:59pm", _abs(2020, 1, 13, 23, 59), _abs(2020, 1, 14, 0, 0)),
])
def test_bare_times(text, lo, hi):
    assert nl_span(text, BASE) == (lo, hi)


# ---- combined day-grain phrase + time -----------------------------------
@pytest.mark.parametrize("text,lo,hi", [
    ("tomorrow at 3pm", _abs(2020, 1, 14, 15), _abs(2020, 1, 14, 16)),
    ("tomorrow 3pm", _abs(2020, 1, 14, 15), _abs(2020, 1, 14, 16)),
    ("yesterday at noon", _abs(2020, 1, 12, 12), _abs(2020, 1, 12, 12, 1)),
    ("next friday at 3:05pm", _abs(2020, 1, 17, 15, 5),
     _abs(2020, 1, 17, 15, 6)),
    ("last friday at 15:30", _abs(2020, 1, 10, 15, 30),
     _abs(2020, 1, 10, 15, 31)),
    ("20 march 2020 at 16:20:11", _abs(2020, 3, 20, 16, 20, 11),
     _abs(2020, 3, 20, 16, 20, 12)),
    ("march 20 2020 at midnight", _abs(2020, 3, 20, 0),
     _abs(2020, 3, 20, 0, 1)),
    ("today at 9am", _abs(2020, 1, 13, 9), _abs(2020, 1, 13, 10)),
    ("-2d at noon", _abs(2020, 1, 11, 12), _abs(2020, 1, 11, 12, 1)),
])
def test_day_plus_time(text, lo, hi):
    assert nl_span(text, BASE) == (lo, hi)


# ---- adversarial: things that must NOT become times ----------------------
@pytest.mark.parametrize("text", [
    "2020",              # a year, not 20:20
    "march 20",          # day number, not an hour
    "20 march",          # day-first form
    "5",                 # bare no-colon hour is ambiguous -> not a time
    "25pm",              # impossible clock hour
    "13pm",              # am/pm hour beyond 12
    "15:71",             # minute out of range
    "15:30:99",          # second out of range
    "0pm",               # 0 is not a 12h clock hour
])
def test_not_a_time(text):
    span = nl_span(text, BASE)
    if text == "2020":
        assert span == (_abs(2020, 1, 1), _abs(2021, 1, 1))
    elif text in ("march 20", "20 march"):
        assert span == (_abs(2020, 3, 20), _abs(2020, 3, 21))
    else:
        assert span is None


@pytest.mark.parametrize("text", [
    "march 2020 at 3pm",   # month-grain phrase can't take a time
    "last week at noon",   # week-grain phrase can't take a time
    "2020 at 3pm",         # year-grain phrase can't take a time
    "at 3pm at 4pm",       # garbage head
    "banana at noon",      # unknown head
])
def test_non_day_head_rejected(text):
    assert nl_span(text, BASE) is None


def test_existing_grammar_unchanged():
    assert nl_span("yesterday", BASE) == (_abs(2020, 1, 12),
                                          _abs(2020, 1, 13))
    assert nl_span("last friday", BASE) == (_abs(2020, 1, 10),
                                            _abs(2020, 1, 11))
    assert nl_span("march 2020", BASE) == (_abs(2020, 3, 1),
                                           _abs(2020, 4, 1))
    now_lo, now_hi = nl_span("now", BASE)
    assert now_hi - now_lo == 1


def test_parser_range_with_times():
    from whoosh_spark.query.parser import parse_query

    q = parse_query("warc_ts:[yesterday at 3pm TO tomorrow at noon]",
                    datetime_fields=["warc_ts"], basedate=BASE)
    # DateRange(lo=2020-01-12T15:00, hi<2020-01-14T12:01)
    assert q.lo == _abs(2020, 1, 12, 15)
    assert q.hi == _abs(2020, 1, 14, 12, 1)
    assert q.incl_lo is True and q.incl_hi is False


def test_parser_single_quoted_dates():
    """DateParserPlugin idiom: field:'nl date with spaces'
    (``qparser/plugins.py::SingleQuotePlugin ≈L100`` + dateparse)."""
    from whoosh_spark.query.parser import parse_query

    q = parse_query("warc_ts:'tomorrow at 3:05pm'",
                    datetime_fields=["warc_ts"], basedate=BASE)
    assert (q.lo, q.hi) == (_abs(2020, 1, 14, 15, 5),
                            _abs(2020, 1, 14, 15, 6))
    q = parse_query("warc_ts:>'next friday at noon'",
                    datetime_fields=["warc_ts"], basedate=BASE)
    # strictly after the noon minute span
    assert q.lo == _abs(2020, 1, 17, 12, 1) and q.hi is None
    q = parse_query("warc_ts:<='last friday'",
                    datetime_fields=["warc_ts"], basedate=BASE)
    assert q.lo is None and q.hi == _abs(2020, 1, 11) and q.incl_hi is False


def test_parser_single_quoted_verbatim_term():
    """On a NON-date field a single-quoted string is one verbatim token."""
    from whoosh_spark.query.ast import Term
    from whoosh_spark.query.parser import parse_query

    q = parse_query("name:'big data'")
    assert isinstance(q, Term) and q.text == "big data" and q.analyzed
    # apostrophes inside words never lex as quotes
    q2 = parse_query("don't panic")
    assert "don" in repr(q2) and "panic" in repr(q2)


def test_apostrophe_words_never_pair_across_tokens():
    """Regression (round-3 review): a leading apostrophe in one word must
    not pair with an apostrophe in a later word — "'90s hits '80s hits"
    stays four WORD tokens, never one space-containing verbatim term."""
    from whoosh_spark.query.parser import parse_query

    q = parse_query("'90s hits '80s hits")
    r = repr(q)
    assert "90s" in r and "80s" in r and "hits" in r
    assert "90s hits" not in r.replace("'", "")


def test_parser_exclusive_time_braces():
    from whoosh_spark.query.parser import parse_query

    q = parse_query("warc_ts:{yesterday at 3pm TO tomorrow at noon}",
                    datetime_fields=["warc_ts"], basedate=BASE)
    # '{' starts AFTER the lo span (16:00); '}' stops BEFORE the hi span
    assert q.lo == _abs(2020, 1, 12, 16)
    assert q.hi == _abs(2020, 1, 14, 12, 0)


def test_time_first_phrases_mirror_day_first():
    """"3pm tomorrow" == "tomorrow at 3pm" — both orders parse to the same
    span; optional "on" before the day phrase."""
    from whoosh_spark.query.dateparse import nl_span

    for a, b in [("3pm tomorrow", "tomorrow at 3pm"),
                 ("noon next friday", "next friday at noon"),
                 ("16:20 yesterday", "yesterday at 16:20"),
                 ("3:05pm on 20 march 2020", "20 march 2020 at 3:05pm"),
                 ("midnight last tuesday", "last tuesday at midnight")]:
        sa, sb = nl_span(a, BASE), nl_span(b, BASE)
        assert sa is not None and sa == sb, (a, sa, b, sb)


def test_time_first_rejects_non_day_tails():
    from whoosh_spark.query.dateparse import nl_span

    assert nl_span("3pm 2020", BASE) is None          # year-grain tail
    assert nl_span("noon last month", BASE) is None   # month-grain tail
    assert nl_span("3pm fish", BASE) is None          # not a date at all
    # a bare hour without am/pm stays a date token, not a leading time
    assert nl_span("20 march", BASE) is not None


# ---- round-4 tail: year-first, ordinals, "of" connectors -------------------

def test_year_first_forms():
    from whoosh_spark.query.dateparse import nl_span

    assert nl_span("2005 march", BASE) == nl_span("march 2005", BASE)
    assert nl_span("2005 march 12", BASE) == nl_span("12 march 2005", BASE)
    assert nl_span("2005 12 march", BASE) == nl_span("12 march 2005", BASE)
    # year-first with junk month stays unparsed
    assert nl_span("2005 fish", BASE) is None
    # two bare years are not a date phrase
    assert nl_span("2005 2006", BASE) is None


def test_ordinal_days_and_of_connector():
    from whoosh_spark.query.dateparse import nl_span

    canon = nl_span("25 october 2005", BASE)
    assert canon is not None
    for v in ("25th october 2005", "25th of october 2005",
              "october 25th 2005", "25th of october 2005"):
        assert nl_span(v, BASE) == canon, v
    assert nl_span("march of 2020", BASE) == nl_span("march 2020", BASE)
    # ordinal day + time phrase still composes
    a = nl_span("25th of october 2005 at 3pm", BASE)
    b = nl_span("25 october 2005 at 3pm", BASE)
    assert a is not None and a == b


def test_ordinal_adversarial():
    from whoosh_spark.query.dateparse import nl_span

    # a 3-digit "ordinal" is not a day
    assert nl_span("125th october 2005", BASE) is None
    # suffix stripping must not mangle the month name itself
    assert nl_span("august 2020", BASE) is not None
    # "of" inside a non-date phrase still unparsed
    assert nl_span("best of 2020", BASE) is None


# ---- round-5 tail: colon modifiers, bare weekdays, invalid days ------------

def test_colon_modifier_forms():
    from whoosh_spark.query.dateparse import nl_span

    assert nl_span("oct:25", BASE) == nl_span("25 october", BASE)
    assert nl_span("oct:25:2005", BASE) == nl_span("25 october 2005", BASE)
    assert nl_span("oct:2005", BASE) == nl_span("october 2005", BASE)
    assert nl_span("october:25", BASE) == nl_span("25 october", BASE)
    # non-month prefix stays unparsed (times keep their own grammar)
    assert nl_span("fish:25", BASE) is None


def test_bare_weekday_is_this_week():
    from whoosh_spark.query.dateparse import nl_span

    for d in ("monday", "friday", "fri", "sun"):
        assert nl_span(d, BASE) == nl_span(f"this {d}", BASE), d


def test_invalid_day_returns_none_not_crash():
    from whoosh_spark.query.dateparse import nl_span

    for v in ("feb 30", "45 october 2005", "oct:32", "2005 31 february"):
        assert nl_span(v, BASE) is None, v
