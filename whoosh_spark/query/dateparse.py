"""Natural-language date parsing (``src/whoosh/qparser/dateparse.py`` —
the English vocabulary subset that resolves WITHOUT ambiguity).

Whoosh parses date text into *timespans* at the expressed precision
("march 2020" is the whole month) relative to a ``basedate``.  This module
reproduces that model: ``nl_span(text, base)`` returns a half-open UTC
``[lo, hi)`` epoch-second span, or None if the text isn't natural-language
(callers then fall back to ISO parsing).  Everything is resolved
driver-side to epoch ints, so query plans stay timezone-independent and
deterministic under an explicit ``basedate`` (tests/entries always pin it).

Supported: ``now``, ``today``/``yesterday``/``tomorrow``,
``this|last|next week|month|year``, month names w/ optional year/day in
ANY part order ("march 2020", "mar", "20 march 2020", "march 20 2020",
"2005 march", "2005 march 12"), ordinal days + "of" connectors
("25th of october 2005", "march of 2020"), bare years
("2020"), signed deltas ``±N s|min|h|d|w|mo|y`` (span at the delta's
grain, e.g. ``-2d`` = that whole day), times of day (``3pm``,
``3:05pm``, ``15:30``, ``16:20:11``, ``noon``, ``midnight`` — span at
the expressed grain within the base day; a bare hour needs am/pm or a
colon so day numbers stay dates), and combined day+time phrases in BOTH
orders (``tomorrow at 3pm``, ``next friday 15:30``, ``20 march 2020 at
16:20:11``; ``3pm tomorrow``, ``noon next friday``, ``16:20 on 20 march
2020`` — any DAY-grain phrase, optional ``at``/``on``).  Fuzzy *ranges*
compose through the query parser's bracket syntax — each side of
``[last tuesday TO next friday at noon]`` goes through ``nl_span``.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["january", "february", "march", "april", "may", "june", "july",
     "august", "september", "october", "november", "december"])}
_MONTHS.update({m[:3]: i for m, i in list(_MONTHS.items())})

_DELTA_RE = re.compile(r"^([+-])\s*(\d+)\s*(s|min|h|d|w|mo|y)$")

_WEEKDAYS = {d: i for i, d in enumerate(
    ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday",
     "sunday"])}
_WEEKDAYS.update({d[:3]: i for d, i in list(_WEEKDAYS.items())})


def _ep(dt: datetime) -> int:
    return int(dt.replace(tzinfo=timezone.utc).timestamp())


def _day(d: datetime) -> tuple[int, int]:
    d0 = d.replace(hour=0, minute=0, second=0, microsecond=0)
    return _ep(d0), _ep(d0 + timedelta(days=1))


def _month(year: int, month: int) -> tuple[int, int]:
    d0 = datetime(year, month, 1)
    d1 = datetime(year + (month == 12), month % 12 + 1, 1)
    return _ep(d0), _ep(d1)


def _year(year: int) -> tuple[int, int]:
    return _ep(datetime(year, 1, 1)), _ep(datetime(year + 1, 1, 1))


def _week(d: datetime) -> tuple[int, int]:
    d0 = (d - timedelta(days=d.weekday())).replace(
        hour=0, minute=0, second=0, microsecond=0)
    return _ep(d0), _ep(d0 + timedelta(days=7))


def _add_months(d: datetime, n: int) -> datetime:
    m = d.month - 1 + n
    y, m = d.year + m // 12, m % 12 + 1
    import calendar

    return d.replace(year=y, month=m,
                     day=min(d.day, calendar.monthrange(y, m)[1]))


# time-of-day tail: noon | midnight | H[:MM[:SS]] with am/pm | H:MM[:SS]
# (a BARE hour without am/pm or colon is NOT a time — "20 march" day nums
# and "2020" years must keep parsing as dates)
_TIME_TAIL_RE = re.compile(
    r"(?:^|\s)(noon|midnight"
    r"|\d{1,2}(?::\d{2}(?::\d{2})?)?\s*(?:am|pm)"
    r"|\d{1,2}:\d{2}(?::\d{2})?)$")
_TIME_RE = re.compile(
    r"^(\d{1,2})(?::(\d{2})(?::(\d{2}))?)?\s*(am|pm)?$")
# time-FIRST phrases ("3pm tomorrow", "noon next friday", "16:20 yesterday",
# optionally "... on friday") — same token alternation anchored at the start
_TIME_LEAD_RE = re.compile(
    r"^(noon|midnight"
    r"|\d{1,2}(?::\d{2}(?::\d{2})?)?\s*(?:am|pm)"
    r"|\d{1,2}:\d{2}(?::\d{2})?)(?:\s|$)")


def _time_of_day(t: str) -> tuple[int, int] | None:
    """(seconds-from-midnight, grain-seconds) for a time-of-day string, at
    the expressed precision: "3pm" = the whole hour, "3:05pm" = the minute,
    "16:20:11" = the second.  noon/midnight are minute-grain points."""
    if t in ("noon", "midnight"):
        return (12 * 3600 if t == "noon" else 0), 60
    m = _TIME_RE.match(t)
    if not m:
        return None
    h, mi, sec, ampm = m.groups()
    h = int(h)
    if ampm:
        if not 1 <= h <= 12:
            return None
        h = h % 12 + (12 if ampm == "pm" else 0)
    elif h > 23 or mi is None:
        return None  # bare no-colon hour stays a date token
    if mi is not None and int(mi) > 59:
        return None
    if sec is not None and int(sec) > 59:
        return None
    off = h * 3600 + int(mi or 0) * 60 + int(sec or 0)
    grain = 3600 if mi is None else (60 if sec is None else 1)
    return off, grain


def nl_span(text: str, base: datetime) -> tuple[int, int] | None:
    """Half-open UTC [lo, hi) span for the natural-language date ``text``
    relative to ``base`` (naive datetime interpreted as UTC), else None."""
    s = text.strip().lower()
    base = base.replace(tzinfo=None)
    if s == "now":
        t = _ep(base.replace(microsecond=0))
        return t, t + 1
    if s in ("today", "yesterday", "tomorrow"):
        off = {"today": 0, "yesterday": -1, "tomorrow": 1}[s]
        return _day(base + timedelta(days=off))
    m = re.match(r"^(this|last|next)\s+(week|month|year)$", s)
    if m:
        rel, unit = m.groups()
        off = {"this": 0, "last": -1, "next": 1}[rel]
        if unit == "week":
            return _week(base + timedelta(weeks=off))
        if unit == "month":
            d = _add_months(base, off)
            return _month(d.year, d.month)
        return _year(base.year + off)
    # bare weekday name ("friday", "fri"): that weekday inside the
    # Mon-start week of base — same reading as "this friday" (the
    # unmodified-weekday case of upstream's relative-day grammar)
    if s in _WEEKDAYS:
        d0 = base - timedelta(days=base.weekday())
        return _day(d0 + timedelta(days=_WEEKDAYS[s]))
    m = re.match(r"^(this|last|next)\s+([a-z]+)$", s)
    if m and m.group(2) in _WEEKDAYS:
        rel, wd = m.group(1), _WEEKDAYS[m.group(2)]
        if rel == "this":  # that weekday inside the Mon-start week of base
            d0 = base - timedelta(days=base.weekday())
            return _day(d0 + timedelta(days=wd))
        diff = wd - base.weekday()
        if rel == "last":
            diff = diff - 7 if diff >= 0 else diff
        else:  # next
            diff = diff + 7 if diff <= 0 else diff
        return _day(base + timedelta(days=diff))
    m = _DELTA_RE.match(s)
    if m:
        sign, n, unit = m.groups()
        n = int(n) * (1 if sign == "+" else -1)
        if unit == "y":
            # only the year matters for a year-grain span; never touch the
            # day field (base.replace(year=...) explodes on Feb 29)
            return _year(base.year + n)
        if unit == "mo":
            d = _add_months(base, n)
            return _month(d.year, d.month)
        delta = {"s": timedelta(seconds=1), "min": timedelta(minutes=1),
                 "h": timedelta(hours=1), "d": timedelta(days=1),
                 "w": timedelta(weeks=1)}[unit]
        d = base + n * delta
        if unit in ("d", "w"):
            return _day(d)
        t = _ep(d.replace(microsecond=0))
        return t, t + 1
    if re.match(r"^\d{4}$", s):
        return _year(int(s))
    # colon-modifier spellings ("oct:25", "oct:25:2005", "oct:2005") fold
    # to the space-separated bag order the month grammar below accepts —
    # upstream's month:day modifier syntax (qparser/dateparse.py ≈L1-1000)
    m = re.match(r"^([a-z]+):(\d{1,4})(?::(\d{4}))?$", s)
    if m and m.group(1) in _MONTHS and (len(m.group(2)) != 3):
        s = " ".join(p for p in (m.group(1), m.group(2), m.group(3)) if p)
    # upstream's looser day spellings fold into the canonical form before
    # the month grammar: ordinal suffixes ("25th") and the "of" connector
    # ("25th of october 2005" ≡ "25 october 2005")
    s2 = re.sub(r"\b(\d{1,2})(?:st|nd|rd|th)\b", r"\1", s)
    s2 = re.sub(r"\bof\s+", "", s2)
    # [day] monthname [day] [year]
    m = re.match(r"^(?:(\d{1,2})\s+)?([a-z]+)(?:\s+(\d{1,2}))?"
                 r"(?:\s+(\d{4}))?$", s2)
    if m and m.group(2) in _MONTHS:
        day = m.group(1) or m.group(3)
        year = int(m.group(4)) if m.group(4) else base.year
        month = _MONTHS[m.group(2)]
        if day:
            try:
                return _day(datetime(year, month, int(day)))
            except ValueError:  # "feb 30": not a date, not a parse crash
                return None
        return _month(year, month)
    # year-FIRST order ("2005 march", "2005 march 12", "2005 12 march") —
    # upstream's grammar accepts the parts in any order; the 4-digit year
    # disambiguates
    m = re.match(r"^(\d{4})\s+(?:(\d{1,2})\s+)?([a-z]+)(?:\s+(\d{1,2}))?$",
                 s2)
    if m and m.group(3) in _MONTHS:
        day = m.group(2) or m.group(4)
        year, month = int(m.group(1)), _MONTHS[m.group(3)]
        if day:
            try:
                return _day(datetime(year, month, int(day)))
            except ValueError:
                return None
        return _month(year, month)
    # time-of-day, optionally after a DAY-grain date phrase (+ optional "at"):
    # "3pm", "15:30", "noon", "tomorrow at 3pm", "next friday 16:20:11"
    m = _TIME_TAIL_RE.search(s)
    if m:
        tod = _time_of_day(m.group(1))
        if tod is not None:
            head = s[: m.start()].strip()
            if head.endswith(" at"):
                head = head[: -3].rstrip()
            elif head == "at":
                head = ""
            if not head:
                day_lo, _ = _day(base)
            else:
                span = nl_span(head, base)
                if span is None or span[1] - span[0] != 86400:
                    return None  # only day-grain phrases take a time
                day_lo = span[0]
            off, grain = tod
            return day_lo + off, day_lo + off + grain
    # time-FIRST order: "3pm tomorrow", "noon next friday", "16:20 on
    # 20 march 2020" — the tail must be a day-grain phrase
    m = _TIME_LEAD_RE.match(s)
    if m:
        tod = _time_of_day(m.group(1))
        if tod is not None:
            tail = s[m.end(1):].strip()
            if tail.startswith("on "):
                tail = tail[3:].strip()
            if tail:
                span = nl_span(tail, base)
                if span is None or span[1] - span[0] != 86400:
                    return None  # only day-grain phrases take a time
                off, grain = tod
                return span[0] + off, span[0] + off + grain
    return None
