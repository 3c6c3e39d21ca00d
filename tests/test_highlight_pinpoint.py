"""PinpointFragmenter (``src/whoosh/highlight.py::PinpointFragmenter ≈L430``)
— the non-retokenizing fragmenter over stored char offsets."""

from __future__ import annotations

from whoosh_spark.highlight import (Fragment, pinpoint_fragments,
                                    uppercase_format)


def _hits(text: str, term: str):
    out, i = [], 0
    while True:
        i = text.find(term, i)
        if i < 0:
            return out
        out.append((i, i + len(term), term))
        i += len(term)


def test_single_hit_window():
    text = "aaaa bbbb cccc dddd eeee"
    frags = pinpoint_fragments(text, _hits(text, "cccc"),
                               maxchars=4, surround=5)
    assert len(frags) == 1
    f = frags[0]
    assert (f.startchar, f.endchar) == (5, 19)
    assert text[f.startchar:f.endchar] == "bbbb cccc dddd"
    assert f.hits == [(10, 14, "cccc")]


def test_grouping_within_maxchars():
    # two hits 8 chars apart: grouped when the matched span fits maxchars,
    # split into two fragments when it doesn't
    text = "xx tok abcd tok yy"
    hits = _hits(text, "tok")
    assert [h[0] for h in hits] == [3, 12]
    grouped = pinpoint_fragments(text, hits, maxchars=20, surround=2)
    assert len(grouped) == 1
    assert grouped[0].hits == hits
    split = pinpoint_fragments(text, hits, maxchars=3, surround=2)
    assert len(split) == 2
    assert [f.hits for f in split] == [[hits[0]], [hits[1]]]


def test_window_clamped_to_text_bounds():
    text = "tok middle tok"
    frags = pinpoint_fragments(text, _hits(text, "tok"),
                               maxchars=3, surround=100)
    assert all(f.startchar == 0 and f.endchar == len(text) for f in frags)


def test_autotrim_snaps_to_whitespace():
    text = "alphabet tok zulufoxtrot"
    raw = pinpoint_fragments(text, _hits(text, "tok"),
                             maxchars=3, surround=4)[0]
    # untrimmed window starts/ends mid-word
    assert text[raw.startchar - 1] != " " and text[raw.endchar] != " "
    trimmed = pinpoint_fragments(text, _hits(text, "tok"), maxchars=3,
                                 surround=4, autotrim=True)[0]
    assert text[trimmed.startchar:trimmed.endchar] == "tok"
    # start snapped to a word boundary, end never eats the hit
    s, e = trimmed.startchar, trimmed.endchar
    assert s == 0 or text[s - 1] == " "
    h = trimmed.hits[0]
    assert s <= h[0] and e >= h[1]


def test_autotrim_snaps_to_any_whitespace():
    """Regression (round-3 review): \\n and \\t are trim boundaries too."""
    text = "abcdefgh\ntok\tzyxwvuts"
    frags = pinpoint_fragments(text, _hits(text, "tok"), maxchars=3,
                               surround=4, autotrim=True)
    assert text[frags[0].startchar:frags[0].endchar] == "tok"


def test_formatter_over_pinpoint_fragment():
    text = "one two three two one"
    frags = pinpoint_fragments(text, _hits(text, "two"),
                               maxchars=3, surround=4)
    assert uppercase_format(text, frags[0]) == "one TWO thr"
    assert uppercase_format(text, frags[1]) == "ree TWO one"


def test_empty_hits():
    assert pinpoint_fragments("whatever", [], maxchars=10, surround=5) == []


def test_search_surface_pinpoint(spark):
    """highlights_from_index(fragmenter='pinpoint') end-to-end on a tiny
    corpus: spans come from chars.char_offsets, never re-analysis."""
    from whoosh_spark import chars as C
    from whoosh_spark.index import InvertedIndex
    from whoosh_spark.query import ast as Q
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma beta"), (1, "beta only here")],
        "doc_id long, text string")
    s = Searcher(InvertedIndex.build(docs, cache=False))
    offs = C.char_offsets(docs)
    out = s.highlights_from_index(
        Q.Term("beta"), offs, limit=2, fragmenter="pinpoint",
        maxchars=4, surround=3, top=2,
        formatter=uppercase_format)
    hl = {d: h for d, _score, h in out}
    assert hl[0] == "ha BETA ga...ma BETA"
    assert hl[1] == "BETA on"
