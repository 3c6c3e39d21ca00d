"""Hit highlighting (``src/whoosh/highlight.py ≈L60-900``, SURVEY.md §2.7).

Whoosh pipeline: analyze stored text → fragmenter picks windows around
matched terms → BasicFragmentScorer ranks fragments → formatter marks hits.
Our k result rows are already on the driver, so this runs as plain Python
over (text, matched terms) — no Spark stage for a 10-row highlight, exactly
like Whoosh highlights lazily per Hit.

Implemented: ContextFragmenter (maxchars=200, surround=20 defaults),
WholeFragmenter, BasicFragmentScorer (hit count + distinct-term bonus),
HtmlFormatter (``<b class="match term0">…``-style) and UppercaseFormatter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from whoosh_spark.analysis.analyzers import _TOKEN_RE


@dataclass
class Fragment:
    startchar: int
    endchar: int
    hits: list[tuple[int, int, str]]  # (startchar, endchar, term)

    def score(self) -> float:
        """BasicFragmentScorer: hit count + distinct-term bonus."""
        return len(self.hits) + 2.0 * len({t for _, _, t in self.hits})


def _token_spans(text: str) -> list[tuple[int, int, str]]:
    """Analyzer-consistent token spans: (start, end, lowered_text)."""
    return [(m.start(), m.end(), m.group(0).lower()) for m in _TOKEN_RE.finditer(text)]


def fragments_from_spans(text: str, hits: list[tuple[int, int, str]],
                         maxchars: int = 200, surround: int = 20) -> list[Fragment]:
    """ContextFragmenter merging over pre-computed hit spans — shared by the
    re-analysis path and the Characters-format (offsets-from-index) path."""
    frags: list[Fragment] = []
    for s, e, t in sorted(hits):
        ws, we = max(0, s - surround), min(len(text), e + surround)
        if frags and ws <= frags[-1].endchar and (we - frags[-1].startchar) <= maxchars:
            frags[-1].endchar = we
            frags[-1].hits.append((s, e, t))
        else:
            frags.append(Fragment(ws, we, [(s, e, t)]))
    return frags


def context_fragments(text: str, terms: set[str], maxchars: int = 200,
                      surround: int = 20) -> list[Fragment]:
    """ContextFragmenter: a window of ±surround chars around each run of
    hits, merged while under maxchars (``highlight.py::ContextFragmenter``)."""
    spans = _token_spans(text)
    hits = [(s, e, t) for s, e, t in spans if t in terms]
    return fragments_from_spans(text, hits, maxchars, surround)


_SENT_END = re.compile(r"[.!?](?=\s|$)")


def sentence_fragments(text: str, terms: set[str],
                       maxchars: int = 200) -> list[Fragment]:
    """SentenceFragmenter (``src/whoosh/highlight.py::SentenceFragmenter
    ≈L260``): fragments are whole sentences (split at . ! ? before
    whitespace/end, capped at maxchars) that contain ≥1 hit."""
    bounds = [0]
    for m in _SENT_END.finditer(text):
        bounds.append(m.end())
    if bounds[-1] != len(text):
        bounds.append(len(text))
    spans = _token_spans(text)
    frags: list[Fragment] = []
    for lo, hi in zip(bounds, bounds[1:]):
        # strip leading whitespace so fragments start at the sentence
        while lo < hi and text[lo].isspace():
            lo += 1
        hi = min(hi, lo + maxchars)
        hits = [(s, e, t) for s, e, t in spans
                if t in terms and lo <= s and e <= hi]
        if hits:
            frags.append(Fragment(lo, hi, hits))
    return frags


def _trim_to_whitespace(text: str, frag: Fragment) -> Fragment:
    """Pinpoint ``autotrim``: snap a fragment that starts/ends mid-word to
    the nearest whitespace boundary inside the window (never past a hit)."""
    s, e = frag.startchar, frag.endchar
    first_hit = frag.hits[0][0] if frag.hits else e
    last_hit = frag.hits[-1][1] if frag.hits else s
    if s > 0 and not text[s - 1].isspace() and not text[s].isspace():
        nxt = next((i for i in range(s, first_hit)
                    if text[i].isspace()), -1)
        if nxt >= 0:
            s = nxt + 1
    if e < len(text) and not text[e - 1].isspace() \
            and not text[e].isspace():
        prev = next((i for i in range(e - 1, last_hit - 1, -1)
                     if text[i].isspace()), -1)
        if prev >= 0:
            e = prev
    return Fragment(s, e, frag.hits)


def pinpoint_fragments(text: str, hits: list[tuple[int, int, str]],
                       maxchars: int = 200, surround: int = 20,
                       autotrim: bool = False) -> list[Fragment]:
    """PinpointFragmenter (``src/whoosh/highlight.py::PinpointFragmenter
    ≈L430``): the NON-RETOKENIZING fragmenter — windows are built directly
    from matched-term char spans (the Characters-format side table,
    ``whoosh_spark.chars``), never from re-analyzing stored text.

    Greedy grouping in startchar order: a group absorbs the next hit while
    the group's matched span (next.endchar - first.startchar) stays within
    ``maxchars``; each group becomes a fragment padded by ±``surround``
    chars.  ``autotrim`` snaps mid-word window edges to whitespace
    (upstream's autotrim flag).  Fragments are returned in startchar order
    and never overlap on their hit groups."""
    hits = sorted(hits)
    frags: list[Fragment] = []
    i, n = 0, len(hits)
    while i < n:
        left = hits[i][0]
        j = i
        while j + 1 < n and hits[j + 1][1] - left <= maxchars:
            j += 1
        right = hits[j][1]
        frag = Fragment(max(0, left - surround),
                        min(len(text), right + surround), hits[i:j + 1])
        frags.append(_trim_to_whitespace(text, frag) if autotrim else frag)
        i = j + 1
    return frags


def whole_fragment(text: str, terms: set[str]) -> list[Fragment]:
    spans = _token_spans(text)
    return [Fragment(0, len(text), [(s, e, t) for s, e, t in spans if t in terms])]


def html_format(text: str, frag: Fragment, tagname: str = "b",
                classname: str = "match") -> str:
    """HtmlFormatter analog: wrap each hit, term-indexed css class.
    Document text is HTML-escaped (upstream HtmlFormatter does too) —
    un-escaped stored markup in a results page is stored XSS."""
    from html import escape

    order: dict[str, int] = {}
    out, pos = [], frag.startchar
    for s, e, t in frag.hits:
        idx = order.setdefault(t, len(order))
        out.append(escape(text[pos:s]))
        out.append(f'<{tagname} class="{classname} term{idx}">'
                   f'{escape(text[s:e])}</{tagname}>')
        pos = e
    out.append(escape(text[pos:frag.endchar]))
    return "".join(out)


def uppercase_format(text: str, frag: Fragment) -> str:
    out, pos = [], frag.startchar
    for s, e, _t in frag.hits:
        out.append(text[pos:s])
        out.append(text[s:e].upper())
        pos = e
    out.append(text[pos:frag.endchar])
    return "".join(out)


def highlight(text: str, terms: set[str], top: int = 3, maxchars: int = 200,
              surround: int = 20, formatter=html_format,
              sep: str = "...", fragmenter: str = "context") -> str:
    """Top-scoring fragments joined — the ``Hit.highlights()`` surface.
    ``fragmenter``: "context" (default), "sentence", or "whole"."""
    lowered = {t.lower() for t in terms}
    if fragmenter == "sentence":
        frags = sentence_fragments(text, lowered, maxchars)
    elif fragmenter == "whole":
        frags = whole_fragment(text, lowered)
    elif fragmenter == "context":
        frags = context_fragments(text, lowered, maxchars, surround)
    else:
        raise ValueError(f"unknown fragmenter {fragmenter!r} "
                         f"(context | sentence | whole)")
    frags.sort(key=lambda f: (-f.score(), f.startchar))
    chosen = sorted(frags[:top], key=lambda f: f.startchar)
    return sep.join(formatter(text, f) for f in chosen)
