"""Snowball Russian stemmer — clean-room implementation from the published
algorithm description (M.F. Porter, snowballstem.org, "Russian stemming
algorithm").

Upstream anchor: ``src/whoosh/lang/snowball/russian.py (≈L1-420)`` behind
``LanguageAnalyzer("ru")``.  All suffix matching happens inside RV (the
region after the first vowel); the derivational step is additionally gated
on R2.  The word is normalized ё→е up front (the published algorithm's
recommended preprocessing).
"""

from __future__ import annotations

_RU_VOWELS = set("аеиоуыэюя")

# endings whose group-1 variants require a preceding а or я (the preceding
# letter is part of the STEM, not removed)
_RU_PERF_GERUND_1 = ("вшись", "вши", "в")
_RU_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")

_RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_REFLEXIVE = ("ся", "сь")
_RU_VERB_1 = (
    "ешь", "нно", "ете", "йте",
    "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть",
    "й", "л", "н",
)
_RU_VERB_2 = (
    "ейте", "уйте",
    "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло", "ено",
    "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт",
    "ую", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами",
    "иях", "иям", "ием", "ией",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем",
    "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_RU_SUPERLATIVE = ("ейше", "ейш")


def _sorted_desc(*groups):
    return tuple(sorted({s for g in groups for s in g},
                        key=lambda s: (-len(s), s)))


# longest-first merged tables (group-1 entries carry their precondition)
_RU_GERUNDS = _sorted_desc(_RU_PERF_GERUND_1, _RU_PERF_GERUND_2)
_RU_PARTICIPLES = _sorted_desc(_RU_PARTICIPLE_1, _RU_PARTICIPLE_2)
_RU_VERBS = _sorted_desc(_RU_VERB_1, _RU_VERB_2)
_RU_ADJ = _sorted_desc(_RU_ADJECTIVE)
_RU_NOUNS = _sorted_desc(_RU_NOUN)


def _rv_start(w: str) -> int:
    """RV: the region after the first vowel (len(w) when no vowel)."""
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            return i + 1
    return len(w)


def _r2_start(w: str) -> int:
    def after_vc(start: int) -> int:
        i, n = start, len(w)
        while i < n and w[i] not in _RU_VOWELS:
            i += 1
        while i < n and w[i] in _RU_VOWELS:
            i += 1
        return i + 1 if i < n else n

    return after_vc(after_vc(0))


def _strip(w: str, suffixes, rv: int, group1: frozenset | None = None) -> \
        tuple[str, bool]:
    """Longest suffix from ``suffixes`` found inside RV → removed.  Entries
    in ``group1`` additionally require a preceding а/я (which stays)."""
    for suf in suffixes:
        start = len(w) - len(suf)
        if start >= rv and w.endswith(suf):
            if group1 is not None and suf in group1:
                if start < 1 or w[start - 1] not in "ая":
                    continue
            return w[:start], True
    return w, False


_G1_GERUND = frozenset(_RU_PERF_GERUND_1)
_G1_PART = frozenset(_RU_PARTICIPLE_1)
_G1_VERB = frozenset(_RU_VERB_1)


def russian_stem(word: str) -> str:
    """Snowball Russian stemmer.  Lowercase input expected; non-Cyrillic
    words pass through unchanged (no vowel → RV empty → no rule fires)."""
    w = word.replace("ё", "е")
    rv = _rv_start(w)
    r2 = _r2_start(w)

    # ---- step 1 -----------------------------------------------------------
    w, done = _strip(w, _RU_GERUNDS, rv, _G1_GERUND)
    if not done:
        w, _ = _strip(w, _RU_REFLEXIVE, rv)
        w, adj = _strip(w, _RU_ADJ, rv)
        if adj:
            w, _ = _strip(w, _RU_PARTICIPLES, rv, _G1_PART)
        else:
            w, verb = _strip(w, _RU_VERBS, rv, _G1_VERB)
            if not verb:
                w, _ = _strip(w, _RU_NOUNS, rv)

    # ---- step 2: final и --------------------------------------------------
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # ---- step 3: derivational (R2) ----------------------------------------
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # ---- step 4 -----------------------------------------------------------
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        w, sup = _strip(w, _RU_SUPERLATIVE, rv)
        if sup and w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w
