"""Snowball English ("Porter2") stemmer — clean-room implementation from
the published algorithm description (M.F. Porter, snowballstem.org,
"The English (Porter2) stemming algorithm", classic revision).

Upstream anchor: ``src/whoosh/lang/snowball/english.py (≈L1-460)`` — the
stemmer ``LanguageAnalyzer("en")`` routes through (``src/whoosh/lang/
__init__.py::stemmer_for_language ≈L60``).  Note this is NOT the original
1980 Porter algorithm (that one ships as analysis/porter.py and backs
``StemmingAnalyzer``, matching upstream's split): Porter2 differs in the
R1/R2 region gates, the y→Y consonant marking, the exceptional forms, and
several suffix tables.

Pure CPython on purpose: the stemmer runs word-at-a-time inside the fused
Arrow analyzer kernel (analysis/udfs.py), where the per-batch loop is
already vectorized at the Arrow boundary; the per-word work is a handful
of endswith checks.
"""

from __future__ import annotations

_EN_VOWELS = set("aeiouy")          # marked Y is a consonant (not in set)
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = set("cdeghkmnrt")      # valid li-endings

# whole-word exceptional forms (applied before the step machinery)
_EN_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# invariant forms checked again after step 1a
_EN_EXCEPTIONS_1A = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

# step-2/3/4 suffix tables: (suffix, replacement) in longest-first order so
# a linear scan implements snowball's longest-match rule (if the longest
# match's region/condition test fails, NO shorter suffix is tried)
_EN_S2 = (
    ("ational", "ate"), ("fulness", "ful"), ("iveness", "ive"),
    ("ization", "ize"), ("ousness", "ous"),
    ("biliti", "ble"), ("lessli", "less"), ("tional", "tion"),
    ("alism", "al"), ("aliti", "al"), ("ation", "ate"), ("entli", "ent"),
    ("fulli", "ful"), ("iviti", "ive"), ("ousli", "ous"),
    ("abli", "able"), ("alli", "al"), ("anci", "ance"), ("ator", "ate"),
    ("enci", "ence"), ("izer", "ize"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
)
_EN_S3 = (
    ("ational", "ate"), ("tional", "tion"),
    ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
)
_EN_S4 = (
    "ement",
    "able", "ance", "ence", "ible", "ment",
    "ant", "ate", "ent", "ion", "ism", "iti", "ive", "ize", "ous",
    "al", "er", "ic",
)


def _after_vc(w: str, start: int) -> int:
    """Offset just past the first non-vowel that follows a vowel, scanning
    from ``start`` (the shared R1/R2 region definition; len(w) if none)."""
    i, n = start, len(w)
    while i < n and w[i] not in _EN_VOWELS:
        i += 1
    while i < n and w[i] in _EN_VOWELS:
        i += 1
    return i + 1 if i < n else n


def _en_regions(w: str) -> tuple[int, int]:
    """R1 (with the gener-/commun-/arsen- prefix override) and R2."""
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        r1 = _after_vc(w, 0)
    return r1, _after_vc(w, r1)


def _ends_short_syllable(w: str) -> bool:
    """True when the word ends in a short syllable: vowel + non-vowel other
    than w/x/Y preceded by a non-vowel; or, for two-letter words, initial
    vowel + non-vowel."""
    n = len(w)
    if n == 2:
        return w[0] in _EN_VOWELS and w[1] not in _EN_VOWELS
    return (n >= 3 and w[-2] in _EN_VOWELS
            and w[-1] not in _EN_VOWELS and w[-1] not in "wxY"
            and w[-3] not in _EN_VOWELS)


def english_stem(word: str) -> str:
    """Snowball English (Porter2) stemmer.  Lowercase input expected."""
    w = word
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    exc = _EN_EXCEPTIONS.get(w)
    if exc is not None:
        return exc

    # mark word-initial y and y-after-vowel as consonants
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _en_regions(w)

    # ---- step 0: apostrophe suffixes --------------------------------------
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # ---- step 1a ----------------------------------------------------------
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and any(c in _EN_VOWELS for c in w[:-2]):
        # delete when the preceding part has a vowel NOT immediately
        # before the s (gas/this keep it; gaps/kiwis lose it)
        w = w[:-1]
    if w in _EN_EXCEPTIONS_1A:
        return w

    # ---- step 1b ----------------------------------------------------------
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if not w.endswith(suf):
            continue
        if suf in ("eedly", "eed"):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
        else:
            stem = w[: -len(suf)]
            if any(c in _EN_VOWELS for c in stem):
                w = stem
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
                elif w.endswith(_EN_DOUBLES):
                    w = w[:-1]
                elif r1 >= len(w) and _ends_short_syllable(w):
                    w += "e"
        break

    # ---- step 1c ----------------------------------------------------------
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_VOWELS:
        w = w[:-1] + "i"

    # ---- step 2 (in R1) ---------------------------------------------------
    for suf, rep in _EN_S2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _EN_LI_END:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # ---- step 3 (in R1) ---------------------------------------------------
    for suf, rep in _EN_S3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - 5 >= r2:
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # ---- step 4 (in R2) ---------------------------------------------------
    for suf in _EN_S4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # ---- step 5 -----------------------------------------------------------
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1
                                and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 \
            and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")
