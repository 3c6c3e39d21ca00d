"""Clean-room Snowball Turkish stemmer.

Implemented from the published algorithm description on snowballstem.org
("Turkish stemming algorithm", Çilden's suffix-stripping design),
mirroring upstream whoosh's ``src/whoosh/lang/snowball/turkish.py``
(≈L1).  The published algorithm is a chain of suffix categories — nominal
verb suffixes first, then noun (possessive + case) suffixes — each
stripped at most once, every strip gated on 2-way (a/e) or 4-way
(ı/i/u/ü) vowel harmony between the suffix vowel and the last stem vowel,
with the y/n/s buffer letters only valid after a vowel-final stem, and a
final-consonant devoicing undo (b/c/d/ğ → p/ç/t/k) once anything was
removed.  The verbal-conjugation tail of the published suffix inventory
(aorist/evidential compound spellings) is not enumerated — this is the
high-frequency nominal chain, and the abridgement is documented here
deliberately (the oracle embeds this same function, so the contract
entries pin exactly what ships).
"""

from __future__ import annotations

_TR_VOWELS = set("aeıioöuü")
_TR_FRONT = set("eiöü")
_TR_ROUNDED = set("oöuü")
_TR_BUFFER = set("yns")
_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def _harmony(stem: str, suffix_vowel: str) -> bool:
    """Vowel harmony between the stem's last vowel and the suffix vowel:
    2-way front/back for a/e suffixes, 4-way front/back × rounded for
    ı/i/u/ü suffixes."""
    last = next((c for c in reversed(stem) if c in _TR_VOWELS), None)
    if last is None:
        return False
    if (last in _TR_FRONT) != (suffix_vowel in _TR_FRONT):
        return False
    if suffix_vowel in "ıiuü":
        return (last in _TR_ROUNDED) == (suffix_vowel in _TR_ROUNDED)
    return True


def _suffix_vowel(suf: str) -> str | None:
    for c in suf:
        if c in _TR_VOWELS:
            return c
    return None


# harmony-invariant suffixes (the published algorithm's "-ki" exception)
_TR_NO_HARMONY = frozenset(("ki", "kü"))


_TR_VOICELESS = set("çfhkpsşt")


def _best_in(w: str, forms: tuple, minlen: int = 1,
             min_vowels: int = 1) -> str | None:
    """Longest matching form in one category whose harmony holds, whose
    buffer letter (if the form starts with one and the bare form is also
    in the pool) follows a vowel, whose zero-vowel spelling (bare m/n)
    follows a vowel-final stem, and which leaves a stem of ≥2 chars
    containing a vowel."""
    best = None
    for suf in forms:
        if len(suf) < minlen or not w.endswith(suf) \
                or (best is not None and len(suf) <= len(best)):
            continue
        rest = w[: -len(suf)]
        if len(rest) < 2 \
                or sum(c in _TR_VOWELS for c in rest) < min_vowels:
            continue
        if suf[0] in _TR_BUFFER and suf[1:] in forms:
            # buffered spelling: the buffer consonant is only valid
            # immediately after a vowel-final stem
            if rest[-1] not in _TR_VOWELS:
                continue
        # consonant assimilation on D-initial suffixes: the hardened t-
        # spelling attaches only after a voiceless consonant, the soft d-
        # spelling everywhere else
        if suf[0] == "t" and "d" + suf[1:] in forms \
                and rest[-1] not in _TR_VOICELESS:
            continue
        if suf[0] == "d" and "t" + suf[1:] in forms \
                and rest[-1] in _TR_VOICELESS:
            continue
        v = _suffix_vowel(suf)
        if v is None:
            # zero-vowel possessive spellings (-m / -n) attach only to
            # vowel-final stems
            if rest[-1] not in _TR_VOWELS:
                continue
        elif suf not in _TR_NO_HARMONY and not _harmony(rest, v):
            continue
        best = suf
    return best


# --- nominal verb suffixes (applied first, in published order) -------------
_TR_NV = (
    # -(y)mIş evidential copula
    ("mış", "miş", "muş", "müş", "ymış", "ymiş", "ymuş", "ymüş"),
    # -(y)sA conditional copula
    ("sa", "se", "ysa", "yse"),
    # -(y)DI past copula
    ("dı", "di", "du", "dü", "tı", "ti", "tu", "tü",
     "ydı", "ydi", "ydu", "ydü"),
    # -(y)ken
    ("ken", "yken"),
    # -DIr assertive copula
    ("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"),
    # -cAsInA
    ("casına", "cesine"),
    # person copulas -(y)Im / -sIn / -(y)Iz / -sInIz
    ("sınız", "siniz", "sunuz", "sünüz"),
    ("sın", "sin", "sun", "sün"),
    ("yım", "yim", "yum", "yüm", "ım", "im", "um", "üm"),
    ("yız", "yiz", "yuz", "yüz", "ız", "iz", "uz", "üz"),
)

# --- noun suffixes (possessive then case, published order) -----------------
_TR_NOUN = (
    # -lArI 3rd-person plural possessive / plural object
    ("ları", "leri"),
    # -lAr plural
    ("lar", "ler"),
    # -(I)mIz / -(I)nIz 1pl/2pl possessive
    ("ımız", "imiz", "umuz", "ümüz", "mız", "miz", "muz", "müz"),
    ("ınız", "iniz", "unuz", "ünüz", "nız", "niz", "nuz", "nüz"),
    # -(I)m / -(I)n 1sg/2sg possessive (bare m/n only after a vowel)
    ("ım", "im", "um", "üm", "m"),
    ("ın", "in", "un", "ün", "n"),
    # -(s)I 3sg possessive
    ("sı", "si", "su", "sü", "ı", "i", "u", "ü"),
    # -(n)In genitive
    ("nın", "nin", "nun", "nün", "ın", "in", "un", "ün"),
    # -(y)A dative
    ("ya", "ye", "a", "e"),
    # -(n)DA locative
    ("nda", "nde", "da", "de", "ta", "te"),
    # -(n)DAn ablative
    ("ndan", "nden", "dan", "den", "tan", "ten"),
    # -(y)lA instrumental
    ("yla", "yle", "la", "le"),
    # -ki relative (invariant; kü after ü-harmony contexts)
    ("ki", "kü"),
)


def turkish_stem(word: str) -> str:
    """Snowball Turkish stemmer (clean-room; see module docstring for the
    documented scope).  Lowercase input expected.

    Per pass, the longest valid suffix across every category wins (so the
    locative ``-de`` beats the dative ``-e`` on "evde"); passes repeat to
    a fixpoint (agglutinative chains: "evlerinden" → -nden → -leri → ev),
    bounded at 4 — the longest nominal chain the published inventory
    produces."""
    w = word
    for _ in range(4):
        # every pass applies the same rules, so stemming is CONFLUENT:
        # "masalar" (→ masa → mas) and "masa" (→ mas) reach the same stem,
        # which is what conflation-for-retrieval needs.  Cascading erosion
        # is self-limiting — a single-vowel strip leaves a consonant-final
        # word the vowel suffixes no longer match
        best = None
        # copulas attach to full predicate words: the nominal-verb
        # families require a two-syllable remainder, so '-sa' cannot
        # erode a two-syllable noun like 'masa'
        for forms in _TR_NV:
            cand = _best_in(w, forms, min_vowels=2)
            if cand is not None and (best is None or len(cand) > len(best)):
                best = cand
        for forms in _TR_NOUN:
            cand = _best_in(w, forms)
            if cand is not None and (best is None or len(cand) > len(best)):
                best = cand
        if best is None:
            break
        w = w[: -len(best)]
    if w != word and w and w[-1] in _TR_DEVOICE:
        w = w[:-1] + _TR_DEVOICE[w[-1]]
    return w
