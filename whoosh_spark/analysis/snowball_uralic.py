"""Clean-room Snowball stemmers: Finnish, Hungarian.

Implemented from the published algorithm descriptions on snowballstem.org
("Finnish stemming algorithm", "Hungarian stemming algorithm" pages,
classic revisions), mirroring upstream whoosh's snowball family
(``src/whoosh/lang/snowball/{finnish,hungarian}.py`` ≈L1).  Both register
behind the same ``register_language`` route as the rest of the family
(analysis/snowball.py), so ``lang_fi`` / ``lang_hu`` chains work
everywhere an analyzer name does.

Finnish follows the published step structure 1-6 (particles, possessives,
cases, other endings, plurals, tidying) over R1/R2.  Hungarian uses the
published single-region R1 (vowel-initial words: after the first
consonant; consonant-initial: after the first vowel) and the published
step order — instrumental al/el with undoubling, general case endings
with á/é normalisation, án/én/ánként specials, stul/stül factives,
owned-object and plural-owner suffixes, then the bare plural — with the
digraph-aware consonant test (cs/gy/ly/ny/sz/ty/zs count as one
consonant for the R1 boundary).
"""

from __future__ import annotations

from whoosh_spark.analysis.snowball import _longest, _std_regions

# ---------------------------------------------------------------------------
# Finnish
# ---------------------------------------------------------------------------

_FI_VOWELS = set("aeiouyäö")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CONS = set("bcdfghjklmnpqrstvwxz")

_FI_STEP1_A = ("kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä")
_FI_STEP2 = ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
_FI_HX = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
          "hän": "ä", "hön": "ö"}
_FI_STEP3_PLAIN = ("ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
                   "lle", "ksi", "ine", "na", "nä", "ta", "tä")
_FI_STEP4_MP = ("impi", "impa", "impä", "immi", "imma", "immä",
                "mpi", "mpa", "mpä", "mmi", "mma", "mmä")


def _fi_regions(w: str) -> tuple[int, int]:
    # identical to the shared snowball R1/R2 definition — delegate so the
    # boundary semantics live in one place
    return _std_regions(w, _FI_VOWELS)


def finnish_stem(word: str) -> str:
    """Snowball Finnish stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    w = word
    r1, r2 = _fi_regions(w)

    def in_r1(i: int) -> bool:
        return i >= r1

    def in_r2(i: int) -> bool:
        return i >= r2

    # ---- step 1: particles ------------------------------------------------
    suf = _longest(w, _FI_STEP1_A + ("sti",))
    if suf == "sti":
        if in_r2(len(w) - 3):
            w = w[:-3]
    elif suf is not None and in_r1(len(w) - len(suf)):
        prev = w[len(w) - len(suf) - 1: len(w) - len(suf)]
        if prev in ("n", "t") or prev in _FI_VOWELS:
            w = w[: -len(suf)]

    # ---- step 2: possessives ---------------------------------------------
    suf = _longest(w, _FI_STEP2)
    if suf is not None and in_r1(len(w) - len(suf)):
        base = w[: -len(suf)]
        if suf == "si":
            if not base.endswith("k"):
                w = base
        elif suf == "ni":
            w = base[:-3] + "ksi" if base.endswith("kse") else base
        elif suf == "an":
            if base.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                w = base
        elif suf == "än":
            if base.endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                w = base
        elif suf == "en":
            if base.endswith(("lle", "ine")):
                w = base
        else:  # nsa nsä mme nne
            w = base

    # ---- step 3: cases ----------------------------------------------------
    ended = False
    suf = _longest(w, tuple(_FI_HX) + ("siin", "seen", "den", "tten",
                                       "tta", "ttä") + _FI_STEP3_PLAIN
                   + ("a", "ä", "n"))
    if suf is not None and in_r1(len(w) - len(suf)):
        base = w[: -len(suf)]
        if suf in _FI_HX:
            if base.endswith(_FI_HX[suf]):
                w, ended = base, True
        elif suf in ("siin", "den", "tten"):
            if len(base) >= 2 and base[-1] == "i" and base[-2] in _FI_VOWELS:
                w, ended = base, True
        elif suf == "seen":
            if base.endswith(_FI_LONG):
                w, ended = base, True
        elif suf in ("a", "ä"):
            if len(base) >= 2 and base[-2] in _FI_CONS \
                    and base[-1] in _FI_VOWELS:
                w, ended = base, True
        elif suf in ("tta", "ttä"):
            if base.endswith("e"):
                w, ended = base, True
        elif suf in _FI_STEP3_PLAIN:
            w, ended = base, True
        else:  # "n"
            w, ended = base, True
            if w.endswith(_FI_LONG) or w.endswith("ie"):
                w = w[:-1]

    # ---- step 4: other endings (R2) --------------------------------------
    suf = _longest(w, _FI_STEP4_MP + ("eja", "ejä"))
    if suf is not None and in_r2(len(w) - len(suf)):
        base = w[: -len(suf)]
        if suf in ("eja", "ejä") or len(suf) == 4:
            w = base
        elif not base.endswith("po"):
            w = base

    # ---- step 5: plurals --------------------------------------------------
    if ended:
        if w and w[-1] in ("i", "j") and in_r1(len(w) - 1):
            w = w[:-1]
    else:
        if w.endswith("t") and in_r1(len(w) - 1) \
                and len(w) >= 2 and w[-2] in _FI_VOWELS:
            w = w[:-1]
            suf = _longest(w, ("imma", "mma"))
            if suf is not None and in_r2(len(w) - len(suf)):
                base = w[: -len(suf)]
                if suf == "imma" or not base.endswith("po"):
                    w = base

    # ---- step 6: tidying (r1/r2 are offsets on the original word; the
    # steps only ever shorten from the right, so they remain valid).  Each
    # two-letter condition requires the WHOLE ending inside R1, matching
    # the published "R1 ends with ..." wording ------------------------------
    if w.endswith(_FI_LONG) and len(w) - 2 >= r1:
        w = w[:-1]
    if len(w) >= 2 and w[-1] in ("a", "ä", "e", "i") \
            and w[-2] in _FI_CONS and len(w) - 2 >= r1:
        w = w[:-1]
    if w.endswith(("oj", "uj")) and len(w) - 2 >= r1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 2 >= r1:
        w = w[:-1]
    # final double consonant (followed only by vowels) → undouble
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i] in _FI_CONS and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w


# ---------------------------------------------------------------------------
# Hungarian
# ---------------------------------------------------------------------------

_HU_VOWELS = set("aáeéiíoóöőuúüű")
_HU_DIGRAPHS = ("cs", "dzs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

# general case endings (step 2 of the published description), longest-match
_HU_CASES = ("onként", "enként", "anként", "képpen", "ban", "ben",
             "nak", "nek", "val", "vel", "tól", "től", "ról", "ről",
             "ból", "ből", "hoz", "hez", "höz", "nál", "nél", "ért",
             "ként", "képp", "kor", "ba", "be", "ra", "re", "ul", "ül",
             "vá", "vé", "ig", "at", "et", "ot", "öt", "on", "en",
             "an", "ön", "n", "t")
# owned-object (possessive) endings, step "remove owned" — longest-match
_HU_OWNED_A = ("ánk", "ájuk", "ám", "ád", "á")
_HU_OWNED_E = ("énk", "éjük", "ém", "éd", "é")
_HU_OWNED_D = ("unk", "ünk", "juk", "jük", "uk", "ük", "em", "om", "am",
               "od", "ed", "ad", "öd", "ja", "je", "d", "a", "e", "o")
# plural-owner endings ("-éi" family)
_HU_PLOWN_A = ("áim", "áid", "ái", "áink", "áitok", "áik")
_HU_PLOWN_E = ("éim", "éid", "éi", "éink", "éitek", "éik")
_HU_PLOWN_D = ("im", "id", "i", "ink", "itok", "itek", "ik")


def _hu_r1(w: str) -> int:
    """R1 per the published Hungarian definition: if the word begins with
    a vowel, R1 starts after the first consonant (a digraph counting as
    one); if it begins with a consonant, after the first vowel."""
    n = len(w)
    if not n:
        return n
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return min(i + len(d), n)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return min(i + 1, n) if i < n else n


def _hu_undouble(w: str) -> str:
    """Remove one of a final doubled consonant (digraph-aware: 'ssz' →
    'sz', 'nny' → 'ny')."""
    for d in _HU_DIGRAPHS:
        if w.endswith(d[0] + d):
            return w[: -len(d) - 1] + d
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _HU_VOWELS:
        return w[:-1]
    return w


def _hu_norm(w: str) -> str:
    """á→a, é→e on the final letter (the published 'v_ending' rule applied
    after a removal exposes the lengthened stem vowel)."""
    if w.endswith("á"):
        return w[:-1] + "a"
    if w.endswith("é"):
        return w[:-1] + "e"
    return w


def hungarian_stem(word: str) -> str:
    """Snowball Hungarian stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    w = word
    r1 = _hu_r1(w)

    def in_r1(i: int) -> bool:
        return i >= r1

    # ---- step 1: instrumental al/el preceded by a doubled consonant ------
    if w.endswith(("al", "el")) and in_r1(len(w) - 2):
        base = w[:-2]
        undoubled = _hu_undouble(base)
        if undoubled != base:
            w = undoubled
    # ---- step 2: general case endings, then á/é normalisation ------------
    suf = _longest(w, _HU_CASES)
    if suf is not None and in_r1(len(w) - len(suf)):
        w = _hu_norm(w[: -len(suf)])
    # ---- step 3: án/ánként/én specials -----------------------------------
    suf = _longest(w, ("ánként", "án", "én"))
    if suf is not None and in_r1(len(w) - len(suf)):
        w = w[: -len(suf)] + ("e" if suf == "én" else "a")
    # ---- step 4: factive stul/stül ---------------------------------------
    suf = _longest(w, ("astul", "estül", "ástul", "éstül", "stul", "stül"))
    if suf is not None and in_r1(len(w) - len(suf)):
        base = w[: -len(suf)]
        if suf == "ástul":
            w = base + "a"
        elif suf == "éstül":
            w = base + "e"
        else:
            w = base
    # ---- step 5: owned-object (possessive) endings -----------------------
    suf = _longest(w, _HU_OWNED_A + _HU_OWNED_E + _HU_OWNED_D)
    if suf is not None and in_r1(len(w) - len(suf)):
        base = w[: -len(suf)]
        if suf in _HU_OWNED_A:
            w = base + "a"
        elif suf in _HU_OWNED_E:
            w = base + "e"
        else:
            w = base
    # ---- step 6: plural-owner endings ------------------------------------
    suf = _longest(w, _HU_PLOWN_A + _HU_PLOWN_E + _HU_PLOWN_D)
    if suf is not None and in_r1(len(w) - len(suf)):
        base = w[: -len(suf)]
        if suf in _HU_PLOWN_A:
            w = base + "a"
        elif suf in _HU_PLOWN_E:
            w = base + "e"
        else:
            w = base
    # ---- step 7: bare plural ---------------------------------------------
    suf = _longest(w, ("ák", "ék", "ök", "ok", "ek", "ak", "k"))
    if suf is not None and in_r1(len(w) - len(suf)):
        base = w[: -len(suf)]
        if suf == "ák":
            w = base + "a"
        elif suf == "ék":
            w = base + "e"
        else:
            w = base
    return w
