"""Clean-room Snowball stemmers: Swedish, Norwegian, Danish, Dutch.

Implemented from the published algorithm descriptions on snowballstem.org
("Swedish / Norwegian / Danish / Dutch stemming algorithm" pages, classic
revisions — not the 2021+ additions), mirroring upstream whoosh's snowball
family (``src/whoosh/lang/snowball/{swedish,norwegian,danish,dutch}.py``
≈L1).  All four register behind the same ``register_language`` route as
German/French/Spanish (analysis/snowball.py), so ``lang_sv`` /
``lang_no`` / ``lang_da`` / ``lang_nl`` chains work everywhere an
analyzer name does.

The three Scandinavian algorithms share one skeleton: a single R1 region
with the 3-letter floor, a step-1 longest-match suffix pool plus an
s-with-valid-ending rule, a consonant-pair shortening step, and a small
step-3 pool.  Dutch adds the e-marking / undoubling machinery of German.
"""

from __future__ import annotations

from whoosh_spark.analysis.snowball import _longest

# ---------------------------------------------------------------------------
# shared Scandinavian helpers
# ---------------------------------------------------------------------------


def _r1_floor3(w: str, vowels: set) -> int:
    """R1 = after the first non-vowel following a vowel, adjusted so at
    least 3 letters precede it (the shared Scandinavian/German rule)."""
    i, n = 0, len(w)
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    r1 = min(i + 1, n) if i < n else n
    return max(r1, 3)


# ---------------------------------------------------------------------------
# Swedish
# ---------------------------------------------------------------------------

_SV_VOWELS = set("aeiouyäåö")
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_S1 = ("a arna erna heterna orna ad e ade ande arne are aste en anden "
          "aren heten ern ar er heter or as arnas ernas ornas es ades "
          "andes ens arens hetens erns at andet het ast").split()
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def swedish_stem(word: str) -> str:
    """Snowball Swedish stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    w = word
    r1 = _r1_floor3(w, _SV_VOWELS)

    def in_r1(i: int) -> bool:
        return i >= r1

    # ---- step 1: longest suffix from the pool, else s after a valid
    # s-ending — delete if the suffix starts in R1 --------------------------
    suf = _longest(w, _SV_S1)
    if suf is not None:
        if in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
    elif w.endswith("s") and len(w) >= 2 and w[-2] in _SV_S_END \
            and in_r1(len(w) - 1):
        w = w[:-1]
    # ---- step 2: shorten a final consonant pair ---------------------------
    if w.endswith(_SV_PAIRS) and in_r1(len(w) - 2):
        w = w[:-1]
    # ---- step 3 -----------------------------------------------------------
    suf = _longest(w, ("lig", "ig", "els", "löst", "fullt"))
    if suf is not None and in_r1(len(w) - len(suf)):
        if suf == "löst":
            w = w[:-1]          # löst -> lös
        elif suf == "fullt":
            w = w[:-1]          # fullt -> full
        else:
            w = w[: -len(suf)]
    return w


# ---------------------------------------------------------------------------
# Norwegian
# ---------------------------------------------------------------------------

_NO_VOWELS = set("aeiouyæåø")
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_S1 = ("a e ede ande ende ane ene hetene en heten ar er heter as es "
          "edes endes enes hetenes ens hetens ers ets et het ast").split()
_NO_S3 = ("leg eleg ig eig lig elig els lov elov slov hetslov").split()


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian (Bokmål) stemmer (clean-room from the published
    algorithm description).  Lowercase input expected."""
    w = word
    r1 = _r1_floor3(w, _NO_VOWELS)

    def in_r1(i: int) -> bool:
        return i >= r1

    # ---- step 1: pool | erte/ert -> er | s after valid s-ending ----------
    suf = _longest(w, _NO_S1 + ["erte", "ert", "s"])
    if suf is not None and in_r1(len(w) - len(suf)):
        if suf in ("erte", "ert"):
            w = w[: -len(suf)] + "er"
        elif suf == "s":
            # valid s-ending: one of the consonant set, or k NOT preceded
            # by a vowel
            prev = w[-2] if len(w) >= 2 else ""
            ok = prev in _NO_S_END or (
                prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))
            if ok:
                w = w[:-1]
        else:
            w = w[: -len(suf)]
    # ---- step 2: dt / vt -> drop the t ------------------------------------
    if w.endswith(("dt", "vt")) and in_r1(len(w) - 2):
        w = w[:-1]
    # ---- step 3 -----------------------------------------------------------
    suf = _longest(w, _NO_S3)
    if suf is not None and in_r1(len(w) - len(suf)):
        w = w[: -len(suf)]
    return w


# ---------------------------------------------------------------------------
# Danish
# ---------------------------------------------------------------------------

_DA_VOWELS = set("aeiouyæåø")
_DA_S_END = set("abcdfghjklmnoprtvyzå")
_DA_S1 = ("hed ethed ered e erede ende erende ene erne ere en heden eren "
          "er heder erer heds es endes erendes enes ernes eres ens hedens "
          "erens ers ets erets et eret").split()
_DA_PAIRS = ("gd", "dt", "gt", "kt")


def danish_stem(word: str) -> str:
    """Snowball Danish stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    w = word
    r1 = _r1_floor3(w, _DA_VOWELS)

    def in_r1(i: int) -> bool:
        return i >= r1

    def step2(w: str) -> str:
        if w.endswith(_DA_PAIRS) and in_r1(len(w) - 2):
            return w[:-1]
        return w

    # ---- step 1 -----------------------------------------------------------
    suf = _longest(w, _DA_S1)
    if suf is not None:
        if in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
    elif w.endswith("s") and len(w) >= 2 and w[-2] in _DA_S_END \
            and in_r1(len(w) - 1):
        w = w[:-1]
    # ---- step 2: shorten a final consonant pair ---------------------------
    w = step2(w)
    # ---- step 3 -----------------------------------------------------------
    # "first, if the word ends igst, remove the final st" — the spec puts
    # NO region condition on this one
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest(w, ("ig", "lig", "elig", "els", "løst"))
    if suf is not None and in_r1(len(w) - len(suf)):
        if suf == "løst":
            w = w[:-1]          # løst -> løs
        else:
            w = w[: -len(suf)]
            w = step2(w)        # the deletion re-exposes a pair
    # ---- step 4: undouble a final identical consonant pair (whole pair
    # inside R1 — snowball setlimit semantics) ------------------------------
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and in_r1(len(w) - 2):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_VOWELS = set("aeiouyè")
_NL_ACCENTS = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_mark(w: str) -> str:
    """Pre-pass: initial y -> Y, y after a vowel -> Y, i between vowels
    -> I (uppercase = 'treat as consonant' marker)."""
    chars = list(w)
    n = len(chars)
    out = chars[:]
    for i, c in enumerate(chars):
        prev = chars[i - 1] if i > 0 else ""
        nxt = chars[i + 1] if i < n - 1 else ""
        if c == "y" and (i == 0 or prev in _NL_VOWELS):
            out[i] = "Y"
        elif c == "i" and prev in _NL_VOWELS and nxt in _NL_VOWELS:
            out[i] = "I"
    return "".join(out)


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    """Snowball Dutch stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    from whoosh_spark.analysis.snowball import _std_regions

    w = _nl_mark(word.translate(_NL_ACCENTS))
    r1, r2 = _std_regions(w, _NL_VOWELS)
    r1 = max(r1, 3)

    def in_r1(i: int) -> bool:
        return i >= r1

    def in_r2(i: int) -> bool:
        return i >= r2

    def valid_en(i: int) -> bool:
        # preceded by a non-vowel, and not the string "gem"
        return (i > 0 and w[i - 1] not in _NL_VOWELS
                and w[max(0, i - 3): i] != "gem")

    # ---- step 1 -----------------------------------------------------------
    suf = _longest(w, ("heden", "ene", "en", "se", "s"))
    if suf is not None:
        i = len(w) - len(suf)
        if suf == "heden":
            if in_r1(i):
                w = w[:i] + "heid"
        elif suf in ("en", "ene"):
            if in_r1(i) and valid_en(i):
                w = _nl_undouble(w[:i])
        else:  # s / se: valid s-ending = a non-vowel other than j
            if in_r1(i) and i > 0 and w[i - 1] not in _NL_VOWELS \
                    and w[i - 1] != "j":
                w = w[:i]
    # ---- step 2: final e after a non-vowel --------------------------------
    e_removed = False
    if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True
    # ---- step 3a: heid ----------------------------------------------------
    if w.endswith("heid") and in_r2(len(w) - 4) \
            and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            i = len(w) - 2
            if in_r1(i) and valid_en(i):
                w = _nl_undouble(w[:i])
    # ---- step 3b: d-suffixes ----------------------------------------------
    suf = _longest(w, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if suf is not None:
        i = len(w) - len(suf)
        if suf in ("end", "ing"):
            if in_r2(i):
                w = w[:i]
                if w.endswith("ig") and in_r2(len(w) - 2) \
                        and (len(w) < 3 or w[-3] != "e"):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif suf == "ig":
            if in_r2(i) and (i == 0 or w[i - 1] != "e"):
                w = w[:i]
        elif suf == "lijk":
            if in_r2(i):
                w = w[:i]
                # repeat step 2
                if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
                        and w[-2] not in _NL_VOWELS:
                    w = _nl_undouble(w[:-1])
        elif suf == "baar":
            if in_r2(i):
                w = w[:i]
        else:  # bar — only when step 2 actually removed an e
            if in_r2(i) and e_removed:
                w = w[:i]
    # ---- step 4: undouble vowel (CVVC, V in aa/ee/oo/uu, last not I) ------
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-4] not in _NL_VOWELS \
            and w[-2] == w[-3] and w[-2] in "aeou":
        w = w[:-2] + w[-1]
    # ---- unmark -----------------------------------------------------------
    return w.replace("I", "i").replace("Y", "y")
