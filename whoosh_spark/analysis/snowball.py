"""Per-language analysis: pluggable snowball-style stemmer registry +
language analyzer chains (``src/whoosh/lang/__init__.py::stemmer_for_language
≈L60`` + ``src/whoosh/analysis/analyzers.py::LanguageAnalyzer ≈L220``).

Upstream ships the snowball stemmer family for ~22 languages; this module
ships the REGISTRY (so any language plugs in as ``register_stemmer(lang,
fn)`` + ``register_language(lang, stopwords)``) with clean-room
implementations of:

  * English — Snowball English / "Porter2" (analysis/snowball_english.py;
    the original 1980 Porter ships separately as analysis/porter.py and
    backs StemmingAnalyzer, matching upstream's split)
  * German  — the Snowball German stemming algorithm, implemented from the
    published algorithm description (M.F. Porter, snowballstem.org, "German
    stemming algorithm" — the classic revision, not the 2021 additions)

  * French  — the Snowball French stemming algorithm (classic revision),
    implemented from the published algorithm description
  * Spanish — the Snowball Spanish stemming algorithm, same provenance
  * Italian / Portuguese — same provenance (analysis/snowball_romance.py)
  * Swedish / Norwegian / Danish / Dutch — same provenance
    (analysis/snowball_nordic.py)
  * Russian — same provenance (analysis/snowball_russian.py; Cyrillic,
    exercises the unicode tokenizer path)

Chains register into ``ANALYZERS`` as ``lang_<code>`` so they work
everywhere a chain name does: ``write_index(analyzer="lang_de")`` (persisted
in the manifest), ``FieldSpec(analyzer=...)``, and the query-time tee.
"""

from __future__ import annotations

_VOWELS = set("aeiouyäöü")
_S_ENDING = set("bdfghklmnrt")
_ST_ENDING = set("bdfghklmnt")


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets per the snowball definition: R1 = after the
    first non-vowel following a vowel; R2 = same, computed inside R1; R1's
    start is then adjusted to at least 3."""
    def after_vc(start: int) -> int:
        i = start
        n = len(word)
        while i < n and word[i] not in _VOWELS:
            i += 1
        while i < n and word[i] in _VOWELS:
            i += 1
        # i now at first non-vowel after a vowel (or end)
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return max(r1, 3), r2


def german_stem(word: str) -> str:
    """Snowball German stemmer (clean-room from the published algorithm).

    Lowercase input expected.  Steps: ß→ss; mark intervocalic u/y as
    consonants; three suffix-removal steps gated on the R1/R2 regions;
    unmark; fold umlauts.
    """
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants (upper case = marker): the
    # regions MUST be computed over the marked string (U/Y ∉ _VOWELS), or
    # the marking is dead and e.g. 'bauern' keeps R1 past its 'ern'
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _regions(w)

    def in_r1(suffix_start: int) -> bool:
        return suffix_start >= r1

    def in_r2(suffix_start: int) -> bool:
        return suffix_start >= r2

    lw = w.lower()
    # ---- step 1 -----------------------------------------------------------
    done = False
    for suf in ("ern", "em", "er"):
        if lw.endswith(suf):
            if in_r1(len(lw) - len(suf)):
                w = w[: -len(suf)]
                lw = lw[: -len(suf)]
            done = True
            break
    if not done:
        for suf in ("en", "es", "e"):
            if lw.endswith(suf):
                if in_r1(len(lw) - len(suf)):
                    w = w[: -len(suf)]
                    lw = lw[: -len(suf)]
                    if lw.endswith("niss"):
                        w = w[:-1]
                        lw = lw[:-1]
                done = True
                break
    if not done and lw.endswith("s") and len(lw) >= 2 \
            and lw[-2] in _S_ENDING and in_r1(len(lw) - 1):
        w = w[:-1]
        lw = lw[:-1]
    # ---- step 2 -----------------------------------------------------------
    done = False
    for suf in ("est", "en", "er"):
        if lw.endswith(suf):
            if in_r1(len(lw) - len(suf)):
                w = w[: -len(suf)]
                lw = lw[: -len(suf)]
            done = True
            break
    if not done and lw.endswith("st") and len(lw) >= 6 \
            and lw[-3] in _ST_ENDING and in_r1(len(lw) - 2):
        # st-ending must itself be preceded by at least 3 letters
        w = w[:-2]
        lw = lw[:-2]
    # ---- step 3 (d-suffixes) ----------------------------------------------
    if lw.endswith(("end", "ung")):
        if in_r2(len(lw) - 3):
            w = w[:-3]
            lw = lw[:-3]
            if lw.endswith("ig") and not lw.endswith("eig") \
                    and in_r2(len(lw) - 2):
                w = w[:-2]
                lw = lw[:-2]
    elif lw.endswith(("isch",)):
        if in_r2(len(lw) - 4) and not lw.endswith("eisch"):
            w = w[:-4]
            lw = lw[:-4]
    elif lw.endswith(("ig", "ik")):
        if in_r2(len(lw) - 2) and not lw.endswith(("eig", "eik")):
            w = w[:-2]
            lw = lw[:-2]
    elif lw.endswith(("lich", "heit")):
        if in_r2(len(lw) - 4):
            w = w[:-4]
            lw = lw[:-4]
            for pre in ("er", "en"):
                if lw.endswith(pre) and in_r1(len(lw) - 2):
                    w = w[:-2]
                    lw = lw[:-2]
                    break
    elif lw.endswith("keit"):
        if in_r2(len(lw) - 4):
            w = w[:-4]
            lw = lw[:-4]
            if lw.endswith("lich") and in_r2(len(lw) - 4):
                w = w[:-4]
                lw = lw[:-4]
            elif lw.endswith("ig") and in_r2(len(lw) - 2):
                w = w[:-2]
                lw = lw[:-2]
    # ---- finalize ---------------------------------------------------------
    w = w.lower()
    return (w.replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# French (Snowball French stemming algorithm, classic revision — clean-room
# from the published algorithm description, snowballstem.org "French stemming
# algorithm"; upstream surface: src/whoosh/lang/snowball/french.py ≈L1)
# ---------------------------------------------------------------------------

_FR_VOWELS = set("aeiouyâàëéêèïîôûù")


def _std_regions(w: str, vowels: set) -> tuple[int, int]:
    """Standard snowball R1/R2 (no German floor): R1 = after the first
    non-vowel following a vowel; R2 = same, computed inside R1."""
    def after_vc(start: int) -> int:
        i, n = start, len(w)
        while i < n and w[i] not in vowels:
            i += 1
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    return r1, after_vc(r1)


def _longest(w: str, sufs) -> str | None:
    """Longest listed suffix matching ``w`` (snowball longest-match: the
    winner's condition failing means NO action — shorter candidates are
    not retried)."""
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _fr_mark(w: str) -> str:
    """Pre-pass: u/i between vowels -> U/I, y next to a vowel -> Y, u after
    q -> U (uppercase = 'treat as consonant' marker)."""
    chars = list(w)
    n = len(chars)
    out = chars[:]
    for i, c in enumerate(chars):
        prev = chars[i - 1] if i > 0 else ""
        nxt = chars[i + 1] if i < n - 1 else ""
        if c in "ui" and prev in _FR_VOWELS and nxt in _FR_VOWELS:
            out[i] = c.upper()
        elif c == "y" and (prev in _FR_VOWELS or nxt in _FR_VOWELS):
            out[i] = "Y"
        elif c == "u" and prev == "q":
            out[i] = "U"
    return "".join(out)


def _fr_rv(w: str) -> int:
    """RV: after the 3rd letter when the word starts with two vowels or
    with par/col/tap; else after the first vowel not at position 0; else
    the end."""
    n = len(w)
    if w[:3] in ("par", "col", "tap"):
        return min(3, n)
    if n >= 2 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return min(3, n)
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


# step-1 suffix pool: suffix -> action group (searched longest-first; the
# longest match's group alone decides)
_FR_S1 = {}
for _s in ("ance iqUe isme able iste eux "
           "ances iqUes ismes ables istes").split():
    _FR_S1[_s] = "del_r2"
for _s in "atrice ateur ation atrices ateurs ations".split():
    _FR_S1[_s] = "ateur"
for _s in ("logie", "logies"):
    _FR_S1[_s] = "log"
for _s in ("usion", "ution", "usions", "utions"):
    _FR_S1[_s] = "u"
for _s in ("ence", "ences"):
    _FR_S1[_s] = "ent"
for _s in ("ement", "ements"):
    _FR_S1[_s] = "ement"
for _s in ("ité", "ités"):
    _FR_S1[_s] = "ite"
for _s in ("if", "ive", "ifs", "ives"):
    _FR_S1[_s] = "if"
_FR_S1["eaux"] = "eaux"
_FR_S1["aux"] = "aux"
for _s in ("euse", "euses"):
    _FR_S1[_s] = "euse"
for _s in ("issement", "issements"):
    _FR_S1[_s] = "issement"
_FR_S1["amment"] = "amment"
_FR_S1["emment"] = "emment"
for _s in ("ment", "ments"):
    _FR_S1[_s] = "ment"

_FR_S2A = ("îmes ît îtes i ie ies ir ira irai iraIent irais irait iras "
           "irent irez iriez irions irons iront is issaIent issais issait "
           "issant issante issantes issants isse issent isses issez issiez "
           "issions issons it").split()

_FR_S2B_ER = ("é ée ées és èrent er era erai eraIent erais erait eras erez "
              "eriez erions erons eront ez iez").split()
_FR_S2B_A = ("âmes ât âtes a ai aIent ais ait ant ante antes ants as asse "
             "assent asses assiez assions").split()


def french_stem(word: str) -> str:
    """Snowball French stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    w = _fr_mark(word)
    rv = _fr_rv(w)
    r1, r2 = _std_regions(w, _FR_VOWELS)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    # ---- step 1: standard suffix removal ---------------------------------
    changed1 = False
    ment_removed = False
    suf = _longest(w, _FR_S1)
    if suf is not None:
        g = _FR_S1[suf]
        i = len(w) - len(suf)
        if g == "del_r2":
            if in_r2(i):
                w = w[:i]
                changed1 = True
        elif g == "ateur":
            if in_r2(i):
                w = w[:i]
                changed1 = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif g == "log":
            if in_r2(i):
                w = w[:i] + "log"
                changed1 = True
        elif g == "u":
            if in_r2(i):
                w = w[:i] + "u"
                changed1 = True
        elif g == "ent":
            if in_r2(i):
                w = w[:i] + "ent"
                changed1 = True
        elif g == "ement":
            if in_rv(i):
                w = w[:i]
                changed1 = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = w[:-3]
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif (w.endswith("abl") and in_r2(len(w) - 3)) \
                        or (w.endswith("iqU") and in_r2(len(w) - 3)):
                    w = w[:-3]
                elif (w.endswith("ièr") or w.endswith("Ièr")) \
                        and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif g == "ite":
            if in_r2(i):
                w = w[:i]
                changed1 = True
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif g == "if":
            if in_r2(i):
                w = w[:i]
                changed1 = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif g == "eaux":
            w = w[:i] + "eau"
            changed1 = True
        elif g == "aux":
            if in_r1(i):
                w = w[:i] + "al"
                changed1 = True
        elif g == "euse":
            if in_r2(i):
                w = w[:i]
                changed1 = True
            elif in_r1(i):
                w = w[:i] + "eux"
                changed1 = True
        elif g == "issement":
            if in_r1(i) and i > 0 and w[i - 1] not in _FR_VOWELS:
                w = w[:i]
                changed1 = True
        elif g == "amment":
            if in_rv(i):
                w = w[:i] + "ant"
                changed1 = True
                ment_removed = True
        elif g == "emment":
            if in_rv(i):
                w = w[:i] + "ent"
                changed1 = True
                ment_removed = True
        elif g == "ment":
            # delete when preceded by a vowel which is itself in RV
            if i > 0 and w[i - 1] in _FR_VOWELS and in_rv(i - 1):
                w = w[:i]
                changed1 = True
                ment_removed = True

    # ---- steps 2a/2b: verb suffixes (confined to RV) ---------------------
    did2a = did2b = False
    changed2a = changed2b = False
    if (not changed1) or ment_removed:
        did2a = True
        suf = _longest(w, _FR_S2A)
        if suf is not None:
            i = len(w) - len(suf)
            if in_rv(i) and i > 0 and w[i - 1] not in _FR_VOWELS \
                    and in_rv(i - 1):
                w = w[:i]
                changed2a = True
        if not changed2a:
            did2b = True
            suf = _longest(w, ["ions"] + _FR_S2B_ER + _FR_S2B_A)
            if suf is not None:
                i = len(w) - len(suf)
                if suf == "ions":
                    if in_rv(i) and in_r2(i):
                        w = w[:i]
                        changed2b = True
                elif suf in _FR_S2B_ER:
                    if in_rv(i):
                        w = w[:i]
                        changed2b = True
                else:  # the a-group
                    if in_rv(i):
                        w = w[:i]
                        changed2b = True
                        if w.endswith("e") and in_rv(len(w) - 1):
                            w = w[:-1]

    # ---- step 3 / step 4 -------------------------------------------------
    last_changed = changed2b if did2b else (changed2a if did2a else changed1)
    if last_changed:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: final s not preceded by a/i/o/u/è/s
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        suf = _longest(w, ("ion", "ier", "ière", "Ier", "Ière", "e", "ë"))
        if suf is not None:
            i = len(w) - len(suf)
            if suf == "ion":
                if in_rv(i) and in_r2(i) and i > 0 and w[i - 1] in "st" \
                        and in_rv(i - 1):
                    w = w[:i]
            elif suf in ("ier", "ière", "Ier", "Ière"):
                if in_rv(i):
                    w = w[:i] + "i"
            elif suf == "e":
                if in_rv(i):
                    w = w[:i]
            else:  # ë
                if in_rv(i) and w[:i].endswith("gu"):
                    w = w[:i]

    # ---- step 5: undouble ------------------------------------------------
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]
    # ---- step 6: un-accent -----------------------------------------------
    j = len(w) - 1
    k = 0
    while j >= 0 and w[j] not in _FR_VOWELS:
        j -= 1
        k += 1
    if k >= 1 and j >= 0 and w[j] in "éè":
        w = w[:j] + "e" + w[j + 1:]
    # ---- unmark ----------------------------------------------------------
    return w.replace("U", "u").replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Spanish (Snowball Spanish stemming algorithm — clean-room from the
# published algorithm description, snowballstem.org "Spanish stemming
# algorithm"; upstream surface: src/whoosh/lang/snowball/spanish.py ≈L1)
# ---------------------------------------------------------------------------

_ES_VOWELS = set("aeiouáéíóúü")
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")

_ES_PRONOUNS = ("me se sela selo selas selos la le lo las les los "
                "nos").split()
_ES_P_A = ("iéndo", "ándo", "ár", "ér", "ír")       # un-accent after delete
_ES_P_B = ("ando", "iendo", "ar", "er", "ir")

_ES_S1 = {}
for _s in ("anza anzas ico ica icos icas ismo ismos able ables ible ibles "
           "ista istas oso osa osos osas amiento amientos imiento "
           "imientos").split():
    _ES_S1[_s] = "del_r2"
for _s in ("adora ador ación adoras adores aciones ante antes ancia "
           "ancias").split():
    _ES_S1[_s] = "ador"
for _s in ("logía", "logías"):
    _ES_S1[_s] = "log"
for _s in ("ución", "uciones"):
    _ES_S1[_s] = "u"
for _s in ("encia", "encias"):
    _ES_S1[_s] = "ente"
_ES_S1["amente"] = "amente"
_ES_S1["mente"] = "mente"
for _s in ("idad", "idades"):
    _ES_S1[_s] = "idad"
for _s in ("iva", "ivo", "ivas", "ivos"):
    _ES_S1[_s] = "iv"

_ES_S2A = "ya ye yan yen yeron yendo yo yó yas yes yais yamos".split()
_ES_S2B_GU = "en es éis emos".split()
_ES_S2B = ("arían arías arán arás aríais aría aréis aríamos aremos ará aré "
           "erían erías erán erás eríais ería eréis eríamos eremos erá eré "
           "irían irías irán irás iríais iría iréis iríamos iremos irá iré "
           "aba ada ida ía ara iera ad ed id ase iese aste iste an aban ían "
           "aran ieran asen iesen aron ieron ado ido ando iendo ió ar er ir "
           "as abas adas idas ías aras ieras ases ieses ís áis abais íais "
           "arais ierais aseis ieseis asteis isteis ados idos amos ábamos "
           "íamos imos áramos iéramos iésemos ásemos").split()
_ES_S3_DEL = ("os", "a", "o", "á", "í", "ó")


def _es_rv(w: str, vowels: set | None = None) -> int:
    """RV: second letter a consonant -> after the next following vowel;
    first two letters vowels -> after the next following consonant;
    consonant+vowel -> after the third letter; else the end.  (The shared
    Spanish/Italian/Portuguese RV definition — pass the language's vowel
    set.)"""
    vowels = _ES_VOWELS if vowels is None else vowels
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    if w[0] in vowels:
        for i in range(2, n):
            if w[i] not in vowels:
                return i + 1
        return n
    return 3


def spanish_stem(word: str) -> str:
    """Snowball Spanish stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    w = word
    rv = _es_rv(w)
    r1, r2 = _std_regions(w, _ES_VOWELS)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    # ---- step 0: attached pronoun ----------------------------------------
    pron = _longest(w, _ES_PRONOUNS)
    if pron is not None:
        base = w[: len(w) - len(pron)]
        end = _longest(base, _ES_P_A + _ES_P_B + ("yendo",))
        if end is not None:
            i = len(base) - len(end)
            if end == "yendo":
                if in_rv(i) and i > 0 and base[i - 1] == "u":
                    w = base
            elif end in _ES_P_A:
                if in_rv(i):
                    w = base[:i] + end.translate(_ES_UNACCENT)
            else:
                if in_rv(i):
                    w = base
        # regions were computed on entry and keep their offsets: pronoun
        # removal only shortens the tail, never the region starts

    # ---- step 1: standard suffix removal ---------------------------------
    changed1 = False
    suf = _longest(w, _ES_S1)
    if suf is not None:
        g = _ES_S1[suf]
        i = len(w) - len(suf)
        if g == "del_r2":
            if in_r2(i):
                w = w[:i]
                changed1 = True
        elif g == "ador":
            if in_r2(i):
                w = w[:i]
                changed1 = True
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif g == "log":
            if in_r2(i):
                w = w[:i] + "log"
                changed1 = True
        elif g == "u":
            if in_r2(i):
                w = w[:i] + "u"
                changed1 = True
        elif g == "ente":
            if in_r2(i):
                w = w[:i] + "ente"
                changed1 = True
        elif g == "amente":
            if in_r1(i):
                w = w[:i]
                changed1 = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif (w.endswith(("os", "ic", "ad"))
                      and in_r2(len(w) - 2)):
                    w = w[:-2]
        elif g == "mente":
            if in_r2(i):
                w = w[:i]
                changed1 = True
                if (w.endswith(("ante", "able", "ible"))
                        and in_r2(len(w) - 4)):
                    w = w[:-4]
        elif g == "idad":
            if in_r2(i):
                w = w[:i]
                changed1 = True
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif (w.endswith(("ic", "iv")) and in_r2(len(w) - 2)):
                    w = w[:-2]
        elif g == "iv":
            if in_r2(i):
                w = w[:i]
                changed1 = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]

    # ---- step 2a: verb suffixes beginning y ------------------------------
    changed2a = False
    if not changed1:
        suf = _longest(w, _ES_S2A)
        if suf is not None:
            i = len(w) - len(suf)
            if in_rv(i) and i > 0 and w[i - 1] == "u":
                w = w[:i]
                changed2a = True
        # ---- step 2b: other verb suffixes --------------------------------
        if not changed2a:
            suf = _longest(w, _ES_S2B_GU + _ES_S2B)
            if suf is not None:
                i = len(w) - len(suf)
                if in_rv(i):
                    w = w[:i]
                    if suf in _ES_S2B_GU and w.endswith("gu"):
                        w = w[:-1]

    # ---- step 3: residual suffix -----------------------------------------
    suf = _longest(w, _ES_S3_DEL + ("e", "é"))
    if suf is not None:
        i = len(w) - len(suf)
        if suf in _ES_S3_DEL:
            if in_rv(i):
                w = w[:i]
        else:  # e / é
            if in_rv(i):
                w = w[:i]
                if w.endswith("gu") and in_rv(len(w) - 1):
                    w = w[:-1]

    return w.translate(_ES_UNACCENT)


# ---------------------------------------------------------------------------
# registry + chains
# ---------------------------------------------------------------------------

def _porter2(word: str) -> str:
    from whoosh_spark.analysis.snowball_english import english_stem

    return english_stem(word)


STEMMERS: dict[str, object] = {"en": _porter2, "de": german_stem,
                               "fr": french_stem, "es": spanish_stem}

# compact per-language stopword cores (public snowball lists, head subset;
# the registry takes any iterable — swap in the full lists as needed)
LANG_STOPWORDS: dict[str, frozenset] = {
    "de": frozenset("""der die das den dem des ein eine einer eines einem
        einen und oder aber als also am an auf aus bei bin bis bist da
        damit dann doch dort du durch er es für hatte haben hat ich ihr im
        in ist ja kann mein mich mir mit nach nicht noch nun nur ob sich
        sie sind so um uns unter vom von vor war was wie wir wird zu zum
        zur""".split()),
    "fr": frozenset("""au aux avec ce ces dans de des du elle en et eux il
        ils je la le les leur lui ma mais me même mes moi mon ne nos notre
        nous on ou par pas pour qu que qui sa se ses son sur ta te tes toi
        ton tu un une vos votre vous été étée étées étés étant suis es est
        sommes êtes sont serai seras sera serons serez seront serais serait
        serions seriez seraient étais était étions étiez étaient fus fut
        fûmes fûtes furent sois soit soyons soyez soient fusse fusses fût
        fussions fussiez fussent ayant eu eue eues eus ai as avons avez ont
        aurai auras aura aurons aurez auront aurais aurait aurions auriez
        auraient avais avait avions aviez avaient eut eûmes eûtes eurent
        aie aies ait ayons ayez aient eusse eusses eût eussions eussiez
        eussent ceci cela celà cet cette ici là""".split()),
    "es": frozenset("""al algo ante antes como con contra cual cuando de
        del desde donde durante el ella ellas ellos en entre era erais es
        esa esas ese eso esos esta estas este esto estos fue ha hay la las
        le les lo los más mi mis mucho muy no nos nosotros o os otra otro
        para pero poco por porque que quien se sin sobre son su sus también
        tanto te tu tus un una uno unos vosotros y ya yo algunos algunas
        cada desde donde ellas esos estos fueron había han he hemos hube
        les me mía mías mío míos nada ni nuestra nuestras nuestro nuestros
        os otras otros quienes qué sí somos soy suya suyas suyo suyos todo
        todos tuya tuyo vuestra vuestras vuestro vuestros""".split()),
}


def register_stemmer(lang: str, fn) -> None:
    """Plug a stemmer for a language code (``whoosh.lang.stemmer_for_language``
    registry analog).  ``fn(word) -> stem`` must be picklable (runs inside
    the Arrow batch kernel)."""
    if not callable(fn):
        raise TypeError(f"stemmer for {lang!r} must be callable")
    STEMMERS[lang] = fn


def make_language_analyzer(lang: str):
    """Tokenize → lowercase → language stop filter (gap-preserving ordinals)
    → language stemmer (identity when none registered): upstream's
    ``LanguageAnalyzer(lang)``."""
    from whoosh_spark.analysis.analyzers import (
        MIN_WORD_SIZE,
        _TOKEN_RE_NC,
    )

    stops = LANG_STOPWORDS.get(lang, frozenset())
    stem = STEMMERS.get(lang)
    # worker-lifetime stem memo: corpus vocabulary is Zipf-bounded, so at
    # scale nearly every token is a repeat — the per-token cost becomes one
    # dict hit instead of the full suffix machinery.  Capped so adversarial
    # (unbounded-vocab) input can't grow executor memory without limit.
    cache: dict[str, str] = {}
    cache_cap = 1 << 20

    def fn(text: str) -> tuple[list[str], list[int]]:
        tokens: list[str] = []
        positions: list[int] = []
        for pos, t in enumerate(_TOKEN_RE_NC.findall(text)):
            t = t.lower()
            if len(t) >= MIN_WORD_SIZE and t not in stops:
                if stem is not None:
                    s = cache.get(t)
                    if s is None:
                        s = stem(t)
                        if len(cache) < cache_cap:
                            cache[t] = s
                    tokens.append(s)
                else:
                    tokens.append(t)
                positions.append(pos)
        return tokens, positions

    return fn


def register_language(lang: str, stopwords=None, stemmer=None) -> None:
    """One-call per-language chain registration: optional stopword list +
    optional stemmer, then the ``lang_<code>`` analyzer appears in the
    schema registry."""
    from whoosh_spark.analysis.analyzers import ANALYZERS

    if stopwords is not None:
        LANG_STOPWORDS[lang] = frozenset(stopwords)
    if stemmer is not None:
        register_stemmer(lang, stemmer)
    ANALYZERS[f"lang_{lang}"] = make_language_analyzer(lang)


# round-5 family extension: Italian/Portuguese (romance skeleton) and
# Swedish/Norwegian/Danish/Dutch (nordic skeleton) — imported at the bottom
# so the helpers above exist when these modules import them back
from whoosh_spark.analysis.snowball_nordic import (  # noqa: E402
    danish_stem,
    dutch_stem,
    norwegian_stem,
    swedish_stem,
)
from whoosh_spark.analysis.snowball_romance import (  # noqa: E402
    italian_stem,
    portuguese_stem,
    romanian_stem,
)
from whoosh_spark.analysis.snowball_russian import russian_stem  # noqa: E402
from whoosh_spark.analysis.snowball_turkish import turkish_stem  # noqa: E402
from whoosh_spark.analysis.snowball_uralic import (  # noqa: E402
    finnish_stem,
    hungarian_stem,
)

STEMMERS.update({"sv": swedish_stem, "no": norwegian_stem,
                 "da": danish_stem, "nl": dutch_stem,
                 "it": italian_stem, "pt": portuguese_stem,
                 "ru": russian_stem, "ro": romanian_stem,
                 "fi": finnish_stem, "hu": hungarian_stem,
                 "tr": turkish_stem})

LANG_STOPWORDS.update({
    "en": frozenset("""i me my myself we our ours ourselves you your yours
        yourself yourselves he him his himself she her hers herself it its
        itself they them their theirs themselves what which who whom this
        that these those am is are was were be been being have has had
        having do does did doing a an the and but if or because as until
        while of at by for with about against between into through during
        before after above below to from up down in out on off over under
        again further then once here there when where why how all any both
        each few more most other some such no nor not only own same so
        than too very s t can will just don should now""".split()),
    "sv": frozenset("""och det att i en jag hon som han på den med var sig
        för så till är men ett om hade de av icke mig du henne då sin nu
        har inte hans honom skulle hennes där min man ej vid kunde något
        från ut när efter upp vi dem vara vad över än dig kan sina här ha
        mot alla under någon eller allt mycket sedan ju denna själv detta
        åt utan varit hur ingen mitt ni bli blev oss din dessa några deras
        blir mina samma vilken er sådan vår blivit dess inom mellan sådant
        varför varje vilka ditt vem vilket sådana vart dina vars vårt våra
        ert era vilkas""".split()),
    "no": frozenset("""og i jeg det at en et den til er som på de med han
        av ikke ikkje der så var meg seg men ett har om vi min mitt ha
        hadde hun nå over da ved fra du ut sin dem oss opp man kan hans
        hvor eller hva skal selv sjøl her alle vil bli ble blei blitt
        kunne inn når være kom noen noe ville dere som deres kun ja etter
        ned skulle denne for deg si sine sitt mot å meget hvorfor dette
        disse uten hvordan ingen din ditt blir samme hvilken hvilke sånn
        inni mellom vår hver hvem vors hvis både bare enn fordi før mange
        også slik vært båe begge siden henne hennar hennes""".split()),
    "da": frozenset("""og i jeg det at en den til er som på de med han af
        ikke der så var mig sig men et har om vi min havde ham hun nu over
        da fra du ud sin dem os op man hans hvor eller hvad skal selv her
        alle vil blev kunne ind når være dog noget ville jo deres efter
        ned skulle denne end dette mit også under have dig anden hende
        mine alt meget sit sine vor mod disse hvis din nogle hos blive
        mange ad bliver hendes været thi jer sådan""".split()),
    "nl": frozenset("""de en van ik te dat die in een hij het niet zijn is
        was op aan met als voor had er maar om hem dan zou of wat mijn men
        dit zo door over ze zich bij ook tot je mij uit der daar haar naar
        heb hoe heeft hebben deze u want nog zal me zij nu ge geen omdat
        iets worden toch al waren veel meer doen toen moet ben zonder kan
        hun dus alles onder ja eens hier wie werd altijd doch wordt wezen
        kunnen ons zelf tegen na reeds wil kon niets uw iemand geweest
        andere""".split()),
    "it": frozenset("""ad al allo ai agli all agl alla alle con col coi da
        dal dallo dai dagli dall dagl dalla dalle di del dello dei degli
        dell degl della delle in nel nello nei negli nell negl nella nelle
        su sul sullo sui sugli sull sugl sulla sulle per tra contro io tu
        lui lei noi voi loro mio mia miei mie tuo tua tuoi tue suo sua
        suoi sue nostro nostra nostri nostre vostro vostra vostri vostre
        mi ti ci vi lo la li le gli ne il un uno una ma ed se perché anche
        come dov dove che chi cui non più quale quanto quanti quanta
        quante quello quelli quella quelle questo questi questa queste si
        tutto tutti a c e i l o ho hai ha abbiamo avete hanno""".split()),
    "ru": frozenset("""и в во не что он на я с со как а то все она так его
        но да ты к у же вы за бы по только ее мне было вот от меня еще нет
        о из ему теперь когда даже ну вдруг ли если уже или ни быть был
        него до вас нибудь опять уж вам ведь там потом себя ничего ей
        может они тут где есть надо ней для мы тебя их чем была сам чтоб
        без будто чего раз тоже себе под будет ж тогда кто этот того
        потому этого какой совсем ним здесь этом один почти мой тем чтобы
        нее сейчас были куда зачем всех никогда можно при наконец два об
        другой хоть после над больше тот через эти нас про всего них какая
        много разве три эту моя впрочем хорошо свою этой перед иногда
        лучше чуть том нельзя такой им более всегда конечно всю между""".
        split()),
    "pt": frozenset("""de a o que e do da em um para é com não uma os no
        se na por mais as dos como mas foi ao ele das tem à seu sua ou ser
        quando muito há nos já está eu também só pelo pela até isso ela
        entre era depois sem mesmo aos ter seus quem nas me esse eles
        estão você tinha foram essa num nem suas meu às minha têm numa
        pelos elas havia seja qual será nós tenho lhe deles essas esses
        pelas este fosse dele""".split()),
    "fi": frozenset("""olla olen olet on olemme olette ovat ole oli olisi
        olisit olisin olisimme olisitte olisivat olit olin olimme olitte
        olivat ollut olleet en et ei emme ette eivät minä minun minut minua
        minussa minusta minuun minulla minulta minulle sinä sinun hän hänen
        häntä se sen sitä siinä siitä siihen sillä sille me meidän te
        teidän he heidän tämä tämän tätä tässä tästä tähän tuo nämä nuo ne
        kuka mikä mitä missä mistä mihin miksi kun niin nyt itse ja että
        jos koska kuin mutta sekä sillä tai vaan vai vaikka myös jo vielä
        vain joka jonka jossa josta""".split()),
    "hu": frozenset("""a az és vagy hogy nem de is egy ez ezek azok ők mi
        ti én te ő csak már még mint ahogy amely amelyek aki akik ami ilyen
        olyan ott itt akkor majd mert ha való volt voltak lesz lesznek van
        vannak lenni lehet kell által arra azzal abban ebben úgy így hát
        mindig minden sok több nagyon ismét ezt azt annak ennek akár pedig
        szerint között után előtt alatt felett nélkül ellen óta miatt vele
        nála rá el le fel ki be meg át hozzá néhány más másik ugyanis
        tehát illetve például vagyis amikor amíg mivel""".split()),
    "ro": frozenset("""și in în a la cu de pe un o este sunt era erau fi
        fie fost care ce cine unde când cum nu da dar sau iar însă dacă
        pentru până prin după fără sub peste între către despre acest
        această aceste acel acea acei acele eu tu el ea noi voi ei ele meu
        mea tău ta său sa lui al ai ale cel cea cei cele mai foarte atât
        apoi aici acolo se îi le îl ne vă mă te îți își s-a s-au nici ori
        din ca să au am ați ar fi va vor tot toate toți orice ceva cineva
        nimic nimeni doar chiar deci astfel atunci acum""".split()),
    "tr": frozenset("""ve bir bu da de için ile mi mı mu mü ne o ki ama
        veya ancak çok daha en gibi kadar sonra önce üzere diye eğer hem
        hep hiç her şey şu ben sen biz siz onlar bana sana ona beni seni
        onu bizi sizi bizim sizin onların benim senin onun değil var yok
        idi imiş ise olarak olan oldu olur ya yani çünkü fakat hatta artık
        şimdi böyle şöyle öyle nasıl neden niçin niye kim hangi kaç birkaç
        bazı bütün tüm işte sadece belki tabii yine gene dahi üzerinde
        arasında altında yanında karşı doğru başka diğer aynı""".split()),
})

for _lang in ("en", "de", "fr", "es", "sv", "no", "da", "nl", "it", "pt",
              "ru", "ro", "fi", "hu", "tr"):
    register_language(_lang)

# Paice-Husk / Lancaster through the same registry route — the analog of
# upstream's ``StemmingAnalyzer(stemfn=paicehusk.stem)``: the STANDARD
# chain's stop set with the Lancaster stemmer swapped in, reachable as
# analyzer name "lang_lancaster" everywhere an analyzer name is accepted
from whoosh_spark.analysis.paicehusk import paicehusk_stem  # noqa: E402
from whoosh_spark.config import STOP_WORDS as _STD_STOPS  # noqa: E402

register_language("lancaster", stopwords=_STD_STOPS,
                  stemmer=paicehusk_stem)
