"""Clean-room Snowball stemmers: Italian, Portuguese.

Implemented from the published algorithm descriptions on snowballstem.org
("Italian stemming algorithm", "Portuguese stemming algorithm" — classic
revisions), mirroring upstream whoosh's snowball family
(``src/whoosh/lang/snowball/{italian,portuguese}.py`` ≈L1).  Both share
the Spanish skeleton (analysis/snowball.py): RV/R1/R2 regions, a step-0
attached-pronoun pass (Italian), a step-1 standard-suffix pool with
per-group conditions, a step-2 verb-suffix pool confined to RV, and
residual-vowel cleanup.
"""

from __future__ import annotations

from whoosh_spark.analysis.snowball import _es_rv, _longest, _std_regions

# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_VOWELS = set("aeiouàèìòù")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRONOUNS = ("ci gli la le li lo mi ne si ti vi sene gliela gliele "
                "glieli glielo gliene mela mele meli melo mene tela tele "
                "teli telo tene cela cele celi celo cene vela vele veli "
                "velo vene").split()

_IT_S1 = {}
for _s in ("anza anze ico ici ica ice iche ichi ismo ismi abile abili "
           "ibile ibili ista iste isti istà istè istì oso osi osa ose "
           "mente atrice atrici ante anti").split():
    _IT_S1[_s] = "del_r2"
for _s in ("azione", "azioni", "atore", "atori"):
    _IT_S1[_s] = "azione"
for _s in ("logia", "logie"):
    _IT_S1[_s] = "log"
for _s in ("uzione", "uzioni", "usione", "usioni"):
    _IT_S1[_s] = "u"
for _s in ("enza", "enze"):
    _IT_S1[_s] = "ente"
_IT_S1["amente"] = "amente"
for _s in ("amento", "amenti", "imento", "imenti"):
    _IT_S1[_s] = "amento"
_IT_S1["ità"] = "ita"
for _s in ("ivo", "ivi", "iva", "ive"):
    _IT_S1[_s] = "iv"

_IT_S2 = ("ammo ando ano are arono asse assero assi assimo ata ate ati "
          "ato ava avamo avano avate avi avo emmo enda ende endi endo "
          "erà erai eranno ere erebbe erebbero erei eremmo eremo ereste "
          "eresti erete erò erono essero ete eva evamo evano evate evi "
          "evo iamo immo irà irai iranno ire irebbe irebbero irei "
          "iremmo iremo ireste iresti irete irò irono isca iscano isce "
          "isci isco iscono issero ita ite iti ito iva ivamo ivano ivate "
          "ivi ivo ono uta ute uti uto ar ir").split()


def _it_mark(w: str) -> str:
    """Pre-pass: u/i between vowels -> U/I, u after q -> U (uppercase =
    'treat as consonant' marker)."""
    chars = list(w)
    n = len(chars)
    out = chars[:]
    for i, c in enumerate(chars):
        prev = chars[i - 1] if i > 0 else ""
        nxt = chars[i + 1] if i < n - 1 else ""
        if c in "ui" and prev in _IT_VOWELS and nxt in _IT_VOWELS:
            out[i] = c.upper()
        elif c == "u" and prev == "q":
            out[i] = "U"
    return "".join(out)


def italian_stem(word: str) -> str:
    """Snowball Italian stemmer (clean-room from the published algorithm
    description).  Lowercase input expected."""
    w = _it_mark(word.translate(_IT_ACUTE))
    rv = _es_rv(w, _IT_VOWELS)
    r1, r2 = _std_regions(w, _IT_VOWELS)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    # ---- step 0: attached pronoun ----------------------------------------
    pron = _longest(w, _IT_PRONOUNS)
    if pron is not None:
        base = w[: len(w) - len(pron)]
        end = _longest(base, ("ando", "endo", "ar", "er", "ir"))
        if end is not None and in_rv(len(base) - len(end)):
            if end in ("ando", "endo"):
                w = base
            else:
                w = base + "e"
    # ---- step 1: standard suffixes ---------------------------------------
    changed1 = False
    suf = _longest(w, _IT_S1)
    if suf is not None:
        g = _IT_S1[suf]
        i = len(w) - len(suf)
        if g == "del_r2":
            if in_r2(i):
                w = w[:i]
                changed1 = True
        elif g == "azione":
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
                elif (w.endswith(("os", "ic")) and in_r2(len(w) - 2)):
                    w = w[:-2]
                elif w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
        elif g == "amento":
            if in_rv(i):
                w = w[:i]
                changed1 = True
        elif g == "ita":
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
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
    # ---- step 2: verb suffixes (only if step 1 left the word alone) ------
    if not changed1:
        suf = _longest(w, _IT_S2)
        if suf is not None and in_rv(len(w) - len(suf)):
            w = w[: -len(suf)]
    # ---- step 3a: residual vowel (and a preceding i) in RV ----------------
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]
    # ---- step 3b: ch/gh -> c/g in RV --------------------------------------
    if w.endswith(("ch", "gh")) and in_rv(len(w) - 2):
        w = w[:-1]
    # ---- unmark -----------------------------------------------------------
    return w.replace("U", "u").replace("I", "i").lower()


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------

_PT_VOWELS = set("aeiouáéíóúâêô")

_PT_S1 = {}
for _s in ("eza ezas ico ica icos icas ismo ismos ável ível ista istas "
           "oso osa osos osas amento amentos imento imentos adora ador "
           "aça~o adoras adores aço~es ante antes ância").split():
    _PT_S1[_s] = "del_r2"
for _s in ("logia", "logias"):
    _PT_S1[_s] = "log"
for _s in ("uça~o", "uço~es"):
    _PT_S1[_s] = "u"
for _s in ("ência", "ências"):
    _PT_S1[_s] = "ente"
_PT_S1["amente"] = "amente"
_PT_S1["mente"] = "mente"
for _s in ("idade", "idades"):
    _PT_S1[_s] = "idade"
for _s in ("iva", "ivo", "ivas", "ivos"):
    _PT_S1[_s] = "iv"
for _s in ("ira", "iras"):
    _PT_S1[_s] = "ira"

_PT_S2 = ("ada ida ia aria eria iria ará ara erá era irá ava asse esse "
          "isse aste este iste ei arei erei irei am iam ariam eriam iriam "
          "aram eram iram avam em arem erem irem assem essem issem ado "
          "ido ando endo indo ara~o era~o ira~o ar er ir as adas idas ias "
          "arias erias irias arás aras erás eras irás avas es ardes erdes "
          "irdes ares eres ires asses esses isses astes estes istes is "
          "ais iais aríais eríais iríais áveis íeis aríeis eríeis iríeis "
          "ados idos ámos amos íamos aríamos eríamos iríamos áramos "
          "éramos íramos ávamos emos aremos eremos iremos ássemos "
          "êssemos íssemos imos armos ermos irmos eu iu ou ira "
          "iras").split()


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese stemmer (clean-room from the published algorithm
    description).  Lowercase input expected.  The nasalized vowels ã/õ are
    carried through the steps as the two-character markers a~/o~ exactly as
    the published description specifies, then folded back."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _es_rv(w, _PT_VOWELS)
    r1, r2 = _std_regions(w, _PT_VOWELS)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    # ---- step 1: standard suffixes ---------------------------------------
    changed1 = False
    suf = _longest(w, _PT_S1)
    if suf is not None:
        g = _PT_S1[suf]
        i = len(w) - len(suf)
        if g == "del_r2":
            if in_r2(i):
                w = w[:i]
                changed1 = True
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
                if (w.endswith(("ante", "avel", "ível"))
                        and in_r2(len(w) - 4)):
                    w = w[:-4]
        elif g == "idade":
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
        elif g == "ira":
            if in_rv(i) and i > 0 and w[i - 1] == "e":
                w = w[:i] + "ir"
                changed1 = True
    # ---- step 2: verb suffixes (only if step 1 left the word alone) ------
    changed2 = False
    if not changed1:
        suf = _longest(w, _PT_S2)
        if suf is not None and in_rv(len(w) - len(suf)):
            w = w[: -len(suf)]
            changed2 = True
    # ---- step 3: i after c when 1/2 changed the word ----------------------
    if (changed1 or changed2) and w.endswith("i") and in_rv(len(w) - 1) \
            and len(w) >= 2 and w[-2] == "c":
        w = w[:-1]
    # ---- step 4: residual suffix (only if 1 and 2 both did nothing) -------
    if not (changed1 or changed2):
        suf = _longest(w, ("os", "a", "i", "o", "á", "í", "ó"))
        if suf is not None and in_rv(len(w) - len(suf)):
            w = w[: -len(suf)]
    # ---- step 5: final e / cedilla ----------------------------------------
    if w and w[-1] in "eéê" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("gu") and in_rv(len(w) - 1):
            w = w[:-1]
        elif w.endswith("ci") and in_rv(len(w) - 1):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"
    # ---- fold the nasal markers back --------------------------------------
    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Romanian
# ---------------------------------------------------------------------------

_RO_VOWELS = set("aăâeiîou")
# cedilla-form ş/ţ (U+015F/U+0163) normalised to the comma-below letters
# the published algorithm is written in (U+0219/U+021B)
_RO_CEDILLA = str.maketrans("şţ", "șț")

_RO_S0 = {}
for _s in ("ul", "ului"):
    _RO_S0[_s] = ""
_RO_S0["aua"] = "a"
for _s in ("ea", "ele", "elor"):
    _RO_S0[_s] = "e"
for _s in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
    _RO_S0[_s] = "i"
_RO_S0["ile"] = "i_not_ab"
_RO_S0["atei"] = "at"
for _s in ("ație", "ația"):
    _RO_S0[_s] = "ați"

# step 1: combining-suffix reductions, repeated until stable
_RO_S1 = {}
for _s in ("abilitate", "abilitati", "abilități"):
    _RO_S1[_s] = "abil"
_RO_S1["ibilitate"] = "ibil"
for _s in ("ivitate", "ivitati", "ivități"):
    _RO_S1[_s] = "iv"
for _s in ("icitate", "icitati", "icități", "icator", "icatori",
           "iciv", "iciva", "icive", "icivi", "icivă"):
    _RO_S1[_s] = "ic"
for _s in ("ativ", "ativa", "ative", "ativi", "ativă", "ațiune",
           "atoare", "ator", "atori", "ătoare", "ător", "ători"):
    _RO_S1[_s] = "at"
for _s in ("itiv", "itiva", "itive", "itivi", "itivă", "ițiune",
           "itoare", "itor", "itori"):
    _RO_S1[_s] = "it"

# step 2: standard suffixes deleted in R2
_RO_S2_DEL = ("at ata ată ati ate ut uta ută uti ute it ita ită iti ite "
              "ic ica ice ici ică iv iva ive ivi ivă abil abila abile "
              "abili abilă ibil ibila ibile ibili ibilă oasa oasă oase "
              "os osi oși ant anta ante anti antă ator atori itate itati "
              "ități").split()
_RO_S2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă", "iști")
# full step-2 longest-match pool, built once (hot path: one call per new
# vocabulary token).  'ibilitate' is NOT here — the step-1 repeat loop
# ('ibilitate'→'ibil' in R1 ⊇ R2) always consumes it first
_RO_S2_ALL = tuple(_RO_S2_DEL) + _RO_S2_IST + ("iune", "iuni")

# step 3: verb suffixes in RV.  Group A needs a consonant or 'u' before
# the suffix; group B deletes unconditionally (regular-conjugation pool of
# the published description: infinitives, ez/esc presents, gerunds, person
# endings, imperfects and simple/pluperfects)
_RO_VERB_A = ("are ere ire âre ind ând indu ându eze ează esc ești "
              "ește ez ezi ază").split()
_RO_VERB_B = ("am ai au eai eau iai iau ui âi ași arăm arăți ară asem "
              "aseși ase aserăm aserăți aseră isem iseși ise iserăm "
              "iserăți iseră âsem âseși âse âserăm âserăți âseră usem "
              "useși use userăm userăți useră ăm ați em eți im iți âm "
              "âți sei se sesem seseși sese seserăm seserăți seseră "
              "seși serăm serăți seră").split()
_RO_VERB_ALL = tuple(_RO_VERB_A) + tuple(_RO_VERB_B)
_RO_VERB_A_SET = frozenset(_RO_VERB_A)


def romanian_stem(word: str) -> str:
    """Snowball Romanian stemmer (clean-room from the published algorithm
    description; the step-3 verb pool is the regular-conjugation subset —
    the long tail of compound verbal spellings in the published list is
    covered by the shared group machinery, not enumerated exhaustively).
    Lowercase input expected."""
    w = word.translate(_RO_CEDILLA)
    # mark i/u between vowels as consonants (published pre-pass)
    chars = list(w)
    for j in range(1, len(chars) - 1):
        if chars[j] in "iu" and chars[j - 1] in _RO_VOWELS \
                and chars[j + 1] in _RO_VOWELS:
            chars[j] = chars[j].upper()
    w = "".join(chars)
    rv = _es_rv(w, _RO_VOWELS)
    r1, r2 = _std_regions(w, _RO_VOWELS)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    # ---- step 0: removal of plurals / articles ----------------------------
    suf = _longest(w, _RO_S0)
    if suf is not None and in_r1(len(w) - len(suf)):
        rep = _RO_S0[suf]
        i = len(w) - len(suf)
        if rep == "i_not_ab":
            if not w[:i].endswith("ab"):
                w = w[:i] + "i"
        else:
            w = w[:i] + rep
    # ---- step 1: combining suffixes, repeat until stable ------------------
    removed_std = False
    while True:
        suf = _longest(w, _RO_S1)
        if suf is None or not in_r1(len(w) - len(suf)):
            break
        w = w[: len(w) - len(suf)] + _RO_S1[suf]
        removed_std = True
    # ---- step 2: standard suffixes in R2 ----------------------------------
    suf = _longest(w, _RO_S2_ALL)
    if suf is not None and in_r2(len(w) - len(suf)):
        i = len(w) - len(suf)
        if suf in ("iune", "iuni"):
            if i > 0 and w[i - 1] == "ț":
                w = w[: i - 1] + "t"
                removed_std = True
        elif suf in _RO_S2_IST:
            w = w[:i] + "ist"
            removed_std = True
        else:
            w = w[:i]
            removed_std = True
    # ---- step 3: verb suffixes in RV (only when 1/2 did nothing) ----------
    if not removed_std:
        suf = _longest(w, _RO_VERB_ALL)
        if suf is not None and in_rv(len(w) - len(suf)):
            i = len(w) - len(suf)
            if suf in _RO_VERB_A_SET:
                # needs a consonant or 'u' immediately before, inside RV
                if i > rv and (w[i - 1] not in _RO_VOWELS
                               or w[i - 1] == "u"):
                    w = w[:i]
            else:
                w = w[:i]
    # ---- step 4: final vowel ----------------------------------------------
    suf = _longest(w, ("ie", "a", "e", "i", "ă"))
    if suf is not None and in_rv(len(w) - len(suf)):
        w = w[: -len(suf)]
    return w.lower()
