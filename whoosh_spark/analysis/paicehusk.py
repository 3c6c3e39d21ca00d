"""Clean-room Paice-Husk (Lancaster) stemmer.

Upstream analog: ``src/whoosh/lang/paicehusk.py`` (≈L1-100) — whoosh
ships the same published rule engine plus the default Lancaster rule
table.  Source of the design and table: C. D. Paice, "Another stemmer",
ACM SIGIR Forum 24(3), 1990 (the widely-reproduced default rule set from
the Lancaster University stemming project).

Rule format (one per line): ``<reversed-ending><*?><digits><append><.|>``
— the ending is spelled backwards (so rules group by the word's final
letter), ``*`` restricts the rule to intact (not-yet-stemmed) words, the
digit count is how many characters to delete from the end, the optional
letters are appended, ``.`` terminates and ``>`` continues stemming from
the new final letter.  A candidate result must be "acceptable": if it
starts with a vowel it keeps ≥2 letters; if with a consonant, ≥3 letters
including at least one vowel or ``y``.
"""

from __future__ import annotations

import re

_RULE_RE = re.compile(r"^([a-zA-Z]+)(\*?)(\d+)([a-zA-Z]*)([.>])$")
_VOWELS = set("aeiou")

DEFAULT_RULES = """
ai*2. a*1.
bb1.
city3s. ci2> cn1t>
dd1. dei3y> deec2ss. dee1. de2> dooh4>
e1>
feil1v. fi2>
gni3> gai3y. ga2> gg1.
ht*2. hsiug5ct. hsi3>
i*1. i1y>
ji1d. juf1s. ju1d. jo1d. jeh1r. jrev1t. jsim2t. jn1d. j1s.
lbaifi6. lbai4y. lba3> lbi3. lib2l> lc1. lufi4y. luf3> lu2. lai3> lau3>
la2> ll1.
mui3. mu*2. msi3> mm1.
nois4j> noix4ct. noi3> nai3> na2> nee0. ne2> nn1.
pihs4> pp1.
re2> rae0. ra2. ro2> ru2> rr1. rt1> rei3y>
sei3y> sis2. si2> ssen4> ss0. suo3> su*2. s*1> s0.
tacilp4y. ta2> tnem4> tne3> tna3> tpir2b. tpro2b. tcud1. tpmus2.
tpec2iv. tulo2v. tsis0. tsi3> tt1.
uqi3. ugo1.
vis3j> vie0. vi2>
ylb1> yli3y> ylp0. yl2> ygo1. yhp1. ymo1. ypo1. yti3> yte3> ytl2.
yrtsi5. yra3> yro3> yfi3. ycn2t> yca3>
zi2> zy1s.
"""


def parse_rules(text: str) -> dict[str, list[tuple[str, bool, int, str, bool]]]:
    """Rule table → {final letter: [(ending, intact_only, delete, append,
    continue), ...]} with the ending un-reversed, in published order."""
    table: dict[str, list] = {}
    for tok in text.split():
        m = _RULE_RE.match(tok)
        if not m:
            raise ValueError(f"bad Paice-Husk rule: {tok!r}")
        rev, intact, num, append, term = m.groups()
        ending = rev[::-1].lower()
        table.setdefault(ending[-1], []).append(
            (ending, intact == "*", int(num), append.lower(), term == ">"))
    return table


_DEFAULT_TABLE = parse_rules(DEFAULT_RULES)


def _acceptable(stem: str) -> bool:
    if not stem:
        return False
    if stem[0] in _VOWELS:
        return len(stem) >= 2
    return len(stem) >= 3 and any(c in _VOWELS or c == "y"
                                  for c in stem[1:])


def paicehusk_stem(word: str, rules=None) -> str:
    """Apply the Lancaster rules to ``word`` (lowercase input expected).
    First acceptable rule in the final-letter group wins; ``>`` rules
    loop; intact rules fire only while the word is unmodified."""
    table = rules if rules is not None else _DEFAULT_TABLE
    w = word
    intact = True
    while w:
        group = table.get(w[-1])
        if not group:
            break
        applied = None
        for ending, intact_only, num, append, cont in group:
            if intact_only and not intact:
                continue
            if not w.endswith(ending) or num > len(w):
                continue
            cand = w[: len(w) - num] + append
            if cand == w:
                # protect rule (delete 0, no append): matches and stops
                # (or continues) without changing the word — no
                # acceptability check, and the word STAYS intact
                applied = (w, cont)
                break
            if _acceptable(cand):
                applied = (cand, cont)
                break
        if applied is None:
            break
        new_w, cont = applied
        if new_w == w:
            # an unchanged word can't make progress — a continuing protect
            # rule in a custom table would otherwise loop forever
            break
        intact = False
        w = new_w
        if not cont:
            break
    return w
