"""Double Metaphone phonetic encoding.

Clean-room implementation of Lawrence Philips' Double Metaphone algorithm
(published in C/C++ Users Journal, June 2000; the same published rule set
upstream whoosh ships as ``src/whoosh/lang/dmetaphone.py`` and uses in
``analysis::DoubleMetaphoneFilter``).  Returns a (primary, secondary)
pair of phonetic keys, ≤ 4 chars each; ``secondary`` is None when it
equals the primary.

Engine integration (Spark-first): the encoder is a pure scalar function,
so the "phonetic" analyzer chain runs it inside the same Arrow-batched
tokenizer UDF as every other filter — one code token per word token,
positions preserved (replace semantics, upstream's default), and the
index/query tee applies it on both sides so "smith" finds "smyth".
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _is_vowel(w: str, i: int) -> bool:
    return 0 <= i < len(w) and w[i] in VOWELS


def _at(w: str, start: int, length: int, *candidates: str) -> bool:
    """True if w[start:start+length] is one of candidates (reference
    helper StringAt; negative start never matches)."""
    if start < 0:
        return False
    return w[start:start + length] in candidates


def _slavo_germanic(w: str) -> bool:
    return "W" in w or "K" in w or "CZ" in w or "WITZ" in w


def double_metaphone(word: str) -> tuple[str, str | None]:
    """Primary and secondary Double Metaphone keys of ``word``."""
    out0: list[str] = []  # primary
    out1: list[str] = []  # secondary

    def add(p: str, s: str | None = None) -> None:
        out0.append(p)
        out1.append(p if s is None else s)

    w = "".join(c for c in word.upper() if c.isalpha() or c in "ÇÑ")
    if not w:
        return "", None
    length = len(w)
    last = length - 1
    sg = _slavo_germanic(w)
    # pad for lookahead, exactly like the reference implementation
    w = w + "      "

    current = 0
    # silent initial letters
    if _at(w, 0, 2, "GN", "KN", "PN", "WR", "PS"):
        current += 1
    # initial X is pronounced Z (e.g. "Xavier") → S
    if w[0] == "X":
        add("S")
        current += 1

    # termination counts accumulated key CHARACTERS (empty-string chunks
    # from silent/alternate-only rules must not shorten the keys)
    while ((sum(map(len, out0)) < 4 or sum(map(len, out1)) < 4)
           and current < length):
        c = w[current]

        if c in "AEIOUY":
            if current == 0:
                add("A")  # all initial vowels map to A
            current += 1

        elif c == "B":
            add("P")  # "-mb" as in "dumb" already skipped via M
            current += 2 if w[current + 1] == "B" else 1

        elif c == "Ç":
            add("S")
            current += 1

        elif c == "C":
            # germanic "-ACH-" with non-vowel before (e.g. "michach")
            if (current > 1 and not _is_vowel(w, current - 2)
                    and _at(w, current - 1, 3, "ACH")
                    and w[current + 2] != "I"
                    and (w[current + 2] != "E"
                         or _at(w, current - 2, 6, "BACHER", "MACHER"))):
                add("K")
                current += 2
            elif current == 0 and _at(w, current, 6, "CAESAR"):
                add("S")
                current += 2
            elif _at(w, current, 4, "CHIA"):  # italian "chianti"
                add("K")
                current += 2
            elif _at(w, current, 2, "CH"):
                if current > 0 and _at(w, current, 4, "CHAE"):  # "michael"
                    add("K", "X")
                elif (current == 0
                      and (_at(w, current + 1, 5, "HARAC", "HARIS")
                           or _at(w, current + 1, 3, "HOR", "HYM", "HIA",
                                  "HEM"))
                      and not _at(w, 0, 5, "CHORE")):
                    add("K")  # greek roots: "chorus", "chemistry"
                elif (_at(w, 0, 4, "VAN ", "VON ") or _at(w, 0, 3, "SCH")
                      or _at(w, current - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                      or _at(w, current + 2, 1, "T", "S")
                      or ((current == 0 or _at(w, current - 1, 1,
                                               "A", "O", "U", "E"))
                          and _at(w, current + 2, 1, "L", "R", "N", "M",
                                  "B", "H", "F", "V", "W", " "))):
                    add("K")  # germanic / "architect" (not "arch")
                elif current > 0:
                    if _at(w, 0, 2, "MC"):  # "McHugh"
                        add("K")
                    else:
                        add("X", "K")
                else:
                    add("X")
                current += 2
            elif _at(w, current, 2, "CZ") and not _at(w, current - 2, 4,
                                                      "WICZ"):
                add("S", "X")  # "czerny"
                current += 2
            elif _at(w, current + 1, 3, "CIA"):  # "focaccia"
                add("X")
                current += 3
            elif (_at(w, current, 2, "CC")
                  and not (current == 1 and w[0] == "M")):
                # double C, but not "McClellan"
                if (_at(w, current + 2, 1, "I", "E", "H")
                        and not _at(w, current + 2, 2, "HU")):
                    if ((current == 1 and w[0] == "A")
                            or _at(w, current - 1, 5, "UCCEE", "UCCES")):
                        add("KS")  # "accident", "succeed"
                    else:
                        add("X")  # "bacci", "bertucci"
                    current += 3
                else:  # "Pierce's rule"
                    add("K")
                    current += 2
            elif _at(w, current, 2, "CK", "CG", "CQ"):
                add("K")
                current += 2
            elif _at(w, current, 2, "CI", "CE", "CY"):
                if _at(w, current, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")  # italian vs english
                else:
                    add("S")
                current += 2
            else:
                add("K")
                if _at(w, current + 1, 2, " C", " Q", " G"):
                    current += 3  # "mac caffrey", "mac gregor"
                elif (_at(w, current + 1, 1, "C", "K", "Q")
                      and not _at(w, current + 1, 2, "CE", "CI")):
                    current += 2
                else:
                    current += 1

        elif c == "D":
            if _at(w, current, 2, "DG"):
                if _at(w, current + 2, 1, "I", "E", "Y"):
                    add("J")  # "edge"
                    current += 3
                else:
                    add("TK")  # "edgar"
                    current += 2
            elif _at(w, current, 2, "DT", "DD"):
                add("T")
                current += 2
            else:
                add("T")
                current += 1

        elif c == "F":
            add("F")
            current += 2 if w[current + 1] == "F" else 1

        elif c == "G":
            if w[current + 1] == "H":
                if current > 0 and not _is_vowel(w, current - 1):
                    add("K")  # "hugh"-style GH after consonant
                    current += 2
                elif current == 0:
                    if w[current + 2] == "I":  # "ghislane"
                        add("J")
                    else:  # "ghoul"
                        add("K")
                    current += 2
                # Parker's rule (with some further refinements): silent GH
                elif ((current > 1 and _at(w, current - 2, 1, "B", "H", "D"))
                      or (current > 2 and _at(w, current - 3, 1,
                                              "B", "H", "D"))
                      or (current > 3 and _at(w, current - 4, 1, "B", "H"))):
                    current += 2
                else:
                    if (current > 2 and w[current - 1] == "U"
                            and _at(w, current - 3, 1, "C", "G", "L",
                                    "R", "T")):
                        add("F")  # "laugh", "cough"
                    elif current > 0 and w[current - 1] != "I":
                        add("K")
                    current += 2
            elif w[current + 1] == "N":
                if current == 1 and _is_vowel(w, 0) and not sg:
                    add("KN", "N")
                elif (not _at(w, current + 2, 2, "EY")
                      and w[current + 1] != "Y" and not sg):
                    add("N", "KN")  # not "cagney"
                else:
                    add("KN")
                current += 2
            elif _at(w, current + 1, 2, "LI") and not sg:  # "tagliaro"
                add("KL", "L")
                current += 2
            elif (current == 0
                  and (w[current + 1] == "Y"
                       or _at(w, current + 1, 2, "ES", "EP", "EB", "EL",
                              "EY", "IB", "IL", "IN", "IE", "EI", "ER"))):
                add("K", "J")  # -ges-, -gep-, -gel-, -gie- at start
                current += 2
            elif ((_at(w, current + 1, 2, "ER") or w[current + 1] == "Y")
                  and not _at(w, 0, 6, "DANGER", "RANGER", "MANGER")
                  and not _at(w, current - 1, 1, "E", "I")
                  and not _at(w, current - 1, 3, "RGY", "OGY")):
                add("K", "J")  # -ger-, -gy-
                current += 2
            elif (_at(w, current + 1, 1, "E", "I", "Y")
                  or _at(w, current - 1, 4, "AGGI", "OGGI")):
                if (_at(w, 0, 4, "VAN ", "VON ") or _at(w, 0, 3, "SCH")
                        or _at(w, current + 1, 2, "ET")):
                    add("K")  # germanic
                elif _at(w, current + 1, 4, "IER "):
                    add("J")  # always soft: "ogier"
                else:
                    add("J", "K")
                current += 2
            else:
                add("K")
                current += 2 if w[current + 1] == "G" else 1

        elif c == "H":
            # keep only between vowels or at start before a vowel
            if ((current == 0 or _is_vowel(w, current - 1))
                    and _is_vowel(w, current + 1)):
                add("H")
                current += 2
            else:
                current += 1

        elif c == "J":
            if _at(w, current, 4, "JOSE") or _at(w, 0, 4, "SAN "):
                # spanish: "jose", "san jacinto"
                if ((current == 0 and w[current + 4] == " ")
                        or _at(w, 0, 4, "SAN ")):
                    add("H")
                else:
                    add("J", "H")
                current += 1
            else:
                if current == 0 and not _at(w, current, 4, "JOSE"):
                    add("J", "A")  # "Yankelovich" vs "Jankelowicz"
                elif (_is_vowel(w, current - 1) and not sg
                      and (w[current + 1] == "A" or w[current + 1] == "O")):
                    add("J", "H")  # spanish pronunciation likely
                elif current == last:
                    add("J", "")
                elif (not _at(w, current + 1, 1, "L", "T", "K", "S", "N",
                              "M", "B", "Z")
                      and not _at(w, current - 1, 1, "S", "K", "L")):
                    add("J")
                current += 2 if w[current + 1] == "J" else 1

        elif c == "K":
            add("K")
            current += 2 if w[current + 1] == "K" else 1

        elif c == "L":
            if w[current + 1] == "L":
                # spanish "-illo", "-illa", "-alle"
                if ((current == length - 3
                     and _at(w, current - 1, 4, "ILLO", "ILLA", "ALLE"))
                        or ((_at(w, last - 1, 2, "AS", "OS")
                             or _at(w, last, 1, "A", "O"))
                            and _at(w, current - 1, 4, "ALLE"))):
                    add("L", "")
                    current += 2
                    continue
                add("L")
                current += 2
            else:
                add("L")
                current += 1

        elif c == "M":
            add("M")
            if ((_at(w, current - 1, 3, "UMB")
                 and (current + 1 == last
                      or _at(w, current + 2, 2, "ER")))  # "dumb", "thumb"
                    or w[current + 1] == "M"):
                current += 2
            else:
                current += 1

        elif c == "N":
            add("N")
            current += 2 if w[current + 1] == "N" else 1

        elif c == "Ñ":
            add("N")
            current += 1

        elif c == "P":
            if w[current + 1] == "H":
                add("F")
                current += 2
            else:
                add("P")  # "campbell", "raspberry"
                current += 2 if _at(w, current + 1, 1, "P", "B") else 1

        elif c == "Q":
            add("K")
            current += 2 if w[current + 1] == "Q" else 1

        elif c == "R":
            # french "-ier-" ending: "rogier", but not "hochmeier"
            if (current == last and not sg
                    and _at(w, current - 2, 2, "IE")
                    and not _at(w, current - 4, 2, "ME", "MA")):
                add("", "R")
            else:
                add("R")
            current += 2 if w[current + 1] == "R" else 1

        elif c == "S":
            if _at(w, current - 1, 3, "ISL", "YSL"):
                current += 1  # silent: "island", "carlisle"
                continue
            elif current == 0 and _at(w, current, 5, "SUGAR"):
                add("X", "S")
                current += 1
                continue
            elif _at(w, current, 2, "SH"):
                if _at(w, current + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                current += 2
                continue
            elif (_at(w, current, 3, "SIO", "SIA")
                  or _at(w, current, 4, "SIAN")):
                add("S") if sg else add("S", "X")
                current += 3
                continue
            elif ((current == 0 and _at(w, current + 1, 1, "M", "N",
                                        "L", "W"))
                  or _at(w, current + 1, 1, "Z")):
                # german/anglicisation: "smith" ↔ "schmidt"
                add("S", "X")
                current += 2 if _at(w, current + 1, 1, "Z") else 1
                continue
            elif _at(w, current, 2, "SC"):
                if w[current + 2] == "H":
                    # "schlesinger" vs "schooner" vs "schermerhorn"
                    if _at(w, current + 3, 2, "OO", "ER", "EN", "UY",
                           "ED", "EM"):
                        if _at(w, current + 3, 2, "ER", "EN"):
                            add("X", "SK")  # "schenker"
                        else:
                            add("SK")  # "school", "schooner"
                    else:
                        if (current == 0 and not _is_vowel(w, 3)
                                and w[3] != "W"):
                            add("X", "S")
                        else:
                            add("X")
                elif _at(w, current + 2, 1, "I", "E", "Y"):
                    add("S")
                else:
                    add("SK")
                current += 3
                continue
            else:
                if current == last and _at(w, current - 2, 2, "AI", "OI"):
                    add("", "S")  # french: "resnais", "artois"
                else:
                    add("S")
                current += 2 if _at(w, current + 1, 1, "S", "Z") else 1

        elif c == "T":
            if _at(w, current, 4, "TION"):
                add("X")
                current += 3
            elif _at(w, current, 3, "TIA", "TCH"):
                add("X")
                current += 3
            elif _at(w, current, 2, "TH") or _at(w, current, 3, "TTH"):
                if (_at(w, current + 2, 2, "OM", "AM")  # "thomas", "thames"
                        or _at(w, 0, 4, "VAN ", "VON ")
                        or _at(w, 0, 3, "SCH")):
                    add("T")
                else:
                    add("0", "T")
                current += 2
            else:
                add("T")
                current += 2 if _at(w, current + 1, 1, "T", "D") else 1

        elif c == "V":
            add("F")
            current += 2 if w[current + 1] == "V" else 1

        elif c == "W":
            if _at(w, current, 2, "WR"):
                add("R")
                current += 2
            else:
                if (current == 0
                        and (_is_vowel(w, 1) or _at(w, current, 2, "WH"))):
                    if _is_vowel(w, 1):
                        add("A", "F")  # "Wasserman" ↔ "Vasserman"
                    else:
                        add("A")  # "Uomo" ↔ "Womo"
                if ((current == last and _is_vowel(w, current - 1))
                        or _at(w, current - 1, 5, "EWSKI", "EWSKY",
                               "OWSKI", "OWSKY")
                        or _at(w, 0, 3, "SCH")):
                    add("", "F")  # "Arnow" ↔ "Arnoff"
                    current += 1
                elif _at(w, current, 4, "WICZ", "WITZ"):
                    add("TS", "FX")  # polish: "Filipowicz"
                    current += 4
                else:
                    current += 1  # else skip

        elif c == "X":
            # french ending: "breaux"
            if not (current == last
                    and (_at(w, current - 3, 3, "IAU", "EAU")
                         or _at(w, current - 2, 2, "AU", "OU"))):
                add("KS")
            current += 2 if _at(w, current + 1, 1, "C", "X") else 1

        elif c == "Z":
            if w[current + 1] == "H":
                add("J")  # chinese pinyin: "zhao"
                current += 2
            else:
                if (_at(w, current + 1, 2, "ZO", "ZI", "ZA")
                        or (sg and current > 0 and w[current - 1] != "T")):
                    add("S", "TS")
                else:
                    add("S")
                current += 2 if w[current + 1] == "Z" else 1

        else:
            current += 1

    primary = "".join(out0)[:4]
    secondary = "".join(out1)[:4]
    return primary, (None if secondary == primary else secondary)


def phonetic_keys(word: str) -> list[str]:
    """Both metaphone keys of ``word`` (1 or 2 entries, deduped)."""
    p, s = double_metaphone(word)
    keys = [k for k in (p, s) if k]
    return keys or [word]


def phonetic_match(a: str, b: str) -> bool:
    """True if any metaphone key of ``a`` collides with one of ``b``
    (upstream's DoubleMetaphoneFilter retrieval semantics)."""
    return bool(set(phonetic_keys(a)) & set(phonetic_keys(b)))
