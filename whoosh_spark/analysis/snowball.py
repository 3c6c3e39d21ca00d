"""Per-language analysis: pluggable snowball-style stemmer registry +
language analyzer chains (``src/whoosh/lang/__init__.py::stemmer_for_language
≈L60`` + ``src/whoosh/analysis/analyzers.py::LanguageAnalyzer ≈L220``).

Upstream ships the snowball stemmer family for ~22 languages; this module
ships the REGISTRY (so any language plugs in as ``register_stemmer(lang,
fn)`` + ``register_language(lang, stopwords)``) with clean-room
implementations of:

  * English — Porter (analysis/porter.py, already shipped)
  * German  — the Snowball German stemming algorithm, implemented from the
    published algorithm description (M.F. Porter, snowballstem.org, "German
    stemming algorithm" — the classic revision, not the 2021 additions)

plus stopword-only light chains for fr/es (no published-algorithm stemmer
re-implemented yet — the registry makes adding one a one-liner).

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
# registry + chains
# ---------------------------------------------------------------------------

def _porter(word: str) -> str:
    from whoosh_spark.analysis.porter import stem

    return stem(word)


STEMMERS: dict[str, object] = {"en": _porter, "de": german_stem}

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
        ton tu un une vos votre vous""".split()),
    "es": frozenset("""al algo ante antes como con contra cual cuando de
        del desde donde durante el ella ellas ellos en entre era erais es
        esa esas ese eso esos esta estas este esto estos fue ha hay la las
        le les lo los más mi mis mucho muy no nos nosotros o os otra otro
        para pero poco por porque que quien se sin sobre son su sus también
        tanto te tu tus un una uno unos vosotros y ya yo""".split()),
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

    def fn(text: str) -> tuple[list[str], list[int]]:
        tokens: list[str] = []
        positions: list[int] = []
        for pos, t in enumerate(_TOKEN_RE_NC.findall(text)):
            t = t.lower()
            if len(t) >= MIN_WORD_SIZE and t not in stops:
                tokens.append(stem(t) if stem else t)
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


for _lang in ("de", "fr", "es"):
    register_language(_lang)
