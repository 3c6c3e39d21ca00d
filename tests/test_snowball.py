"""Per-language analysis: Snowball German stemmer (clean-room from the
published algorithm description) + the language chain registry
(``src/whoosh/lang`` + ``LanguageAnalyzer`` parity surface)."""

from __future__ import annotations

import pytest

from whoosh_spark.analysis.snowball import (
    LANG_STOPWORDS,
    STEMMERS,
    french_stem,
    german_stem,
    make_language_analyzer,
    register_language,
    register_stemmer,
    spanish_stem,
)

# algorithm-derived vectors (worked by hand from the published spec's
# steps/regions; each comment names the rule that fires)
GERMAN_VECTORS = {
    "häusern": "haus",            # step1 'ern' in R1, umlaut fold
    "häuser": "haus",             # step1 'er'
    "kategorien": "kategori",     # step1 'en'
    "kategorie": "kategori",      # step1 'e'
    "aufeinander": "aufeinand",   # step1 'er'
    "verständnisses": "verstandnis",  # step1 'es' + niss double-s rule
    "bezeichnung": "bezeichn",    # step3 'ung' in R2
    "freundlichkeit": "freundlich",   # step3 'keit' in R2 (lich not in R2)
    "schönheit": "schonheit",     # 'heit' NOT in R2 (R2 at word end)
    "orders": "ord",              # s after s-ending r, then step2 'er'
    "the": "the",                 # 'e' not in R1 (R1 floor = 3)
    "aalgleichen": "aalgleich",   # step1 'en' in R1
    "bauern": "bau",              # intervocalic u marked consonant -> R1=3
    "feuern": "feu",              # same marking, step1 'ern'
    "ß": "ss",                    # ß fold, nothing else fires
}


@pytest.mark.parametrize("word,expected", sorted(GERMAN_VECTORS.items()))
def test_german_vectors(word, expected):
    assert german_stem(word) == expected


# algorithm-derived vectors for the French stemmer (each comment names the
# rule that fires; worked by hand from the published spec)
FRENCH_VECTORS = {
    "continuité": "continu",      # step1 'ité' in R2
    "majestueusement": "majestu",  # step1 'ement' in RV, then 'eus' in R2
    "montrerez": "montr",         # step2b 'erez' in RV
    "animaux": "animal",          # step1 'aux' -> 'al' in R1
    "nationaux": "national",      # same
    "yeux": "yeux",               # y marked Y -> R2 past end, nothing fires
    "voix": "voix",               # no suffix matches anywhere
    "documents": "docu",          # step1 'ments' after vowel in RV
    "principalement": "principal",  # step1 'ement' in RV
    "consciences": "conscienc",   # 'ences' not in R2; step4 s + final e
    "recherches": "recherch",     # step4 s-removal + final e in RV
    "important": "import",        # step2b 'ant' in RV
    "continuera": "continu",      # step2b 'era' in RV
    "tables": "tabl",             # step4: s after e, then final e
    "data": "dat",                # step2b a-group 'a' in RV
}

# algorithm-derived vectors for the Spanish stemmer
SPANISH_VECTORS = {
    "generosas": "gener",         # step1 'osas' in R2
    "bebiendo": "beb",            # step2b 'iendo' in RV
    "canciones": "cancion",       # step2b 'es' in RV
    "diciéndoselo": "dic",        # step0 pronoun 'selo' after 'iéndo',
                                  # un-accent, then step2b 'iendo'
    "felizmente": "feliz",        # step1 'mente' in R2
    "capacidades": "capac",       # step1 'idades' in R2, 'ac' survives
    "rápidamente": "rapid",       # step1 'amente' in R1, accent folded
    "trabajando": "trabaj",       # step2b 'ando' in RV
    "llegue": "lleg",             # step3 'e' in RV + gu -> g undouble
    "guerra": "guerr",            # step3 'a' in RV
    "orders": "orders",           # ends 'rs': no Spanish suffix matches
    "tables": "tabl",             # step2b 'es' in RV
    "nacionales": "nacional",     # step2b 'es' in RV
}


@pytest.mark.parametrize("word,expected", sorted(FRENCH_VECTORS.items()))
def test_french_vectors(word, expected):
    assert french_stem(word) == expected


@pytest.mark.parametrize("word,expected", sorted(SPANISH_VECTORS.items()))
def test_spanish_vectors(word, expected):
    assert spanish_stem(word) == expected


# algorithm-derived vectors for the round-5 family extension (each comment
# names the rule that fires; worked by hand from the published specs)
ENGLISH_VECTORS = {
    "caresses": "caress",         # 1a 'sses'
    "flies": "fli",               # 1a 'ies' after >1 letter
    "ties": "tie",                # 1a 'ies' after 1 letter
    "gaps": "gap",                # 1a 's' (vowel not just before s)
    "gas": "gas",                 # 1a 's' blocked (vowel just before)
    "dying": "die",               # exceptional form
    "news": "news",               # invariant exceptional form
    "inning": "inning",           # post-1a invariant
    "agreed": "agre",             # 1b 'eed'→ee, step5 e after non-short
    "feed": "feed",               # 'eed' not in R1
    "hopping": "hop",             # 1b undouble 'pp'
    "hoping": "hope",             # 1b short word +e
    "sing": "sing",               # 1b blocked: no vowel in stem
    "conflated": "conflat",       # 1b 'at'+e, step5 e in R2
    "happy": "happi",             # 1c y→i after consonant
    "saying": "say",              # y marked as consonant after vowel
    "relational": "relat",        # step2 'ational'→ate, step5
    "conditional": "condit",      # step2 'tional'→tion, step4 ion/t
    "rapidly": "rapid",           # 1c then step2 'li' after valid d
    "nationally": "nation",       # step2 'alli'→al, step4 'al'
    "generously": "generous",     # 'gener' R1 override, step2 'ousli'
    "communities": "communiti",   # 'commun' override; 'iti' not in R2
    "abilities": "abil",          # 1a ies, step4 'iti' in R2
    "luxuriated": "luxuri",       # 1b 'at'+e, step4 'ate' in R2
    "hopeful": "hope",            # step3 'ful', step5 keeps e (short)
    "controlling": "control",     # 1b ing, undouble 'll'
    "queries": "queri",           # 1a 'ies' — matches corpus 'query' (1c)
    "orders": "order",            # 1a 's'
}

SWEDISH_VECTORS = {
    "jackorna": "jack",           # step1 'orna' in R1
    "klubbarnas": "klubb",        # step1 'arnas'
    "möjligheterna": "möj",       # step1 'heterna', step3 'lig'
    "friskt": "frisk",            # step2 'kt' pair shortened
    "betydelse": "betyd",         # step1 'e', step3 'els'
    "verksamheten": "verksam",    # step1 'heten'
    "skalle": "skall",            # step1 'e'; 'll' not a step2 pair
    "tomten": "tomt",             # step1 'en'
    "sist": "sist",               # nothing fires
    "hands": "hand",              # s after valid s-ending 'd'
    "sett": "sett",               # 'tt' pair straddles R1 — kept
}

NORWEGIAN_VECTORS = {
    "billige": "bil",             # step1 'e', step3 'lig'
    "bilens": "bil",              # step1 'ens'
    "forelskede": "forelsk",      # step1 'ede'
    "verks": "verk",              # s after k not preceded by a vowel
    "naturlig": "natur",          # step3 'lig'
    "hetene": "hetene",           # longest match 'hetene' not in R1
    "lekene": "lek",              # step1 'ene'
    "godt": "godt",               # 'dt' pair straddles R1 — kept
}

DANISH_VECTORS = {
    "undersøgelse": "undersøg",   # step1 'e', step3 'els'
    "indtagelsen": "indtag",      # step1 'en', step3 'els'
    "overbevisende": "overbevis",  # step1 'ende'
    "billigst": "bil",            # step3 'igst' -> st, then 'lig'
    "spændende": "spænd",         # step1 'ende'
    "forløst": "forløs",          # step3 'løst' -> 'løs' in R1
    "hunds": "hund",              # s after valid s-ending 'd'
    "glasset": "glass",           # step1 'et'; 'ss' straddles R1 — kept
    "sagt": "sagt",               # 'gt' pair straddles R1 — kept
    "kaldte": "kald",             # step1 'e'; 'dt' wholly in R1 — shortened
}

DUTCH_VECTORS = {
    "lichamelijkheden": "licham",  # heden->heid, 3a heid, 3b lijk + step2
    "lichamelijk": "licham",      # 3b 'lijk', repeated step2 final e
    "hoofden": "hoofd",           # step1 'en' after valid en-ending
    "lopen": "lop",               # step1 'en' (no kk/dd/tt undouble)
    "groot": "grot",              # step4 vowel undouble CVVC
    "uitdrukkelijk": "uitdruk",   # 3b 'lijk', step2 e, undouble 'kk'
    "eetbar": "eetbar",           # 'bar' needs a step-2 e removal first
    "eetbare": "eetbar",          # step2 e; 'bar' then not in R2
}

ITALIAN_VECTORS = {
    "abbandonata": "abbandon",    # step2 'ata' in RV
    "pronomi": "pronom",          # step3a final 'i' in RV
    "caratteristico": "caratterist",  # step1 'ico' in R2
    "nazionali": "nazional",      # step3a final 'i'
    "comodità": "comod",          # step1 'ità' in R2
    "dicendogli": "dic",          # step0 pronoun 'gli' after 'endo'
    "guardandola": "guard",       # step0 pronoun 'la', step2 'ando'
    "psicologia": "psicolog",     # step3a 'a' then preceding 'i'
    "velocemente": "veloc",       # step1 'mente' in R2, 3a final e
    "rapidamente": "rapid",       # step1 'amente' in R1
}

RUSSIAN_VECTORS = {
    "книгами": "книг",            # noun 'ами' in RV
    "красивый": "красив",         # adjective 'ый'
    "читала": "чита",             # verb group-1 'ла' after а
    "прочитавши": "прочита",      # perfective gerund 'вши' after а
    "возможность": "возможн",     # noun 'ь', derivational 'ост' in R2
    "новейший": "нов",            # adjective 'ий', superlative 'ейш'
    "бессмысленно": "бессмыслен",  # noun 'о', step4 undouble 'нн'
    "которая": "котор",           # adjective 'ая'
    "находиться": "наход",        # reflexive 'ся' then verb 'ить'
    "читаются": "чита",           # reflexive 'ся' then group-1 'ют'
    "окно": "окн",                # group-1 'но' blocked (no а/я), noun 'о'
    "пример": "пример",           # no ending in RV
    "рисует": "рис",              # verb group-2 'ует'
    "пишет": "пишет",             # group-1 'ет' blocked (no а/я)
    "london": "london",           # non-Cyrillic passes through
}

PORTUGUESE_VECTORS = {
    "quinzena": "quinzen",        # step4 residual 'a' in RV
    "amoroso": "amor",            # step1 'oso' in R2
    "bilhões": "bilhõ",           # nasal marker carried, step2 'es'
    "nacionalidade": "nacional",  # step1 'idade' in R2
    "comunicação": "comunic",     # step1 'aça~o' in R2
    "falaremos": "fal",           # step2 'aremos' in RV
    "magicamente": "magic",       # step1 'amente' in R1 ('ic' not in R2)
    "chegue": "cheg",             # step5 final e + gu -> g
}


def _vector_params():
    from whoosh_spark.analysis.snowball_english import english_stem
    from whoosh_spark.analysis.snowball_nordic import (
        danish_stem,
        dutch_stem,
        norwegian_stem,
        swedish_stem,
    )
    from whoosh_spark.analysis.snowball_romance import (
        italian_stem,
        portuguese_stem,
    )
    from whoosh_spark.analysis.snowball_russian import russian_stem

    pools = ((english_stem, ENGLISH_VECTORS),
             (russian_stem, RUSSIAN_VECTORS),
             (swedish_stem, SWEDISH_VECTORS),
             (norwegian_stem, NORWEGIAN_VECTORS),
             (danish_stem, DANISH_VECTORS),
             (dutch_stem, DUTCH_VECTORS),
             (italian_stem, ITALIAN_VECTORS),
             (portuguese_stem, PORTUGUESE_VECTORS))
    return [(fn, w, exp) for fn, m in pools for w, exp in sorted(m.items())]


@pytest.mark.parametrize("fn,word,expected", _vector_params())
def test_round5_family_vectors(fn, word, expected):
    assert fn(word) == expected


def test_round5_family_registered():
    # all nine shipped languages are full chains in the built-in snapshot
    from whoosh_spark.analysis.analyzers import _BUILTIN_ANALYZERS

    for code in ("en", "de", "fr", "es", "sv", "no", "da", "nl", "it",
                 "pt", "ru"):
        assert f"lang_{code}" in _BUILTIN_ANALYZERS
        assert code in STEMMERS and code in LANG_STOPWORDS


def test_round5_family_idempotent_and_unmarked():
    # stems re-stem stably and consonant markers (U/I/Y, a~/o~) never leak.
    # Russian is excluded from the stability leg: the algorithm is
    # genuinely non-idempotent (removing a noun ending can expose a
    # verb-shaped one, e.g. прочита→прочит→проч), which is fine — the
    # index and the query tee always apply the chain exactly once
    for fn, m in ((STEMMERS["en"], ENGLISH_VECTORS),
                  (STEMMERS["sv"], SWEDISH_VECTORS),
                  (STEMMERS["no"], NORWEGIAN_VECTORS),
                  (STEMMERS["da"], DANISH_VECTORS),
                  (STEMMERS["nl"], DUTCH_VECTORS),
                  (STEMMERS["it"], ITALIAN_VECTORS),
                  (STEMMERS["pt"], PORTUGUESE_VECTORS)):
        for stem in m.values():
            assert fn(fn(stem)) == fn(stem)
            out = fn(stem)
            assert out == out.lower() and "~" not in out
    for stem in RUSSIAN_VECTORS.values():
        out = STEMMERS["ru"](stem)
        assert out == out.lower() and "~" not in out


def _all_stemmers():
    from whoosh_spark.analysis.snowball import STEMMERS

    return [(code, STEMMERS[code]) for code in
            ("en", "de", "fr", "es", "sv", "no", "da", "nl", "it", "pt",
             "ru")]


@pytest.mark.parametrize("code,fn", _all_stemmers())
def test_stemmer_total_on_random_unicode(code, fn):
    # robustness property (derandomized): every shipped stemmer is total —
    # no exception, never lengthens beyond bound, marker-free output —
    # over adversarial short/long/unicode/edge inputs
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40))
    def check(w):
        w = w.lower()
        out = fn(w)
        assert isinstance(out, str)
        assert len(out) <= len(w) + 2  # +e/+ee style appends only
        if "~" not in w:  # marker leak check (pt a~/o~), not passthrough
            assert "~" not in out
        if code != "ru":  # ru is genuinely non-idempotent (see below)
            # idempotent on its own output
            assert fn(out) == fn(fn(out))

    check()


def test_russian_chain_cyrillic_end_to_end():
    # the full lang_ru chain over Cyrillic text: unicode tokenize, Russian
    # stop filter (и/в/на dropped, gaps kept), snowball stem
    fn = make_language_analyzer("ru")
    toks, poss = fn("Она читала книгами и пример в окно")
    assert toks == ["чита", "книг", "пример", "окн"]
    assert poss == [1, 2, 4, 6]  # stop-gap ordinals preserved


def test_french_spanish_registered():
    # round-5: fr/es are full chains now (stop + stem), not stopword-only
    assert STEMMERS["fr"] is french_stem
    assert STEMMERS["es"] is spanish_stem
    from whoosh_spark.analysis.analyzers import ANALYZERS

    toks, _ = ANALYZERS["lang_fr"]("le chat continuera")
    assert toks == ["chat", "continu"]
    toks, _ = ANALYZERS["lang_es"]("el gato bebiendo")
    assert toks == ["gat", "beb"]  # step3 'o' in RV


def test_french_markers_never_leak():
    for w in ("yeux", "payer", "inquiétude", "aiguë", "qualité"):
        out = french_stem(w)
        assert out == out.lower(), (w, out)


def test_stemmers_idempotent_on_stems():
    # a stem re-stemmed must be stable for the vocab we publish vectors for
    for m, fn in ((FRENCH_VECTORS, french_stem),
                  (SPANISH_VECTORS, spanish_stem)):
        for stem in m.values():
            assert fn(fn(stem)) == fn(stem)


def test_german_idempotent_on_short_words():
    for w in ("ab", "im", "zu", "ei"):
        assert german_stem(w) == w


def test_intervocalic_u_y_protected():
    # u between vowels is marked consonant: the marking must never leak
    # uppercase into the output
    out = german_stem("bauern")
    assert out == out.lower()


def test_language_chain_stops_and_stems():
    fn = make_language_analyzer("de")
    toks, poss = fn("der Häuser und Kategorien")
    # 'der'/'und' are German stopwords; gaps preserved in ordinals
    assert toks == ["haus", "kategori"]
    assert poss == [1, 3]


def test_language_chain_identity_without_stemmer():
    # a code with no shipped stemmer ("nl" became a full chain in round 5,
    # so use a fresh one): stopped, no stemmer -> identity
    register_language("zz", stopwords=["dix", "het"])
    fn = make_language_analyzer("zz")
    toks, _ = fn("dix kat het huis")
    assert toks == ["kat", "huis"]


def test_registry_pluggable():
    register_language("xx", stopwords=["foo"], stemmer=lambda w: w[:3])
    from whoosh_spark.analysis.analyzers import ANALYZERS

    assert "lang_xx" in ANALYZERS
    toks, _ = ANALYZERS["lang_xx"]("foo barbells")
    assert toks == ["bar"]
    assert "xx" in STEMMERS and "xx" in LANG_STOPWORDS


def test_register_stemmer_rejects_noncallable():
    with pytest.raises(TypeError):
        register_stemmer("yy", "not-a-function")


def test_lang_de_rank_identity_vs_python_oracle(spark, sf0001_documents):
    """End-to-end: lang_de index over the de sub-corpus, query through the
    same chain — scores must follow the BM25 pipeline over the stemmed
    token stream (cross-checked by the DuckDB twin in the contract gate;
    here: basic shape + determinism)."""
    from pyspark.sql import functions as F

    import whoosh_spark.analysis.snowball  # noqa: F401
    from whoosh_spark.index import InvertedIndex
    from whoosh_spark.query.parser import parse_query
    from whoosh_spark.search import Searcher

    docs = sf0001_documents.where(F.col("lang") == "de")
    s = Searcher(InvertedIndex.build(docs, analyzer="lang_de"))
    q = parse_query("orders", analyzer="lang_de")
    rows = s.search(q, limit=10).collect()
    assert len(rows) == 10
    # the index holds stems: the raw word is absent, its stem present
    st = s.ix.stats_for_terms(["orders", "ord"])
    assert "orders" not in st and "ord" in st
