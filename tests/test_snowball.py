"""Per-language analysis: Snowball German stemmer (clean-room from the
published algorithm description) + the language chain registry
(``src/whoosh/lang`` + ``LanguageAnalyzer`` parity surface)."""

from __future__ import annotations

import pytest

from whoosh_spark.analysis.snowball import (
    LANG_STOPWORDS,
    STEMMERS,
    german_stem,
    make_language_analyzer,
    register_language,
    register_stemmer,
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
    fn = make_language_analyzer("fr")
    toks, _ = fn("le chat noir")
    assert toks == ["chat", "noir"]  # 'le' stopped, no stemmer -> identity


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
