"""CharsetTokenizer chain + glob/dynamic schema fields (round-3 tail:
``tokenizers.py::CharsetTokenizer ≈L300``, ``fields.py::Schema glob
≈L1250``)."""

from __future__ import annotations

import pytest

from whoosh_spark.analysis.analyzers import (ANALYZERS, analyze_text,
                                             analyze_text_charset,
                                             charset_tokenize)


# ---- tokenizer -----------------------------------------------------------
def test_charset_tokenize_folds_while_tokenizing():
    assert charset_tokenize("Café au Lait!") == ["cafe", "au", "lait"]
    assert charset_tokenize("Ünïcode-Tökens") == ["unicode", "tokens"]


def test_charset_combining_mark_is_not_a_break():
    composed = "café x"          # é composed
    decomposed = "café x"       # e + combining acute
    assert charset_tokenize(composed) == charset_tokenize(decomposed) \
        == ["cafe", "x"]


def test_charset_breaks_and_underscore():
    assert charset_tokenize("a_b c--d  ") == ["a_b", "c", "d"]
    assert charset_tokenize("") == []
    assert charset_tokenize("...") == []


def test_lone_combining_mark_no_phantom_token():
    """Regression (round-3 review): a bare combining mark between breaks
    folds to '' and must not emit an empty token or burn a position."""
    assert charset_tokenize("a ́ b") == ["a", "b"]
    toks, poss = analyze_text_charset("data ́ vector")
    assert toks == ["data", "vector"] and poss == [0, 1]


def test_custom_charmap():
    # digits break, letters uppercase — arbitrary maps are honored
    cm = lambda c: (c.upper() if c.isalpha() else None)
    assert charset_tokenize("ab1cd ef", cm) == ["AB", "CD", "EF"]


def test_charset_chain_matches_standard_on_ascii():
    text = "The Big Data query of window tables a an"
    assert analyze_text_charset(text) == analyze_text(text)


def test_charset_chain_stop_gaps_positions():
    toks, poss = analyze_text_charset("thé big dàta")
    # "thé" folds to stopword "the" -> dropped, position gap preserved
    assert toks == ["big", "data"]
    assert poss == [1, 2]


def test_charset_registered():
    assert ANALYZERS["charset"] is analyze_text_charset


# ---- glob schema fields --------------------------------------------------
def test_glob_expands_string_columns(spark):
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex

    docs = spark.createDataFrame(
        [(0, "alpha beta", "red fast", "en"),
         (1, "beta gamma", "blue slow", "de")],
        "doc_id long, text string, color_tag string, lang string")
    mix = MultiFieldIndex.build(
        docs, fields={"text": FieldSpec("text"), "*_tag": FieldSpec("*_tag")},
        default_field="text", cache=False)
    assert set(mix.indexes) == {"text", "color_tag"}
    assert mix.specs["color_tag"].source == "color_tag"


def test_glob_explicit_beats_glob(spark):
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex

    docs = spark.createDataFrame(
        [(0, "alpha", "x")], "doc_id long, text string, lang string")
    mix = MultiFieldIndex.build(
        docs,
        fields={"lang": FieldSpec("lang", boost=3.0), "*": FieldSpec("*")},
        default_field="lang", cache=False)
    # explicit lang spec (boost 3) wins over the glob; text comes via glob
    assert mix.specs["lang"].boost == 3.0
    assert set(mix.indexes) == {"lang", "text"}


def test_glob_no_match_raises(spark):
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex

    docs = spark.createDataFrame([(0, "alpha")], "doc_id long, text string")
    with pytest.raises(ValueError, match="glob"):
        MultiFieldIndex.build(docs, fields={"*_tag": FieldSpec("*_tag")},
                              cache=False)


def test_glob_field_queryable(spark):
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex
    from whoosh_spark.query import ast as Q
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [(0, "alpha beta", "red fast"), (1, "beta gamma", "blue slow")],
        "doc_id long, text string, color_tag string")
    mix = MultiFieldIndex.build(
        docs, fields={"text": FieldSpec("text"), "*_tag": FieldSpec("*_tag")},
        default_field="text", cache=False)
    s = Searcher(mix)
    rows = s.search(Q.Term("blue", fieldname="color_tag"), limit=5).collect()
    assert [int(r["doc_id"]) for r in rows] == [1]


def test_charset_index_end_to_end(spark):
    """Accented docs + accented query meet at the folded term."""
    from whoosh_spark.index import InvertedIndex
    from whoosh_spark.query.parser import parse_query
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [(0, "Café RÉSUMÉ naïve"), (1, "cafe resume plain")],
        "doc_id long, text string")
    s = Searcher(InvertedIndex.build(docs, analyzer="charset"))
    ids = {int(r["doc_id"])
           for r in s.search(parse_query("résumé", analyzer="charset"),
                             limit=5).collect()}
    assert ids == {0, 1}
