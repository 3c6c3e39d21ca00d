"""Analyzer-chain parity tests (reference tests/test_analysis.py style:
exact token lists + position semantics, SURVEY.md §5)."""

from __future__ import annotations

import pandas as pd
import pytest

from whoosh_spark.analysis.analyzers import analyze_text, tokenize_raw
from whoosh_spark.config import STOP_WORDS, quantize_length


def test_tokenizer_basics():
    assert tokenize_raw("Hello big.data v1.2.3 x") == ["Hello", "big.data", "v1.2.3", "x"]
    assert tokenize_raw("") == []
    assert tokenize_raw(None) == []


def test_positions_preserved_across_stop_removal():
    toks, poss = analyze_text("big the data")
    assert toks == ["big", "data"]
    assert poss == [0, 2]  # gap where 'the' was — NOT renumbered


def test_lowercase_before_stop_and_minsize():
    toks, poss = analyze_text("THE Data A xx y")
    # THE→the (stopped), A→a (stopped+minsize), y (minsize)
    assert toks == ["data", "xx"]
    assert poss == [1, 3]


def test_stop_words_include_tbd():
    assert "tbd" in STOP_WORDS
    toks, _ = analyze_text("schedule tbd tomorrow")
    assert toks == ["schedule", "tomorrow"]


def test_unicode_cpython_semantics():
    toks, _ = analyze_text("Naïve RÉSUMÉ 東京 café")
    assert toks == ["naïve", "résumé", "東京", "café"]
    # Turkish dotted capital İ lowers to 'i̇' (2 codepoints) under CPython
    toks2, _ = analyze_text("İstanbul")
    assert toks2 == ["İstanbul".lower()]


def test_dotted_tokens_kept_whole():
    toks, _ = analyze_text("visit example.com and web.archive.org")
    assert toks == ["visit", "example.com", "web.archive.org"]


def test_analyze_udf_matches_pure_python(spark):
    texts = [
        "Hello big.data THE quick a I x naïve East 東京",
        "", None, "the a an of", "spark JOIN merge SPARK join",
        "word " * 300,  # long doc
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    from whoosh_spark.analysis.udfs import analyze_udf
    import pyspark.sql.functions as F

    got = {
        r["doc_id"]: (list(r["a"]["tokens"]), list(r["a"]["positions"]))
        for r in df.select("doc_id", analyze_udf("text").alias("a")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == analyze_text(t if isinstance(t, str) else ""), f"doc {i}"


def test_quantize_udf_matches_table(spark):
    import pyspark.sql.functions as F
    from whoosh_spark.analysis.udfs import quantize_len_udf

    vals = list(range(0, 200)) + [299, 300, 1485, 1486, 5000, 100000]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = {r["n"]: r["q"] for r in df.select("n", quantize_len_udf("n").alias("q")).collect()}
    for v in vals:
        assert got[v] == quantize_length(v), v


def test_oracle_tokenizer_unicode_parity():
    """The DuckDB index-oracle tokenizer ([\\p{L}\\p{N}_], SQL lower) must
    reproduce the CPython re.UNICODE chain on non-ASCII corpus text —
    RE2/Java \\w is ASCII-only, which silently diverged before round 2."""
    import duckdb

    from whoosh_spark.analysis.analyzers import analyze_text
    from whoosh_spark.config import (MIN_WORD_SIZE, STOP_WORDS,
                                     TOKEN_PATTERN_RE2_UNI)

    con = duckdb.connect()
    texts = [
        "naïve résumé 東京 café data the v1.2.3 node.js münchen istanbul",
        "Straße ŒUVRE mixed_under 123 a",
        "big data and the query",
    ]
    for t in texts:
        py = analyze_text(t)[0]
        dd = con.execute(
            "SELECT regexp_extract_all(?, ?)", [t, TOKEN_PATTERN_RE2_UNI]
        ).fetchone()[0]
        dd = [x.lower() for x in dd]
        dd = [x for x in dd if len(x) >= MIN_WORD_SIZE and x not in STOP_WORDS]
        assert py == dd, (t, py, dd)
