"""NGRAMWORDS field chain (``src/whoosh/fields.py::NGRAMWORDS ≈L1150``):
char 2..4-grams per lowercased word, all at the word's tokenizer ordinal —
substring search = parse-time gram split into And over the gram index."""

from __future__ import annotations

from whoosh_spark.analysis.analyzers import analyze_text_ngram, ngram_tokens
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query
from whoosh_spark.search import Searcher


def test_ngram_chain_tokens_positions():
    toks, poss = analyze_text_ngram("Big data")
    # "big": bi ig big; "data": da at ta dat ata data
    assert toks == ["bi", "ig", "big", "da", "at", "ta", "dat", "ata", "data"]
    assert poss == [0, 0, 0, 1, 1, 1, 1, 1, 1]
    # 1-char words yield no grams but still advance the ordinal
    toks2, poss2 = analyze_text_ngram("a table")
    assert toks2 == ngram_tokens("table", 2, 4)
    assert set(poss2) == {1}


def test_ngram_substring_search(spark):
    docs = spark.createDataFrame(
        [(0, "the table merge plan"),
         (1, "tab stop only"),
         (2, "vector scan"),
         (3, "portable tables")],
        "doc_id long, text string")
    s = Searcher(InvertedIndex.build(docs, analyzer="ngram"))
    q = parse_query("tabl", analyzer="ngram")
    got = sorted(r["doc_id"] for r in s.search(q, limit=10).collect())
    # "tabl" substring: table (0), portable/tables (3); NOT bare "tab" (1)
    assert got == [0, 3]
    # single-gram query still works as a plain Term over the gram index
    one = parse_query("ta", analyzer="ngram")
    assert isinstance(one, Q.Term)
    got_one = sorted(r["doc_id"] for r in s.search(one, limit=10).collect())
    assert got_one == [0, 1, 3]
