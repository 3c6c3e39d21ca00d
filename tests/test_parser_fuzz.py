"""Property fuzz of the query-string surface: ANY input string must either
parse to a Query or raise ValueError (dateparse's documented error shape) —
never crash with an internal error — and every parsed query must normalize,
render, and evaluate end-to-end on a small index without raising.

Upstream parity note: whoosh's default QueryParser is similarly total — its
plugins degrade malformed syntax to term words rather than erroring
(``src/whoosh/qparser/default.py::QueryParser.parse ≈L320``).
"""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query, parse_simple

# bias toward query metacharacters so the grammar paths actually fire
_SYNTAX = '"()[]{}~^*?:+-' + "'"
_alpha = st.text(string.ascii_lowercase + " ", min_size=0, max_size=12)
_soup = st.text(
    string.ascii_lowercase + string.digits + _SYNTAX + " \t",
    min_size=0, max_size=40,
)
_keywords = st.sampled_from(
    ["AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "TO", "title:", "text:",
     '"big data"~2', "da*a", "dat?", "fuzz~", "fuzz~2", "[a TO m]",
     "{a TO m}", "^2.5", "(", ")"])
_mixed = st.lists(_soup | _keywords | _alpha, min_size=0, max_size=6).map(
    " ".join)


@given(_mixed)
@settings(max_examples=300, deadline=None, derandomize=True)
def test_parse_total(s):
    try:
        q = parse_query(s, fields=["title", "text"],
                        datetime_fields=["warc_ts"])
    except ValueError:
        return  # documented error shape (unparseable date bound)
    assert isinstance(q, Q.Query)
    # normalize is idempotent and repr/str never crash
    n = q.normalize()
    assert isinstance(n, Q.Query)
    assert isinstance(repr(n), str)


@given(_mixed)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_parse_simple_total(s):
    q = parse_simple(s, fields=["title", "text"])
    assert isinstance(q, Q.Query)
    assert isinstance(repr(q.normalize()), str)


@pytest.fixture(scope="module")
def tiny_searcher(spark):
    from whoosh_spark.index import InvertedIndex
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["big data query engine", "fuzzy match data", "a b c d e",
             "query the big table", ""])],
        "doc_id long, text string")
    return Searcher(InvertedIndex.build(docs))


# a fixed adversarial corpus of parser soup that historically trips naive
# grammars; each must run end-to-end (parse -> evaluate -> collect)
_E2E_CASES = [
    "", "   ", '"', '""', '"unclosed', "((((", "))))", "()", "(())",
    "AND", "OR", "NOT", "AND OR NOT", "a AND", "OR b", "NOT NOT a",
    "a^", "a^x", "^2", "~", "a~99", "*", "?", "*a", "a*b*c",
    "[ TO ]", "[a TO", "TO b]", "{a TO b", "a:[1 TO 2]",
    "[da TO ]", "[ TO dz]", "[ab*]", "{]", "text:[ab*]", "[dat?]",
    "title:", ":a", "unknown:term", "text:(a OR b)",
    'big "data query"~1 -noise +must', "a:-b", "--a", "++a",
    "warc_ts:[2020-01-01 TO 2020-02-01]", "warc_ts:notadate",
]


@pytest.mark.parametrize("s", _E2E_CASES)
def test_parse_evaluate_e2e(tiny_searcher, s):
    try:
        q = parse_query(s, fields=["text"], datetime_fields=["warc_ts"])
    except ValueError:
        return  # unparseable date bound is the one documented raise
    rows = tiny_searcher.search(q, limit=5).collect()
    assert isinstance(rows, list)
