"""Differential rank-identity fuzz: randomly generated query ASTs must
produce IDENTICAL top-k doc ids and BM25 scores (rtol 1e-9) from the Spark
engine and the pure-Python oracle (whoosh_spark/oracle/engine.py).

This is the unknown-unknowns companion to tests/test_rank_identity.py's
fixed reference set: hypothesis composes nested And/Or/DisMax/AndNot/
AndMaybe/Require/Not/Phrase/Prefix/Wildcard/Fuzzy/TermRange shapes (depth
≤ 3, with boosts/minmatch/slop) over the sf0.001 vocabulary plus missing
terms and stopwords, so compound-rewrite corner cases (empty children,
NullQuery propagation, nested normalization) get adversarial coverage.

``derandomize=True`` keeps the example set fixed → stable suite runtime and
reproducible failures.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_spark.index import InvertedIndex
from whoosh_spark.oracle.engine import PyIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher

K = 10

# sf0.001 documents vocabulary (FIXTURES.md) + absent terms + a stopword
_VOCAB = ["data", "query", "vector", "window", "hash", "join", "big",
          "table", "scan", "sort", "filter", "merge", "stream", "order",
          "line", "column", "key", "batch", "fast", "slow", "small",
          "zzz_missing", "qqq_absent", "the"]
_BOOSTS = st.sampled_from([0.5, 1.0, 1.0, 1.0, 2.0, 3.0])

_term = st.builds(Q.Term, st.sampled_from(_VOCAB), boost=_BOOSTS)
_leaf = st.one_of(
    _term,
    st.builds(Q.Phrase,
              st.lists(st.sampled_from(_VOCAB[:10]), min_size=2, max_size=3),
              slop=st.sampled_from([1, 1, 2, 3])),
    st.builds(Q.Prefix, st.sampled_from(["da", "qu", "ve", "zz", "s"])),
    st.builds(Q.Wildcard, st.sampled_from(["d*a", "s??t", "*dow", "q*"])),
    st.builds(Q.Fuzzy, st.sampled_from(["dat", "vectr", "joim", "zzzz"]),
              maxdist=st.sampled_from([1, 2])),
    st.builds(Q.TermRange, st.sampled_from(["a", "da", "m"]),
              st.sampled_from(["dz", "m", "z"])),
)


def _compound(children):
    return st.one_of(
        st.builds(Q.And, st.lists(children, min_size=1, max_size=3)),
        st.builds(Q.Or, st.lists(children, min_size=1, max_size=3),
                  minmatch=st.sampled_from([0, 0, 2])),
        st.builds(Q.DisMax, st.lists(children, min_size=1, max_size=3),
                  tiebreak=st.sampled_from([0.0, 0.5])),
        st.builds(Q.AndNot, children, children),
        st.builds(Q.AndMaybe, children, children),
        st.builds(Q.Require, children, children),
        st.builds(Q.Not, children),
    )


_query = st.recursive(_leaf, _compound, max_leaves=6)


@pytest.fixture(scope="module")
def searcher(spark, sf0001_documents):
    return Searcher(InvertedIndex.build(sf0001_documents))


@pytest.fixture(scope="module")
def py(docs_rows):
    return PyIndex(docs_rows)


@given(_query)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_random_ast_rank_identity(searcher, py, q):
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in searcher.search(q, limit=K).collect()]
    exp = py.search(q, K)
    assert [g[0] for g in got] == [e[0] for e in exp], \
        f"{q!r}: doc ids differ\nspark={got}\noracle={exp}"
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9), \
            f"{q!r}: score differs at doc {g[0]}"
