"""Span-query differential rank-identity fuzz: random span trees
(SpanNear/SpanNot/SpanContains/SpanBefore/SpanFirst/SpanOr/SpanCondition
over Term / slop-1 Phrase / Prefix leaves, nested up to depth 2, also
wrapped in ordinary compounds) must produce IDENTICAL top-k ids and BM25 scores from the Spark
positional kernel (evaluate.py::_spans_df) and the pure-Python span oracle
(PyIndex._span_tree — same (s, e) span algebra in dicts).

Scoring contract mirrored on both sides: a span query scores the SUM of
its a-side terms' BM25 over docs whose final span list is non-empty
(``spans.py ≈L100-600`` semantics; inner leaf boosts are ignored).

``derandomize=True`` keeps the driver's pytest gate deterministic.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzz_vocab import PREFIXES, VOCAB
from whoosh_spark.query import ast as Q

K = 10

_sub = st.one_of(
    st.builds(Q.Term, st.sampled_from(VOCAB)),
    st.builds(Q.Phrase,
              st.lists(st.sampled_from(VOCAB[:10]), min_size=2, max_size=2)),
    st.builds(Q.Prefix, st.sampled_from(PREFIXES)),
)


def _span_level(children):
    return st.one_of(
        st.builds(Q.SpanNear, children, children,
                  slop=st.sampled_from([1, 2, 3]), ordered=st.booleans()),
        st.builds(Q.SpanNot, children, children),
        st.builds(Q.SpanContains, children, children),
        st.builds(Q.SpanBefore, children, children),
        st.builds(Q.SpanFirst, children, limit=st.sampled_from([2, 5, 20])),
        st.builds(Q.SpanOr, st.lists(children, min_size=2, max_size=3)),
        st.builds(Q.SpanCondition, children, children),
    )


_span = st.recursive(_sub, _span_level, max_leaves=4).filter(
    lambda q: not isinstance(q, (Q.Term, Q.Phrase, Q.Prefix)))

# spans also compose under ordinary boolean algebra
_query = st.one_of(
    _span,
    st.builds(Q.And, st.tuples(_span, st.builds(Q.Term, st.sampled_from(VOCAB)))),
    st.builds(Q.Or, st.tuples(_span, _span)),
    st.builds(Q.AndNot, _span, st.builds(Q.Term, st.sampled_from(VOCAB))),
)

# searcher / py come from conftest (session-scoped, sf0.001 corpus)


@given(_query)
@settings(max_examples=120, deadline=None, derandomize=True)
def test_span_ast_rank_identity(searcher, py, q):
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in searcher.search(q, limit=K).collect()]
    exp = py.search(q, K)
    assert [g[0] for g in got] == [e[0] for e in exp], \
        f"{q!r}: doc ids differ\nspark={got}\noracle={exp}"
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9), \
            f"{q!r}: score differs at doc {g[0]}"
