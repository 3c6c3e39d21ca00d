"""Differential rank-identity fuzz: randomly generated query ASTs must
produce IDENTICAL top-k doc ids and BM25 scores (rtol 1e-9) from the Spark
engine and the pure-Python oracle (whoosh_spark/oracle/engine.py).

This is the unknown-unknowns companion to tests/test_rank_identity.py's
fixed reference set: hypothesis composes nested And/Or/DisMax/AndNot/
AndMaybe/Require/Not shapes (depth ≤ 3, with boosts/minmatch/tiebreak) over
leaves spanning Term/Phrase (incl. a stopword)/boosted Prefix/boosted
Wildcard/Fuzzy/TermRange/Every on the sf0.001 vocabulary plus missing
terms, so compound-rewrite corner cases (empty children, NullQuery
propagation, duplicate cross-child expansions, nested normalization) get
adversarial coverage.  This suite found the duplicate-expansion scoring
bug pinned in tests/test_dup_expansion.py.

``derandomize=True`` keeps the example set fixed → stable suite runtime
and reproducible failures; exploratory random-seed sweeps live in
tests/fuzz_campaign.py (manual, not collected).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzz_vocab import BOOSTS, FUZZIES, PREFIXES, VOCAB, WILDCARDS
from whoosh_spark.query import ast as Q

K = 10

_BOOSTS = st.sampled_from(BOOSTS)

_term = st.builds(Q.Term, st.sampled_from(VOCAB), boost=_BOOSTS)
_leaf = st.one_of(
    _term,
    st.builds(Q.Phrase,
              st.lists(st.sampled_from(VOCAB[:10] + ["the"]),
                       min_size=2, max_size=3),
              slop=st.sampled_from([1, 1, 2, 3])),
    st.builds(Q.Prefix, st.sampled_from(PREFIXES), boost=_BOOSTS),
    st.builds(Q.Wildcard, st.sampled_from(WILDCARDS), boost=_BOOSTS),
    st.builds(Q.Fuzzy, st.sampled_from(FUZZIES),
              maxdist=st.sampled_from([1, 2])),
    st.builds(Q.TermRange, st.sampled_from(["a", "da", "m"]),
              st.sampled_from(["dz", "m", "z"])),
    st.builds(Q.Every, boost=_BOOSTS),
    st.builds(Q.Regex, st.sampled_from(["da.a", "^qu", "or$", "a.c",
                                        "z{3}", "(big|fast)"]),
              boost=_BOOSTS),
    st.builds(Q.Sequence,
              st.tuples(st.builds(Q.Term, st.sampled_from(VOCAB[:10])),
                        st.one_of(
                            st.builds(Q.Term, st.sampled_from(VOCAB[:10])),
                            st.builds(Q.Prefix, st.sampled_from(PREFIXES)))),
              slop=st.sampled_from([1, 2, 3])),
    st.builds(Q.NumericRange, st.just("n_chars"),
              st.sampled_from([None, 47, 150, 312]),
              st.sampled_from([None, 250, 400, 558]),
              incl_lo=st.booleans(), incl_hi=st.booleans(),
              boost=_BOOSTS),
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
        st.builds(Q.Otherwise, children, children),
        st.builds(Q.Constant, children,
                  score=st.sampled_from([0.5, 1.0, 2.0])),
        st.builds(Q.Not, children),
        st.builds(Q.Weighted, children,
                  weighting=st.sampled_from(
                      ["pl2", "dfree", "tfidf", "frequency",
                       "reverse:bm25"])),
    )


_query = st.recursive(_leaf, _compound, max_leaves=6)

# searcher / py come from conftest (session-scoped, sf0.001 corpus)


@given(_query)
@settings(max_examples=150, deadline=None, derandomize=True)
def test_random_ast_rank_identity(searcher, py, q):
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in searcher.search(q, limit=K).collect()]
    exp = py.search(q, K)
    assert [g[0] for g in got] == [e[0] for e in exp], \
        f"{q!r}: doc ids differ\nspark={got}\noracle={exp}"
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9), \
            f"{q!r}: score differs at doc {g[0]}"
