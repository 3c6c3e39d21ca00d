"""Fielded differential rank-identity fuzz: random query ASTs over a
two-field schema (title = first 6 whitespace tokens of the sf0.001 text,
body = full text) must produce IDENTICAL top-k ids and BM25F scores from
the Spark ``MultiFieldIndex`` engine and the fielded pure-Python oracle
(``PyMultiIndex``: per-field df/avgdl/length stats, compound algebra
mixing fields — ``scoring.py::BM25F ≈L140`` semantics).

Covers the fielded surfaces the single-field fuzz can't: leaf routing by
``fieldname`` (None = default field), per-field statistics isolation,
cross-field And/Or/DisMax/pair-op mixing, fielded expansions
(Prefix/Wildcard/Fuzzy/TermRange enumerate the TARGET field's lexicon),
and fielded WAND eligibility (search() runs its default optimize path).

Both sides are built from the same Python row list, so tokenization inputs
are byte-identical.  ``derandomize=True`` keeps the driver's pytest gate
deterministic.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzz_vocab import BOOSTS, FUZZIES, PREFIXES, VOCAB, WILDCARDS
from whoosh_spark import FieldSpec, MultiFieldIndex, Searcher
from whoosh_spark.oracle.engine import PyIndex, PyMultiIndex
from whoosh_spark.query import ast as Q

K = 10
_BOOSTS = st.sampled_from(BOOSTS)
_FIELD = st.sampled_from([None, "title", "body", "body"])


def _title(text: str) -> str:
    return " ".join((text or "").split()[:6])


@pytest.fixture(scope="module")
def corpus(docs_rows):
    return [(d, _title(t), t) for d, t in docs_rows]


# non-default per-field B and boost so the BM25F differentiators
# (scoring.py::BM25F ≈L140 `<field>_B` kwargs + field weight) are what's
# actually being diffed, not just the routing
TITLE_B, TITLE_BOOST = 0.6, 2.0


@pytest.fixture(scope="module")
def fsearcher(spark, corpus):
    docs = spark.createDataFrame(
        corpus, "doc_id long, title string, body string")
    mix = MultiFieldIndex.build(
        docs,
        fields={"title": FieldSpec("title", b=TITLE_B, boost=TITLE_BOOST),
                "body": FieldSpec("body")},
        default_field="body",
    )
    return Searcher(mix)


@pytest.fixture(scope="module")
def fpy(corpus):
    return PyMultiIndex(
        {"title": PyIndex([(d, ti) for d, ti, _ in corpus], b=TITLE_B),
         "body": PyIndex([(d, b) for d, _, b in corpus])},
        default_field="body",
        boosts={"title": TITLE_BOOST},
    )


@st.composite
def _span_tree(draw):
    """Single-field span tree: SpanNear/SpanNot/SpanFirst over Term/Prefix
    leaves that all carry ONE drawn fieldname (the engine raises on mixed
    fields inside a span)."""
    fn = draw(_FIELD)
    leaf = st.one_of(
        st.builds(Q.Term, st.sampled_from(VOCAB), fieldname=st.just(fn)),
        st.builds(Q.Prefix, st.sampled_from(PREFIXES), fieldname=st.just(fn)),
    )
    kind = draw(st.sampled_from(["near", "not", "first", "contains"]))
    if kind == "near":
        return Q.SpanNear(draw(leaf), draw(leaf),
                          slop=draw(st.sampled_from([1, 2, 3])),
                          ordered=draw(st.booleans()))
    if kind == "not":
        return Q.SpanNot(draw(leaf), draw(leaf))
    if kind == "contains":
        return Q.SpanContains(draw(leaf), draw(leaf))
    return Q.SpanFirst(draw(leaf), limit=draw(st.sampled_from([2, 5, 20])))


_leaf = st.one_of(
    st.builds(Q.Term, st.sampled_from(VOCAB), boost=_BOOSTS,
              fieldname=_FIELD),
    _span_tree(),
    st.builds(Q.Phrase,
              st.lists(st.sampled_from(VOCAB[:10] + ["the"]),
                       min_size=2, max_size=3),
              slop=st.sampled_from([1, 1, 2]), fieldname=_FIELD),
    st.builds(Q.Prefix, st.sampled_from(PREFIXES), boost=_BOOSTS,
              fieldname=_FIELD),
    st.builds(Q.Wildcard, st.sampled_from(WILDCARDS), boost=_BOOSTS,
              fieldname=_FIELD),
    st.builds(Q.Fuzzy, st.sampled_from(FUZZIES),
              maxdist=st.sampled_from([1, 2]), fieldname=_FIELD),
    st.builds(Q.Regex, st.sampled_from(["da.a", "^qu", "(big|fast)"]),
              boost=_BOOSTS, fieldname=_FIELD),
    st.builds(Q.TermRange, st.sampled_from(["a", "da", "m"]),
              st.sampled_from(["dz", "m", "z"]), fieldname=_FIELD),
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
    )


_query = st.recursive(_leaf, _compound, max_leaves=5)


@given(_query)
@settings(max_examples=120, deadline=None, derandomize=True)
def test_fielded_ast_rank_identity(fsearcher, fpy, q):
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in fsearcher.search(q, limit=K).collect()]
    exp = fpy.search(q, K)
    assert [g[0] for g in got] == [e[0] for e in exp], \
        f"{q!r}: doc ids differ\nspark={got}\noracle={exp}"
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9), \
            f"{q!r}: score differs at doc {g[0]}"
