"""Duplicate-expansion scoring semantics, pinned deterministically.

``ast.normalize`` dedupes IDENTICAL compound children (upstream
``compound.py::CompoundQuery.normalize ≈L120`` keeps a ``seen`` set), but
DISTINCT children that merely EXPAND to the same term — e.g. a Prefix and a
Wildcard both matching only ``data`` — each keep their own matcher upstream,
so an IntersectionMatcher/UnionMatcher sums the shared term's weight once
PER CHILD.  The Spark evaluator batches expanded terms into one postings
scan; these tests pin that the batch stays multiplicity-aware in every
compound that uses it (And / Or+minmatch / DisMax+tiebreak / the
AndNot/AndMaybe/Require one-scan pair plan).

Found by tests/test_rank_fuzz_deep.py (hypothesis); kept here as fast,
named regressions.
"""

from __future__ import annotations

import pytest

from whoosh_spark.query import ast as Q

# both expand to exactly the term "data" on the sf0.001 vocabulary
P = Q.Prefix("dat")
W = Q.Wildcard("d*a")
DUP_CASES = [
    Q.And([P, W]),
    Q.And([P, W, Q.Term("query", 0.5)]),
    Q.Or([P, W], minmatch=2),
    Q.Or([P, W, Q.Term("zzz_missing")], minmatch=2),
    Q.DisMax([P, W], tiebreak=0.5),
    Q.AndNot(Q.And([P, W]), Q.Term("query")),
    Q.AndNot(Q.Or([P, W]), Q.Term("zzz_missing")),
    Q.AndMaybe(Q.Term("query"), Q.Or([P, W])),
    Q.AndMaybe(Q.And([P, W]), Q.And([P, W, Q.Term("query")])),
    Q.Require(Q.Or([P, W]), Q.Term("query")),
]


# searcher / py come from conftest (session-scoped, sf0.001 corpus)


@pytest.mark.parametrize("q", DUP_CASES, ids=lambda q: repr(q)[:60])
def test_dup_expansion_rank_identity(searcher, py, q):
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in searcher.search(q, limit=10).collect()]
    exp = py.search(q, 10)
    assert [g[0] for g in got] == [e[0] for e in exp], \
        f"{q!r}: doc ids differ\nspark={got}\noracle={exp}"
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9), \
            f"{q!r}: score differs at doc {g[0]}"


def test_identical_children_still_dedupe(searcher, py):
    """ast.normalize keeps upstream's seen-set dedup for IDENTICAL children:
    And(Term(data), Term(data)) == Term(data), scored once."""
    dup = Q.And([Q.Term("data"), Q.Term("data")])
    single = Q.Term("data")
    got_dup = [(int(r["doc_id"]), float(r["score"]))
               for r in searcher.search(dup, limit=10).collect()]
    got_one = [(int(r["doc_id"]), float(r["score"]))
               for r in searcher.search(single, limit=10).collect()]
    assert got_dup == got_one
