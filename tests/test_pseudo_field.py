"""PseudoFieldPlugin analog: ``name:text`` routes through a user function
returning a Query node (upstream ``qparser/plugins.py::PseudoFieldPlugin``
≈L330)."""

import pytest

from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query

PS = {
    # fn receives the PARSED node (upstream fn-over-node contract)
    "syn": lambda n: Q.Or([n, Q.Term(n.text + "s")]),
    "rev": lambda n: Q.Term(n.text[::-1]),
    "drop": lambda n: None,
}


def test_pseudo_node_substitution():
    q = parse_query("big AND syn:data", pseudo_fields=PS)
    assert isinstance(q, Q.And)
    syn = q.children[1]
    assert isinstance(syn, Q.Or)
    assert sorted(t for c in syn.children for t in c.terms()) == [
        "data", "datas"]
    assert parse_query("rev:abc", pseudo_fields=PS).terms() == ["cba"]


def test_pseudo_none_drops_leaf():
    q = parse_query("big drop:x", pseudo_fields=PS)
    assert q == Q.Term("big")
    assert parse_query("drop:x", pseudo_fields=PS) is Q.NullQuery


def test_pseudo_boost_wraps_model_preserving():
    q = parse_query("syn:data^2", pseudo_fields=PS)
    assert isinstance(q, Q.Weighted) and q.boost == 2.0
    # weighting=None: the boost wrapper must NOT swap the searcher's
    # scoring model for the subtree
    assert q.weighting is None


def test_pseudo_receives_parsed_node_not_markup():
    # phrases/fuzzies parse BEFORE the function sees them — no quote or
    # tilde markup leaks into user code
    seen = []

    def capture(n):
        seen.append(n)
        return n

    q = parse_query('cap:"big data"~2', pseudo_fields={"cap": capture})
    assert isinstance(seen[0], Q.Phrase) and seen[0].slop == 2
    assert q == seen[0]
    parse_query("cap:word~1", pseudo_fields={"cap": capture})
    assert isinstance(seen[1], Q.Fuzzy)


def test_pseudo_shadows_real_field():
    # upstream applies pseudo functions before field routing
    q = parse_query("syn:data", fields=["syn", "text"], pseudo_fields=PS)
    assert isinstance(q, Q.Or)
    # without the plugin the same string routes as a real field
    q2 = parse_query("syn:data", fields=["syn", "text"])
    assert isinstance(q2, Q.Term) and q2.fieldname == "syn"


def test_pseudo_bad_return_raises():
    with pytest.raises(TypeError):
        parse_query("bad:x", pseudo_fields={"bad": lambda t: 42})


def test_pseudo_ignores_other_prefixes():
    q = parse_query("other:data", pseudo_fields=PS)
    assert q == Q.Term("data")  # unknown prefix stripped as before


def test_pseudo_search_end_to_end(spark, sf0001_documents):
    # pseudo-expanded search == the explicit expansion query
    from whoosh_spark import InvertedIndex, Searcher

    s = Searcher(InvertedIndex.build(sf0001_documents))
    got = s.search(parse_query("syn:order", pseudo_fields=PS),
                   limit=10).collect()
    want = s.search(Q.Or([Q.Term("order"), Q.Term("orders")]),
                    limit=10).collect()
    assert [(r.doc_id, r.score) for r in got] == \
        [(r.doc_id, r.score) for r in want]
    assert got
