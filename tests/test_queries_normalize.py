"""Query.normalize() identities (reference tests/test_queries.py style)."""

from __future__ import annotations

from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query


def test_flatten_same_class():
    q = Q.And([Q.And([Q.Term("a1"), Q.Term("b1")]), Q.Term("c1")]).normalize()
    assert isinstance(q, Q.And) and len(q.children) == 3


def test_dedupe_children():
    q = Q.Or([Q.Term("xx"), Q.Term("xx"), Q.Term("yy")]).normalize()
    assert len(q.children) == 2


def test_null_elimination_and_unwrap():
    assert Q.And([Q.Term("the")]).normalize() is Q.NullQuery  # stopword term
    q = Q.And([Q.Term("data"), Q.Term("the")]).normalize()
    assert q == Q.Term("data")
    assert Q.Or([]).normalize() is Q.NullQuery


def test_every_absorption():
    q = Q.And([Q.Every(), Q.Term("data")]).normalize()
    assert q == Q.Term("data")


def test_query_time_analysis():
    assert Q.Term("DATA").normalize() == Q.Term("data")
    # multi-token term text behaves like implicit And (parser semantics)
    q = Q.Term("big data").normalize()
    assert isinstance(q, Q.And)


def test_phrase_normalize_drops_stops():
    q = Q.Phrase(["big", "the", "data"]).normalize()
    assert isinstance(q, Q.Phrase) and list(q.words) == ["big", "data"]
    assert Q.Phrase(["the"]).normalize() is Q.NullQuery
    assert Q.Phrase(["Data"]).normalize() == Q.Term("data")


def test_andnot_null_b():
    q = Q.AndNot(Q.Term("data"), Q.Term("the")).normalize()
    assert q == Q.Term("data")


# ---------------------------------------------------------------------------
# parser → expected query tree (reference tests/test_parsing.py style)
# ---------------------------------------------------------------------------

def test_parse_simple_word():
    assert parse_query("Data") == Q.Term("data")


def test_parse_implicit_and():
    q = parse_query("big data")
    assert isinstance(q, Q.And)
    assert q.children == (Q.Term("big"), Q.Term("data"))


def test_parse_or_and_precedence():
    q = parse_query("big OR data AND query")
    assert isinstance(q, Q.Or)


def test_parse_phrase_with_slop():
    q = parse_query('"big data"~2')
    assert isinstance(q, Q.Phrase) and q.slop == 2


def test_parse_not():
    q = parse_query("data NOT vector")
    assert isinstance(q, Q.And)
    assert any(isinstance(c, Q.Not) for c in q.children)


def test_parse_boost_prefix_fuzzy_range():
    assert parse_query("data^2.5") == Q.Term("data", boost=2.5)
    assert parse_query("quer*") == Q.Prefix("quer")
    assert isinstance(parse_query("wi?ld"), Q.Wildcard)
    f = parse_query("data~1")
    assert isinstance(f, Q.Fuzzy) and f.maxdist == 1
    r = parse_query("[da TO dz]")
    assert isinstance(r, Q.TermRange) and r.incl_lo and r.incl_hi
    r2 = parse_query("{da TO dz}")
    assert not r2.incl_lo and not r2.incl_hi


def test_parse_parens_and_field_strip():
    q = parse_query("(big OR data) query")
    assert isinstance(q, Q.And)
    assert parse_query("text:data") == Q.Term("data")


# ---------------------------------------------------------------------------
# normalize() idempotence + minmatch-gate preservation
# (found by tests/fuzz_campaign.py --many: search() normalizes once,
# search_many() twice; a non-idempotent normalize made them diverge)

def test_nested_minmatch_or_not_flattened():
    inner = Q.Or([Q.Term("data"), Q.Term("big"), Q.Term("scan")], minmatch=3)
    q = Q.Or([Q.Term("query"), inner], minmatch=0).normalize()
    assert isinstance(q, Q.Or)
    # the minmatch=3 child keeps its gate (no hoisting)
    assert any(isinstance(c, Q.Or) and c.minmatch == 3 for c in q.children)


def test_minmatch_one_parent_still_flattens():
    q = Q.Or([Q.Or([Q.Term("data"), Q.Term("big")]), Q.Term("scan")],
             minmatch=1).normalize()
    assert isinstance(q, Q.Or)
    assert all(isinstance(c, Q.Term) for c in q.children)
    assert len(q.children) == 3


def test_deep_nested_gate_survives_double_normalize():
    q = Q.Or([
        Q.Wildcard("*dow"),
        Q.Or([
            Q.TermRange(None, "z"),
            Q.TermRange(None, "dz"),
            Q.Or([Q.TermRange("da", "m", incl_hi=False),
                  Q.Fuzzy("vectr", maxdist=1, prefixlength=1)], minmatch=2),
        ], minmatch=3),
    ], minmatch=0)
    n1 = q.normalize()
    assert n1 == n1.normalize()
    gated = [c for c in n1.children if isinstance(c, Q.Or)]
    assert gated and gated[0].minmatch == 3
    assert any(isinstance(g, Q.Or) and g.minmatch == 2
               for g in gated[0].children)


def test_normalize_idempotent_random_asts():
    """Property: normalize(normalize(q)) == normalize(q) over the campaign
    generator's full AST space (pure python — no Spark)."""
    import random

    import fuzz_campaign as FC

    rng = random.Random(20260818)
    for _ in range(3000):
        q = FC.rand_query(rng, fields=[None, "title", "body"])
        n1 = q.normalize()
        assert n1 == n1.normalize(), repr(q)


def test_boost_type_validated_at_construction():
    """A non-numeric boost fails FAST with a clear TypeError instead of an
    opaque Spark CAST_INVALID_INPUT at plan-construction time (classic slip:
    Term("field", "word") putting the field name in the boost slot)."""
    import pytest

    with pytest.raises(TypeError, match="boost must be a number"):
        Q.Term("text", "data")
    with pytest.raises(TypeError, match="boost must be a number"):
        Q.Prefix("quer", "oops")
    # numeric boosts (int or float) and the full signature stay fine
    assert Q.Term("data", 2, "text").boost == 2
    assert Q.Wildcard("qu*", 1.5).boost == 1.5


class TestAcceptReplace:
    """qcore.py::Query.accept ≈L230 / Query.replace ≈L260 — bottom-up
    rebuild and the spelling-correction text-rewrite primitive."""

    def test_accept_visits_every_node(self):
        from whoosh_spark.query import ast as Q
        q = Q.AndNot(Q.And([Q.Term("a"), Q.Not(Q.Term("b"))]),
                     Q.SpanNear(Q.Term("c"), Q.Term("d"), slop=2,
                                ordered=True))
        seen = []
        out = q.accept(lambda n: (seen.append(type(n).__name__), n)[1])
        assert out == q  # identity fn -> equal tree
        assert sorted(set(seen)) == ["And", "AndNot", "Not", "SpanNear",
                                     "Term"]
        assert seen.count("Term") == 4

    def test_accept_rebuilds_copy(self):
        from dataclasses import replace as _rep
        from whoosh_spark.query import ast as Q
        q = Q.Or([Q.Term("a"), Q.Term("b")])
        out = q.accept(lambda n: _rep(n, boost=2.0)
                       if isinstance(n, Q.Term) else n)
        assert all(c.boost == 2.0 for c in out.children)
        assert all(c.boost == 1.0 for c in q.children)  # original untouched

    def test_replace_text_and_words(self):
        from whoosh_spark.query import ast as Q
        q = Q.And([Q.Term("alfa"), Q.Phrase(["alfa", "bravo"]),
                   Q.Fuzzy("alfa", maxdist=1), Q.Prefix("alfa")])
        r = q.replace(None, "alfa", "delta")
        assert "alfa" not in repr(r) and "alfa" in repr(q)

    def test_replace_respects_field(self):
        from whoosh_spark.query import ast as Q
        q = Q.And([Q.Term("alfa", fieldname="title"), Q.Term("alfa")])
        r = q.replace("title", "alfa", "echo")
        assert r.children[0].text == "echo"
        assert r.children[1].text == "alfa"
        r2 = q.replace(None, "alfa", "echo")
        assert r2.children[0].text == "alfa"
        assert r2.children[1].text == "echo"
