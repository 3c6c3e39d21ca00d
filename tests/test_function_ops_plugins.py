"""FunctionPlugin macros and OperatorsPlugin custom spellings (no Spark).

Reference: ``src/whoosh/qparser/plugins.py`` FunctionPlugin ≈L550,
OperatorsPlugin ≈L250 (And=r"&"-style constructor args replace an
operator's spelling; clean=True drops the defaults), Require infix
``query/compound.py::Require ≈L660``.
"""

from __future__ import annotations

import pytest

from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query


# ---------------------------------------------------------------- operators

def test_custom_and_or_spellings():
    q = parse_query(r"big && data || vector",
                    ops={"and": r"&&", "or": r"\|\|"})
    assert isinstance(q, Q.Or)
    a, v = q.children
    assert isinstance(a, Q.And) and {c.text for c in a.children} == {"big", "data"}
    assert isinstance(v, Q.Term) and v.text == "vector"


def test_replaced_spelling_degrades_to_term():
    # with "or" replaced, the word OR analyzes as ordinary text ("or" is a
    # stopword, so it vanishes and the remaining words juxtapose)
    q = parse_query("big OR data", ops={"or": r"\|\|"})
    assert isinstance(q, Q.And)
    # a non-stopword default spelling degrades to a real term
    q = parse_query("big ANDNOT data", ops={"andnot": r"&!"})
    assert isinstance(q, Q.And) and len(q.children) == 3
    assert {c.text for c in q.children} == {"big", "andnot", "data"}
    # and the custom spelling carries the operator
    q = parse_query("big &! data", ops={"andnot": r"&!"})
    assert isinstance(q, Q.AndNot)


def test_custom_not_andmaybe():
    q = parse_query("big ! data", ops={"not": r"!"})
    assert isinstance(q, Q.And)
    assert any(isinstance(c, Q.Not) for c in q.children)
    q = parse_query("big &~ data", ops={"andmaybe": r"&~"})
    assert isinstance(q, Q.AndMaybe)


def test_ops_clean_drops_defaults():
    # only the named operators exist; AND degrades ("and" stops out)
    q = parse_query("big AND data", ops={"or": r"\|\|"}, ops_clean=True)
    assert isinstance(q, Q.And) and len(q.children) == 2
    q = parse_query("big || data", ops={"or": r"\|\|"}, ops_clean=True)
    assert isinstance(q, Q.Or)


def test_require_default_infix():
    q = parse_query("big REQUIRE data")
    assert isinstance(q, Q.Require)
    assert q.a.text == "big" and q.b.text == "data"
    # custom spelling for require
    q = parse_query("big &= data", ops={"require": r"&="})
    assert isinstance(q, Q.Require)


def test_require_binds_like_andnot():
    q = parse_query("big data REQUIRE vector")
    assert isinstance(q, Q.Require)
    assert isinstance(q.a, Q.And)


def test_unknown_op_name_raises():
    with pytest.raises(ValueError, match="unknown operator"):
        parse_query("x", ops={"xor": "X"})


# ---------------------------------------------------------------- functions

def _fns():
    return {
        "near": lambda a, b, slop="1": Q.Phrase([a, b], slop=int(slop)),
        "drop": lambda *a, **k: None,
        "bad": lambda: "not a query",
        "every": lambda: Q.Every(),
    }


def test_function_positional_and_kwargs():
    q = parse_query("#near[big, data]", functions=_fns())
    assert isinstance(q, Q.Phrase) and q.words == ("big", "data") and q.slop == 1
    q = parse_query("#near[big, data, slop=3]", functions=_fns())
    assert q.slop == 3


def test_function_no_args_and_boost():
    q = parse_query("#every", functions=_fns())
    assert isinstance(q, Q.Every)
    q = parse_query("vector #near[big, data]^2", functions=_fns())
    assert isinstance(q, Q.And)
    w = [c for c in q.children if isinstance(c, Q.Weighted)][0]
    assert w.boost == 2.0 and w.weighting is None
    assert isinstance(w.child, Q.Phrase)


def test_function_none_drops_leaf():
    q = parse_query("vector #drop[x]", functions=_fns())
    assert isinstance(q, Q.Term) and q.text == "vector"


def test_function_errors():
    with pytest.raises(ValueError, match="unknown query function"):
        parse_query("#nope[x]", functions=_fns())
    with pytest.raises(TypeError, match="expected a Query"):
        parse_query("#bad", functions=_fns())


def test_function_inactive_without_registry():
    # no functions= → '#near[big]' is plain text (legacy analysis)
    q = parse_query("#near[big]")
    assert isinstance(q, Q.And)
    assert {c.text for c in q.children} == {"near", "big"}


def test_function_composes_with_operators():
    q = parse_query("#near[big, data] OR vector", functions=_fns())
    assert isinstance(q, Q.Or)
    assert isinstance(q.children[0], Q.Phrase)


class TestReviewRegressions:
    """Round-5 session-3 review findings on the new parser/AST code."""

    def test_squote_stays_inside_group(self):
        # a single-quoted token after another unit must not escape its
        # enclosing paren/NOT group (SQUOTE was missing from the
        # juxtaposition-continuation token lists)
        q = parse_query("big OR (data 'c d')")
        assert isinstance(q, Q.Or)
        inner = q.children[1]
        assert isinstance(inner, Q.And)
        assert any(getattr(c, "text", None) == "c d" for c in inner.children)
        q2 = parse_query("NOT (big 'x y')")
        assert isinstance(q2, Q.Not) and isinstance(q2.child, Q.And)

    def test_ops_clean_without_ops_disables_all(self):
        # OperatorsPlugin(clean=True) with no replacements: no operator
        # spellings at all — AND becomes a stopword-dropped term
        q = parse_query("big AND data", ops_clean=True)
        assert isinstance(q, Q.And) and len(q.children) == 2
        assert {c.text for c in q.children} == {"big", "data"}
        q2 = parse_query("big ANDNOT data", ops_clean=True)
        assert {c.text for c in q2.children} == {"big", "andnot", "data"}

    def test_replace_rewrites_pattern_leaves(self):
        # Wildcard/Regex store the string as `pattern`; upstream keeps it
        # in `text` and Query.replace covers it
        w = Q.Wildcard("alf*a").replace(None, "alf*a", "x*")
        assert w.pattern == "x*"
        r = Q.Regex("^d.t.$").replace(None, "^d.t.$", "^x$")
        assert r.pattern == "^x$"

    def test_orgroup_infix_binding_documented(self):
        # under group="or" the infix takes the immediately preceding unit
        q = parse_query("big data ANDNOT vector", group="or")
        assert isinstance(q, Q.Or)
        assert isinstance(q.children[1], Q.AndNot)
        # and parens widen the left side
        q2 = parse_query("(big data) ANDNOT vector", group="or")
        assert isinstance(q2, Q.AndNot)
