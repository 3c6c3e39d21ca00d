"""Remaining analysis filters: SubstitutionFilter, StripFilter,
ReverseTextFilter, DelimitedAttributeFilter (``src/whoosh/analysis/
filters.py ≈L430-470``)."""

from __future__ import annotations

from whoosh_spark.analysis.analyzers import (
    analyze_text,
    analyze_text_boosts,
    analyze_text_reversed,
    make_substitution_analyzer,
    parse_delimited_boost,
    strip_token,
    substitute,
)


def test_substitution_filter():
    assert substitute("wi-fi", "-", "") == "wifi"
    an = make_substitution_analyzer(r"\d+", "#")
    toks, poss = an("abc123 def the 456")
    assert toks == ["abc#", "def", "#"]
    # positions keep the stop gap from "the"
    assert poss == [0, 1, 3]


def test_substitution_drops_emptied_tokens():
    an = make_substitution_analyzer(r"^zz.*$", "")
    toks, poss = an("keep zzdrop keep2")
    assert toks == ["keep", "keep2"]
    assert poss == [0, 2]


def test_strip_and_reverse():
    assert strip_token("  pad  ") == "pad"
    assert strip_token("xxpadxx", "x") == "pad"
    toks, poss = analyze_text_reversed("Hello the World")
    base_t, base_p = analyze_text("Hello the World")
    assert toks == [t[::-1] for t in base_t]
    assert poss == base_p
    # leading-wildcard trick: '*orld' becomes reversed-prefix 'dlro'
    assert any(t.startswith("dlro") for t in toks)


def test_delimited_boost():
    assert parse_delimited_boost("tag^2") == ("tag", 2.0)
    assert parse_delimited_boost("tag^2.5") == ("tag", 2.5)
    assert parse_delimited_boost("plain") == ("plain", 1.0)
    assert parse_delimited_boost("a^b^3") == ("a^b", 3.0)
    assert parse_delimited_boost("tag|4", delimiter="|") == ("tag", 4.0)


def test_analyze_text_boosts():
    toks, poss, boosts = analyze_text_boosts("Big^2 data the Query^0.5")
    assert toks == ["big", "data", "query"]
    assert poss == [0, 1, 3]
    assert boosts == [2.0, 1.0, 0.5]
    # multi-token expansion shares the word boost
    toks2, poss2, boosts2 = analyze_text_boosts("state-of-art^3")
    assert set(boosts2) == {3.0}
    assert len(toks2) == len(poss2) == len(boosts2)
