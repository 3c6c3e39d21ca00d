"""Paice-Husk / Lancaster stemmer: canonical vectors, engine semantics
(intact rules, protect rules, acceptability, continuation), registry
chain, and totality."""

import pytest

from whoosh_spark.analysis.paicehusk import (
    DEFAULT_RULES,
    paicehusk_stem,
    parse_rules,
)

# hand-traced through the published Lancaster table; the classics
# (happiness→happy, maximum→maxim, decision→decid, electricity→elect)
# match the published reference behavior
VECTORS = {
    "happiness": "happy",        # -ness, then i→y
    "maximum": "maxim",          # -um intact rule
    "presumably": "presum",      # -bly → -bl, then -abl
    "conflated": "confl",        # -ed, then -at
    "running": "run",            # -ing, then undouble nn
    "decision": "decid",         # -sion → j, then -ij → -id
    "explosion": "explod",       # same j-route
    "conception": "conceiv",     # -ion, then -cept → -ceiv
    "electricity": "elect",      # -ity, then -ic
    "triplicate": "triply",      # -e, then -plicat → -ply
    "classified": "class",       # -ied → y, then -ify
    "desirability": "desir",     # -ity, then -abil→bl chain
    "distinguish": "distinct",   # -guish → -ct
    "analyzed": "analys",        # -ed, then -yz → -ys
    "press": "press",            # ss protect rule
    "flies": "fly",              # -ies → y; -ly rule unacceptable on fly
    "dying": "dying",            # -ing removal would leave unacceptable dy
    "multiply": "multiply",      # -ply protect rule
    "news": "new",               # intact -s
    "skies": "sky",
    "crying": "cry",
    "kneeling": "kneel",         # -een protected from -en
    "order": "ord",
    "orders": "ord",
    "ordering": "ord",
    "data": "dat",
}


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()))
def test_lancaster_vectors(word, expected):
    assert paicehusk_stem(word) == expected


def test_intact_only_rules():
    # the intact -s rule fires on the original word but not after another
    # rule has already modified it
    assert paicehusk_stem("news") == "new"
    # 'famous': -ous fires (not intact-dependent) → fam
    assert paicehusk_stem("famous") == "fam"


def test_acceptability_guard():
    # rules whose result would be unacceptable are skipped, not applied
    assert paicehusk_stem("sing") == "sing"    # -ing would leave 's'
    assert paicehusk_stem("string") == "string"  # 'str' has no vowel


def test_parse_rules_rejects_garbage():
    with pytest.raises(ValueError):
        parse_rules("notarule!")


def test_custom_rule_table():
    table = parse_rules("gni3> e1>")
    assert paicehusk_stem("hoping", rules=table) == "hop"
    assert paicehusk_stem("hope", rules=table) == "hop"


def test_default_rules_parse_clean():
    table = parse_rules(DEFAULT_RULES)
    assert set(table) <= set("abcdefghijlmnprstuvyz")
    # every group preserves published order: first rule listed is tried
    # first ('s' group must protect -ss before the intact -s rule)
    s_endings = [r[0] for r in table["s"]]
    assert s_endings.index("ss") < s_endings.index("s")


def test_registry_chain():
    from whoosh_spark.analysis.analyzers import ANALYZERS

    toks, pos = ANALYZERS["lang_lancaster"](
        "the ordering of orders and maximum")
    assert toks == ["ord", "ord", "maxim"]
    assert pos == [1, 3, 5]  # stop gaps preserved


def test_lancaster_total_on_random_unicode():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40))
    def check(w):
        out = paicehusk_stem(w.lower())
        assert isinstance(out, str) and len(out) <= len(w) + 4

    check()
