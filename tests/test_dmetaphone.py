"""Double Metaphone (``src/whoosh/lang/dmetaphone.py`` +
``analysis/morph.py::DoubleMetaphoneFilter ≈L60``): canonical published
vectors, key structure, and the end-to-end phonetic analyzer chain."""

from __future__ import annotations

import pytest

from whoosh_spark.analysis.dmetaphone import (
    double_metaphone, phonetic_keys, phonetic_match)
from whoosh_spark.analysis.analyzers import analyze_text_phonetic

# canonical outputs from the published algorithm (Philips, CUJ June 2000)
VECTORS = {
    "smith": ("SM0", "XMT"),
    "smyth": ("SM0", "XMT"),
    "schmidt": ("XMT", "SMT"),
    "knight": ("NT", None),
    "night": ("NT", None),
    "wright": ("RT", None),
    "jose": ("HS", None),
    "otto": ("AT", None),
    "judge": ("JJ", "AJ"),
    "phone": ("FN", None),
    "katherine": ("K0RN", "KTRN"),
    "kathryn": ("K0RN", "KTRN"),
    "michael": ("MKL", "MXL"),
    "school": ("SKL", None),
    "filipowicz": ("FLPT", "FLPF"),
    "xavier": ("SF", "SFR"),
    "dumb": ("TM", None),
    "thumb": ("0M", "TM"),
    "edge": ("AJ", None),
    "edgar": ("ATKR", None),
    "island": ("ALNT", None),
    "caesar": ("SSR", None),
    "chianti": ("KNT", None),
    "ghost": ("KST", None),
    "czerny": ("SRN", "XRN"),
    "focaccia": ("FKX", None),
    "zhao": ("J", None),
}


def test_canonical_vectors():
    for word, want in VECTORS.items():
        assert double_metaphone(word) == want, word


def test_key_structure():
    import string

    words = ["alphabet", "Bridge", "crunch", "O'Neil", "McHugh",
             "van gogh", "12345", "", "a", "résumé", "straße"]
    for w in words:
        p, s = double_metaphone(w)
        for key in (p, s):
            if key:
                assert len(key) <= 4
                assert all(c in string.ascii_uppercase + "0" for c in key)
        if s is not None:
            assert s != p
    assert double_metaphone("") == ("", None)
    assert double_metaphone("123") == ("", None)
    # case-insensitive and deterministic
    assert double_metaphone("SMITH") == double_metaphone("smith")


def test_phonetic_match_and_keys():
    assert phonetic_match("smith", "smyth")
    assert phonetic_match("katherine", "kathryn")
    assert not phonetic_match("smith", "wright")
    assert phonetic_keys("smith") == ["SM0", "XMT"]
    assert phonetic_keys("otto") == ["AT"]


def test_phonetic_analyzer_chain():
    toks, poss = analyze_text_phonetic("Smith the knight")
    # "the" stop-filtered; smith emits primary+secondary at one position
    assert toks == ["sm0", "xmt", "nt"]
    assert poss == [0, 0, 2]
    assert analyze_text_phonetic("") == ([], [])


def test_phonetic_index_retrieval(spark):
    # smith/smyth collide in the phonetic index; query-time tee applies the
    # same chain so either spelling finds both docs
    from whoosh_spark import InvertedIndex, Searcher
    from whoosh_spark.query import parse_query

    docs = spark.createDataFrame(
        [(0, "mr smith wrote code"), (1, "ms smyth reviewed code"),
         (2, "someone else entirely")],
        "doc_id long, text string")
    s = Searcher(InvertedIndex.build(docs, analyzer="phonetic"))
    for spelling in ("smith", "smyth"):
        q = parse_query(spelling, analyzer="phonetic")
        got = {int(r["doc_id"]) for r in s.search(q, limit=10).collect()}
        assert got == {0, 1}, spelling


def test_phonetic_cross_key_retrieval(spark):
    # smith and schmidt share ONLY one key (XMT): retrieval must work via
    # the Or of primary+secondary, not And (review regression)
    from whoosh_spark import InvertedIndex, Searcher
    from whoosh_spark.query import parse_query, ast as Q

    q = parse_query("smith", analyzer="phonetic")
    assert isinstance(q, Q.Or)  # sm0 OR xmt

    docs = spark.createDataFrame(
        [(0, "mr schmidt wrote code"), (1, "ms smyth reviewed it")],
        "doc_id long, text string")
    s = Searcher(InvertedIndex.build(docs, analyzer="phonetic"))
    got = {int(r["doc_id"]) for r in
           s.search(q, limit=10).collect()}
    assert got == {0, 1}


def test_loop_termination_counts_chars():
    # silent/alternate-only rules ('' adds) must not shorten keys
    assert double_metaphone("arnowski") == ("ARNS", "ARNF")
    assert double_metaphone("schwarzkopf")[0] == "XRSK"
