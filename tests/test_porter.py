"""Porter stemmer + stemming chain (reference: whoosh lang/porter.py,
classic examples from Porter (1980))."""

from __future__ import annotations

from whoosh_spark.analysis.analyzers import analyze_text_stemming, fold_accents
from whoosh_spark.analysis.porter import stem

# canonical examples from the published algorithm description
CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubling": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_canonical_cases():
    bad = {w: (stem(w), want) for w, want in CASES.items() if stem(w) != want}
    assert not bad, bad


def test_stemming_chain_positions():
    toks, pos = analyze_text_stemming("The motoring agreed troubles")
    assert toks == ["motor", "agre", "troubl"]
    assert pos == [1, 2, 3]  # stop gap at position 0 preserved


def test_fold_accents():
    assert fold_accents("naïve") == "naive"
    assert fold_accents("résumé") == "resume"
    assert fold_accents("münchen") == "munchen"
