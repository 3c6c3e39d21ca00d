"""Round-5 snowball family completion: Finnish, Hungarian, Romanian,
Turkish — the last four of upstream whoosh's fifteen snowball languages
(``whoosh.lang.languages`` ≈L15: da nl en fi fr de hu it no pt ro ru es
sv tr).  Hand-traced canonical vectors, registry wiring, and totality
properties (all four algorithms are genuinely non-idempotent on
adversarial input — like Russian, the chain is applied exactly once by
both the index and the query tee, so no idempotency leg here)."""

import pytest

from whoosh_spark.analysis.snowball import LANG_STOPWORDS, STEMMERS
from whoosh_spark.analysis.snowball_romance import romanian_stem
from whoosh_spark.analysis.snowball_turkish import turkish_stem
from whoosh_spark.analysis.snowball_uralic import (
    finnish_stem,
    hungarian_stem,
)

FINNISH_VECTORS = {
    "taloissa": "talo",          # step3 'ssa', step5 plural 'i'
    "talossa": "talo",           # step3 'ssa'
    "talon": "talo",             # step3 'n'
    "talot": "talo",             # step5 't' after vowel
    "talo": "talo",              # no ending
    "kirjastoissa": "kirjasto",  # step3 'ssa' + step5 'i'
    "tablet": "tabl",            # step5 plural 't', step6b final cons+e
    "table": "tabl",             # step6b — same class as "tablet"
    "järjestelmässä": "järjestelm",   # step3 'ssä', step6b
    "tietokoneen": "tietokon",   # step3 'n', LV shorten, step6b
    "ystäväni": "ystäv",         # step2 possessive 'ni', step6b
    "ystävänsä": "ystäv",        # step2 possessive 'nsä', step6b
    "suurimmat": "suurim",       # step5 't', step6b 'a', undouble mm
    "kaupunkiin": "kaupunk",     # step3 hXn family 'hin'≡'iin' Vi rule
    "puhelimella": "puhelim",    # step3 'lla', step6b final cons+e
    "ajo": "ajo",                # step6d guard: R1 must hold ALL of 'jo'
}

HUNGARIAN_VECTORS = {
    "házak": "ház",              # plural 'ak'
    "házat": "ház",              # case 'at'
    "házban": "ház",             # case 'ban'
    "háznak": "ház",             # case 'nak'
    "házzal": "ház",             # step1 'al' + undouble zz
    "házon": "ház",              # case 'on'
    "ház": "ház",                # no ending
    "asztalok": "asztal",        # plural 'ok'
    "asztalon": "asztal",        # case 'on'
    "könyvek": "könyv",          # plural 'ek'
    "könyvet": "könyv",          # case 'et'
    "gyerekeknek": "gyerek",     # case 'nek' then plural 'ek'? (single
                                 # pass: longest 'nek', then plural 'ek')
    "virágot": "virág",          # case 'ot'
    "tablet": "tabl",            # case 'et' (host-alphabet word)
    "table": "tabl",             # owned 'e'
}

ROMANIAN_VECTORS = {
    "datele": "dat",             # step0 'ele'→'e', step4 final 'e'
    "data": "dat",               # step4 final 'a' in RV
    "date": "dat",               # step4 final 'e'
    "tabelul": "tabel",          # step0 article 'ul'
    "ordinele": "ordin",         # step0 'ele'→'e', step4 'e'
    "copilului": "copil",        # step0 'ului'
    "copiii": "copii",           # step0 'ii'→'i' (marked I protects rest)
    "lucrează": "lucr",          # step3 verb 'ează' after consonant
    "lucrate": "lucrat",         # step2? no — step0 none; step4 'e'
    "abilitate": "abil",         # step1 'abilitate'→'abil'
    "jurnalism": "jurnalist",    # step2 ism-family → 'ist'
    "frumoasă": "frumoas",       # step4 final 'ă'
    "românesc": "român",         # step3 verb-form 'esc' after consonant
}

TURKISH_VECTORS = {
    "kitaplar": "kitap",         # plural 'lar'
    "kitabı": "kitap",           # 3sg poss 'ı' + devoice b→p
    "kitapları": "kitap",        # 'ları'
    "kitapta": "kitap",          # locative hardened 'ta' after voiceless p
    "evde": "ev",                # locative 'de' (beats dative 'e')
    "evler": "ev",               # plural 'ler'
    "evi": "ev",                 # 3sg poss 'i'
    "evlerinden": "ev",          # fixpoint: '-nden' then '-leri'
    "evimizde": "ev",            # '-de' then '-imiz' then '-i'? (chain)
    "arabamız": "arap",          # 'mız' then dative 'a', devoice b→p —
                                 # same class as bare "araba" (confluence)
    "çocukların": "çocuk",       # genitive 'ın' then plural 'lar'
    "gözlükleri": "gözlük",      # 'leri'
    "okuldaki": "okul",          # harmony-exempt 'ki' then locative 'da'
    "ağacı": "ağaç",             # poss 'ı' + devoice c→ç
    "geliyormuş": "geliyor",     # evidential 'muş'
    "table": "table",            # harmony blocks '-le'/' -e' strips
    "tableler": "table",         # plural 'ler' (front harmony holds)
}


@pytest.mark.parametrize(
    "fn,word,expected",
    [(fn, w, e) for fn, m in ((finnish_stem, FINNISH_VECTORS),
                              (hungarian_stem, HUNGARIAN_VECTORS),
                              (romanian_stem, ROMANIAN_VECTORS),
                              (turkish_stem, TURKISH_VECTORS))
     for w, e in sorted(m.items())])
def test_family2_vectors(fn, word, expected):
    assert fn(word) == expected


def test_family2_registered():
    # the full fifteen-language upstream family is now in the built-in
    # snapshot: stemmer + stopword list + lang_<code> analyzer for each
    from whoosh_spark.analysis.analyzers import _BUILTIN_ANALYZERS

    for code in ("da", "nl", "en", "fi", "fr", "de", "hu", "it", "no",
                 "pt", "ro", "ru", "es", "sv", "tr"):
        assert f"lang_{code}" in _BUILTIN_ANALYZERS
        assert code in STEMMERS and code in LANG_STOPWORDS


@pytest.mark.parametrize("code", ["fi", "hu", "ro", "tr"])
def test_family2_total_on_random_unicode(code):
    # totality property (derandomized): no exception, bounded length,
    # lowercase-stable, marker-free — over adversarial unicode input
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fn = STEMMERS[code]

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40))
    def check(w):
        w = w.lower()
        out = fn(w)
        assert isinstance(out, str)
        assert len(out) <= len(w) + 3  # +ist/+a/+e style appends only
        assert "~" not in out or "~" in w

    check()


def test_family2_chains_stop_and_stem():
    from whoosh_spark.analysis.analyzers import ANALYZERS

    toks, pos = ANALYZERS["lang_tr"]("Evlerinden tableler ve bir table")
    assert toks == ["ev", "table", "table"]
    assert pos == [0, 1, 4]  # 've'/'bir' stopped, gaps preserved
    toks, _ = ANALYZERS["lang_fi"]("tablet ja table on talossa")
    assert toks == ["tabl", "tabl", "talo"]
    toks, _ = ANALYZERS["lang_hu"]("a tablet és az asztalok")
    assert toks == ["tabl", "asztal"]
    toks, _ = ANALYZERS["lang_ro"]("datele și data din tabelul")
    assert toks == ["dat", "dat", "tabel"]


def test_romanian_marker_never_leaks():
    # intervocalic i/u are marked I/U during the steps; the output must
    # always be folded back to lowercase
    for w in ("ploaie", "nouă", "voiau", "aiurea", "copiii"):
        out = romanian_stem(w)
        assert out == out.lower()


def test_turkish_harmony_and_voicing_gates():
    # hardened '-ta' must not attach after a vowel; soft '-da' must not
    # attach after voiceless; '-le' must not strip off a back-vowel stem
    assert turkish_stem("data") == "dat"           # no '-ta' after vowel
    assert turkish_stem("kitapta") == "kitap"      # '-ta' after voiceless
    assert turkish_stem("tablede") == "table"      # '-de' front harmony
    assert turkish_stem("table") == "table"        # '-le' back-harmony gate


def test_turkish_confluence():
    # suffixed forms land in the same conflation class as the bare word —
    # the fixpoint applies identical rules every pass, so stripping one
    # outer suffix can never strand a form in a different class
    for root, forms in (("masa", ("masalar", "masası")),
                        ("araba", ("arabamız", "arabalar")),
                        ("ev", ("evler", "evi", "evde", "evlerinden")),
                        ("kitap", ("kitaplar", "kitabı", "kitapta"))):
        want = turkish_stem(root)
        for f in forms:
            assert turkish_stem(f) == want, (f, turkish_stem(f), want)
