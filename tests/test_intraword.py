"""IntraWord / BiWord / CompoundWord filter units
(``src/whoosh/analysis/intraword.py`` ≈L40/L300/L380 semantics)."""

from __future__ import annotations

from whoosh_spark.analysis.analyzers import (
    analyze_text_biword,
    analyze_text_intraword,
    compound_split,
    intraword_split,
    make_compound_analyzer,
)


class TestIntraWord:
    def test_camel_case(self):
        assert intraword_split("camelCaseWord") == ["camel", "Case", "Word"]

    def test_allcaps_run(self):
        assert intraword_split("XMLHttpRequest") == ["XML", "Http", "Request"]

    def test_alpha_digit_boundary(self):
        assert intraword_split("RFC3229bis") == ["RFC", "3229", "bis"]

    def test_delimiters(self):
        assert intraword_split("wi-fi_5ghz") == ["wi", "fi", "5", "ghz"]

    def test_mergewords(self):
        out = intraword_split("wi-fi", mergewords=True)
        assert out == ["wi", "fi", "wifi"]

    def test_mergenums(self):
        out = intraword_split("1-2up", mergenums=True)
        assert out == ["1", "2", "up", "12"]

    def test_chain_positions_shared(self):
        toks, pos = analyze_text_intraword("the camelCase spark")
        # "the" is a stopword; camelCase splits to camel+case at position 1
        assert toks == ["camel", "case", "spark"]
        assert pos == [1, 1, 2]


class TestBiWord:
    def test_pairs(self):
        toks, pos = analyze_text_biword("big data merge")
        assert toks == ["big-data", "data-merge"]
        assert pos == [0, 1]

    def test_stopword_collapses_pair(self):
        # "the" drops, so the pair spans the gap (filtered-stream adjacency)
        toks, _ = analyze_text_biword("big the data")
        assert toks == ["big-data"]

    def test_short_input(self):
        # lone token emitted when no pair forms (upstream BiWordFilter rule)
        assert analyze_text_biword("spark") == (["spark"], [0])
        assert analyze_text_biword("") == ([], [])


class TestCompound:
    WORDS = frozenset({"note", "book", "case", "data", "base"})

    def test_split(self):
        assert compound_split("notebook", self.WORDS, keep_original=False) == \
            ["note", "book"]

    def test_keep_original(self):
        assert compound_split("notebook", self.WORDS) == ["notebook", "note", "book"]

    def test_unknown_stays_whole(self):
        assert compound_split("spark", self.WORDS) == ["spark"]

    def test_prefers_fewest_parts(self):
        ws = frozenset({"data", "base", "databases", "data", "bases"})
        assert compound_split("databases", ws, keep_original=False) == ["databases"]

    def test_analyzer_chain(self):
        an = make_compound_analyzer(self.WORDS)
        toks, pos = an("the notebook database")
        # notebook -> note+book at pos 1; database -> data+base at pos 2
        assert toks == ["note", "book", "data", "base"]
        assert pos == [1, 1, 2, 2]


class TestSimpleTokenizers:
    def test_id(self):
        from whoosh_spark.analysis.analyzers import analyze_id
        assert analyze_id("http://Example.com/A?b=1") == (["http://Example.com/A?b=1"], [0])
        assert analyze_id("") == ([], [])

    def test_keyword(self):
        from whoosh_spark.analysis.analyzers import analyze_keyword
        assert analyze_keyword("Red  GREEN blue") == (["red", "green", "blue"], [0, 1, 2])

    def test_comma(self):
        from whoosh_spark.analysis.analyzers import analyze_comma
        assert analyze_comma("a, b ,c,,") == (["a", "b", "c"], [0, 1, 2])

    def test_path(self):
        from whoosh_spark.analysis.analyzers import analyze_path
        toks, pos = analyze_path("/usr/local/bin")
        assert toks == ["/usr", "/usr/local", "/usr/local/bin"]
        assert pos == [0, 1, 2]
