"""Thesaurus (upstream ``whoosh.lang.wordnet`` analog): prolog parse,
synonym lookup, parquet persistence roundtrip, and query expansion."""

import pytest

from whoosh_spark.analysis.wordnet import Thesaurus

WN_LINES = [
    "s(100001740,1,'entity',n,1,11).",
    "s(100002137,1,'thing',n,12,0).",
    "s(100002137,2,'entity',n,2,0).",
    "s(100002452,1,'object',n,1,51).",
    "s(100002452,2,'thing',n,1,51).",
    "s(100003009,1,'o''clock',r,1,0).",       # prolog '' escape
    "s(100003100,1,'physical object',n,1,0).",  # multiword kept verbatim
    "sk(100001740,1,'entity%1:03:00::').",      # non-synset line ignored
    "g(100001740,'that which is perceived').",
]


@pytest.fixture(scope="module")
def thes():
    return Thesaurus.from_file(WN_LINES)


def test_parse_and_synonyms(thes):
    # 'thing' sits in two synsets: {entity,thing} and {object,thing} —
    # synonyms are the union minus the word itself
    assert thes.synonyms("thing") == ["entity", "object"]
    assert thes.synonyms("entity") == ["thing"]
    assert thes.synonyms("o'clock") == []          # escape folded back
    assert thes.synonyms("physical object") == []  # multiword parsed
    assert thes.synonyms("missing") == []


def test_expansion_and_case(thes):
    assert thes.expansion("THING") == ["entity", "object", "thing"]
    assert thes.expansion("zzz") == ["zzz"]


def test_query_shape(thes):
    from whoosh_spark.query import ast as Q

    q = thes.query("thing", boost=2.0)
    assert isinstance(q, Q.Or) and q.boost == 2.0
    assert sorted(t for c in q.children for t in c.terms()) == [
        "entity", "object", "thing"]


def test_storage_roundtrip(spark, tmp_path):
    t = Thesaurus.from_file(WN_LINES)
    path = str(tmp_path / "thesaurus")
    t.to_storage(spark, path)
    t2 = Thesaurus.from_storage(spark, path)
    assert t2.w2s == t.w2s and t2.s2w == t.s2w
    assert t2.synonyms("thing") == ["entity", "object"]


def test_expanded_search_end_to_end(spark, sf0001_documents):
    # synonym-expanded search == explicit Or over the same expansion set
    from whoosh_spark import InvertedIndex, Searcher
    from whoosh_spark.query import ast as Q

    t = Thesaurus()
    for sid, w in ((1, "data"), (1, "value"), (1, "information")):
        t.add(sid, w)
    s = Searcher(InvertedIndex.build(sf0001_documents))
    got = s.search(t.query("data"), limit=10).collect()
    want = s.search(
        Q.Or([Q.Term("data"), Q.Term("information"), Q.Term("value")]),
        limit=10).collect()
    assert [(r.doc_id, r.score) for r in got] == \
        [(r.doc_id, r.score) for r in want]
    assert got  # 'information' missing from the corpus matches nothing
