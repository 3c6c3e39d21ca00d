"""Per-row language-routed analysis (``analyzer="lang_routed"``): each
document goes through its own ``lang_<code>`` chain inside the one analyze
pass; unrouted codes fall back to the standard chain.  Upstream analog:
``LanguageAnalyzer`` (``src/whoosh/analysis/analyzers.py ≈L220``) chosen
per corpus language instead of per index."""

import pytest
from pyspark.sql import functions as F

from whoosh_spark import InvertedIndex, Searcher
from whoosh_spark import build as B
from whoosh_spark.query.parser import parse_query


@pytest.fixture(scope="module")
def routed_analyzed(sf0001_documents):
    return B.analyzed_docs(sf0001_documents, lang_col="lang",
                           analyzer="lang_routed").cache()


def _rows_by_id(df):
    return {r["doc_id"]: (sorted(r["terms"]), r["len_raw"])
            for r in df.collect()}


@pytest.mark.parametrize("lang", ["en", "de", "es", "fr"])
def test_routed_equals_dedicated_chain(sf0001_documents, routed_analyzed,
                                       lang):
    # routed output for lang-X docs ≡ the dedicated lang_X chain's output
    sub = sf0001_documents.where(F.col("lang") == lang)
    ids = [r["doc_id"] for r in sub.select("doc_id").collect()]
    dedicated = _rows_by_id(
        B.analyzed_docs(sub, analyzer=f"lang_{lang}"))
    routed = _rows_by_id(
        routed_analyzed.where(F.col("doc_id").isin(ids)))
    assert routed == dedicated and len(routed) > 0


def test_unrouted_lang_uses_standard_chain(sf0001_documents,
                                           routed_analyzed):
    # zh has no registered chain -> inlined StandardAnalyzer fallback
    sub = sf0001_documents.where(F.col("lang") == "zh")
    ids = [r["doc_id"] for r in sub.select("doc_id").collect()]
    standard = _rows_by_id(B.analyzed_docs(sub, analyzer="standard"))
    routed = _rows_by_id(
        routed_analyzed.where(F.col("doc_id").isin(ids)))
    assert routed == standard and len(routed) > 0


def test_routed_query_hits_only_matching_stems(spark, sf0001_documents):
    # "orders" -> de stem "ord": only German-chain docs produce that token
    ix = InvertedIndex.build(sf0001_documents, analyzer="lang_routed",
                             lang_col="lang")
    s = Searcher(ix)
    hits = [r["doc_id"] for r in s.search(
        parse_query("orders", analyzer="lang_de"), limit=50).collect()]
    assert hits
    langs = {r["lang"] for r in sf0001_documents.where(
        F.col("doc_id").isin(hits)).select("lang").collect()}
    assert langs == {"de"}


def test_routed_lang_col_survives_compact_and_upsert(spark,
                                                     sf0001_documents,
                                                     tmp_path):
    # review regression: compact_index used to drop the manifest's
    # lang_col, breaking later upserts/writer commits on routed indexes
    import json

    from whoosh_spark import store

    path = str(tmp_path / "routed_compact")
    store.write_index(sf0001_documents.limit(200), path,
                      analyzer="lang_routed", lang_col="lang")
    store.compact_index(spark, path)
    man = json.loads(open(f"{path}/manifest.json").read())
    assert man["analyzer"] == "lang_routed" and man["lang_col"] == "lang"
    new = sf0001_documents.where(F.col("doc_id") >= 400).limit(20)
    store.upsert_documents(spark, path, new, key="doc_id")
    s = Searcher(store.load_index(spark, path))
    assert s.search(parse_query("order", analyzer="lang_de"),
                    limit=5).count() > 0


def test_routed_fieldspec_multifield(spark, sf0001_documents):
    # FieldSpec(analyzer="lang_routed") routes per-row via the default
    # "lang" column — schema-declared multilingual fields, upstream's
    # per-field analyzer declaration composed with per-row routing
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex

    mf = MultiFieldIndex.build(
        sf0001_documents,
        fields={"text": FieldSpec(source="text", analyzer="lang_routed")})
    q = parse_query("orders", analyzer="lang_de", fields=["text"])
    hits = [r["doc_id"]
            for r in Searcher(mf).search(q, limit=20).collect()]
    assert hits
    langs = {r["lang"] for r in sf0001_documents.where(
        F.col("doc_id").isin(hits)).select("lang").collect()}
    assert langs == {"de"}


def test_routed_persisted_roundtrip(spark, sf0001_documents, tmp_path):
    from whoosh_spark import store

    path = str(tmp_path / "routed_ix")
    man = store.write_index(sf0001_documents, path,
                            analyzer="lang_routed", lang_col="lang")
    assert man["analyzer"] == "lang_routed" and man["lang_col"] == "lang"
    ix = store.load_index(spark, path)
    s = Searcher(ix)
    mem = Searcher(InvertedIndex.build(
        sf0001_documents, analyzer="lang_routed", lang_col="lang"))
    q = parse_query("queries", analyzer="lang_en")
    got = [(r["doc_id"], round(r["score"], 6))
           for r in s.search(q, limit=10).collect()]
    want = [(r["doc_id"], round(r["score"], 6))
            for r in mem.search(q, limit=10).collect()]
    assert got == want and len(got) == 10
