"""Plain-text debug codec (codec/plaintext.py) — faithful, queryable
round-trip of an index through the human-readable text layout
(upstream ``codec/plaintext.py`` ≈450 LoC, debug codec)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from whoosh_spark.codec.plaintext import dump_plaintext, load_plaintext
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


@pytest.fixture(scope="module")
def small_docs(spark, sf0001_documents):
    return sf0001_documents.where(F.col("doc_id") < 150).cache()


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in df.select("doc_id", "score").collect()]


def test_roundtrip_rank_identity(spark, small_docs, tmp_path):
    ix = InvertedIndex.build(small_docs)
    path = str(tmp_path / "pt")
    header = dump_plaintext(ix, path)
    assert header["n_docs"] == 150
    back = load_plaintext(spark, path)
    for q in (Q.Term("data"),
              Q.And([Q.Term("big"), Q.Term("data")]),
              Q.Phrase(["big", "data"]),
              Q.Or([Q.Term("query"), Q.Term("vector")], minmatch=1)):
        a = _rows(Searcher(ix).search(q, limit=15, optimize=False))
        b = _rows(Searcher(back).search(q, limit=15, optimize=False))
        assert a == b, q
    # stats round-trip exactly (df/cf/max_weight feed BM25 + WAND)
    cols = ["field", "term", "df", "cf", "max_weight"]
    sa = sorted(map(tuple, ix.term_stats.select(*cols).collect()))
    sb = sorted(map(tuple, back.term_stats.select(*cols).collect()))
    assert sa == sb


def test_text_is_greppable(spark, small_docs, tmp_path):
    ix = InvertedIndex.build(small_docs)
    path = str(tmp_path / "pt2")
    dump_plaintext(ix, path)
    line = (spark.read.text(f"{path}/postings")
            .where(F.col("value").startswith("text\tdata\t"))
            .limit(1).collect()[0]["value"])
    parts = line.split("\t")
    assert len(parts) == 5
    assert parts[0] == "text" and parts[1] == "data"
    assert int(parts[2]) >= 0 and int(parts[3]) >= 1
    assert all(p.isdigit() for p in parts[4].split(","))
    hdr = json.loads(open(f"{path}/header.json").read())
    assert hdr["codec"].startswith("whoosh-spark-plaintext/")


def test_roundtrip_frequency_format(spark, small_docs, tmp_path):
    ix = InvertedIndex.build(small_docs, format="frequency")
    path = str(tmp_path / "ptf")
    dump_plaintext(ix, path)
    back = load_plaintext(spark, path)
    assert back.posting_format == "frequency"
    a = _rows(Searcher(ix).search(Q.Term("data"), limit=10, optimize=False))
    b = _rows(Searcher(back).search(Q.Term("data"), limit=10, optimize=False))
    assert a == b
    with pytest.raises(ValueError, match="does not store positions"):
        back.postings(["data"], with_positions=True)


def test_load_missing_header(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        load_plaintext(spark, str(tmp_path / "nope"))
