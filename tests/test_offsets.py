"""Characters-format round-2 additions: the analyzer span mirror
(``analyze_text_spans``), the persisted ``char_offsets`` index segment
(``write_index(store_offsets=True)`` → ``load_index``), and predicate
pushdown into the segment's parquet scan.  Complements tests/test_chars.py,
which covers the in-memory side table and ``highlights_from_index``."""

from __future__ import annotations

import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from whoosh_spark.analysis.analyzers import analyze_text, analyze_text_spans
from whoosh_spark.chars import (char_offsets, read_char_offsets,
                                write_char_offsets)

SF_DIR = "/root/testdata/sf0.001"


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None, derandomize=True)
def test_spans_mirror_analyze_text(text):
    spans = analyze_text_spans(text)
    tokens, _ = analyze_text(text)
    assert [t for t, _, _ in spans] == tokens
    for t, s, e in spans:
        assert text[s:e].lower() == t


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_persisted_segment_roundtrip_and_pushdown(spark, tmp_path):
    path = str(tmp_path / "ix")
    docs = _docs(spark).limit(50)
    write_char_offsets(docs, path)
    offsets = read_char_offsets(spark, path)
    sub = offsets.where((F.col("term") == "data") & F.col("doc_id").isin(0, 1, 2, 3))
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "term" in plan and "doc_id" in plan
    key = lambda df: {(r["term"], int(r["doc_id"])):
                      (list(r["starts"]), list(r["ends"]))
                      for r in df.collect()}
    mem = key(char_offsets(docs).where(
        (F.col("term") == "data") & F.col("doc_id").isin(0, 1, 2, 3)))
    disk = key(sub)
    assert disk == mem and disk  # non-empty on this corpus


def test_write_index_store_offsets_flag(spark, tmp_path):
    from whoosh_spark.store import load_index, write_index

    path = str(tmp_path / "ix2")
    docs = _docs(spark).limit(40)
    write_index(docs, path, store_offsets=True)
    ix = load_index(spark, path)
    assert ix.char_offsets is not None
    assert set(ix.char_offsets.columns) == {"term", "doc_id", "starts", "ends"}
    # segment agrees with a direct re-analysis on one doc
    row = docs.select("doc_id", "text").where(F.col("doc_id") == 0).collect()[0]
    want = {}
    for t, s, e in analyze_text_spans(row["text"]):
        want.setdefault(t, []).append((s, e))
    got = {r["term"]: list(zip(r["starts"], r["ends"]))
           for r in ix.char_offsets.where(F.col("doc_id") == 0).collect()}
    assert got == want
    # an index built WITHOUT the flag loads with the segment unset
    path2 = str(tmp_path / "ix3")
    write_index(docs, path2)
    assert load_index(spark, path2).char_offsets is None


def test_segment_lifecycle_rebuild_upsert_purge(spark, tmp_path):
    """The Characters segment must never go stale: a rebuild without the
    flag drops it, an upsert extends it with the new docs' spans, and a
    purge compaction removes the purged docs' rows."""
    from whoosh_spark.store import (compact_index, load_index,
                                    upsert_documents, write_index)

    path = str(tmp_path / "ix4")
    docs = _docs(spark).limit(30)
    write_index(docs, path, store_offsets=True)
    assert load_index(spark, path).char_offsets is not None

    # upsert: a changed doc (same url) gets a fresh doc_id WITH spans
    one = docs.where(F.col("doc_id") == 5).withColumn(
        "text", F.lit("zebra quux zebra"))
    upsert_documents(spark, path, one, key="doc_id")
    ix = load_index(spark, path)
    zeb = ix.char_offsets.where(F.col("term") == "zebra").collect()
    assert len(zeb) == 1 and list(zeb[0]["starts"]) == [0, 11]
    new_id = int(zeb[0]["doc_id"])
    assert new_id >= 30  # renumbered above the old max

    # purge: the soft-deleted old doc 5's rows leave the segment
    compact_index(spark, path, purge_deleted=True)
    ix = load_index(spark, path)
    ids = {int(r["doc_id"]) for r in
           ix.char_offsets.select("doc_id").distinct().collect()}
    assert 5 not in ids and new_id in ids

    # rebuild at the SAME path without the flag: stale segment dropped
    write_index(docs, path)
    assert load_index(spark, path).char_offsets is None
