"""Persisted multi-field schema index — the ``create_in(dir, Schema(...))``
/ ``open_dir`` analog (``src/whoosh/index.py::create_in ≈L60``): per-field
sub-indexes under fields/<name>/, ONE shared stored table, schema committed
last."""

from __future__ import annotations

import json
import os

import pytest

from whoosh_spark import FieldSpec, MultiFieldIndex, Searcher, store
from whoosh_spark.query import ast as Q
from whoosh_spark.query.parser import parse_query


@pytest.fixture(scope="module")
def mf_docs(spark):
    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(int(r["doc_id"]), " ".join((r["text"] or "").split()[:6]),
             r["text"], r["lang"]) for r in
            raw.select("doc_id", "text", "lang").collect()]
    return spark.createDataFrame(
        rows, "doc_id long, title string, body string, lang string")


FIELDS = {"title": FieldSpec("title", boost=2.0),
          "body": FieldSpec("body")}


@pytest.fixture(scope="module")
def mem_mix(mf_docs):
    return MultiFieldIndex.build(mf_docs, fields=FIELDS,
                                 default_field="body")


@pytest.fixture(scope="module")
def disk_path(tmp_path_factory, mf_docs):
    path = str(tmp_path_factory.mktemp("mfix") / "ix")
    store.write_multifield_index(mf_docs, path, FIELDS,
                                 default_field="body")
    return path


def _hits(mix, q, **kw):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in Searcher(mix).search(q, limit=10, **kw).collect()]


QUERIES = [
    Q.Term("data"),
    Q.Term("data", fieldname="title"),
    Q.And([Q.Term("data", fieldname="title"), Q.Term("query")]),
    Q.Phrase(["big", "data"], fieldname="body"),
]


@pytest.mark.parametrize("q", QUERIES, ids=[repr(q)[:40] for q in QUERIES])
def test_roundtrip_matches_in_memory(spark, mem_mix, disk_path, q):
    mix = store.load_multifield_index(spark, disk_path)
    assert _hits(mix, q) == _hits(mem_mix, q)


def test_parsed_multifield_query(spark, mem_mix, disk_path):
    mix = store.load_multifield_index(spark, disk_path)
    q = parse_query("title:data AND body:query", fields={"title", "body"})
    assert _hits(mix, q) == _hits(mem_mix, q)


def test_shared_stored_fields(spark, disk_path):
    mix = store.load_multifield_index(spark, disk_path)
    rows = Searcher(mix).search(Q.Term("data"), limit=3,
                                with_stored=["lang"]).collect()
    assert rows and all(r["lang"] is not None for r in rows)
    # per-field sub-index dirs must NOT duplicate the stored table
    assert not os.path.exists(os.path.join(disk_path, "fields", "body",
                                           "docs"))


def test_glob_schema_persisted_concrete(spark, tmp_path, mf_docs):
    path = str(tmp_path / "ix")
    store.write_multifield_index(mf_docs, path, {"*itle": FieldSpec("*")},
                                 default_field="title")
    schema = json.loads(open(os.path.join(path, "_schema.json")).read())
    assert set(schema["fields"]) == {"title"}
    assert schema["fields"]["title"]["source"] == "title"
    mix = store.load_multifield_index(spark, path)
    assert sorted(mix.indexes) == ["title"]


def test_field_pairs_spec_attaches_accelerator(spark, tmp_path, mf_docs):
    path = str(tmp_path / "ix")
    store.write_multifield_index(
        mf_docs, path,
        {"title": FieldSpec("title"), "body": FieldSpec("body", pairs=True)},
        default_field="body")
    mix = store.load_multifield_index(spark, path)
    assert mix.indexes["body"].pairs is not None
    assert mix.indexes["title"].pairs is None
    mem = MultiFieldIndex.build(mf_docs, fields=FIELDS,
                                default_field="body")
    q = Q.Phrase(["big", "data"], fieldname="body")
    assert _hits(mix, q) == _hits(mem, q)


def test_staleness_and_refresh_reattaches_stored(spark, tmp_path, mf_docs):
    path = str(tmp_path / "ix")
    store.write_multifield_index(mf_docs, path, FIELDS,
                                 default_field="body")
    mix = store.load_multifield_index(spark, path)
    assert mix.up_to_date()
    store.delete_documents(spark, os.path.join(path, "fields", "body"), [0])
    assert not mix.up_to_date()
    fresh = mix.refresh()
    assert fresh.up_to_date()
    # the reopened sub-index has no docs/ dir of its own — the family's
    # shared stored table must be re-attached
    assert fresh.indexes["body"].docs is not None
    rows = Searcher(fresh).search(Q.Term("data"), limit=3,
                                  with_stored=["lang"]).collect()
    assert rows and 0 not in [int(r["doc_id"]) for r in rows]


def test_missing_schema_raises_with_hint(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="_schema.json"):
        store.load_multifield_index(spark, str(tmp_path / "nope"))
