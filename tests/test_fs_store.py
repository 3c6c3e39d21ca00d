"""Scheme-dispatched store I/O: the same write/load/delete/compact cycle the
local-path tests run, but through ``file://`` URIs so every control-plane
file operation (manifest swap, build log, overlay probe) goes through the
Hadoop FileSystem JVM API — the code path an ``hdfs://`` or ``s3a://``
deployment would take (fs.py module docstring documents the S3 rename
caveat)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from whoosh_spark import fs as FS
from whoosh_spark import store
from whoosh_spark.execution.evaluate import Evaluator
from whoosh_spark.query import ast as Q

DOCS = [(i, f"data query row{i % 3} scan", "en", f"s{i % 2}", 20) for i in range(30)]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_fs_primitives_over_uri(spark, tmp_path):
    base = f"file://{tmp_path}/ctl"
    p = FS.join(base, "x.txt")
    assert FS.read_text(p) is None
    FS.write_text_atomic(p, "hello\n")
    assert FS.read_text(p) == "hello\n"
    FS.write_text_atomic(p, "swapped\n")  # overwrite via delete+rename
    assert FS.read_text(p) == "swapped\n"
    FS.append_text(p, "line2\n")
    assert FS.read_text(p) == "swapped\nline2\n"
    assert FS.exists(p) and not FS.exists(FS.join(base, "nope"))
    FS.makedirs(FS.join(base, "d"))
    assert not FS.isdir_nonempty(FS.join(base, "d"))
    FS.write_text_atomic(FS.join(base, "d", "f"), "x")
    assert FS.isdir_nonempty(FS.join(base, "d"))
    FS.rename(FS.join(base, "d"), FS.join(base, "d2"))
    assert FS.isdir_nonempty(FS.join(base, "d2"))
    FS.rmtree(FS.join(base, "d2"))
    assert not FS.exists(FS.join(base, "d2"))


def test_store_cycle_over_file_uri(spark, docs, tmp_path):
    path = f"file://{tmp_path}/ix"
    manifest = store.write_index(docs, path, chunks_per_commit=4)
    assert manifest["n_docs"] == 30
    # control-plane files really are there (via the URI branch)
    assert FS.read_text(FS.join(path, store.MANIFEST)) is not None
    log = store.build_log(path)
    assert any(r["phase"] == "analyze" for r in log)
    assert any(r["phase"] == "merge" for r in log)

    ix = store.load_index(spark, path)
    ids = sorted(r["doc_id"] for r in Evaluator(ix).evaluate(Q.Term("data")).collect())
    assert ids == list(range(30))

    # soft delete via overlay, then purge-compact — both over the URI
    store.delete_documents(spark, path, doc_ids=[0, 1, 2])
    ix2 = store.load_index(spark, path)
    ids2 = sorted(r["doc_id"] for r in Evaluator(ix2).evaluate(Q.Term("data")).collect())
    assert ids2 == list(range(3, 30))

    store.compact_index(spark, path, purge_deleted=True)
    ix3 = store.load_index(spark, path)
    assert ix3.deleted is None
    ids3 = sorted(r["doc_id"] for r in Evaluator(ix3).evaluate(Q.Term("data")).collect())
    assert ids3 == list(range(3, 30))
    n, _ = ix3.global_stats()
    assert n == 27  # physically purged


def test_resume_over_file_uri(spark, docs, tmp_path):
    path = f"file://{tmp_path}/ix"
    partial = store.write_index(docs, path, chunk_bits=3, chunks_per_commit=1,
                                max_batches=2)
    assert partial["status"] == "partial"
    done_before = set(store.completed_chunks(path))
    assert len(done_before) == 2
    manifest = store.write_index(docs, path, chunk_bits=3, chunks_per_commit=1)
    assert manifest["n_docs"] == 30
    # resumed build reused the committed chunks (no duplicate batch ids)
    batches = [r["batch"] for r in store.build_log(path) if r["phase"] == "analyze"]
    assert len(batches) == len(set(batches))
