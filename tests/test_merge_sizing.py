"""The data-volume-sized merge shuffle (config.MERGE_PARTITION_BYTES) is a
pure PERFORMANCE knob: block content must be bit-identical at any merge
partition count, and the write path must record the chosen count in the
build lineage so soak runs can attribute merge cost."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from whoosh_spark import build as B
from whoosh_spark import fs as FS
from whoosh_spark import store


def _block_fingerprint(blocks_df):
    """Order-insensitive content hash over every column of the block table."""
    cols = [c for c in blocks_df.columns]
    row = (
        blocks_df.select(
            F.md5(F.concat_ws("\x1f", *[F.base64(F.col(c).cast("binary"))
                                        if t == "binary" else F.col(c).cast("string")
                                        for c, t in blocks_df.dtypes])).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)")).alias("s"),
             F.count("*").alias("n"))
        .collect()[0]
    )
    return (str(row["s"]), int(row["n"]), tuple(cols))


@pytest.mark.parametrize("n_part", [1, 3, 17])
def test_blocks_identical_at_any_merge_partition_count(spark, sf0001_documents, n_part):
    analyzed = B.analyzed_docs(sf0001_documents.select("doc_id", "text"))
    base = _block_fingerprint(B.posting_blocks_from_analyzed(analyzed))
    got = _block_fingerprint(B.posting_blocks_from_analyzed(analyzed, n_part=n_part))
    assert got == base


def test_write_index_records_merge_sizing(spark, sf0001_documents, tmp_path):
    path = str(tmp_path / "ix")
    store.write_index(sf0001_documents.select("doc_id", "text"), path)
    recs = [json.loads(l) for l in open(os.path.join(path, "_build_log.jsonl"))]
    merge = [r for r in recs if r.get("phase") == "merge"][-1]
    assert merge["merge_partitions"] >= 1
    assert merge["analyzed_bytes"] == FS.dir_bytes(os.path.join(path, "analyzed"))
    # at test scale the conf-derived floor must win (no 1-partition collapse)
    assert merge["merge_partitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions"))


def test_env_override_wins(spark, sf0001_documents, tmp_path, monkeypatch):
    monkeypatch.setenv("WHOOSH_MERGE_PARTITIONS", "2")
    path = str(tmp_path / "ix")
    store.write_index(sf0001_documents.select("doc_id", "text"), path)
    recs = [json.loads(l) for l in open(os.path.join(path, "_build_log.jsonl"))]
    merge = [r for r in recs if r.get("phase") == "merge"][-1]
    assert merge["merge_partitions"] == 2


def test_dir_bytes_local(tmp_path):
    d = tmp_path / "x"
    d.mkdir()
    (d / "a.bin").write_bytes(b"12345")
    sub = d / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"6789")
    assert FS.dir_bytes(str(d)) == 9
    assert FS.dir_bytes(str(tmp_path / "absent")) == 0
