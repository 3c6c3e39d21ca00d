"""Exact-substring duplication spans (windowed-hash suffix-array analog)."""

from __future__ import annotations

import duckdb
import pytest

from whoosh_spark.oracle.pipeline_sql import duplicated_spans_sql
from whoosh_spark.pipeline.dedup import duplicated_spans


def _spans(spark, rows, n, min_count=2):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_spans(df, n=n, min_count=min_count)
    return sorted((int(r["doc_id"]), int(r["start_tok"]), int(r["end_tok"]),
                   int(r["span_tokens"])) for r in out.collect())


def test_cross_doc_exact_substring(spark):
    shared = " ".join(f"s{i}" for i in range(6))
    rows = [
        (0, "a b c " + shared + " x y"),
        (1, "p q " + shared + " r"),
        (2, "u v w only unique tokens here zz"),
    ]
    got = _spans(spark, rows, n=6)
    # doc 0: shared at tokens 3..9; doc 1: at 2..8; doc 2: nothing
    assert got == [(0, 3, 9, 6), (1, 2, 8, 6)]


def test_within_doc_repeat_counts(spark):
    block = " ".join(f"b{i}" for i in range(5))
    rows = [(7, block + " gap1 gap2 gap3 gap4 gap5 gap6 " + block)]
    got = _spans(spark, rows, n=5)
    # the 5-gram block occurs twice inside ONE doc → both occurrences flagged
    assert got == [(7, 0, 5, 5), (7, 11, 16, 5)]


def test_overlapping_windows_merge_to_maximal_span(spark):
    long_shared = " ".join(f"t{i}" for i in range(10))
    rows = [(1, long_shared + " tailone tailtwo"),
            (2, "head " + long_shared)]
    got = _spans(spark, rows, n=4)
    # every 4-window inside the 10-token run duplicates → ONE maximal span
    assert got == [(1, 0, 10, 10), (2, 1, 11, 10)]


def test_short_docs_skipped(spark):
    rows = [(1, "one two three"), (2, "one two three")]
    assert _spans(spark, rows, n=4) == []
    # at n=3 the whole doc is the duplicated span
    assert _spans(spark, rows, n=3) == [(1, 0, 3, 3), (2, 0, 3, 3)]


@pytest.mark.parametrize("n", [5, 12])
def test_oracle_agreement_sf0001(spark, n):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sdf = (duplicated_spans(docs, n=n)
           .orderBy("doc_id", "start_tok").toPandas())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    odf = con.execute(duplicated_spans_sql(n=n)).fetchdf()
    assert len(sdf) == len(odf) > 0
    assert sdf.reset_index(drop=True).astype("int64").equals(
        odf.reset_index(drop=True).astype("int64"))
