"""TimeLimit partial results (``src/whoosh/collectors.py::TimeLimitCollector
≈L700``): upstream raises TimeLimitError but keeps the rows collected so
far; the distributed restatement keeps whole completed doc-space chunks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import (Searcher, TimeLimitError,
                                 collect_chunked_with_deadline)


@pytest.fixture(scope="module")
def searcher(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return Searcher(InvertedIndex.build(docs))


def test_partial_mode_complete_run_is_exact(searcher):
    """With a generous deadline, partial mode returns EXACTLY the normal
    top-k (global stats, per-chunk top-k merge is lossless)."""
    q = Q.Or([Q.Term("data"), Q.Term("vector")])
    normal = [(int(r["doc_id"]), round(float(r["score"]), 9))
              for r in searcher.search(q, limit=10, optimize=False).collect()]
    part = [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in searcher.search_with_timeout(
                q, timelimit=300.0, limit=10, partial=True, chunks=4)]
    assert part == normal


def test_partial_on_expiry_carries_completed_chunks(spark):
    """Deterministic mid-run expiry: chunk 0 and 1 are instant, chunk 2
    sleeps past the deadline — the error must carry exactly the first two
    chunks' merged rows."""
    pdf = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(12)], "doc_id long, score double")

    def _slowify(doc_id, score):
        import time
        if (doc_id % 4 == 2).any():
            time.sleep(8)
        return score

    slowify = F.pandas_udf(_slowify, "double")

    scores = pdf.select("doc_id", slowify("doc_id", "score").alias("score"))
    with pytest.raises(TimeLimitError) as ei:
        collect_chunked_with_deadline(scores, timelimit=4.0, limit=5,
                                      chunks=4)
    err = ei.value
    assert err.chunks_done == 2 and err.chunks == 4
    got = [(int(r["doc_id"]), float(r["score"])) for r in err.partial]
    # chunks 0 and 1 = doc_ids {0,4,8} and {1,5,9}, merged by score desc
    assert got == [(0, 100.0), (1, 99.0), (4, 96.0), (5, 95.0), (8, 92.0)]


def test_zero_deadline_yields_empty_partial(searcher):
    with pytest.raises(TimeLimitError) as ei:
        searcher.search_with_timeout(Q.Term("data"), timelimit=1e-9,
                                     limit=5, partial=True, chunks=4)
    # the evaluate() planning scope itself may expire (no .partial yet) or
    # the first chunk does (partial attached, empty)
    assert getattr(ei.value, "partial", []) == []


def test_partial_mode_honors_search_kwargs(searcher):
    """Regression (round-3 review): partial mode must apply the full search
    option surface (here: filter), not silently drop **kw."""
    q = Q.Term("data")
    flt = "doc_id % 2 = 0"
    normal = [(int(r["doc_id"]), round(float(r["score"]), 9))
              for r in searcher.search(q, limit=10, optimize=False,
                                       filter=Q.Filter(flt)).collect()]
    part = [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in searcher.search_with_timeout(
                q, timelimit=300.0, limit=10, partial=True, chunks=4,
                filter=Q.Filter(flt))]
    assert part == normal
    assert all(d % 2 == 0 for d, _ in part)


def test_partial_mode_rejects_order_changing_kwargs(searcher):
    with pytest.raises(ValueError, match="sortedby"):
        searcher.search_with_timeout(Q.Term("data"), 30.0, partial=True,
                                     sortedby="n_chars")


def test_zero_chunks_rejected(spark):
    df = spark.createDataFrame([(0, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="chunks"):
        collect_chunked_with_deadline(df, 10.0, 5, chunks=0)


def test_default_mode_still_raises_without_partial(searcher):
    with pytest.raises(TimeLimitError) as ei:
        searcher.search_with_timeout(Q.Term("data"), timelimit=1e-9, limit=5)
    assert not hasattr(ei.value, "partial")
