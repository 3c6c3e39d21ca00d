"""MpWriter invariant (reference tests/test_mpwriter.py semantics,
SURVEY.md §5 item 3): building at 1, 8, and 32 input partitions must yield
IDENTICAL postings/blocks/term_stats/field_stats tables (order-insensitive)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark.index import InvertedIndex


def _table_hash(df, cols):
    """Order-insensitive content hash: xor-free sum of per-row hashes."""
    h = df.select(F.hash(*cols).cast("long").alias("h"))
    agg = h.agg(F.sum("h").alias("s"), F.count("*").alias("n")).collect()[0]
    return (agg["s"], agg["n"])


BLOCK_COLS = ["field", "term", "bucket", "blk", "n", "min_id", "max_id",
              "max_weight", "min_len", "w_const", "ids", "weights", "positions", "lens"]


@pytest.mark.parametrize("parts", [1, 8, 32])
def test_build_partition_invariance(spark, sf0001_documents, parts):
    base = InvertedIndex.build(sf0001_documents.repartition(4), cache=False)
    other = InvertedIndex.build(sf0001_documents.repartition(parts), cache=False)
    assert _table_hash(base.blocks, BLOCK_COLS) == _table_hash(other.blocks, BLOCK_COLS)
    ts_cols = ["field", "term", "df", "cf", "max_weight", "min_id", "max_id"]
    assert _table_hash(base.term_stats, ts_cols) == _table_hash(other.term_stats, ts_cols)
    assert base.field_stats.collect() == other.field_stats.collect()


def test_blocks_respect_size_and_ranges(spark, sf0001_documents):
    ix = InvertedIndex.build(sf0001_documents, cache=False)
    from whoosh_spark.config import BLOCK_SIZE, DOC_BUCKET_BITS

    bad = ix.blocks.where(
        (F.col("n") > BLOCK_SIZE)
        | (F.col("min_id") > F.col("max_id"))
        | (F.shiftright(F.col("min_id"), DOC_BUCKET_BITS) != F.col("bucket"))
        | (F.shiftright(F.col("max_id"), DOC_BUCKET_BITS) != F.col("bucket"))
    ).count()
    assert bad == 0


def test_term_stats_consistent_with_decoded_postings(spark, sf0001_documents):
    ix = InvertedIndex.build(sf0001_documents, cache=False)
    terms = ["data", "query", "vector"]
    posts = ix.postings(terms)
    got = {
        r["term"]: (r["df"], r["cf"])
        for r in posts.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf"))
        .collect()
    }
    exp = ix.stats_for_terms(terms)
    for t in terms:
        assert got[t] == (exp[t]["df"], exp[t]["cf"])
