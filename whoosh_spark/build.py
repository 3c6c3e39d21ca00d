"""Index-build dataflow: docs → analyze → explode → (term,doc) agg → blocks + stats.

Spark restatement of Whoosh's write path (SURVEY.md §3.1):

    [scan docs]                                  (parquet, column-pruned)
    → [analyze_udf + explode]                    (narrow, Arrow-batched)
    → [groupBy(term, doc_id) agg tf/positions]   (partial+final hash agg)
    → [groupBy(term, doc_id >> bucket_bits)]     (the ONE wide shuffle)
    → [applyInPandas block encode]               (numpy kernels, ≤4096 rows/group)
    + [term_stats / field_stats aggregates]      (partial+final agg, skew-free)

Skew strategy (north_rule): the block-build group key includes the doc-range
bucket, so a hot term's postings land in many bounded-size groups instead of
one giant one — equivalent to salting, but the "salt" is the doc range, which
makes block boundaries deterministic (partitioning-invariant) and keeps
blocks range-disjoint so they merge by simple ordering (no second reduce).
Whoosh's MpWriter (``src/whoosh/multiproc.py::MpWriter ≈L150``) proves the
algebra commutes; our tests assert 1≡8≡32-partition builds bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_spark.analysis.udfs import analyze_udf, quantize_len_udf
from whoosh_spark.codec.blocks import BLOCKS_SCHEMA, encode_term_bucket
from whoosh_spark.config import DOC_BUCKET_BITS, TEXT_FIELD


def analyzed_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, tokens, positions, len_raw, dl) — one row per input doc."""
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_text"))
        .withColumn("a", analyze_udf(F.col("_text")))
        .select(
            "doc_id",
            F.col("a.tokens").alias("tokens"),
            F.col("a.positions").alias("positions"),
            F.size("a.tokens").alias("len_raw"),
        )
        .withColumn("dl", quantize_len_udf(F.col("len_raw")))
    )


def doc_lengths(analyzed: DataFrame) -> DataFrame:
    return analyzed.select("doc_id", "len_raw", "dl")


def flat_postings(analyzed: DataFrame, field: str = TEXT_FIELD) -> DataFrame:
    """(field, term, doc_id, tf, positions, dl) — the logical posting list.

    Positions keep tokenizer ordinals (stop gaps preserved).  dl is carried
    through from analysis so the block encoder never needs a doc-side join
    (SURVEY.md §2.3 — BM25 per-block min_len metadata).
    """
    tok = analyzed.select(
        "doc_id",
        "dl",
        F.explode(F.arrays_zip("tokens", "positions")).alias("tp"),
    ).select(
        "doc_id",
        "dl",
        F.col("tp.tokens").alias("term"),
        F.col("tp.positions").alias("pos"),
    )
    return (
        tok.groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.first("dl").alias("dl"),
        )
        .withColumn("field", F.lit(field))
        .select("field", "term", "doc_id", "tf", "positions", "dl")
    )


def _encode_group(key, pdf):
    import pandas as pd

    field, term, bucket = key
    rows = encode_term_bucket(
        field,
        term,
        bucket,
        pdf["doc_id"].to_numpy(),
        pdf["tf"].to_numpy(),
        pdf["dl"].to_numpy(),
        [list(p) for p in pdf["positions"]],
    )
    return pd.DataFrame(rows)


def posting_blocks(postings: DataFrame) -> DataFrame:
    """Encode flat postings into the persisted block table (BLOCKS_SCHEMA)."""
    bucketed = postings.withColumn(
        "bucket", F.shiftright(F.col("doc_id"), DOC_BUCKET_BITS)
    )
    return bucketed.groupBy("field", "term", "bucket").applyInPandas(
        _encode_group, schema=BLOCKS_SCHEMA
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """TermInfo analog (``src/whoosh/reading.py::TermInfo ≈L40``)."""
    return postings.groupBy("field", "term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.max("tf").cast("double").alias("max_weight"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def field_stats(lengths: DataFrame, field: str = TEXT_FIELD) -> DataFrame:
    """doc_count + total/min/max raw length; avgdl = total_len/doc_count.

    avgdl uses exact raw totals while per-doc dl is byte-quantized — matching
    Whoosh (writer accumulates exact totals; per-doc lengths round-trip
    through length_to_byte; SURVEY.md §2.3).
    """
    return lengths.agg(
        F.lit(field).alias("field"),
        F.count("*").cast("long").alias("doc_count"),
        F.sum("len_raw").cast("long").alias("total_len"),
        F.min("len_raw").cast("int").alias("min_len"),
        F.max("len_raw").cast("int").alias("max_len"),
    )
