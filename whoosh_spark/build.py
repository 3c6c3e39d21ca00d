"""Index-build dataflow: docs → analyze(+per-doc agg) → explode → blocks + stats.

Spark restatement of Whoosh's write path (SURVEY.md §3.1):

    [scan docs]                                  (parquet, column-pruned)
    → [mapInArrow analyze + per-doc (term,tf,positions) agg]   (narrow)
    → [explode arrays_zip]                       (narrow, JVM columnar)
    → [groupBy(term, doc_id >> bucket_bits) applyInArrow encode]
                                                 (the ONE wide shuffle)
    → [term_stats from block metadata]           (tiny agg over blocks)

Tokens of a document are doc-local, so the per-(term, doc) tf/position
aggregation happens inside the SAME CPython tokenizer loop — there is no
``groupBy(term, doc_id)`` shuffle at all (Whoosh's PostingPool sort becomes
a dict insert; the only network data movement is term-partitioning the
already-aggregated postings).

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

from whoosh_spark.analysis.udfs import ANALYZED_SCHEMA, analyze_batches_arrow
from pyspark.sql import types as T

from whoosh_spark.codec.blocks import (
    BLOCKS_SCHEMA,
    RUNS_SCHEMA_PA,
    build_runs_arrow,
    encode_group_arrow,
    encode_sorted_stream,
    merge_runs_stream,
)
from whoosh_spark.config import DOC_BUCKET_BITS, TEXT_FIELD

_PA_TO_SPARK = {"string": T.StringType(), "int64": T.LongType(),
                "int32": T.IntegerType(), "binary": T.BinaryType()}
RUNS_SCHEMA = T.StructType(
    [T.StructField(n, _PA_TO_SPARK[t]) for n, t in RUNS_SCHEMA_PA]
)


def routed_language_chains() -> dict:
    """``{lang_code: chain_fn}`` for every registered ``lang_<code>``
    analyzer (snowball registry import triggers the built-in family)."""
    import whoosh_spark.analysis.snowball  # noqa: F401  (registers chains)
    from whoosh_spark.analysis.analyzers import ANALYZERS

    return {name[5:]: fn for name, fn in ANALYZERS.items()
            if name.startswith("lang_")}


def analyzed_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  analyzer: str = "standard",
                  format: str = "positions",
                  analyzer_fn=None,
                  lang_col: str | None = None) -> DataFrame:
    """(doc_id, len_raw, dl, terms, tfs, positions) — one row per input doc.

    ``terms`` are the doc's distinct post-analysis tokens (first-occurrence
    order), ``tfs``/``positions`` parallel arrays; positions keep tokenizer
    ordinals (stop gaps preserved — Phrase semantics, SURVEY.md §2.2).
    ``analyzer`` names a chain from ``analysis.analyzers.ANALYZERS``
    (per-field Schema configuration); "standard" uses the inlined fast path.
    ``format`` names a posting Format (``formats.py``) deciding the per-
    posting payload (positions | frequency | existence | ... ).
    """
    if analyzer == "lang_routed":
        # per-row language routing (see udfs.make_routed_analyze_batches):
        # one analyze pass over the whole multilingual corpus, each doc
        # through its own lang_<code> chain, standard chain for unrouted
        # codes.  Query side picks a concrete chain per query
        # (parse_query(analyzer="lang_de") etc.)
        from whoosh_spark.analysis.udfs import make_routed_analyze_batches

        src = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_text"),
            F.col(lang_col or "lang").alias("_lang"),
        )
        out = src.mapInArrow(make_routed_analyze_batches(
            routed_language_chains()), schema=ANALYZED_SCHEMA)
        from whoosh_spark.formats import get_format

        return get_format(format).apply(out)
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_text")
    )
    if analyzer_fn is not None:
        # parameterized chain (e.g. the hot-filtered pair extractor, whose
        # hot set comes from another index's stats) — ``analyzer`` stays
        # the RECORDED name, the callable does the work
        from whoosh_spark.analysis.udfs import make_analyze_batches

        fn = make_analyze_batches(analyzer_fn)
    elif analyzer == "standard":
        fn = analyze_batches_arrow
    else:
        from whoosh_spark.analysis.analyzers import ANALYZERS
        from whoosh_spark.analysis.udfs import make_analyze_batches

        fn = make_analyze_batches(ANALYZERS[analyzer])
    out = src.mapInArrow(fn, schema=ANALYZED_SCHEMA)
    # declared posting Format (formats.py): reshape the payload BEFORE the
    # posting shuffle, so a leaner format shrinks the shuffled bytes too
    from whoosh_spark.formats import get_format

    return get_format(format).apply(out)


def doc_lengths(analyzed: DataFrame) -> DataFrame:
    return analyzed.select("doc_id", "len_raw", "dl")


def flat_postings(analyzed: DataFrame, field: str = TEXT_FIELD) -> DataFrame:
    """(field, term, doc_id, tf, positions, dl) — the logical posting list.

    Pure JVM columnar explode of the per-doc aggregated arrays — narrow, no
    shuffle, no Python.
    """
    return (
        analyzed.select(
            "doc_id",
            "dl",
            F.explode(F.arrays_zip("terms", "tfs", "pos_blobs")).alias("tp"),
        )
        .select(
            F.lit(field).alias("field"),
            F.col("tp.terms").alias("term"),
            "doc_id",
            F.col("tp.tfs").alias("tf"),
            F.col("tp.pos_blobs").alias("pos_blob"),
            "dl",
        )
    )


def posting_blocks(postings: DataFrame) -> DataFrame:
    """Encode flat postings into the persisted block table (BLOCKS_SCHEMA).

    One wide shuffle on (field, term, doc-bucket); Arrow-native encode
    (numpy kernels over the ListArray buffers — no Python list per row).
    """
    bucketed = postings.withColumn(
        "bucket", F.shiftright(F.col("doc_id"), DOC_BUCKET_BITS)
    )
    # Explicit partition count: an unnumbered repartition is AQE-coalescible
    # down to ~64MB partitions, which serializes the encode on a handful of
    # cores (observed: 4x anti-scaling).  Pin it to the session's shuffle
    # parallelism so the encode stage always uses the full cluster.
    n_part = int(postings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        bucketed.repartition(n_part, "field", "term", "bucket")
        .sortWithinPartitions("field", "term", "bucket", "doc_id")
        .mapInArrow(encode_sorted_stream, schema=BLOCKS_SCHEMA)
    )


def posting_blocks_from_analyzed(analyzed: DataFrame, field: str = TEXT_FIELD,
                                 n_part: int | None = None) -> DataFrame:
    """Two-level build (the scale path; Whoosh MpWriter algebra):

        analyzed → [per-partition RUN build: dict-encode + lexsort +
                    whole-stream varint, one row per (term, bucket)]
                 → shuffle runs on (term, bucket)   ← ~200x fewer rows,
                                                      ~6x fewer bytes than
                                                      shuffling postings
                 → [merge runs per group by doc_id → 128-posting blocks]

    Output is byte-identical to ``posting_blocks(flat_postings(analyzed))``
    (invariance tests assert it): block carving depends only on the sorted
    (term, bucket, doc_id) content, not on partitioning — which also makes
    ``n_part`` a pure performance knob (write_index passes a data-volume-
    derived count, see config.MERGE_PARTITION_BYTES).
    """
    runs = analyzed.mapInArrow(
        build_runs_arrow(field, DOC_BUCKET_BITS), schema=RUNS_SCHEMA
    )
    if n_part is None:
        n_part = int(
            analyzed.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        runs.repartition(n_part, "term", "bucket")
        .sortWithinPartitions("term", "bucket")
        .mapInArrow(merge_runs_stream(field), schema=BLOCKS_SCHEMA)
    )


def posting_blocks_grouped(postings: DataFrame) -> DataFrame:
    """Reference formulation: per-group applyInArrow (same output, slower —
    Spark pays a UDF invocation per (term, bucket) group)."""
    bucketed = postings.withColumn(
        "bucket", F.shiftright(F.col("doc_id"), DOC_BUCKET_BITS)
    )
    return bucketed.groupBy("field", "term", "bucket").applyInArrow(
        encode_group_arrow, schema=BLOCKS_SCHEMA
    )


def term_stats(blocks: DataFrame) -> DataFrame:
    """TermInfo analog (``src/whoosh/reading.py::TermInfo ≈L40``).

    Derived from block metadata (one row per ≤128-posting block), so this agg
    touches ~1/128th of the posting rows and needs no extra shuffle over raw
    postings.
    """
    return blocks.groupBy("field", "term").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.max("max_weight").cast("double").alias("max_weight"),
        F.min("min_id").alias("min_id"),
        F.max("max_id").alias("max_id"),
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
