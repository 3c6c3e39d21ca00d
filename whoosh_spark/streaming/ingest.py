"""Structured-Streaming ingestion: micro-segments + compaction.

Whoosh's nearest analog is ``BufferedWriter``/``AsyncWriter``
(``src/whoosh/writing.py ≈L950-1100``): buffer incoming docs in a RAM
segment, searchable before commit, merged into real segments later.  The
Spark-native restatement:

    readStream(pages) → foreachBatch:
        analyze batch → append analyzed/batch=stream-<epoch>  (micro-segment)
        log lineage to _build_log.jsonl
    … periodically …
    compact_index(path): re-run the merge phase over ALL micro-segments →
        fresh blocks/term_stats/doc_lengths/field_stats + manifest swap
        (MERGE_SMALL / OPTIMIZE policy analog, ``writing.py ≈L60``)

Queries against the last manifest generation see the last compaction —
snapshot-isolation semantics exactly like Whoosh readers see the last TOC.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_spark import build as B
from whoosh_spark import fs as FS
from whoosh_spark import store
from whoosh_spark.config import TEXT_FIELD


def _ingest_batch(path: str, id_col: str, text_col: str, run_id: str,
                  analyzer: str = "standard", format: str = "positions",
                  lang_col: str | None = None):
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        t0 = time.perf_counter()
        analyzed = B.analyzed_docs(batch_df, id_col, text_col,
                                   analyzer=analyzer,
                                   format=format,
                                   lang_col=lang_col).withColumn(
            "chunk", F.lit(-1)
        )
        out = FS.join(path, "analyzed", f"batch=stream-{run_id}-{epoch_id}")
        analyzed.write.mode("overwrite").parquet(out)
        off_dir = FS.join(path, "char_offsets")
        if FS.isdir_nonempty(off_dir):
            # keep the opt-in Characters segment live across streamed
            # micro-segments, mirroring store.upsert_documents
            from whoosh_spark.chars import char_offsets

            char_offsets(batch_df, id_col, text_col).write.mode(
                "append").parquet(off_dir)
        boosts_dir = FS.join(path, "boosts")
        if FS.isdir_nonempty(boosts_dir):
            # same liveness rule for the PositionBoosts overlay
            from whoosh_spark.boosts import token_boost_overlay

            token_boost_overlay(batch_df, id_col, text_col).write.mode(
                "append").parquet(boosts_dir)
        n = batch_df.sparkSession.read.parquet(out).count()
        store._append_log(
            path,
            {
                "phase": "analyze",
                "batch": f"stream-{run_id}-{epoch_id}",
                "chunks": [],
                "counters": {"stream": {"n_docs": int(n), "n_tokens": -1}},
                "wall_ms": int(1000 * (time.perf_counter() - t0)),
                "ts": time.time(),
            },
        )

    return fn


def stream_index(stream_df: DataFrame, path: str, checkpoint: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 trigger_once: bool = False):
    """Start (or run-once) the micro-segment ingestion stream.

    ``stream_df`` is any streaming DataFrame with (id_col, text_col) — e.g.
    a file source over landing parquet, or Kafka bytes mapped to pages.
    Returns the StreamingQuery.
    """
    # micro-segment names carry a checkpoint-derived run id: a stream
    # restarted with a FRESH checkpoint restarts epoch ids at 0 and would
    # otherwise overwrite-destroy the segments of the previous run, while
    # the SAME checkpoint (failure recovery) keeps the same id so an
    # epoch retry idempotently overwrites its own directory
    import hashlib

    run_id = hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:8]
    # micro-segments must be analyzed with the chain AND posting format
    # the index declares
    analyzer = store.manifest_analyzer(path)
    fmt = store.manifest_posting_format(path)
    _raw = FS.read_text(FS.join(path, store.MANIFEST))
    lang_col = (json.loads(_raw) or {}).get("lang_col") if _raw else None
    writer = (
        stream_df.writeStream.foreachBatch(
            _ingest_batch(path, id_col, text_col, run_id, analyzer, fmt,
                          lang_col))
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_index(spark: SparkSession, path: str, field: str = TEXT_FIELD,
                  store_docs: DataFrame | None = None,
                  text_col: str = "text") -> dict:
    """Merge every analyzed micro-segment into fresh query tables + manifest
    (delegates to ``store.compact_index`` — same OPTIMIZE-policy merge the
    batch writer uses)."""
    return store.compact_index(spark, path, field=field, store_docs=store_docs,
                               text_col=text_col)
