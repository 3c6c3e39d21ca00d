"""Persisted index store: Iceberg-shaped Parquet layout + JSON manifest.

Whoosh writes immutable *segments* plus a TOC generation file
(``src/whoosh/index.py::FileIndex/TOC ≈L300``, ``writing.py::commit ≈L900``).
Spark-first restatement (SURVEY.md §2.1, §2.3):

    <path>/
      analyzed/chunk=N/*.parquet   per-doc analysis output — the per-partition
                                   CHECKPOINT unit (resume skips done chunks)
      blocks/*.parquet             encoded posting blocks, sorted by
                                   (field, term, bucket, blk) ⇒ parquet
                                   row-group stats prune term lookups
      term_stats/*.parquet         TermInfo analog
      doc_lengths/*.parquet        (doc_id, len_raw, dl)
      field_stats/*.parquet        1 row per field
      docs/*.parquet               stored fields (minus analyzed text by default)
      _build_log.jsonl             lineage: one record per committed chunk
                                   batch (chunk ids, n_docs, n_tokens, wall_ms)
      manifest.json                TOC analog: generation, schema, counters —
                                   written LAST, atomically (tmp+rename), so a
                                   crashed build is detectable and resumable

The analyze phase (the CPU-dominant part) commits in chunk batches: each
batch is one Spark job whose output lands under ``analyzed/chunk=…`` before
the batch is logged.  A killed build restarts, reads ``_build_log.jsonl``,
and re-runs only pending chunks (north_rule: "resumable from per-partition
checkpoints with lineage + doc/term counters logged per segment").

Chunk identity is ``doc_id >> chunk_bits`` — deterministic in the DATA, not
in Spark's partitioning, so resume yields byte-identical tables at any
parallelism (MpWriter-invariance, reference tests/test_mpwriter.py).

On a real deployment the same layout maps 1:1 onto Iceberg (snapshot =
manifest, data files = chunk/partition outputs); writing through an Iceberg
catalog is a sink swap, not a redesign.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager

from whoosh_spark import fs as FS

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_spark import build as B
from whoosh_spark.config import TEXT_FIELD
from whoosh_spark.index import InvertedIndex

MANIFEST = "manifest.json"
PAIR_DIR = "pair_index"  # adjacent-pair (nextword) phrase accelerator
TRI_DIR = "trigram_index"  # hot-trigram (3-word nextword) accelerator


def manifest_analyzer(path: str) -> str:
    """The analyzer chain this index's manifest declares ("standard" when
    absent/pre-manifest) — the one source of truth for every writer that
    re-analyzes docs into an existing index (upsert, streaming)."""
    raw = FS.read_text(FS.join(path, MANIFEST))
    return json.loads(raw).get("analyzer", "standard") if raw else "standard"


def latest_generation(path: str) -> int:
    """Generation of the manifest currently committed at ``path`` (-1 when
    none) — ``index.py::Index.latest_generation ≈L370``.  Each commit
    (write/compact/upsert/segment-fold/delete) stamps a fresh generation,
    so a cheap one-file read answers staleness."""
    raw = FS.read_text(FS.join(path, MANIFEST))
    return json.loads(raw).get("generation", -1) if raw else -1


def _next_generation(path: str) -> int:
    """Strictly-increasing generation stamp: wall-clock seconds, but never
    ≤ the committed generation (two commits in one second must differ for
    ``InvertedIndex.up_to_date`` to see the second one)."""
    return max(int(time.time()), latest_generation(path) + 1)


def _bump_generation(path: str) -> None:
    """Re-stamp the committed manifest after a visibility-changing overlay
    write (soft deletes): readers opened before the delete must report
    stale.  No-op when no manifest exists yet."""
    raw = FS.read_text(FS.join(path, MANIFEST))
    if raw is None:
        return
    manifest = json.loads(raw)
    manifest["generation"] = max(int(time.time()),
                                 manifest.get("generation", -1) + 1)
    FS.write_text_atomic(FS.join(path, MANIFEST), json.dumps(manifest, indent=1))


def manifest_posting_format(path: str) -> str:
    """The posting Format the manifest declares ("positions" when absent) —
    same single-source-of-truth rule as :func:`manifest_analyzer`."""
    raw = FS.read_text(FS.join(path, MANIFEST))
    return (json.loads(raw).get("posting_format", "positions")
            if raw else "positions")
BUILD_LOG = "_build_log.jsonl"
DEFAULT_CHUNK_BITS = 16  # 65536 docs per checkpoint chunk


def _log_path(path: str) -> str:
    return FS.join(path, BUILD_LOG)


def _read_log(path: str) -> list[dict]:
    text = FS.read_text(_log_path(path))
    if text is None:
        return []
    return [json.loads(line) for line in text.splitlines() if line.strip()]


def _append_log(path: str, record: dict) -> None:
    # scheme-dispatched (fs.py): local O_APPEND, or Hadoop-FS read+atomic
    # rewrite for hdfs://s3a://file:// paths (single-writer build log)
    FS.append_text(_log_path(path), json.dumps(record) + "\n")


def completed_chunks(path: str) -> set[int]:
    done: set[int] = set()
    for rec in _read_log(path):
        if rec.get("phase") == "analyze":
            done.update(rec["chunks"])
    return done



def _drop_unstorable(df: DataFrame) -> DataFrame:
    """Stored-fields hygiene shared by build/compact/upsert: raw binary
    columns (e.g. html bytes) never land in the docs table."""
    return df.drop(*[f.name for f in df.schema.fields
                     if f.dataType.typeName() == "binary"])


def _resolve_pair_min_df(spark: SparkSession, path: str,
                         pair_min_df: float) -> int:
    """A fractional threshold (0 < v < 1) means "df ≥ v·N" — an absolute df
    covers an ever-larger vocabulary share as the corpus grows (100k is the
    10% head at 1M docs but the 0.1% head at 100M), so the scale-stable
    spelling is a fraction of the doc count.  Resolved to an absolute df at
    build time and stored resolved, so the query router needs no N."""
    if 0 < pair_min_df < 1:
        n = int(spark.read.parquet(
            FS.join(path, "field_stats")).collect()[0]["doc_count"])
        return max(1, int(pair_min_df * n))
    return int(pair_min_df)


def _prepare_pair_dir(path: str, pair_min_df: int,
                      subdir: str = PAIR_DIR) -> None:
    """The pair/trigram build's resume guard covers analyzer/format but not
    the hot set — checkpoints extracted under a DIFFERENT threshold pair
    different tokens, so reusing them records the new threshold over old
    grams (the router would then return wrong empties).  A meta file inside
    the segment dir pins the threshold; a mismatch wipes the dir before the
    build."""
    meta_path = FS.join(path, subdir, "_pair_meta.json")
    raw = FS.read_text(meta_path)
    if raw is not None and json.loads(raw).get("pair_min_df") == pair_min_df:
        return
    if FS.isdir_nonempty(FS.join(path, subdir)):
        FS.rmtree(FS.join(path, subdir))
    FS.makedirs(FS.join(path, subdir))
    FS.write_text_atomic(meta_path,
                         json.dumps({"pair_min_df": pair_min_df}))


def _pair_segment_min_df(path: str, subdir: str = PAIR_DIR) -> int | None:
    """Threshold of a COMPLETE pair/trigram segment, from the segment's own
    records (inner manifest proves completion, ``_pair_meta.json`` carries
    the df the hot set was actually extracted at).  ``None`` = no usable
    segment.  The OUTER manifest is deliberately not consulted: it can lag
    the segment dir (crash between inner build and outer commit) and would
    mis-vouch."""
    if FS.read_text(FS.join(path, subdir, MANIFEST)) is None:
        return None
    meta = FS.read_text(FS.join(path, subdir, "_pair_meta.json"))
    if meta is None:
        return None
    return int(json.loads(meta)["pair_min_df"])


def _hot_pairs_fn(spark: SparkSession, path: str, pair_min_df: int,
                  k: int = 2):
    """Pair extractor for the accel build: full bigrams at threshold 0,
    else only hot×hot pairs (constituent df ≥ pair_min_df, taken from the
    MAIN index's term_stats — the same stats the query router checks).  The
    unfiltered bigram dictionary is ~an order of magnitude bigger than the
    unigram one (measured: pair merge 11× the main merge at 1M docs);
    rare-constituent phrases never route here, so indexing their pairs buys
    nothing.

    Returns ``(fn, broadcast_or_None)`` — the caller unpersists the
    broadcast once the pair segment is materialized (executor copies are
    dropped; a re-executed plan lazily re-broadcasts from the driver), so
    a long-lived session building many indexes doesn't accumulate
    executor-side hot-set copies."""
    if pair_min_df <= 0:
        return None, None  # registry "adjacent_pairs" chain (all pairs)
    from whoosh_spark.analysis.analyzers import (
        make_hot_pairs_fn,
        make_hot_trigrams_fn,
    )

    ts = spark.read.parquet(FS.join(path, "term_stats"))
    hot = frozenset(
        r["term"] for r in
        ts.where(F.col("df") >= pair_min_df).select("term").collect())
    # ship via torrent broadcast, not closure pickling: a pathological
    # threshold can make this set huge, and a closure copy would be
    # re-serialized into every task (driver memory × task dispatch cost)
    bc = spark.sparkContext.broadcast(hot)
    maker = make_hot_pairs_fn if k == 2 else make_hot_trigrams_fn
    return maker(bc), bc


def _drop_pair_index(path: str, reason: str) -> None:
    """Invalidate the adjacent-pair accelerator segment.  Any operation
    that changes the doc set (upsert, segment fold, merge, purge) leaves
    the pair sub-index describing the OLD corpus — phrase queries routed
    through a stale one would miss or mis-score matches, so the segment is
    dropped (and the manifest flag cleared) rather than served stale;
    rebuild with ``write_index(..., phrase_pairs=True)`` /
    ``compact_index``."""
    dropped = False
    for subdir in (PAIR_DIR, TRI_DIR):
        d = FS.join(path, subdir)
        if FS.isdir_nonempty(d):
            FS.rmtree(d)
            dropped = True
    if not dropped:
        return
    raw = FS.read_text(FS.join(path, MANIFEST))
    if raw is not None:
        manifest = json.loads(raw)
        had_pairs = manifest.pop("phrase_pairs", None)
        had_tris = manifest.pop("phrase_trigrams", None)
        if had_pairs or had_tris:
            FS.write_text_atomic(FS.join(path, MANIFEST),
                                 json.dumps(manifest, indent=1))
    _append_log(path, {"phase": "pair_drop", "reason": reason,
                       "ts": time.time()})


def _merge_partitions(spark: SparkSession, analyzed_dir: str) -> tuple[int, int]:
    """(n_part, analyzed_bytes) for the runs shuffle — sized by DATA VOLUME
    (config.MERGE_PARTITION_BYTES), not core count: a core-pinned width makes
    per-partition sort memory grow with the corpus until the external sort
    spills (measured: per-doc merge cost x1.5 from 1M→10M docs at a fixed 40
    partitions).  Shared by every path that re-merges analyzed segments
    (write_index, compact_index, hence merge_indexes).  Env override
    ``WHOOSH_MERGE_PARTITIONS`` for experiments."""
    an_bytes = FS.dir_bytes(analyzed_dir)
    env_n = os.environ.get("WHOOSH_MERGE_PARTITIONS")
    if env_n:
        n = int(env_n)
        if n < 1:
            raise ValueError(
                f"WHOOSH_MERGE_PARTITIONS must be >= 1, got {env_n!r}")
        return n, an_bytes
    from whoosh_spark.config import MERGE_PARTITION_BYTES

    conf_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(conf_n, -(-an_bytes // MERGE_PARTITION_BYTES)), an_bytes


def _rebalance(df: DataFrame, spark: SparkSession) -> DataFrame:
    """The analyzed table compresses ~10x, so its scan may yield far fewer
    splits than the cluster has cores — the merge would then run nearly
    serial.  Repartition only when badly under-split (the extra shuffle is
    cheap: compact per-doc rows)."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < max(4, n_part // 2):
        df = df.repartition(n_part)
    return df



def _build_accel_segment(spark: SparkSession, path: str, pair_min_df: int,
                         chunk_bits: int, k: int, subdir: str,
                         analyzer_name: str, format: str = "positions",
                         docs: DataFrame | None = None,
                         id_col: str | None = None,
                         text_col: str = "text", field: str = TEXT_FIELD,
                         chunks_per_commit: int = 16) -> None:
    """Build ONE nextword accel sub-index (k=2 pairs / k=3 trigrams) under
    ``<path>/<subdir>`` — the single implementation behind write_index's
    opt-ins and build_pair_segment's upgrade path (review round-5: the
    four near-verbatim copies had already drifted).

    Prefers deriving the k-gram stream from the parent's persisted
    ``analyzed/`` checkpoints; the follow-up inner write_index then runs
    over an EMPTY-text ids frame, so a chunk that legitimately produced
    zero hot k-grams re-analyzes to nothing instead of being re-extracted
    UNGATED from raw text (the hot-gate invariant).  Falls back to the
    raw-text extractor (hot-gated via ``_hot_pairs_fn``) when derivation
    isn't possible; ``docs=None`` then means the stored docs table, which
    only carries text when the index was built with store_text=True."""
    _prepare_pair_dir(path, pair_min_df, subdir)
    if format == "positions" and _derive_pair_analyzed(
            spark, path, pair_min_df, chunk_bits, k=k, subdir=subdir):
        ids = (spark.read.parquet(FS.join(path, "analyzed"))
               .select(F.col("doc_id"), F.lit("").alias(text_col)))
        write_index(ids, FS.join(path, subdir), id_col="doc_id",
                    text_col=text_col, field=field, chunk_bits=chunk_bits,
                    chunks_per_commit=chunks_per_commit,
                    analyzer=analyzer_name, format="frequency",
                    write_stored=False)
        return
    if docs is None:
        docs = spark.read.parquet(FS.join(path, "docs"))
        id_col = "doc_id"  # stored docs are always renamed to doc_id
        if text_col not in docs.columns:
            raise ValueError(
                f"stored docs carry no {text_col!r} column (index built "
                "without store_text=True) — pass the original corpus as "
                "docs=")
    elif id_col is None:
        id_col = "doc_id"
    fn, bc = _hot_pairs_fn(spark, path, pair_min_df, k=k)
    write_index(docs.select(F.col(id_col), F.col(text_col)),
                FS.join(path, subdir), id_col=id_col, text_col=text_col,
                field=field, chunk_bits=chunk_bits,
                chunks_per_commit=chunks_per_commit,
                analyzer=analyzer_name, format="frequency",
                write_stored=False, _analyzer_fn=fn)
    if bc is not None:
        bc.unpersist()


def write_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    field: str = TEXT_FIELD,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    chunks_per_commit: int = 16,
    store_text: bool = False,
    store_offsets: bool = False,
    analyzer: str = "standard",
    store_boosts: bool = False,
    max_batches: int | None = None,
    format: str = "positions",
    phrase_pairs: bool = False,
    pair_min_df: float = 0,
    phrase_trigrams: bool = False,
    write_stored: bool = True,
    _analyzer_fn=None,
    lang_col: str | None = None,
) -> dict:
    """Build + persist the index; resumable.  Returns the manifest dict.

    ``store_offsets`` additionally writes the Characters-format segment
    (``char_offsets/``, see :mod:`whoosh_spark.chars`) — opt-in exactly
    like upstream's ``TEXT(chars=True)`` field declaration.
    ``analyzer`` is a registry name (``analysis.analyzers.ANALYZERS``) —
    recorded in the manifest so upserts/streaming reuse the SAME chain and
    query-time parsing can tee to it (Schema declares the analyzer once,
    ``fields.py::FieldType.analyzer``).  ``store_boosts`` persists the
    PositionBoosts overlay (``boosts/``, see :mod:`whoosh_spark.boosts`);
    requires ``analyzer="boosted"`` so overlay tokens match the index.
    ``max_batches`` limits analyze-phase commits (used by the resumability
    tests to simulate a mid-build kill).
    """
    if store_boosts and analyzer != "boosted":
        raise ValueError("store_boosts requires analyzer='boosted' — the "
                         "overlay's token stream must match the index chain")
    from whoosh_spark.formats import get_format

    get_format(format)  # fail fast on a typo'd/unregistered Format
    if format == "characters":
        # upstream TEXT(chars=True): the Characters format IS positions +
        # the char-offsets side segment
        store_offsets = True
    spark = docs.sparkSession
    t_start = time.perf_counter()

    src = docs.withColumn("_chunk", F.shiftright(F.col(id_col).cast("long"), chunk_bits))
    all_chunks = sorted(
        r["_chunk"] for r in src.select("_chunk").distinct().collect()
    )
    log = _read_log(path)
    # resume guard: analyzed/ checkpoints from a previous partial build are
    # only reusable if they were produced by the SAME analyzer chain
    prev_an = next((rec.get("analyzer", "standard") for rec in log
                    if rec.get("phase") == "analyze"), None)
    if prev_an is not None and prev_an != analyzer:
        raise ValueError(
            f"resume with analyzer={analyzer!r} over checkpoints analyzed "
            f"with {prev_an!r} — wipe the index dir or keep the analyzer")
    # same resume guard for the posting format: checkpoints carry the
    # format-shaped payload, so a format change needs a fresh build
    prev_fmt = next((rec.get("posting_format", "positions") for rec in log
                     if rec.get("phase") == "analyze"), None)
    if prev_fmt is not None and prev_fmt != format:
        raise ValueError(
            f"resume with format={format!r} over checkpoints written with "
            f"{prev_fmt!r} — wipe the index dir or keep the format")
    done = completed_chunks(path)
    pending = [c for c in all_chunks if c not in done]
    # string batch ids ('upsert-<ts>', 'purge-<ts>', 'stream-<epoch>') live
    # in the same log; only integer build batches participate in numbering
    next_batch = 1 + max(
        (rec.get("batch", -1) for rec in log
         if rec.get("phase") == "analyze"
         and isinstance(rec.get("batch"), int)),
        default=-1,
    )

    # ---- phase 1: analyze, committed in chunk batches --------------------
    # Each batch lands in its own analyzed/batch=N directory (a plain write;
    # dynamic partitionBy costs ~3.5x) and is logged only after the write
    # completes — the batch directory IS the checkpoint.
    n_batches = 0
    for i in range(0, len(pending), chunks_per_commit):
        if max_batches is not None and n_batches >= max_batches:
            break
        batch = pending[i : i + chunks_per_commit]
        bid = next_batch + n_batches
        t0 = time.perf_counter()
        # express the chunk filter as doc_id RANGE predicates so the parquet
        # scan prunes row groups (a predicate on the derived _chunk column
        # would force a full corpus scan per batch)
        id_col_l = F.col(id_col).cast("long")
        rng_pred = F.lit(False)
        for c in batch:
            lo = c << chunk_bits
            hi = ((c + 1) << chunk_bits) - 1
            rng_pred = rng_pred | id_col_l.between(lo, hi)
        part = src.where(rng_pred)
        analyzed = B.analyzed_docs(part, id_col, text_col,
                                   analyzer=analyzer,
                                   format=format,
                                   analyzer_fn=_analyzer_fn,
                                   lang_col=lang_col).withColumn(
            "chunk", F.shiftright(F.col("doc_id"), chunk_bits)
        )
        batch_dir = FS.join(path, "analyzed", f"batch={bid}")
        analyzed.write.mode("overwrite").parquet(batch_dir)
        t_write = time.perf_counter() - t0
        # per-chunk counters from what was just written (column-pruned scan
        # of two int columns — parquet footer + tiny pages)
        just = spark.read.parquet(batch_dir)
        counters = {
            int(r["chunk"]): {"n_docs": int(r["n"]), "n_tokens": int(r["t"])}
            for r in just.groupBy("chunk")
            .agg(F.count("*").alias("n"), F.sum("len_raw").alias("t"))
            .collect()
        }
        _append_log(
            path,
            {
                "phase": "analyze",
                "batch": bid,
                "chunks": [int(c) for c in batch],
                "counters": counters,
                "analyzer": analyzer,
                "posting_format": format,
                "wall_ms": int(1000 * (time.perf_counter() - t0)),
                "write_ms": int(1000 * t_write),
                "ts": time.time(),
            },
        )
        n_batches += 1

    if max_batches is not None and (len(pending) > n_batches * chunks_per_commit):
        return {"status": "partial", "chunks_done": sorted(completed_chunks(path))}

    # ---- phase 2: shuffle merge → blocks + stats + manifest --------------
    # Four independent job chains run CONCURRENTLY (Python threads submitting
    # Spark jobs; the scheduler packs their tasks into free slots).  At 1
    # core they interleave at no cost; at N cores the stats/stored tail
    # overlaps the big blocks shuffle instead of serializing after it —
    # shrinking the Amdahl tail is where N→4N scaling efficiency lives.
    #   chain A: blocks shuffle-merge → term_stats (+ n_terms/n_blocks counts)
    #   chain B: doc_lengths → field_stats
    #   chain C: stored docs
    #   chain D: char_offsets (opt-in)
    t0 = time.perf_counter()
    steps: dict[str, int] = {}

    @contextmanager
    def _timed(name: str):
        t = time.perf_counter()
        yield
        steps[name] = int(1000 * (time.perf_counter() - t))

    analyzed = spark.read.parquet(FS.join(path, "analyzed")).drop("chunk", "batch")
    analyzed = _rebalance(analyzed, spark)
    counts: dict[str, int] = {}

    merge_n, an_bytes = _merge_partitions(spark, FS.join(path, "analyzed"))

    def _chain_blocks() -> None:
        with _timed("blocks"):
            blocks = B.posting_blocks_from_analyzed(analyzed, field,
                                                    n_part=merge_n)
            # already sorted by (field, term, bucket, blk) within partitions
            # by construction (encode_sorted_stream preserves its input
            # sort), so parquet row-group min/max stats give term-pruning
            # for free
            blocks.write.mode("overwrite").parquet(FS.join(path, "blocks"))
        with _timed("term_stats"):
            blocks_r = spark.read.parquet(FS.join(path, "blocks"))
            tstats = B.term_stats(blocks_r)
            tstats.write.mode("overwrite").parquet(FS.join(path, "term_stats"))
            counts["n_terms"] = spark.read.parquet(
                FS.join(path, "term_stats")).count()
            counts["n_blocks"] = blocks_r.count()

    def _chain_lengths() -> None:
        with _timed("lengths"):
            lengths = B.doc_lengths(analyzed)
            lengths.write.mode("overwrite").parquet(FS.join(path, "doc_lengths"))
            lengths_r = spark.read.parquet(FS.join(path, "doc_lengths"))
            B.field_stats(lengths_r, field).write.mode("overwrite").parquet(
                FS.join(path, "field_stats")
            )

    def _chain_docs() -> None:
        with _timed("docs"):
            # stored fields: analyzed text and raw binary (e.g. html bytes)
            # excluded by default — Whoosh stores only declared stored
            # fields (fields.py STORED)
            stored = docs if store_text else docs.drop(text_col)
            stored = _drop_unstorable(stored)
            if id_col != "doc_id":
                stored = stored.withColumnRenamed(id_col, "doc_id")
            stored.write.mode("overwrite").parquet(FS.join(path, "docs"))

    def _chain_chars() -> None:
        with _timed("char_offsets"):
            from whoosh_spark.chars import write_char_offsets

            write_char_offsets(docs, path, id_col, text_col)

    def _chain_boosts() -> None:
        with _timed("boosts"):
            from whoosh_spark.boosts import token_boost_overlay

            token_boost_overlay(docs, id_col, text_col).write.mode(
                "overwrite").parquet(FS.join(path, "boosts"))

    # write_stored=False: a family writer (write_multifield_index) stores
    # docs ONCE at the family root instead of once per field sub-index
    chains = ([_chain_blocks, _chain_lengths, _chain_docs] if write_stored
              else [_chain_blocks, _chain_lengths])
    offsets_dir = FS.join(path, "char_offsets")
    if store_offsets:
        chains.append(_chain_chars)
    elif FS.isdir_nonempty(offsets_dir):
        # a previous generation at this path opted in; its spans describe
        # the OLD corpus — drop them rather than attach stale offsets
        FS.rmtree(offsets_dir)
    boosts_dir = FS.join(path, "boosts")
    if store_boosts:
        chains.append(_chain_boosts)
    elif FS.isdir_nonempty(boosts_dir):
        # same staleness rule as char_offsets: never attach a previous
        # generation's overlay to a rebuilt corpus
        FS.rmtree(boosts_dir)
    try:
        if spark.sparkContext.defaultParallelism >= 4:
            with ThreadPoolExecutor(max_workers=len(chains)) as pool:
                futures = [pool.submit(c) for c in chains]
                for f in futures:
                    f.result()  # re-raise the first chain failure
        else:
            # 1-2 task slots: concurrent stages just interleave on the same
            # slot (cache/GC thrash, no overlap to win) — run the tail serial
            for c in chains:
                c()
    except BaseException:
        # A failed chain leaves sibling chains' tables describing the NEW
        # corpus while the failed one (and any pre-existing manifest) still
        # describes the OLD generation.  Drop the manifest so load_index
        # refuses the mixed state; re-running write_index resumes from the
        # analyze checkpoints and rewrites the whole tail.
        FS.remove(FS.join(path, MANIFEST))
        raise
    _append_log(
        path,
        {"phase": "merge", "wall_ms": int(1000 * (time.perf_counter() - t0)),
         "steps_ms": steps, "merge_partitions": merge_n,
         "analyzed_bytes": an_bytes, "ts": time.time()},
    )

    # ---- adjacent-pair accelerator (opt-in, its own resumable build) -----
    if phrase_pairs:
        if analyzer != "standard":
            raise ValueError("phrase_pairs=True requires analyzer='standard'"
                             " — the pair certificate is defined against the"
                             " standard chain's token/ordinal stream")
        pair_min_df = _resolve_pair_min_df(spark, path, pair_min_df)
        _build_accel_segment(spark, path, pair_min_df, chunk_bits,
                             k=2, subdir=PAIR_DIR,
                             analyzer_name="adjacent_pairs", format=format,
                             docs=docs, id_col=id_col, text_col=text_col,
                             field=field,
                             chunks_per_commit=chunks_per_commit)
        if phrase_trigrams:
            # hot-trigram accelerator (3-word nextword): same hot gate as
            # the pair segment, its own resumable sub-build under TRI_DIR
            if pair_min_df <= 0:
                raise ValueError(
                    "phrase_trigrams=True requires pair_min_df > 0 — an "
                    "ungated trigram dictionary is unbounded")
            _build_accel_segment(spark, path, pair_min_df, chunk_bits,
                                 k=3, subdir=TRI_DIR,
                                 analyzer_name="adjacent_trigrams",
                                 format=format, docs=docs, id_col=id_col,
                                 text_col=text_col, field=field,
                                 chunks_per_commit=chunks_per_commit)
        elif FS.isdir_nonempty(FS.join(path, TRI_DIR)):
            # staleness rule (same as char_offsets/boosts/pairs): a
            # previous generation's trigram segment describes the OLD
            # corpus/threshold — drop it so the compact-time inner-record
            # vouch can never resurrect it
            FS.rmtree(FS.join(path, TRI_DIR))
    else:
        if phrase_trigrams:
            raise ValueError("phrase_trigrams=True requires "
                             "phrase_pairs=True (shared hot-term gate)")
        # same staleness rule as char_offsets/boosts: a previous generation
        # at this path may have opted in — its pairs describe the OLD corpus
        _drop_pair_index(path, "rebuild without phrase_pairs")

    # ---- manifest (atomic tmp+rename = TOC generation swap) --------------
    fs_row = spark.read.parquet(FS.join(path, "field_stats")).collect()[0]
    manifest = {
        "format": "whoosh-spark/1",
        "generation": _next_generation(path),
        "field": field,
        "chunk_bits": chunk_bits,
        "n_docs": int(fs_row["doc_count"]),
        "total_len": int(fs_row["total_len"]),
        "n_terms": counts["n_terms"],
        "n_blocks": counts["n_blocks"],
        "store_text": store_text,
        "analyzer": analyzer,
        "lang_col": (lang_col or "lang") if analyzer == "lang_routed"
        else None,
        "text_col": text_col,
        "id_col": id_col,
        "posting_format": format,
        "phrase_pairs": phrase_pairs,
        "pair_min_df": int(pair_min_df) if phrase_pairs else 0,
        "phrase_trigrams": bool(phrase_pairs and phrase_trigrams),
        "build_wall_s": round(time.perf_counter() - t_start, 3),
    }
    FS.write_text_atomic(FS.join(path, MANIFEST), json.dumps(manifest, indent=1))
    return manifest


def _derive_pair_analyzed(spark: SparkSession, path: str,
                          pair_min_df: int, chunk_bits: int,
                          k: int = 2, subdir: str = PAIR_DIR) -> bool:
    """Round-5 pair-build fast path: materialize the adjacent-pair analyzed
    segment for ``<path>/pairs`` by INVERTING the parent's persisted
    ``analyzed/`` token stream (positions → adjacencies,
    ``analysis/udfs.py::make_pairs_from_analyzed``) instead of re-running
    the full tokenize pass over the raw corpus.  The re-analysis was the
    dominant pair-build cost (measured 0.92-1.0× the MAIN build's wall at
    1M-10M docs — the round-4 scale-soak watch item); the derivation reads
    the ~10×-compressed token segment and never touches raw text.

    Writes ``pairs/analyzed/batch=0`` + the analyze log record, so the
    subsequent ``write_index`` call sees every chunk checkpointed and
    resumes straight into the merge phase.  Returns False when the parent
    segment can't support derivation (no analyzed/ checkpoints, or a
    non-positions posting format) — callers fall back to the raw-text
    analyze path.  Output is bit-identical to that path (pinned by
    tests/test_pairs_from_analyzed.py)."""
    an_dir = FS.join(path, "analyzed")
    if not FS.isdir_nonempty(an_dir):
        return False
    raw = FS.read_text(FS.join(path, MANIFEST))
    man = json.loads(raw) if raw else {}
    if man.get("posting_format", "positions") != "positions":
        return False
    from whoosh_spark.analysis.udfs import (
        ANALYZED_SCHEMA,
        make_pairs_from_analyzed,
    )
    from whoosh_spark.formats import get_format

    hot_bc = None
    if pair_min_df > 0:
        ts = spark.read.parquet(FS.join(path, "term_stats"))
        hot = frozenset(
            r["term"] for r in
            ts.where(F.col("df") >= pair_min_df).select("term").collect())
        hot_bc = spark.sparkContext.broadcast(hot)
    pair_dir = FS.join(path, subdir)
    # a same-threshold partial TEXT-path build may have left analyze
    # checkpoints behind; the derivation rewrites the whole stream in one
    # job, so stale batches (which would double-count their chunks next to
    # the derived batch=0) are dropped first
    if FS.isdir_nonempty(FS.join(pair_dir, "analyzed")):
        FS.rmtree(FS.join(pair_dir, "analyzed"))
    FS.remove(FS.join(pair_dir, BUILD_LOG))
    t0 = time.perf_counter()
    parent = (spark.read.parquet(an_dir)
              .select("doc_id", "len_raw", "dl", "terms", "tfs",
                      "pos_blobs"))
    derived = parent.mapInArrow(
        make_pairs_from_analyzed(hot_bc, k=k), schema=ANALYZED_SCHEMA)
    derived = get_format("frequency").apply(derived).withColumn(
        "chunk", F.shiftright(F.col("doc_id"), chunk_bits))
    batch_dir = FS.join(pair_dir, "analyzed", "batch=0")
    derived.write.mode("overwrite").parquet(batch_dir)
    just = spark.read.parquet(batch_dir)
    counters = {
        int(r["chunk"]): {"n_docs": int(r["n"]), "n_tokens": int(r["t"])}
        for r in just.groupBy("chunk")
        .agg(F.count("*").alias("n"), F.sum("len_raw").alias("t"))
        .collect()
    }
    _append_log(pair_dir, {
        "phase": "analyze", "batch": 0,
        "chunks": sorted(counters),
        "counters": counters,
        "analyzer": "adjacent_pairs" if k == 2 else "adjacent_trigrams",
        "posting_format": "frequency",
        "derived_from": "parent-analyzed",
        "wall_ms": int(1000 * (time.perf_counter() - t0)),
        "ts": time.time(),
    })
    if hot_bc is not None:
        hot_bc.unpersist()
    return True


def build_pair_segment(spark: SparkSession, path: str,
                       docs: DataFrame | None = None,
                       pair_min_df: float = 0,
                       id_col: str | None = None,
                       phrase_trigrams: bool = False) -> dict:
    """Attach the adjacent-pair phrase accelerator to an EXISTING index
    without rebuilding it (the OPTIMIZE-style upgrade path; equivalent to
    having passed ``phrase_pairs=True`` to write_index).

    When the index carries its ``analyzed/`` checkpoints in the positions
    format (the default build), the pair stream is DERIVED from them
    (``_derive_pair_analyzed``) and ``docs`` is not needed at all — no
    raw-text re-analysis.  Otherwise ``docs`` supplies the corpus (id +
    text); it defaults to the stored docs table, which only carries text
    when the index was built with ``store_text=True``.  ``id_col``
    defaults to the id column the manifest records (stored docs always use
    the renamed ``doc_id``); pass it only to override for a corpus whose
    id column differs from the build-time one.
    """
    raw = FS.read_text(FS.join(path, MANIFEST))
    if raw is None:
        raise FileNotFoundError(f"no {MANIFEST} under {path!r}")
    manifest = json.loads(raw)
    if manifest.get("phrase_pairs") and (
            not phrase_trigrams or manifest.get("phrase_trigrams")):
        return manifest
    if manifest.get("phrase_pairs"):
        # pairs already attached — honor the recorded threshold so the two
        # segments share one hot set (the router checks a single value)
        pair_min_df = int(manifest.get("pair_min_df", 0))
    if manifest.get("analyzer", "standard") != "standard":
        raise ValueError("the pair certificate is defined against the "
                         "standard chain; this index was built with "
                         f"analyzer={manifest.get('analyzer')!r}")
    text_col = manifest.get("text_col", "text")
    chunk_bits = int(manifest.get("chunk_bits", DEFAULT_CHUNK_BITS))
    fmt = manifest.get("posting_format", "positions")
    field = manifest.get("field", TEXT_FIELD)
    if id_col is None and docs is not None:
        id_col = manifest.get("id_col", "doc_id")
    pair_min_df = _resolve_pair_min_df(spark, path, pair_min_df)
    # skip the pair build when a COMPLETE same-threshold segment already
    # exists (review round-5: the trigram upgrade used to rebuild the
    # entire pair segment byte-identically before touching trigrams)
    if not (manifest.get("phrase_pairs")
            and _pair_segment_min_df(path) == pair_min_df):
        _build_accel_segment(spark, path, pair_min_df, chunk_bits,
                             k=2, subdir=PAIR_DIR,
                             analyzer_name="adjacent_pairs", format=fmt,
                             docs=docs, id_col=id_col, text_col=text_col,
                             field=field)
    if phrase_trigrams:
        if pair_min_df <= 0:
            raise ValueError("phrase_trigrams=True requires pair_min_df > 0")
        _build_accel_segment(spark, path, pair_min_df, chunk_bits,
                             k=3, subdir=TRI_DIR,
                             analyzer_name="adjacent_trigrams", format=fmt,
                             docs=docs, id_col=id_col, text_col=text_col,
                             field=field)
    manifest["phrase_pairs"] = True
    manifest["pair_min_df"] = int(pair_min_df)
    manifest["phrase_trigrams"] = bool(phrase_trigrams)
    manifest["generation"] = _next_generation(path)
    FS.write_text_atomic(FS.join(path, MANIFEST), json.dumps(manifest, indent=1))
    return manifest


SCHEMA_FILE = "_schema.json"


def write_multifield_index(docs: DataFrame, path: str,
                           fields: dict, id_col: str = "doc_id",
                           default_field: str | None = None,
                           store_text: bool = False) -> dict:
    """Persist a multi-field schema index — the ``create_in(dir,
    Schema(title=TEXT, body=TEXT))`` analog (``src/whoosh/index.py::
    create_in ≈L60`` + ``fields.py::Schema ≈L1200``).

    Layout::

        <path>/_schema.json      resolved schema (globs expanded), default
                                 field, id column — written LAST (commit)
        <path>/fields/<name>/    one full single-field index per field
                                 (resumable builds; no per-field stored
                                 docs — write_stored=False)
        <path>/docs/             stored fields ONCE for the whole family

    ``fields`` maps field name → FieldSpec (or source-column shorthand);
    glob field names expand against the docs columns exactly as the
    in-memory ``MultiFieldIndex.build`` does (shared ``resolve_specs``).
    """
    from whoosh_spark.multifield import resolve_specs

    specs = resolve_specs(docs, fields, id_col)
    default_field = default_field or next(iter(specs))
    if default_field not in specs:
        raise ValueError(f"default_field {default_field!r} not in schema")
    for name, spec in specs.items():
        write_index(docs, FS.join(path, "fields", name), id_col=id_col,
                    text_col=spec.source, field=name,
                    analyzer=spec.analyzer, format=spec.format,
                    phrase_pairs=spec.pairs, pair_min_df=spec.pair_min_df,
                    write_stored=False)
    stored = docs if store_text else docs.drop(
        *{s.source for s in specs.values()})
    stored = _drop_unstorable(stored)
    if id_col != "doc_id":
        stored = stored.withColumnRenamed(id_col, "doc_id")
    stored.write.mode("overwrite").parquet(FS.join(path, "docs"))
    schema = {
        "format": "whoosh-spark-multifield/1",
        "default_field": default_field,
        "id_col": id_col,
        "store_text": store_text,
        "fields": {name: {"source": s.source, "analyzer": s.analyzer,
                          "b": s.b, "boost": s.boost, "format": s.format,
                          "pairs": s.pairs, "pair_min_df": s.pair_min_df}
                   for name, s in specs.items()},
    }
    FS.write_text_atomic(FS.join(path, SCHEMA_FILE),
                         json.dumps(schema, indent=1))
    return schema


def load_multifield_index(spark: SparkSession, path: str):
    """Open a persisted schema index (``open_dir`` for multi-field) —
    attaches the family's shared stored table to every field sub-index."""
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex

    raw = FS.read_text(FS.join(path, SCHEMA_FILE))
    if raw is None:
        raise FileNotFoundError(
            f"no {SCHEMA_FILE} under {path!r}: not a multifield index, or "
            f"a build crashed before the schema commit (re-run "
            f"write_multifield_index to resume the field builds)")
    schema = json.loads(raw)
    stored = spark.read.parquet(FS.join(path, "docs"))
    specs = {n: FieldSpec(**d) for n, d in schema["fields"].items()}
    indexes = {}
    for name in specs:
        ix = load_index(spark, FS.join(path, "fields", name))
        ix.docs = stored
        indexes[name] = ix
    mix = MultiFieldIndex(spark, indexes, specs, stored,
                          schema["default_field"])
    mix.path = path
    return mix


def load_index(spark: SparkSession, path: str) -> InvertedIndex:
    """Open a persisted index (manifest-gated, like ``open_dir``)."""
    raw = FS.read_text(FS.join(path, MANIFEST))
    if raw is None:
        raise FileNotFoundError(
            f"no {MANIFEST} under {path!r}: not an index, or a build "
            f"crashed before its first commit (re-run write_index to "
            f"resume from the batch checkpoints)")
    manifest = json.loads(raw)
    deleted_dir = FS.join(path, "deleted")
    deleted = (
        spark.read.parquet(deleted_dir).select("doc_id").distinct()
        if FS.isdir_nonempty(deleted_dir)
        else None
    )
    docs_dir = FS.join(path, "docs")
    ix = InvertedIndex(
        spark,
        blocks=spark.read.parquet(FS.join(path, "blocks")),
        term_stats=spark.read.parquet(FS.join(path, "term_stats")),
        field_stats=spark.read.parquet(FS.join(path, "field_stats")),
        doc_lengths=spark.read.parquet(FS.join(path, "doc_lengths")),
        # absent when written with write_stored=False (family sub-index;
        # the family loader attaches the shared stored table)
        docs=(spark.read.parquet(docs_dir)
              if FS.isdir_nonempty(docs_dir) else None),
        field=manifest["field"],
        deleted=deleted,
    )
    ix.manifest = manifest
    ix.path = path
    ix.analyzer = manifest.get("analyzer", "standard")
    ix.text_col = manifest.get("text_col", "text")
    ix.posting_format = manifest.get("posting_format", "positions")
    offsets_dir = FS.join(path, "char_offsets")
    ix.char_offsets = (
        spark.read.parquet(offsets_dir)
        if FS.isdir_nonempty(offsets_dir) else None
    )
    boosts_dir = FS.join(path, "boosts")
    ix.boosts = (
        spark.read.parquet(boosts_dir).select("term", "doc_id", "w")
        if FS.isdir_nonempty(boosts_dir) else None
    )
    pair_dir = FS.join(path, PAIR_DIR)
    if (manifest.get("phrase_pairs")
            and FS.read_text(FS.join(pair_dir, MANIFEST)) is not None):
        # the accel segment is only attached when BOTH manifests vouch for
        # it (mutating writers clear the outer flag when they invalidate
        # it; a crashed pair build leaves no inner manifest)
        ix.pairs = load_index(spark, pair_dir)
        ix.pair_min_df = int(manifest.get("pair_min_df", 0))
    tri_dir = FS.join(path, TRI_DIR)
    if (manifest.get("phrase_trigrams")
            and getattr(ix, "pairs", None) is not None
            and FS.read_text(FS.join(tri_dir, MANIFEST)) is not None):
        # double-vouch rule PLUS an attached pair segment: the trigram
        # router's hot-eligibility gate reads ix.pair_min_df, which only
        # the pair attach sets — a trigram segment without it would claim
        # absence-proofs for never-indexed cold trigrams
        ix.trigrams = load_index(spark, tri_dir)
    return ix


def delete_documents(spark: SparkSession, path: str,
                     doc_ids: list[int] | None = None,
                     where: str | None = None) -> int:
    """Soft delete (``writing.py::delete_by_term/query ≈L480``): append doc
    ids to the ``deleted`` overlay table (Iceberg delete-file analog).
    ``where`` is a SQL predicate over the stored docs table.  Postings stay
    until the next full rewrite; readers anti-join the overlay."""
    if doc_ids is not None:
        df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    elif where is not None:
        df = spark.read.parquet(FS.join(path, "docs")).where(where).select("doc_id")
    else:
        raise ValueError("need doc_ids or where")
    n = df.count()
    df.write.mode("append").parquet(FS.join(path, "deleted"))
    _append_log(path, {"phase": "delete", "n_docs": int(n), "ts": time.time()})
    if n:
        _bump_generation(path)
    return int(n)


def delete_by_query(spark: SparkSession, path: str, query,
                    fields: dict | None = None) -> int:
    """Soft delete every doc matching a search query
    (``src/whoosh/writing.py::IndexWriter.delete_by_query ≈L510``).

    ``query`` is a parsed :mod:`whoosh_spark.query.ast` node or a query
    string (parsed with :func:`whoosh_spark.query.parser.parse_query`,
    ``fields`` forwarded).  The matching doc ids flow straight from the
    query plan into the ``deleted`` overlay — a distributed append, no
    driver-side id collection — so it scales with the match count.
    """
    from whoosh_spark.query import ast as Q
    from whoosh_spark.search import Searcher

    if isinstance(query, str):
        from whoosh_spark.query.parser import parse_query

        query = parse_query(query, fields=fields)
    if not isinstance(query, Q.Query):
        raise TypeError(f"query must be a Query or str, got {type(query)!r}")
    ix = load_index(spark, path)
    hits = Searcher(ix).docs_for_query(query).persist()
    try:
        n = hits.count()
        if n:
            hits.write.mode("append").parquet(FS.join(path, "deleted"))
    finally:
        hits.unpersist()
    _append_log(path, {"phase": "delete", "n_docs": int(n),
                       "query": repr(query), "ts": time.time()})
    if n:
        _bump_generation(path)
    return int(n)


def merge_indexes(spark: SparkSession, src_paths: list[str], dst_path: str,
                  field: str = TEXT_FIELD) -> dict:
    """Merge several persisted indexes into a new one
    (``src/whoosh/writing.py::IndexWriter.add_reader ≈L500`` — the API
    upstream uses to merge whole indexes/segments through a writer).

    Upstream semantics kept:
      * docs keep their per-source relative order; doc ids are remapped by a
        per-source offset (source i's ids shift past source i-1's max id);
      * soft-deleted docs in a source are PURGED during the merge
        (``add_reader`` iterates only live docs);
      * every source must share the analyzer chain and posting format —
        merging token streams from different chains is refused, the same
        guard the resume path applies.

    Spark-first plan: the id remap is a narrow column add per source; the
    only wide stage is the same posting shuffle-merge a compaction runs.
    Analyzed token segments are unioned (not re-analyzed), so merge cost is
    independent of analyzer cost — exactly upstream's "copy postings, don't
    re-index" contract.
    """
    if len(src_paths) < 2:
        raise ValueError("merge_indexes needs at least two source indexes")

    def _canon(p: str) -> str:
        # 'file:///x', 'file:/x' (Hadoop single-slash), 'FILE://x', '/x'
        # and a relative spelling of the same dir must all compare equal —
        # a string-only guard lets a self-merge through and the in-place
        # overwrite of dst's analyzed/ corrupts it
        from urllib.parse import urlparse

        u = urlparse(p)
        scheme = u.scheme.lower()
        if scheme == "file":
            # netloc is empty for the /// and single-slash spellings; a
            # nonstandard 'file://relative/x' folds netloc into the path
            q = (u.netloc or "") + u.path
            return os.path.abspath(q).rstrip("/")
        if scheme and FS.is_uri(p):
            # remote URI: normalize scheme case + slash count only
            return f"{scheme}://{u.netloc}{u.path}".rstrip("/")
        return os.path.abspath(p).rstrip("/")

    norm_dst = _canon(dst_path)
    if any(_canon(p) == norm_dst for p in src_paths):
        raise ValueError("dst_path must not be one of the sources — the "
                         "merge overwrites dst's analyzed segments in place")
    manifests = []
    for p in src_paths:
        raw = FS.read_text(FS.join(p, MANIFEST))
        if raw is None:
            raise FileNotFoundError(f"no {MANIFEST} under {p!r}")
        manifests.append(json.loads(raw))
    an0 = manifests[0].get("analyzer", "standard")
    fmt0 = manifests[0].get("posting_format", "positions")
    txt0 = manifests[0].get("text_col", "text")
    for p, m in zip(src_paths[1:], manifests[1:]):
        if m.get("analyzer", "standard") != an0:
            raise ValueError(
                f"analyzer mismatch: {src_paths[0]!r} uses {an0!r}, {p!r} "
                f"uses {m.get('analyzer', 'standard')!r} — same-chain "
                f"sources only (token streams are merged, not re-analyzed)")
        if m.get("posting_format", "positions") != fmt0:
            raise ValueError(
                f"posting format mismatch: {fmt0!r} vs "
                f"{m.get('posting_format', 'positions')!r} under {p!r}")

    # per-source id spans → cumulative offsets (ids need not be contiguous,
    # so span from the real max id, not the manifest doc count)
    offsets, nxt = [], 0
    for p in src_paths:
        offsets.append(nxt)
        mx = (spark.read.parquet(FS.join(p, "doc_lengths"))
              .agg(F.max("doc_id").alias("m")).collect()[0]["m"])
        nxt += int(mx) + 1

    def _live_remapped(p: str, off: int, sub: str, cols=None) -> DataFrame | None:
        d = FS.join(p, sub)
        if not FS.isdir_nonempty(d):
            return None
        df = spark.read.parquet(d)
        if cols:
            df = df.select(*cols)
        dd = FS.join(p, "deleted")
        if FS.isdir_nonempty(dd):
            # no broadcast hint: the overlay is usually tiny (AQE broadcasts
            # it anyway) but a mass-delete source can make it corpus-sized —
            # a forced broadcast would OOM the driver there
            dead = spark.read.parquet(dd).select("doc_id").distinct()
            df = df.join(dead, "doc_id", "left_anti")
        return df.withColumn("doc_id", (F.col("doc_id") + F.lit(off)).cast("long"))

    merged_an = None
    for p, off in zip(src_paths, offsets):
        an = _live_remapped(p, off, "analyzed")
        if an is None:
            raise FileNotFoundError(
                f"{p!r} has no analyzed/ token segments — only block-codec "
                "indexes with their analyzed checkpoints can be merged")
        an = an.drop("chunk", "batch")
        merged_an = an if merged_an is None else merged_an.unionByName(an)

    # land the merged token segments as ONE batch dir (the checkpoint unit),
    # then let the standard compaction path rebuild every query table
    bid = f"merge-{int(time.time() * 1000)}"
    an_dir = FS.join(dst_path, "analyzed")
    FS.makedirs(an_dir)
    # a pre-existing pair accelerator at dst describes a corpus this merge
    # replaces — drop it before compact can re-vouch for the stale dir
    _drop_pair_index(dst_path, "merge_indexes rewrites dst")
    (merged_an
     .withColumn("chunk", F.shiftright(F.col("doc_id"), DEFAULT_CHUNK_BITS))
     .write.mode("overwrite")
     .parquet(FS.join(an_dir, f"batch={bid}")))
    _append_log(dst_path, {"phase": "analyze", "batch": bid,
                           "chunks": [], "counters": {},
                           "analyzer": an0, "posting_format": fmt0,
                           "note": f"merge_indexes from {len(src_paths)} sources",
                           "sources": list(src_paths),
                           "offsets": [int(o) for o in offsets],
                           "wall_ms": 0, "ts": time.time()})

    # side segments (chars/boosts) union with the same remap + purge
    for sub, cols in (("char_offsets", None), ("boosts", ["doc_id", "term", "w"])):
        parts = [d for d in (_live_remapped(p, off, sub, cols)
                             for p, off in zip(src_paths, offsets))
                 if d is not None]
        if parts:
            out = parts[0]
            for d in parts[1:]:
                out = out.unionByName(d)
            out.write.mode("overwrite").parquet(FS.join(dst_path, sub))

    merged_docs = None
    for p, off in zip(src_paths, offsets):
        d = _live_remapped(p, off, "docs")
        if d is None:
            continue
        merged_docs = d if merged_docs is None else merged_docs.unionByName(
            d, allowMissingColumns=True)

    # seed manifest so compaction declares the right chain/format/text col
    # (it is immediately replaced by the full manifest compact writes)
    FS.write_text_atomic(
        FS.join(dst_path, MANIFEST),
        json.dumps({"format": "whoosh-spark/1", "field": field,
                    "analyzer": an0, "posting_format": fmt0,
                    "lang_col": manifests[0].get("lang_col"),
                    "text_col": txt0, "n_docs": 0, "total_len": 0}))
    manifest = compact_index(spark, dst_path, field=field,
                             store_docs=merged_docs, text_col=txt0)
    return manifest


def uncommitted_batches(path: str) -> list[str]:
    """Analyzed micro-segment batch ids not yet folded into the query tables.

    The build log is append-only: a ``merge`` record (full build phase 2 /
    compaction) commits every batch logged before it; ``commit`` records
    (incremental :func:`commit_segments`) commit the batches they list.
    Anything analyzed after the last merge and not named by a commit is
    pending — exactly the segments a Whoosh reader would not see before
    ``writer.commit()``.
    """
    log = _read_log(path)
    last_merge = -1
    for i, rec in enumerate(log):
        if rec.get("phase") == "merge":
            last_merge = i
    committed: set = set()
    pending: list[str] = []
    for rec in log[last_merge + 1:]:
        if rec.get("phase") == "analyze":
            pending.append(rec.get("batch"))
        elif rec.get("phase") == "commit":
            committed.update(rec.get("batches", []))
    return [b for b in pending if b not in committed]


def commit_segments(spark: SparkSession, path: str, field: str = TEXT_FIELD,
                    store_docs: DataFrame | None = None) -> dict:
    """Incrementally commit pending micro-segments WITHOUT a full rewrite
    (``src/whoosh/writing.py::IndexWriter.commit ≈L900`` with the default
    no-OPTIMIZE merge policy: the new segment becomes searchable; existing
    segments are left untouched until a later merge).

    Scale contract — this is the piece that makes streaming ingestion viable
    at corpus scale: cost is O(delta) + O(vocabulary), never O(corpus).

      * delta postings: block-encode ONLY the pending batches and APPEND to
        ``blocks/`` — the decoder treats every block row independently, so
        same-term blocks from different commits coexist (new doc ids live in
        their own id range; postings never overlap);
      * term_stats: additive merge (df/cf sums, max of max_weight, min/max
        id bounds) of the old table with the delta's — O(vocab) rows, then
        an atomic tmp+rename swap;
      * doc_lengths: append; field_stats: O(1) additive merge of the two
        1-row tables.

    Global BM25 stats (df, N, avgdl) are exact after the merge, so scores
    equal a from-scratch build's bit-for-bit (pinned in tests).
    ``compact_index`` remains the OPTIMIZE analog that re-merges everything.

    ``store_docs``: stored fields for the NEW docs only (appended to
    ``docs/``) — streaming ingest does not write stored fields itself.
    """
    t0 = time.perf_counter()
    pending = uncommitted_batches(path)
    if not pending:
        return {"committed": [], "n_new_docs": 0}
    # the fold adds docs the pair accelerator has never seen — invalidate
    _drop_pair_index(path, "commit_segments adds docs")
    an_dir = FS.join(path, "analyzed")
    delta = None
    for b in pending:
        d = spark.read.parquet(FS.join(an_dir, f"batch={b}")).drop("chunk", "batch")
        delta = d if delta is None else delta.unionByName(d)

    # ---- delta blocks: encode + append ------------------------------------
    dblocks = B.posting_blocks_from_analyzed(delta, field).persist()
    try:
        dblocks.write.mode("append").parquet(FS.join(path, "blocks"))
        d_ts = B.term_stats(dblocks)
        d_nblocks = dblocks.count()

        # ---- term_stats: additive merge + atomic swap ----------------------
        ts_dir = FS.join(path, "term_stats")
        old_ts = spark.read.parquet(ts_dir)
        new_ts = (old_ts.unionByName(d_ts)
                  .groupBy("field", "term")
                  .agg(F.sum("df").cast("long").alias("df"),
                       F.sum("cf").cast("long").alias("cf"),
                       F.max("max_weight").cast("double").alias("max_weight"),
                       F.min("min_id").alias("min_id"),
                       F.max("max_id").alias("max_id")))
        tmp_ts = FS.join(path, "term_stats_commit_tmp")
        new_ts.write.mode("overwrite").parquet(tmp_ts)
        FS.rmtree(ts_dir)
        FS.rename(tmp_ts, ts_dir)
    finally:
        dblocks.unpersist()

    # ---- doc_lengths: append; field_stats: 1-row additive merge ----------
    d_len = B.doc_lengths(delta).persist()
    try:
        d_len.write.mode("append").parquet(FS.join(path, "doc_lengths"))
        d_fs = B.field_stats(d_len, field).collect()[0]
    finally:
        d_len.unpersist()
    fs_dir = FS.join(path, "field_stats")
    old_fs = spark.read.parquet(fs_dir).collect()[0]
    d_empty = int(d_fs["doc_count"] or 0) == 0
    merged_fs = spark.createDataFrame(
        [(field,
          int(old_fs["doc_count"]) + int(d_fs["doc_count"] or 0),
          int(old_fs["total_len"]) + int(d_fs["total_len"] or 0),
          int(old_fs["min_len"] if d_empty
              else min(old_fs["min_len"], d_fs["min_len"])),
          int(old_fs["max_len"] if d_empty
              else max(old_fs["max_len"], d_fs["max_len"])))],
        "field string, doc_count long, total_len long, min_len int, max_len int")
    tmp_fs = FS.join(path, "field_stats_commit_tmp")
    merged_fs.write.mode("overwrite").parquet(tmp_fs)
    FS.rmtree(fs_dir)
    FS.rename(tmp_fs, fs_dir)

    if store_docs is not None:
        raw0 = FS.read_text(FS.join(path, MANIFEST))
        m0 = json.loads(raw0) if raw0 else {}
        txt = m0.get("text_col", "text")
        # a store_text=True index keeps the text column in docs/ — dropping
        # it here would give writer-added docs null stored text while
        # pre-existing docs still return theirs
        keep = store_docs if m0.get("store_text") else store_docs.drop(txt)
        _drop_unstorable(keep).write.mode("append").parquet(
            FS.join(path, "docs"))

    _append_log(path, {"phase": "commit", "batches": list(pending),
                       "n_docs": int(d_fs["doc_count"]),
                       "n_blocks": int(d_nblocks),
                       "wall_ms": int(1000 * (time.perf_counter() - t0)),
                       "ts": time.time()})

    # ---- manifest swap (the commit point, same as every writer) ----------
    raw = FS.read_text(FS.join(path, MANIFEST))
    manifest = json.loads(raw) if raw else {"format": "whoosh-spark/1",
                                            "field": field}
    manifest["generation"] = _next_generation(path)
    manifest["n_docs"] = int(old_fs["doc_count"]) + int(d_fs["doc_count"] or 0)
    manifest["total_len"] = (int(old_fs["total_len"])
                             + int(d_fs["total_len"] or 0))
    manifest["n_terms"] = spark.read.parquet(
        FS.join(path, "term_stats")).count()
    manifest["n_blocks"] = int(manifest.get("n_blocks", 0)) + int(d_nblocks)
    FS.write_text_atomic(FS.join(path, MANIFEST), json.dumps(manifest, indent=1))
    return {"committed": list(pending), "n_new_docs": int(d_fs["doc_count"]),
            "n_new_blocks": int(d_nblocks), "manifest": manifest}


def build_log(path: str) -> list[dict]:
    """Lineage records (public accessor for tests/ops)."""
    return _read_log(path)


def compact_index(spark: SparkSession, path: str, field: str = TEXT_FIELD,
                  store_docs: DataFrame | None = None, text_col: str = "text",
                  purge_deleted: bool = False) -> dict:
    """Merge every analyzed segment into fresh query tables + manifest swap
    (Whoosh OPTIMIZE merge policy, ``writing.py ≈L60``).

    ``purge_deleted=True`` additionally drops soft-deleted docs from the
    analyzed input, rewrites doc_lengths/field_stats without them, and clears
    the overlay — the physical purge that deleted-doc bitsets defer.
    """
    t0 = time.perf_counter()
    # compaction re-merges already-analyzed tokens (no re-analysis), but the
    # manifest must keep declaring the chain those tokens came from — and
    # the source column they were analyzed out of
    prev_analyzer = manifest_analyzer(path)
    prev_fmt = manifest_posting_format(path)
    _raw = FS.read_text(FS.join(path, MANIFEST))
    _prev = json.loads(_raw) if _raw else {}
    prev_text_col = _prev.get("text_col", "text")
    prev_id_col = _prev.get("id_col", "doc_id")
    prev_lang_col = _prev.get("lang_col")
    if uncommitted_batches(path):
        # this compaction folds streamed micro-segments the pair
        # accelerator has never seen — a "doc-set-preserving" compaction
        # it is not; drop the segment rather than re-vouch for it
        _drop_pair_index(path, "compaction folds uncommitted segments")
    analyzed = _rebalance(
        spark.read.parquet(FS.join(path, "analyzed")).drop("chunk", "batch"),
        spark)
    deleted_dir = FS.join(path, "deleted")
    has_deleted = FS.isdir_nonempty(deleted_dir)
    if purge_deleted and has_deleted:
        # no broadcast hint (same rule as merge_indexes._live_remapped): the
        # overlay is usually tiny and AQE broadcasts it anyway, but a
        # mass-delete overlay can be corpus-sized — a forced broadcast would
        # OOM the driver exactly when the purge matters most
        dd = spark.read.parquet(deleted_dir).select("doc_id").distinct()
        analyzed = analyzed.join(dd, "doc_id", "left_anti")
        # The overlay can only be dropped once the purged docs are PHYSICALLY
        # gone from analyzed/ — otherwise any later compaction re-merges the
        # old segments with no overlay left and resurrects them.  Rewrite
        # analyzed/ as one compacted batch first, then drop the overlay.
        # (Not crash-atomic mid-sequence, same as every overwrite here; the
        # manifest swap at the end is the commit point.)
        an_dir = FS.join(path, "analyzed")
        tmp_an = FS.join(path, "analyzed_purge_tmp")
        analyzed.withColumn("chunk", F.lit(-1)).write.mode("overwrite").parquet(tmp_an)
        FS.rmtree(an_dir)
        FS.makedirs(an_dir)
        bid = f"purge-{int(time.time() * 1000)}"
        FS.rename(tmp_an, FS.join(an_dir, f"batch={bid}"))
        _append_log(path, {"phase": "analyze", "batch": bid, "chunks": [],
                           "counters": {}, "note": "purge-compaction rewrite",
                           "wall_ms": 0, "ts": time.time()})
        analyzed = spark.read.parquet(an_dir).drop("chunk", "batch")
        offsets_dir = FS.join(path, "char_offsets")
        if FS.isdir_nonempty(offsets_dir):
            # Characters segment is keyed by doc_id: rewrite it without the
            # purged docs so a later lookup can't see spans for ghosts
            kept = (spark.read.parquet(offsets_dir)
                    .join(dd, "doc_id", "left_anti"))
            tmp_off = FS.join(path, "char_offsets_purge_tmp")
            kept.write.mode("overwrite").parquet(tmp_off)
            FS.rmtree(offsets_dir)
            FS.rename(tmp_off, offsets_dir)
        boosts_dir = FS.join(path, "boosts")
        if FS.isdir_nonempty(boosts_dir):
            # boost overlay is keyed by doc_id too: purge its ghost rows
            keptb = (spark.read.parquet(boosts_dir)
                     .join(dd, "doc_id", "left_anti"))
            tmp_b = FS.join(path, "boosts_purge_tmp")
            keptb.write.mode("overwrite").parquet(tmp_b)
            FS.rmtree(boosts_dir)
            FS.rename(tmp_b, boosts_dir)
        FS.rmtree(deleted_dir)
        # the purge shrank the doc set but the pair accelerator's stats
        # (phrase df -> freq-scoring idf) still count the ghosts — drop it
        _drop_pair_index(path, "purge compaction changed the doc set")
    # sized AFTER any purge rewrite so the width reflects the kept bytes
    merge_n, _ = _merge_partitions(spark, FS.join(path, "analyzed"))
    blocks = B.posting_blocks_from_analyzed(analyzed, field, n_part=merge_n)
    blocks.write.mode("overwrite").parquet(FS.join(path, "blocks"))
    blocks_r = spark.read.parquet(FS.join(path, "blocks"))
    B.term_stats(blocks_r).write.mode("overwrite").parquet(
        FS.join(path, "term_stats"))
    lengths = B.doc_lengths(analyzed)
    lengths.write.mode("overwrite").parquet(FS.join(path, "doc_lengths"))
    lengths_r = spark.read.parquet(FS.join(path, "doc_lengths"))
    B.field_stats(lengths_r, field).write.mode("overwrite").parquet(
        FS.join(path, "field_stats"))
    if store_docs is not None:
        stored = _drop_unstorable(store_docs.drop(text_col))
        stored.write.mode("overwrite").parquet(FS.join(path, "docs"))
    _append_log(
        path, {"phase": "merge", "purge": bool(purge_deleted),
               "merge_partitions": merge_n,
               "wall_ms": int(1000 * (time.perf_counter() - t0)), "ts": time.time()})
    fs_row = spark.read.parquet(FS.join(path, "field_stats")).collect()[0]
    # a doc-set-preserving compaction keeps the pair accelerator valid (it
    # is keyed by doc_id and content, both unchanged); the purge and
    # uncommitted-fold branches above already dropped it.  Vouch only for a
    # COMPLETE segment (inner manifest present — a crashed pair build
    # leaves none), and take the threshold from the segment's OWN
    # _pair_meta.json (the authoritative record _prepare_pair_dir writes):
    # the pre-compaction outer manifest can predate the pair build — e.g. a
    # crash between the inner build and the outer commit leaves it saying
    # pair_min_df=0 for a hot-only segment, and re-vouching that would
    # route rare-constituent phrases into the accelerator to a silent empty
    pair_df = _pair_segment_min_df(path)
    tri_df = _pair_segment_min_df(path, TRI_DIR)
    manifest = {
        "format": "whoosh-spark/1",
        "generation": _next_generation(path),
        "field": field,
        "chunk_bits": None,
        "n_docs": int(fs_row["doc_count"]),
        "total_len": int(fs_row["total_len"]),
        "n_terms": blocks_r.select("term").distinct().count(),
        "n_blocks": blocks_r.count(),
        "store_text": False,
        "analyzer": prev_analyzer,
        "lang_col": prev_lang_col,
        "text_col": prev_text_col,
        "id_col": prev_id_col,
        "posting_format": prev_fmt,
        "phrase_pairs": pair_df is not None,
        "pair_min_df": pair_df if pair_df is not None else 0,
        # trigrams are only servable next to a SAME-threshold pair segment
        # (the router's eligibility check reads one pair_min_df); a
        # mismatched or orphaned TRI_DIR must not be resurrected
        "phrase_trigrams": (tri_df is not None and pair_df is not None
                            and tri_df == pair_df),
        "build_wall_s": round(time.perf_counter() - t0, 3),
    }
    FS.write_text_atomic(FS.join(path, MANIFEST), json.dumps(manifest, indent=1))
    return manifest


def upsert_documents(spark: SparkSession, path: str, new_docs: DataFrame,
                     key: str = "url", text_col: str = "text",
                     field: str = TEXT_FIELD) -> dict:
    """``writing.py::IndexWriter.update_document (≈L520)``: delete-by-unique-
    key then add.  Old versions are soft-deleted (postings stay until a
    purge compaction); new versions get fresh doc_ids above the current max
    so the overlay can never hide them.
    """
    stored = spark.read.parquet(FS.join(path, "docs"))
    if key not in stored.columns:
        raise ValueError(f"stored docs have no unique key column {key!r}")
    # new doc versions are invisible to the pair accelerator — invalidate
    _drop_pair_index(path, "upsert adds docs")
    victims = (
        stored.join(F.broadcast(new_docs.select(key).distinct()), key, "left_semi")
        .select("doc_id")
    )
    victim_ids = [int(r["doc_id"]) for r in victims.collect()]
    if victim_ids:
        delete_documents(spark, path, doc_ids=victim_ids)

    max_id = spark.read.parquet(FS.join(path, "doc_lengths")).agg(
        F.max("doc_id")).collect()[0][0] or 0
    from pyspark.sql.window import Window

    # global window is fine HERE: it ranks only this upsert's new docs
    # (batch-sized), not the corpus — dense ids above max_id need a total
    # order over exactly these rows
    w = Window.orderBy(key)
    renumbered = new_docs.withColumn(
        "doc_id", (F.lit(int(max_id)) + F.row_number().over(w)).cast("long"))
    _man = json.loads(FS.read_text(FS.join(path, MANIFEST)) or "{}")
    analyzed = B.analyzed_docs(renumbered, "doc_id", text_col,
                               analyzer=manifest_analyzer(path),
                               format=manifest_posting_format(path),
                               lang_col=_man.get("lang_col"),
                               ).withColumn("chunk", F.lit(-1))
    offsets_dir = FS.join(path, "char_offsets")
    if FS.isdir_nonempty(offsets_dir):
        # keep the Characters segment live across upserts: append spans for
        # the new doc_ids (old versions are soft-deleted, so their rows are
        # unreachable via search and get dropped at purge compaction)
        from whoosh_spark.chars import char_offsets as _char_offsets

        _char_offsets(renumbered, "doc_id", text_col).write.mode(
            "append").parquet(offsets_dir)
    boosts_dir = FS.join(path, "boosts")
    if FS.isdir_nonempty(boosts_dir):
        # same liveness rule for the PositionBoosts overlay
        from whoosh_spark.boosts import token_boost_overlay

        token_boost_overlay(renumbered, "doc_id", text_col).write.mode(
            "append").parquet(boosts_dir)
    bid = f"upsert-{int(time.time() * 1000)}"
    analyzed.write.mode("overwrite").parquet(
        FS.join(path, "analyzed", f"batch={bid}"))
    _append_log(path, {"phase": "analyze", "batch": bid, "chunks": [],
                       "counters": {}, "wall_ms": 0, "ts": time.time()})
    # merge new segment + rewrite stored docs (old rows of updated keys out)
    new_stored = stored.join(
        F.broadcast(new_docs.select(key).distinct()), key, "left_anti")
    add_stored = _drop_unstorable(renumbered.drop(text_col))
    merged_docs = new_stored.unionByName(add_stored, allowMissingColumns=True)
    # materialize before the overwrite that reads from the same dir
    tmp_docs = FS.join(path, "docs_tmp")
    merged_docs.write.mode("overwrite").parquet(tmp_docs)
    merged_r = spark.read.parquet(tmp_docs)
    manifest = compact_index(spark, path, field=field)
    merged_r.write.mode("overwrite").parquet(FS.join(path, "docs"))
    FS.rmtree(tmp_docs)
    return manifest


# ---------------------------------------------------------------------------
# Iceberg sink swap
# ---------------------------------------------------------------------------

INDEX_TABLES = ("blocks", "term_stats", "field_stats", "doc_lengths", "docs")


def export_to_iceberg(spark: SparkSession, path: str, table_prefix: str) -> list[str]:
    """Publish a built index's tables into an Iceberg catalog —
    ``<table_prefix>_blocks`` etc. via ``writeTo(...).using("iceberg")``.

    This is the documented "sink swap" for the manifest-over-parquet layout:
    the dataflow that produces the tables is unchanged; Iceberg replaces the
    manifest.json TOC with catalog snapshot commits (atomic on object
    stores, where a rename-based manifest swap is not).  Requires the
    Iceberg runtime jar + a configured catalog on the session; raises a
    clear RuntimeError otherwise (the sandbox ships no Iceberg runtime, so
    only the error path is exercisable in tests — the write path is the
    stock DataFrameWriterV2 API).
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception as e:
        raise RuntimeError(
            "Iceberg runtime not on the classpath: add the "
            "iceberg-spark-runtime jar and a spark.sql.catalog.<name> "
            "configuration, then re-run export_to_iceberg"
        ) from e
    tables = list(INDEX_TABLES)
    # the soft-delete overlay is part of the index state: without it a
    # consumer of the exported tables would resurrect deleted docs
    if FS.isdir_nonempty(FS.join(path, "deleted")):
        tables.append("deleted")
    out = []
    for t in tables:
        df = spark.read.parquet(FS.join(path, t))
        target = f"{table_prefix}_{t}"
        df.writeTo(target).using("iceberg").createOrReplace()
        out.append(target)
    return out
