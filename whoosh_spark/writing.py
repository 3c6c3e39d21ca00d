"""Writer-object API: ``IndexWriter`` / ``AsyncWriter`` / ``BufferedWriter``
(``src/whoosh/writing.py::IndexWriter ≈L300``, ``AsyncWriter ≈L950``,
``BufferedWriter ≈L1000``).

The round-3 engine already had every *capability* (micro-segment ingest,
O(delta) ``commit_segments``, upsert, delete-by-query, OPTIMIZE
compaction); this module adds upstream's object SURFACE over them, so code
written against ``ix.writer()`` idioms ports directly:

    w = IndexWriter(spark, path)
    w.add_document(doc_id=.., text="...", lang="en")
    w.update_document(url="u", text="new")      # delete-by-key + add
    w.delete_document(17)
    w.commit()                                   # or commit(optimize=True)

Buffered docs live driver-side until commit (they are the RAM segment —
bounded by the writer's batching discipline, not corpus-sized); commit
analyzes them as ONE distributed micro-segment batch and folds it with the
O(delta) incremental commit.  ``merge=False`` leaves the segment pending
(Whoosh's no-merge policy) for a later ``commit_segments``/compaction.
"""

from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_spark import build as B
from whoosh_spark import fs as FS
from whoosh_spark import store
from whoosh_spark.config import TEXT_FIELD

LOCK_FILE = "_writer.lock"


class LockError(TimeoutError):
    """Could not acquire the per-index commit lock within the timeout."""


@contextmanager
def _commit_lock(path: str, timeout: float = 120.0,
                 stale_after: float = 600.0):
    """Per-index-path advisory commit lock (upstream's index-lock analog,
    ``src/whoosh/index.py::FileIndex.lock ≈L430``).

    Serializes writer commits against each other: the fold path is
    crash-atomic (append-only analyze log + atomic manifest swap), but two
    INTERLEAVED folds could each merge a table set missing the other's
    just-written micro-segment and the later manifest would win — the lock
    makes commits sequential, so every fold sees every earlier batch.
    Locks from crashed writers are broken after ``stale_after`` seconds
    (the payload records owner pid + timestamp)."""
    lock = FS.join(path, LOCK_FILE)
    t0 = time.monotonic()
    deadline = t0 + timeout
    while True:
        if FS.create_exclusive(
                lock, json.dumps({"pid": os.getpid(), "ts": time.time()})):
            break
        raw = FS.read_text(lock)
        try:
            ts = json.loads(raw).get("ts", 0) if raw else 0
        except (ValueError, AttributeError):
            ts = 0
        if ts and time.time() - ts > stale_after:
            FS.remove(lock)  # dead owner: break the lock
            continue
        if not ts and time.monotonic() - t0 > stale_after:
            # unreadable for the WHOLE grace period: break it.  An empty
            # read can also be the holder's create->write window (the two
            # file ops aren't one atomic step), so a fresh empty lock is
            # treated as live and re-read on the next poll — breaking it
            # immediately would let two commits fold concurrently
            FS.remove(lock)
            continue
        if time.monotonic() > deadline:
            raise LockError(
                f"commit lock busy for {timeout:.0f}s: {lock} (held by "
                f"{raw}); a crashed holder is broken automatically after "
                f"{stale_after:.0f}s")
        time.sleep(0.2)
    try:
        yield
    finally:
        FS.remove(lock)


class IndexWriter:
    """Buffered writer over a persisted index (``writing.py::IndexWriter``).

    Context-manager semantics match upstream: a clean ``with`` exit
    commits, an exception cancels."""

    def __init__(self, spark: SparkSession, path: str, key: str = "url"):
        self.spark = spark
        self.path = path
        self.key = key
        raw = FS.read_text(FS.join(path, store.MANIFEST))
        if raw is None:
            raise FileNotFoundError(f"no index manifest under {path!r} — "
                                    "create one with write_index first")
        self.manifest = json.loads(raw)
        self.text_col = self.manifest.get("text_col", "text")
        self.field = self.manifest.get("field", TEXT_FIELD)
        self._adds: list[dict] = []
        self._updates: list[dict] = []
        self._deletes: list[int] = []
        self._delete_queries: list = []
        self._closed = False

    # ---- buffering ---------------------------------------------------------
    def add_document(self, **fields) -> None:
        """Buffer one document.  ``text_col`` is required; ``doc_id`` is
        optional (missing ids are assigned above the corpus max at commit,
        upstream's docnum assignment)."""
        self._check_open()
        if self.text_col not in fields:
            raise ValueError(f"add_document needs the index's text column "
                             f"{self.text_col!r}")
        self._adds.append(dict(fields))

    def update_document(self, **fields) -> None:
        """Buffer a delete-by-unique-key + add (``update_document ≈L520``).
        The key column (writer's ``key``, default 'url') must be present
        and stored in the index."""
        self._check_open()
        if self.key not in fields:
            raise ValueError(f"update_document needs the unique key "
                             f"{self.key!r}")
        if self.text_col not in fields:
            raise ValueError(f"update_document needs the index's text "
                             f"column {self.text_col!r}")
        self._updates.append(dict(fields))

    def delete_document(self, doc_id: int) -> None:
        self._check_open()
        self._deletes.append(int(doc_id))

    def delete_by_term(self, term: str) -> None:
        """Soft-delete every document containing ``term`` (upstream
        ``delete_by_term``; resolved distributed at commit)."""
        from whoosh_spark.query import ast as Q

        self._check_open()
        self._delete_queries.append(Q.Term(term))

    def delete_by_query(self, q) -> None:
        self._check_open()
        self._delete_queries.append(q)

    def cancel(self) -> None:
        """Drop every buffered change (``IndexWriter.cancel``)."""
        self._adds.clear()
        self._updates.clear()
        self._deletes.clear()
        self._delete_queries.clear()
        self._closed = True

    # ---- commit ------------------------------------------------------------
    def commit(self, optimize: bool = False, merge: bool = True) -> dict:
        """Apply deletes → updates → adds, then fold (O(delta) incremental
        commit).  ``optimize=True`` runs the full OPTIMIZE compaction after;
        ``merge=False`` leaves the new micro-segment pending (searchable
        only after a later commit/compaction — Whoosh's NO_MERGE policy).

        Commits on the same path serialize through the per-index lock
        (``_commit_lock``) — a writer whose commit races another (e.g. an
        ``AsyncWriter`` still folding) WAITS, then re-reads the manifest so
        its fold runs against the generation the earlier commit produced
        (the generation-check-and-retry upstream's AsyncWriter does with
        the index lock)."""
        self._check_open()
        with _commit_lock(self.path):
            return self._commit_locked(optimize, merge)

    def _commit_locked(self, optimize: bool, merge: bool) -> dict:
        spark = self.spark
        # refresh the manifest under the lock: a commit that queued behind
        # another writer must fold against the NEW generation's config
        raw = FS.read_text(FS.join(self.path, store.MANIFEST))
        if raw is not None:
            self.manifest = json.loads(raw)
            self.text_col = self.manifest.get("text_col", "text")
            self.field = self.manifest.get("field", TEXT_FIELD)
        out: dict = {"adds": len(self._adds), "updates": len(self._updates),
                     "deletes": len(self._deletes) + len(self._delete_queries)}
        for q in self._delete_queries:
            store.delete_by_query(spark, self.path, q)
        if self._deletes:
            store.delete_documents(spark, self.path, doc_ids=self._deletes)
        if self._updates:
            store.upsert_documents(
                spark, self.path, self._rows_df(self._updates),
                key=self.key, text_col=self.text_col, field=self.field)
        if self._adds:
            rows = self._assign_ids(self._adds)
            docs = self._rows_df(rows)
            # uuid suffix: two commits in the same millisecond (AsyncWriter
            # overlap) must not share a batch dir — overwrite would silently
            # drop the first commit's documents
            import uuid

            bid = f"writer-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
            analyzed = B.analyzed_docs(
                docs, "doc_id", self.text_col,
                analyzer=self.manifest.get("analyzer", "standard"),
                format=self.manifest.get("posting_format", "positions"),
                lang_col=self.manifest.get("lang_col"),
            ).withColumn("chunk", F.lit(-1))
            seg_dir = FS.join(self.path, "analyzed", f"batch={bid}")
            analyzed.write.mode("overwrite").parquet(seg_dir)
            n = spark.read.parquet(seg_dir).count()
            store._append_log(self.path, {
                "phase": "analyze", "batch": bid, "chunks": [],
                "counters": {"writer": {"n_docs": int(n), "n_tokens": -1}},
                "wall_ms": 0, "ts": time.time()})
            if merge:
                store.commit_segments(
                    spark, self.path, field=self.field,
                    store_docs=(docs if FS.isdir_nonempty(
                        FS.join(self.path, "docs")) else None))
        if optimize:
            store.compact_index(spark, self.path, field=self.field)
        self._adds.clear()
        self._updates.clear()
        self._deletes.clear()
        self._delete_queries.clear()
        self._closed = True
        return out

    # ---- helpers -----------------------------------------------------------
    def _assign_ids(self, rows: list[dict]) -> list[dict]:
        """Sequential ids above the corpus max — INCLUDING docs sitting in
        pending (merge=False) micro-segments, which are not in doc_lengths
        yet but will fold into the same id space.  Runs inside the commit
        lock, so two writers' interleaved commits read this max
        sequentially and never hand out the same id."""
        need = [r for r in rows if "doc_id" not in r]
        if need:
            mx = self.spark.read.parquet(
                FS.join(self.path, "doc_lengths")).agg(
                F.max("doc_id")).collect()[0][0]
            mx = int(mx if mx is not None else -1)
            for b in store.uncommitted_batches(self.path):
                seg = FS.join(self.path, "analyzed", f"batch={b}")
                if FS.isdir_nonempty(seg):
                    bmx = self.spark.read.parquet(seg).agg(
                        F.max("doc_id")).collect()[0][0]
                    if bmx is not None:
                        mx = max(mx, int(bmx))
            nxt = mx + 1
            for r in need:
                r["doc_id"] = nxt
                nxt += 1
        return rows

    def _rows_df(self, rows: list[dict]) -> DataFrame:
        cols: list[str] = []
        for r in rows:
            for k in r:
                if k not in cols:
                    cols.append(k)
        data = [tuple(r.get(c) for c in cols) for r in rows]
        import pandas as pd

        return self.spark.createDataFrame(pd.DataFrame(data, columns=cols))

    def _check_open(self) -> None:
        if self._closed:
            raise ValueError("writer already committed or cancelled "
                             "(upstream raises on reuse too)")

    def __enter__(self) -> "IndexWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            if not self._closed:
                self.commit()
        else:
            self.cancel()


class AsyncWriter(IndexWriter):
    """``writing.py::AsyncWriter ≈L950``: ``commit()`` returns immediately
    and folds on a background thread; ``join()`` waits.  The background
    commit takes the same per-index lock every commit does, so an
    AsyncWriter racing a plain writer (or another AsyncWriter) on one path
    serializes instead of interleaving folds — upstream's lock-retry
    semantics, with crash-atomicity from the append-only log + atomic
    manifest swap."""

    def __init__(self, spark: SparkSession, path: str, key: str = "url"):
        super().__init__(spark, path, key)
        self._thread: threading.Thread | None = None
        self.result: dict | None = None
        self.error: BaseException | None = None

    def commit(self, optimize: bool = False, merge: bool = True) -> None:  # type: ignore[override]
        self._check_open()

        def run(adds=self._adds[:], updates=self._updates[:],
                deletes=self._deletes[:], dq=self._delete_queries[:]):
            try:
                w = IndexWriter(self.spark, self.path, self.key)
                w._adds, w._updates, w._deletes, w._delete_queries = (
                    adds, updates, deletes, dq)
                self.result = w.commit(optimize=optimize, merge=merge)
            except BaseException as exc:  # surfaced by join(), never lost
                self.error = exc

        self._closed = True
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def join(self, timeout: float | None = None) -> dict | None:
        """Wait for the background commit; re-raises any exception it hit
        (a silently-lost commit is indistinguishable from a slow one
        otherwise).  Returns None only on a genuine timeout."""
        if self._thread is not None:
            self._thread.join(timeout)
        if self.error is not None:
            raise self.error
        return self.result


class BufferedWriter(IndexWriter):
    """``writing.py::BufferedWriter ≈L1000``: auto-commits every ``limit``
    buffered docs; ``searcher()`` folds pending docs first so they are
    searchable immediately (upstream's RAM-segment searcher semantics —
    here the 'RAM segment' is the O(delta) incremental fold, which keeps
    BM25 stats exact instead of approximating them)."""

    def __init__(self, spark: SparkSession, path: str, key: str = "url",
                 limit: int = 10):
        super().__init__(spark, path, key)
        self.limit = int(limit)

    def add_document(self, **fields) -> None:
        super().add_document(**fields)
        if len(self._adds) >= self.limit:
            self._flush()

    def update_document(self, **fields) -> None:
        super().update_document(**fields)
        if len(self._updates) >= self.limit:
            self._flush()

    def searcher(self):
        from whoosh_spark.search import Searcher

        if self._adds or self._updates or self._deletes \
                or self._delete_queries:
            self._flush()
        return Searcher(store.load_index(self.spark, self.path))

    def close(self) -> dict:
        """Final flush (upstream ``BufferedWriter.close``)."""
        if self._closed:
            return {}
        return self.commit()

    def _flush(self) -> None:
        self.commit()
        self._closed = False  # buffered writers stay open across flushes

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.close()
        else:
            self.cancel()
