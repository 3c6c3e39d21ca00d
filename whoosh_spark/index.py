"""InvertedIndex: the queryable handle over the four index tables.

Tables (FIXTURES.md "Derived index tables"):
  blocks      — encoded posting blocks (codec.BLOCKS_SCHEMA), sorted by term
  term_stats  — (field, term, df, cf, max_weight, min_id, max_id)
  field_stats — (field, doc_count, total_len, min_len, max_len)
  doc_lengths — (doc_id, len_raw, dl)
  docs        — caller's stored-fields table (doc_id + stored columns)

Read path per SURVEY.md §3.3: term lookups are predicate-pushdown filters on
the blocks table (persisted sorted by (field, term) ⇒ parquet row-group
pruning); stats lookups are driver-side collects of a handful of rows.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whoosh_spark import build as B
from whoosh_spark.codec.blocks import decode_blocks_arrow
from whoosh_spark.config import TEXT_FIELD

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.DoubleType()),
        T.StructField("dl", T.LongType()),
    ]
)
_DECODE_POS_SCHEMA = T.StructType(
    _DECODE_SCHEMA.fields + [T.StructField("positions", T.ArrayType(T.LongType()))]
)


class InvertedIndex:
    def __init__(
        self,
        spark: SparkSession,
        blocks: DataFrame,
        term_stats: DataFrame,
        field_stats: DataFrame,
        doc_lengths: DataFrame,
        docs: DataFrame | None = None,
        field: str = TEXT_FIELD,
        deleted: DataFrame | None = None,
    ):
        self.spark = spark
        self.blocks = blocks
        self.term_stats = term_stats
        self.field_stats = field_stats
        self.doc_lengths = doc_lengths
        self.docs = docs
        self.field = field
        self.deleted = deleted  # (doc_id) soft-delete overlay, or None
        self.char_offsets = None  # Characters-format segment (chars.py), or None
        self.boosts = None  # sparse (term, doc_id, w) boost overlay (boosts.py)
        self.pairs = None  # adjacent-pair (nextword) accel sub-index, or None
        self.pair_min_df = 0  # pairs indexed only for constituents df >= this
        self.analyzer = "standard"  # registry name of the analysis chain
        self.text_col = "text"  # stored source column the field was built from
        self.posting_format = "positions"  # Format name (formats.py)
        self.manifest = None  # TOC dict when opened from disk (store.py)
        self.path = None  # storage URI when opened from disk, else None
        self._global = None  # (N, avgdl) cache
        self._cand_bc = {}  # LRU: candidate-set digest -> Broadcast

    # ---- TOC generation tracking (``index.py::Index.up_to_date ≈L380``,
    # ``Index.refresh ≈L390``) ---------------------------------------------
    def generation(self) -> int:
        """TOC generation this object was opened at (-1 = in-memory build,
        the RamStorage analog — never stale)."""
        return self.manifest["generation"] if self.manifest else -1

    def up_to_date(self) -> bool:
        """True if no newer generation has been committed at this path."""
        if self.path is None:
            return True
        from whoosh_spark.store import latest_generation

        return latest_generation(self.path) == self.generation()

    def refresh(self) -> "InvertedIndex":
        """Return the freshest view of this index: ``self`` when current,
        else a re-opened instance at the latest committed generation."""
        if self.up_to_date():
            return self
        from whoosh_spark.store import load_index

        return load_index(self.spark, self.path)

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        field: str = TEXT_FIELD,
        cache: bool = True,
        analyzer: str = "standard",
        format: str = "positions",
        phrase_pairs: bool = False,
        pair_min_df: float = 0,
        phrase_trigrams: bool = False,
        lang_col: str | None = None,
    ) -> "InvertedIndex":
        analyzed = B.analyzed_docs(docs, id_col, text_col, analyzer=analyzer,
                                   format=format, lang_col=lang_col)
        if cache:
            analyzed = analyzed.cache()
        lengths = B.doc_lengths(analyzed)
        postings = B.flat_postings(analyzed, field)
        blocks = B.posting_blocks_from_analyzed(analyzed, field)
        if cache:
            blocks = blocks.cache()
        tstats = B.term_stats(blocks)
        fstats = B.field_stats(lengths, field)
        ix = cls(
            docs.sparkSession,
            blocks,
            tstats.cache() if cache else tstats,
            fstats,
            lengths,
            docs=docs.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else docs,
            field=field,
        )
        ix.analyzer = analyzer
        ix.text_col = text_col
        ix.posting_format = format
        ix._flat_postings = postings  # kept for build-invariance tests
        if phrase_pairs:
            if analyzer != "standard":
                # the pair certificate is defined against the standard
                # chain's (token, ordinal) stream; other chains would need
                # their own pair extractor to stay exact
                raise ValueError("phrase_pairs=True requires the standard "
                                 "analyzer")
            # adjacent-pair (nextword) accelerator: a frequency-format
            # sub-index over "a b" pair terms — two-word slop-1 Phrases
            # resolve their match set (and phrase tf) from it without ever
            # decoding the constituent terms' position streams.  At
            # pair_min_df > 0 only hot×hot pairs are indexed (the rare-slot
            # gate already covers rare-constituent phrases) — the query
            # router checks the same threshold against the same stats.
            if pair_min_df > 0:
                from whoosh_spark.analysis.analyzers import make_hot_pairs_fn
                from whoosh_spark.build import analyzed_docs as _adocs

                if pair_min_df < 1:  # fraction of N (see store.py)
                    pair_min_df = max(1, int(pair_min_df * analyzed.count()))
                hot = frozenset(
                    r["term"] for r in tstats.where(
                        F.col("df") >= pair_min_df).select("term").collect())
                # broadcast, not closure capture (see store._hot_pairs_fn).
                # NOT unpersisted here: the in-memory pair tables are lazy
                # DataFrames that re-run the extractor on every evaluation —
                # the broadcast must stay resolvable for the index's lifetime
                hot_bc = docs.sparkSession.sparkContext.broadcast(hot)
                pair_an = _adocs(docs, id_col, text_col,
                                 format="frequency",
                                 analyzer_fn=make_hot_pairs_fn(hot_bc))
                if cache:
                    pair_an = pair_an.cache()
                pblocks = B.posting_blocks_from_analyzed(pair_an, field)
                if cache:
                    pblocks = pblocks.cache()
                ptstats = B.term_stats(pblocks)
                plengths = B.doc_lengths(pair_an)
                sub = cls(docs.sparkSession, pblocks,
                          ptstats.cache() if cache else ptstats,
                          B.field_stats(plengths, field),
                          plengths, field=field)
                sub.analyzer = "adjacent_pairs"
                sub.posting_format = "frequency"
                ix.pairs = sub
                ix.pair_min_df = int(pair_min_df)
                if phrase_trigrams:
                    # hot-trigram (3-word nextword) accelerator: one term
                    # lookup answers all-hot 3-word slop-1 Phrases exactly
                    # — the shape the pair segment still had to verify
                    # positionally (the chained gate's adversarial case).
                    # Same hot set, so dictionary growth is bounded by the
                    # frequent head's adjacency combinatorics, and the
                    # router's eligibility check (all dfs >= pair_min_df)
                    # matches the build filter exactly
                    from whoosh_spark.analysis.analyzers import (
                        make_hot_trigrams_fn,
                    )

                    tri_an = _adocs(docs, id_col, text_col,
                                    format="frequency",
                                    analyzer_fn=make_hot_trigrams_fn(hot_bc))
                    if cache:
                        tri_an = tri_an.cache()
                    tblocks = B.posting_blocks_from_analyzed(tri_an, field)
                    if cache:
                        tblocks = tblocks.cache()
                    ttstats = B.term_stats(tblocks)
                    tlengths = B.doc_lengths(tri_an)
                    tsub = cls(docs.sparkSession, tblocks,
                               ttstats.cache() if cache else ttstats,
                               B.field_stats(tlengths, field),
                               tlengths, field=field)
                    tsub.analyzer = "adjacent_trigrams"
                    tsub.posting_format = "frequency"
                    ix.trigrams = tsub
            else:
                if phrase_trigrams:
                    raise ValueError(
                        "phrase_trigrams=True requires pair_min_df > 0 — "
                        "an ungated trigram dictionary is unbounded "
                        "(~every distinct word triple in the corpus)")
                ix.pairs = cls.build(docs, id_col, text_col, field,
                                     cache=cache,
                                     analyzer="adjacent_pairs",
                                     format="frequency")
        elif phrase_trigrams:
            raise ValueError("phrase_trigrams=True requires "
                             "phrase_pairs=True (shared hot-term gate)")
        return ix

    # ------------------------------------------------------------------
    def global_stats(self) -> tuple[int, float]:
        """(N, avgdl) — collected once, O(1) rows."""
        if self._global is None:
            rows = self.field_stats.collect()
            if not rows or rows[0]["doc_count"] is None:
                # empty index (zero docs): every query legitimately matches
                # nothing
                self._global = (0, 0.0)
                self._total_len = 0
                return self._global
            row = rows[0]
            n = int(row["doc_count"])
            avgdl = (row["total_len"] / n) if n else 0.0
            self._global = (n, float(avgdl))
            self._total_len = int(row["total_len"] or 0)
        return self._global

    def total_field_length(self) -> int:
        """Total raw token count of the field (whoosh ``Searcher.field_length``
        — feeds the DFR models)."""
        self.global_stats()
        return self._total_len

    def stats_for_terms(self, terms: list[str]) -> dict[str, dict]:
        """term -> {df, cf, max_weight} for the query's terms (tiny collect).

        Per-instance memo: an InvertedIndex is an immutable snapshot (deletes
        and compactions hand out NEW instances), so term stats never change
        under it — repeated searches over the same terms skip the collect
        (TermInfo caching, ``src/whoosh/reading.py ≈L200``).  Negative
        results memoize too (absent term stays absent)."""
        if not terms:
            return {}
        cache = self.__dict__.setdefault("_stats_memo", {})
        missing = sorted({t for t in terms if t not in cache})
        if missing:
            rows = (
                self.term_stats.where(
                    (F.col("field") == self.field) & F.col("term").isin(missing)
                )
                .select("term", "df", "cf", "max_weight")
                .collect()
            )
            got = {r["term"]: {"df": int(r["df"]), "cf": int(r["cf"]),
                               "max_weight": float(r["max_weight"])} for r in rows}
            for t in missing:
                cache[t] = got.get(t)
        return {t: cache[t] for t in set(terms) if cache.get(t) is not None}

    def expand_terms(self, predicate: Column, limit: int = 1024) -> list[str]:
        """MultiTerm expansion against the term dictionary with a guard LIMIT
        (``src/whoosh/query/terms.py::MultiTerm.matcher ≈L180``)."""
        rows = (
            self.term_stats.where((F.col("field") == self.field) & predicate)
            .select("term")
            .limit(limit + 1)
            .collect()
        )
        if len(rows) > limit:
            raise ValueError(f"term expansion exceeds limit={limit}")
        return sorted(r["term"] for r in rows)

    # ------------------------------------------------------------------
    def postings(self, terms: list[str], with_positions: bool = False,
                 candidate_ids=None) -> DataFrame:
        """Decode posting blocks for the given terms → flat postings DF.

        The term filter is applied on the blocks table BEFORE decode (pushed
        to the parquet scan when the index is loaded from disk).

        ``candidate_ids``: optional iterable of doc ids; postings for other
        docs are dropped inside the Arrow decoder (broadcast membership
        filter — see ``decode_blocks_arrow``), so neither the Python→JVM
        transfer nor any downstream shuffle carries them.
        """
        blk = self.blocks.where(
            (F.col("field") == self.field) & F.col("term").isin(list(set(terms)))
        )
        return self._decode(blk, with_positions, candidate_ids=candidate_ids)

    def postings_where(self, block_pred: Column, with_positions: bool = False) -> DataFrame:
        blk = self.blocks.where((F.col("field") == self.field) & block_pred)
        return self._decode(blk, with_positions)

    def _decode(self, blk: DataFrame, with_positions: bool,
                candidate_ids=None) -> DataFrame:
        if with_positions:
            from whoosh_spark.formats import get_format

            if not get_format(self.posting_format).store_positions:
                # upstream raises QueryError when a field's format lacks
                # positions (``formats.py::Format.supports("positions")``)
                raise ValueError(
                    f"posting format {self.posting_format!r} does not store "
                    f"positions — positional queries (Phrase/Sequence/Span) "
                    f"need an index built with format='positions'")
        schema = _DECODE_POS_SCHEMA if with_positions else _DECODE_SCHEMA
        # column-prune BEFORE the Python stage: the positions stream is the
        # fat column — non-phrase queries never read it (ReadSchema shrinks
        # at the parquet scan)
        cols = ["field", "term", "n", "w_const", "ids", "weights", "lens"]
        if with_positions:
            cols.append("positions")
        blk = blk.select(*cols)
        cand_bc = None
        if candidate_ids is not None:
            import hashlib

            import numpy as np

            arr = (candidate_ids if isinstance(candidate_ids, np.ndarray)
                   else np.asarray(list(candidate_ids), dtype=np.int64))
            arr = np.sort(arr.astype(np.int64, copy=False))
            if arr.size == 0:
                return self.spark.createDataFrame([], schema)
            # LRU-cache the broadcast per candidate set: repeated queries
            # reuse one executor-side copy instead of re-broadcasting, and
            # eviction unpersists executor blocks (the driver copy stays,
            # so an old plan that re-executes just re-broadcasts lazily)
            key = hashlib.md5(arr.tobytes()).digest()
            cand_bc = self._cand_bc.get(key)
            if cand_bc is None:
                cand_bc = self.spark.sparkContext.broadcast(arr)
                self._cand_bc[key] = cand_bc
                while len(self._cand_bc) > 8:
                    self._cand_bc.pop(
                        next(iter(self._cand_bc))).unpersist()
            else:
                self._cand_bc[key] = self._cand_bc.pop(key)  # LRU bump
        return blk.mapInArrow(
            decode_blocks_arrow(want_positions=with_positions,
                                candidates=cand_bc), schema=schema)

    # ------------------------------------------------------------------
    def with_deleted(self, deleted: DataFrame) -> "InvertedIndex":
        """Soft-delete overlay (``codec/base.py::Segment.delete_document
        ≈L550`` bitset analog): matches are anti-joined against ``deleted``
        at query time; stats keep counting deleted docs until a rewrite —
        exactly Whoosh's deleted-but-unpurged semantics (BM25 N includes
        them, SURVEY.md §2.6)."""
        new = self.deleted.unionByName(deleted) if self.deleted is not None else deleted
        ix = InvertedIndex(self.spark, self.blocks, self.term_stats,
                           self.field_stats, self.doc_lengths, self.docs,
                           self.field, deleted=new.select("doc_id").distinct())
        return self._copy_snapshot_attrs(ix)

    def _copy_snapshot_attrs(self, ix: "InvertedIndex") -> "InvertedIndex":
        """Carry immutable-snapshot attachments onto a clone: side segments
        (char_offsets, boost overlay), the declared analyzer/manifest, and
        the stats caches.  Every with_* clone must go through here — a
        dropped attachment silently changes scoring/parsing semantics."""
        ix.char_offsets = self.char_offsets
        ix.boosts = self.boosts
        ix.pairs = self.pairs
        ix.pair_min_df = self.pair_min_df
        ix.analyzer = self.analyzer
        ix.text_col = self.text_col
        ix.posting_format = self.posting_format
        if hasattr(self, "manifest"):
            ix.manifest = self.manifest
        ix._global = self._global
        # _total_len is set together with _global; copying one without the
        # other leaves total_field_length() raising AttributeError
        if self._global is not None:
            ix._total_len = self._total_len
        return ix

    def with_boosts(self, overlay: DataFrame) -> "InvertedIndex":
        """Attach a ``boosts.token_boost_overlay`` side table (PositionBoosts
        format, ``src/whoosh/formats.py::PositionBoosts ≈L300``): BM25
        weight becomes ``coalesce(overlay.w, tf)`` for the overlaid (term,
        doc) cells.  Block-max WAND is disabled on this snapshot (block
        max_weight excludes boosts — the bound would not be an upper
        bound)."""
        ix = InvertedIndex(self.spark, self.blocks, self.term_stats,
                           self.field_stats, self.doc_lengths, self.docs,
                           self.field, deleted=self.deleted)
        self._copy_snapshot_attrs(ix)
        ix.boosts = overlay.select("term", "doc_id", "w")
        return ix

    def not_deleted(self, df: DataFrame) -> DataFrame:
        """Filter a (doc_id, ...) frame through the deletion overlay."""
        if self.deleted is None:
            return df
        return df.join(self.deleted, "doc_id", "left_anti")

    def all_doc_ids(self) -> DataFrame:
        return self.not_deleted(self.doc_lengths.select("doc_id"))

    def idf(self, df: int) -> float:
        """Whoosh idf: log(N/(df+1)) + 1 (``src/whoosh/scoring.py ≈L70``)."""
        n, _ = self.global_stats()
        return math.log(n / (df + 1)) + 1.0

    def reader(self):
        """Low-level read surface over this snapshot
        (``src/whoosh/reading.py::IndexReader`` — see reader.py)."""
        from whoosh_spark.reader import IndexReader

        return IndexReader(self)
