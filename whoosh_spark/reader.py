"""IndexReader adapter — upstream ``src/whoosh/reading.py::IndexReader``
(≈L300-900; cite per SURVEY provenance caveat: ``/root/reference`` is empty,
anchors are the public whoosh 2.7.4 layout).

Upstream exposes the low-level read surface of a segment: term lookup
(``doc_frequency/frequency/term_info``), the ordered term dictionary
(``lexicon/expand_prefix/all_terms``), per-document storage
(``stored_fields/doc_field_length``), and corpus statistics
(``doc_count/field_length/most_frequent_terms``).

Spark-first restatement: every one of these is a query against an index
TABLE, not a file cursor —

- term lookups are O(terms) collects against the broadcast-sized
  ``term_stats`` table (the TermInfo analog, one row per (field, term));
- the "ordered term dictionary" is ``term_stats ORDER BY term`` with the
  prefix/range predicate pushed to the parquet scan; ``lexicon`` streams it
  through ``toLocalIterator`` so the driver never materializes a 100 TB
  vocabulary at once;
- per-doc reads are point lookups on ``doc_lengths`` / ``docs``;
- ``postings`` reuses the block-decode kernel (term-pruned scan, positions
  column only when asked — same plan as query execution).

The reader is a VIEW over an immutable index snapshot (deletes and
compactions hand out new ``InvertedIndex`` instances), matching upstream's
reader-per-generation semantics.  It accepts a single-field
``InvertedIndex`` or a ``MultiFieldIndex`` (fieldname routes to the right
sub-index, like fielded query nodes do).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class TermInfo:
    """``reading.py::TermInfo (≈L40)`` — per-term statistics, method-for-
    method (upstream callers do ``ti.weight()`` etc., so these are methods
    rather than attributes)."""

    _weight: int
    _df: int
    _min_id: int
    _max_id: int
    _max_weight: float

    def weight(self) -> int:
        """Total term frequency across the corpus (cf)."""
        return self._weight

    def doc_frequency(self) -> int:
        return self._df

    def min_id(self) -> int:
        return self._min_id

    def max_id(self) -> int:
        return self._max_id

    def max_weight(self) -> float:
        return self._max_weight


class IndexReader:
    """Low-level read surface over an index snapshot."""

    def __init__(self, ix):
        self.ix = ix

    # -- routing ---------------------------------------------------------
    def _sub(self, fieldname: str | None):
        """Resolve a fieldname to the single-field index that owns it."""
        if fieldname is None or fieldname == self.ix.field:
            # MultiFieldIndex delegates the unfielded surface to its
            # default field's index; InvertedIndex is its own answer
            return getattr(self.ix, "primary", self.ix)
        index_for = getattr(self.ix, "index_for", None)
        if index_for is None:
            raise KeyError(f"unknown field {fieldname!r} "
                           f"(single-field index over {self.ix.field!r})")
        return index_for(fieldname)

    def _fields(self) -> list[str]:
        idxs = getattr(self.ix, "indexes", None)
        return sorted(idxs) if idxs is not None else [self.ix.field]

    # -- corpus statistics -------------------------------------------------
    def doc_count(self) -> int:
        """Undeleted document count (``IndexReader.doc_count ≈L330``)."""
        n = self.doc_count_all()
        if getattr(self.ix, "deleted", None) is not None:
            # the overlay is small (ids only); count it, don't scan docs
            n -= self.ix.deleted.count()
        return n

    def doc_count_all(self) -> int:
        """Total docs including deleted-but-unpurged (``≈L325``) — BM25's N,
        from the already-collected field_stats row."""
        n, _ = self._sub(None).global_stats()
        return n

    def field_length(self, fieldname: str | None = None) -> int:
        """Total token count of the field (``≈L360``)."""
        return self._sub(fieldname).total_field_length()

    def min_field_length(self, fieldname: str | None = None) -> int:
        return int(self._field_stats_row(fieldname)["min_len"] or 0)

    def max_field_length(self, fieldname: str | None = None) -> int:
        return int(self._field_stats_row(fieldname)["max_len"] or 0)

    def _field_stats_row(self, fieldname: str | None):
        rows = self._sub(fieldname).field_stats.collect()
        return rows[0] if rows else {"min_len": 0, "max_len": 0}

    # -- term lookup --------------------------------------------------------
    def has_term(self, text: str, fieldname: str | None = None) -> bool:
        return self.doc_frequency(text, fieldname) > 0

    def __contains__(self, term) -> bool:
        """``(fieldname, text) in reader`` — upstream's membership shape."""
        fieldname, text = term
        return self.has_term(text, fieldname)

    def doc_frequency(self, text: str, fieldname: str | None = None) -> int:
        """Number of docs containing the term; 0 when absent (``≈L400``)."""
        st = self._sub(fieldname).stats_for_terms([text]).get(text)
        return int(st["df"]) if st else 0

    def existing_terms(self, q) -> set[tuple[str | None, str]]:
        """The (fieldname, text) leaf pairs of ``q`` that actually exist
        in the index (``qcore.py::Query.existing_terms ≈L240`` — upstream
        walks the query against an IndexReader; here the reader walks the
        query).  One batched term_stats probe per distinct field, not one
        Spark job per term."""
        by_field: dict[str | None, set[str]] = {}
        for f, t in set(q.field_terms()):
            by_field.setdefault(f, set()).add(t)
        out: set[tuple[str | None, str]] = set()
        for f, texts in by_field.items():
            try:
                sub = self._sub(f)
            except KeyError:
                continue  # unknown field = no existing terms, as upstream
            stats = sub.stats_for_terms(sorted(texts))
            out |= {(f, t) for t in texts if stats.get(t)}
        return out

    def frequency(self, text: str, fieldname: str | None = None) -> int:
        """Total occurrences of the term (cf; ``≈L405``)."""
        st = self._sub(fieldname).stats_for_terms([text]).get(text)
        return int(st["cf"]) if st else 0

    def term_info(self, text: str, fieldname: str | None = None) -> TermInfo:
        """Full TermInfo; raises ``KeyError`` for an absent term like
        upstream (``≈L390``)."""
        sub = self._sub(fieldname)
        rows = (
            sub.term_stats.where(
                (F.col("field") == sub.field) & (F.col("term") == text))
            .select("df", "cf", "max_weight", "min_id", "max_id")
            .collect()
        )
        if not rows:
            raise KeyError((fieldname or sub.field, text))
        r = rows[0]
        return TermInfo(int(r["cf"]), int(r["df"]),
                        int(r["min_id"]), int(r["max_id"]),
                        float(r["max_weight"]))

    # -- term dictionary ------------------------------------------------------
    def lexicon(self, fieldname: str | None = None) -> Iterator[str]:
        """All terms of a field in ascending order (``≈L420``) — streamed
        partition-by-partition via toLocalIterator; the driver holds one
        partition of the vocabulary at a time, never all of it."""
        sub = self._sub(fieldname)
        df = (sub.term_stats.where(F.col("field") == sub.field)
              .select("term").orderBy("term"))
        return (r["term"] for r in df.toLocalIterator())

    def expand_prefix(self, prefix: str,
                      fieldname: str | None = None) -> Iterator[str]:
        """Terms starting with ``prefix``, ascending (``≈L430``).  The
        startswith predicate reaches the parquet scan (StringStartsWith
        pushdown) — same pruning as the Prefix query."""
        sub = self._sub(fieldname)
        df = (sub.term_stats.where(
                (F.col("field") == sub.field)
                & F.col("term").startswith(prefix))
              .select("term").orderBy("term"))
        return (r["term"] for r in df.toLocalIterator())

    def all_terms(self) -> Iterator[tuple[str, str]]:
        """(fieldname, text) across every field, field-major (``≈L415``)."""
        for fld in self._fields():
            for t in self.lexicon(fld):
                yield (fld, t)

    def most_frequent_terms(self, fieldname: str | None = None,
                            number: int = 5,
                            prefix: str = "") -> list[tuple[int, str]]:
        """Top terms by total frequency (``≈L450``): (cf, term), cf DESC —
        a TakeOrderedAndProject over term_stats, no full sort."""
        sub = self._sub(fieldname)
        pred = F.col("field") == sub.field
        if prefix:
            pred = pred & F.col("term").startswith(prefix)
        rows = (sub.term_stats.where(pred)
                .orderBy(F.col("cf").desc(), F.col("term").asc())
                .select("cf", "term").limit(number).collect())
        return [(int(r["cf"]), r["term"]) for r in rows]

    def distinctive_terms_df(self, fieldname: str | None = None,
                             number: int = 5, prefix: str = "") -> DataFrame:
        """cf·idf term ranking as a DataFrame (the distributed form of
        ``most_distinctive_terms``): idf is whoosh's log(N/(df+1))+1 as a
        column expression, top-N via TakeOrderedAndProject — no full sort,
        no driver-side vocabulary."""
        sub = self._sub(fieldname)
        n, _ = sub.global_stats()
        pred = F.col("field") == sub.field
        if prefix:
            pred = pred & F.col("term").startswith(prefix)
        score = F.col("cf") * (
            F.log(F.lit(float(n)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0))
        return (sub.term_stats.where(pred)
                .select(score.alias("score"), "term")
                .orderBy(F.col("score").desc(), F.col("term").asc())
                .limit(number))

    def most_distinctive_terms(self, fieldname: str | None = None,
                               number: int = 5,
                               prefix: str = "") -> list[tuple[float, str]]:
        """Top terms by cf·idf (``≈L460``) — rare-but-heavy terms rank up."""
        rows = self.distinctive_terms_df(fieldname, number, prefix).collect()
        return [(float(r["score"]), r["term"]) for r in rows]

    # -- postings ----------------------------------------------------------
    def postings(self, text: str, fieldname: str | None = None,
                 with_positions: bool = False) -> DataFrame:
        """Decoded posting list of one term as a DataFrame — the Spark-first
        restatement of ``IndexReader.postings → Matcher (≈L500)``: columns
        (doc_id, tf[, positions]), deletion-filtered, term filter pushed to
        the blocks scan before decode."""
        sub = self._sub(fieldname)
        out = sub.postings([text], with_positions=with_positions)
        cols = ["doc_id", "tf"] + (["positions"] if with_positions else [])
        return sub.not_deleted(out.select(*cols))

    # -- per-document storage -------------------------------------------------
    def doc_field_length(self, docnum: int, fieldname: str | None = None,
                         default: int = 0) -> int:
        """Stored per-doc field length (``≈L370``).  Returns the
        byte-quantized dl — the same round-tripped value upstream reads back
        from its per-doc storage and feeds to BM25."""
        sub = self._sub(fieldname)
        rows = (sub.doc_lengths.where(F.col("doc_id") == docnum)
                .select("dl").collect())
        return int(rows[0]["dl"]) if rows else default

    def stored_fields(self, docnum: int) -> dict:
        """Stored fields of one document (``≈L340``)."""
        docs = self._sub(None).docs
        rows = docs.where(F.col("doc_id") == docnum).collect()
        if not rows:
            raise KeyError(docnum)
        return rows[0].asDict()

    # -- term vectors (forward index) ----------------------------------------
    def vector_df(self, docnum: int, fieldname: str | None = None) -> DataFrame:
        """Term vector of ONE document as a DataFrame — columns
        (term, tf, positions), term-ascending; ``positions`` is the
        comma-joined list of tokenizer ordinals (stop gaps preserved).

        Upstream ``reading.py::IndexReader.vector (≈L430)`` reads a
        doc-major vectors segment written at index time (``vector=True``
        fields).  The Spark-first restatement re-derives the vector from
        the stored field through the index's OWN analyzer chain — token
        parity with the inverted file holds by construction (same analyzer
        functions the build's Arrow kernel inlines) — so no second
        persisted per-doc segment is needed.  Cost shape: a point lookup
        with the doc_id filter pushed to the docs scan, then ONE document
        analyzed driver-side (the ``more_like_text`` pattern — upstream's
        vector read is also one-doc work).  Deleted docs have no vector
        (the overlay filters them like every read).
        """
        exists, rows = self._vector_rows(docnum, fieldname)
        data = [(t, len(ps), ",".join(str(p) for p in ps))
                for t, _w, ps in rows]
        return self.ix.spark.createDataFrame(
            data, "term string, tf long, positions string").orderBy("term")

    def _vector_source(self, fieldname: str | None):
        """(sub_index, source column, analyzer name, docs table) for the
        field — raising the same errors the build/parse paths raise for an
        unknown field or chain."""
        sub = self._sub(fieldname)
        specs = getattr(self.ix, "specs", None)
        if specs is not None:
            spec = self.ix.spec_for(fieldname)
            src, analyzer = spec.source, spec.analyzer
        else:
            # InvertedIndex.build records its text_col; pre-attr snapshots
            # and loaded indexes default to the build default "text"
            src = getattr(sub, "text_col", "text")
            analyzer = sub.analyzer
        docs = getattr(self.ix, "docs", None)
        if docs is None:
            raise ValueError("index has no stored docs table; vectors are "
                             "derived from the stored field")
        if src not in docs.columns:
            raise ValueError(
                f"stored docs table has no {src!r} column (index written "
                f"with store_text=False?); vectors need the stored field")
        return sub, src, analyzer, docs

    def _vector_rows(
        self, docnum: int, fieldname: str | None
    ) -> tuple[bool, list[tuple[str, float, list[int]]]]:
        """(doc exists undeleted?, [(term, weight, positions)]) — the local
        vector; a doc whose field analyzes to zero tokens exists with an
        EMPTY vector (distinct from a missing/deleted doc).  Weight is the
        boost-overlay weight when the index carries one (the same
        ``coalesce(w, tf)`` the scorer uses), else tf."""
        sub, src, analyzer, docs = self._vector_source(fieldname)
        one = sub.not_deleted(docs.where(F.col("doc_id") == int(docnum)))
        found = one.select(F.col(src).alias("_text")).collect()
        if not found:
            return False, []
        from whoosh_spark.analysis.analyzers import ANALYZERS

        # unknown chain = hard error, same as build.py/parser.py — a silent
        # standard-chain fallback would contradict the inverted file
        an = ANALYZERS[analyzer or "standard"]
        toks, poss = an(found[0]["_text"] or "")
        agg: dict[str, list[int]] = {}
        for t, p in zip(toks, poss):
            agg.setdefault(t, []).append(p)
        boosted: dict[str, float] = {}
        if getattr(sub, "boosts", None) is not None:
            boosted = {
                r["term"]: float(r["w"])
                for r in sub.boosts.where(
                    F.col("doc_id") == int(docnum)).collect()
            }
        return True, [
            (t, boosted.get(t, float(len(ps))), ps)
            for t, ps in sorted(agg.items())
        ]

    def has_vector(self, docnum: int, fieldname: str | None = None) -> bool:
        """True iff ``vector(docnum, fieldname)`` will succeed: the field is
        vectorable (stored source column present) and the doc exists
        undeleted (``≈L420``)."""
        try:
            sub, _src, _an, docs = self._vector_source(fieldname)
        except (KeyError, ValueError):
            return False
        return (sub.not_deleted(docs.where(F.col("doc_id") == int(docnum)))
                .limit(1).count() > 0)

    def vector(self, docnum: int,
               fieldname: str | None = None) -> Iterator[tuple[str, float]]:
        """(term, weight) pairs, term-ascending — the matcher-as-iterator
        shape of ``IndexReader.vector (≈L430)``.  Raises ``KeyError`` for a
        missing/deleted doc (upstream's no-vector error); an existing doc
        whose field analyzes to nothing yields an empty iterator."""
        exists, rows = self._vector_rows(docnum, fieldname)
        if not exists:
            raise KeyError(f"no vector for document {docnum}")
        return iter((t, w) for t, w, _ps in rows)

    def vector_as(self, astype: str, docnum: int,
                  fieldname: str | None = None) -> Iterator[tuple]:
        """``reading.py::IndexReader.vector_as (≈L450)``: the decoded
        vector as (term, value) pairs — ``frequency`` → int tf, ``weight``
        → float weight (boost-overlay-aware), ``positions`` → list of
        tokenizer ordinals."""
        if astype not in ("frequency", "weight", "positions"):
            raise ValueError(f"unknown vector astype {astype!r}")
        exists, rows = self._vector_rows(docnum, fieldname)
        if not exists:
            raise KeyError(f"no vector for document {docnum}")
        if astype == "frequency":
            return iter((t, len(ps)) for t, _w, ps in rows)
        if astype == "weight":
            return iter((t, w) for t, w, _ps in rows)
        return iter((t, list(ps)) for t, _w, ps in rows)

    def all_stored_fields(self) -> Iterator[dict]:
        """Every undeleted document's stored fields, doc_id ascending
        (``≈L345``) — streamed, one partition driver-resident at a time."""
        sub = self._sub(None)
        df = sub.not_deleted(sub.docs).orderBy("doc_id")
        return (r.asDict() for r in df.toLocalIterator())

    # -- context manager (upstream readers are used in with-blocks) --------
    def close(self) -> None:  # snapshot view: nothing to release
        pass

    def __enter__(self) -> "IndexReader":
        return self

    def __exit__(self, *exc) -> bool:
        self.close()
        return False
