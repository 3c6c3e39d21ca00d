"""Searcher: collection layer (SURVEY.md §2.7).

``search()`` mirrors ``src/whoosh/searching.py::Searcher.search (≈L700)``:
top-k with the reference tie-break (score DESC, doc_id ASC — TopCollector
heap key, ``collectors.py ≈L400``), filter/mask doc-set restriction,
sortedby (SortingCollector), groupedby facet counts, collapse (window
row_number), and offset pagination (search_page ≈L760).

Top-k is Spark's distributed ``TakeOrderedAndProject`` (ORDER BY + LIMIT) —
no driver-side heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whoosh_spark.execution.evaluate import Evaluator
from whoosh_spark.execution.wand import wand_topk
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q


class ScoreFacet:
    """``src/whoosh/sorting.py::ScoreFacet (≈L380)``: lets the relevance
    score participate in a multi-level ``sortedby`` list (e.g.
    ``sortedby=["lang", SCORE]`` — group by language, best score first
    within each).  Upstream's categorizer keys on ``0 - score`` so the
    facet's natural ascending order puts HIGHER scores first; ``reverse``
    flips it like every other level.  Use the module singleton ``SCORE``."""

    def __repr__(self):
        return "ScoreFacet()"


SCORE = ScoreFacet()


class Searcher:
    def __init__(self, ix: InvertedIndex, weighting: str = "bm25"):
        self.ix = ix
        self.ev = Evaluator(ix, weighting=weighting)
        self.weighting = weighting

    # ------------------------------------------------------------------
    def up_to_date(self) -> bool:
        """True if no newer index generation has been committed
        (``searching.py::Searcher.up_to_date ≈L290``)."""
        return self.ix.up_to_date()

    def refresh(self) -> "Searcher":
        """``searching.py::Searcher.refresh ≈L300``: this searcher when the
        underlying index is current, else a new one on the latest committed
        generation (same weighting)."""
        ix = self.ix.refresh()
        return self if ix is self.ix else Searcher(ix, weighting=self.weighting)

    # ------------------------------------------------------------------
    @staticmethod
    def _wand_terms(q: Q.Query) -> tuple[list[str], str, float,
                                         str | None] | None:
        """(term texts, agg mode, tiebreak) if q is WAND-eligible (Term /
        flat Or / flat DisMax of unboosted Terms) — mirrors Whoosh's
        optimized TopCollector applicability
        (``collectors.py::TopCollector, optimize=True``)."""
        qn = q.normalize()

        def flat_terms(children):
            """(texts, common fieldname) if every child is an unboosted Term
            on ONE field (None = default) — single-field batches WAND with
            that field's block metadata, B override, and boost."""
            if not all(isinstance(c, Q.Term) and c.boost == 1.0
                       for c in children):
                return None
            fields = {c.fieldname for c in children}
            if len(fields) != 1:
                return None
            return [c.text for c in children], fields.pop()

        if isinstance(qn, Q.Term) and qn.boost == 1.0:
            return [qn.text], "sum", 0.0, qn.fieldname
        if isinstance(qn, Q.Or) and qn.minmatch <= 1 and qn.boost == 1.0:
            tf = flat_terms(qn.children)
            if tf is not None:
                return tf[0], "sum", 0.0, tf[1]
        if isinstance(qn, Q.DisMax) and qn.boost == 1.0 and 0.0 <= qn.tiebreak <= 1.0:
            tf = flat_terms(qn.children)
            # DisMax.normalize keeps duplicate children (unlike Or) and the
            # tiebreak sum counts them — only the duplicate-free case is
            # equivalent to the deduped WAND term batch
            if tf is not None and len(set(tf[0])) == len(tf[0]):
                return tf[0], "max", qn.tiebreak, tf[1]
        return None

    def search(
        self,
        q: Q.Query,
        limit: int | None = 10,
        filter: Q.Query | None = None,
        mask: Q.Query | None = None,
        sortedby: str | None = None,
        reverse: bool = False,
        collapse: str | None = None,
        collapse_limit: int = 1,
        collapse_order: str | None = None,
        offset: int = 0,
        with_stored: list[str] | None = None,
        optimize: bool = True,
        final=None,
    ) -> DataFrame:
        """``final`` is the WeightingModel.final() hook
        (``src/whoosh/scoring.py::WeightingModel.final ≈L100``): a callable
        ``(score: Column) -> Column`` evaluated over the scored frame joined
        with the stored docs table, so it may reference stored columns via
        ``F.col`` (e.g. ``lambda s: s * F.col("n_chars")``).  Applied before
        ranking, like Whoosh's collector-side final pass."""
        wand = (
            self._wand_terms(q)
            if (
                optimize
                and self.weighting == "bm25"  # WAND bounds are BM25-specific
                and final is None
                and limit is not None
                and filter is None
                and mask is None
                and sortedby is None
                and collapse is None
                and not offset
            )
            else None
        )
        if wand is not None:
            wterms, wmode, wtb, wfield = wand
            if hasattr(self.ix, "index_for"):  # MultiFieldIndex
                # unknown field raises KeyError here, matching the
                # Evaluator path — a typo'd field must not look like
                # "no matches"
                ixf = self.ix.index_for(wfield)
                wb = self.ix.bm25_b(wfield)
                wmult = self.ix.field_boost(wfield)
            else:
                if wfield is not None and wfield != self.ix.field:
                    raise KeyError(f"unknown field {wfield!r} (single-field "
                                   f"index {self.ix.field!r})")
                ixf, wb, wmult = self.ix, None, 1.0
            if getattr(ixf, "boosts", None) is not None:
                # boost overlay: block max_weight excludes boosts, so the
                # WAND bound is not an upper bound — score exhaustively
                # (supports_block_quality() == False, mcore.py ≈L200)
                wand = None
        if wand is not None:
            scores = wand_topk(ixf, wterms, limit, mode=wmode, tiebreak=wtb,
                               b=wb, mult=wmult)
            ordered = scores.orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            ).limit(limit)
            if with_stored:
                ordered = ordered.join(
                    self.ix.docs.select("doc_id", *with_stored), "doc_id", "left"
                ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
            return ordered
        scores = self.ev.evaluate(q)
        if filter is not None:
            scores = scores.join(self.ev.evaluate(filter).select("doc_id"), "doc_id", "left_semi")
        if mask is not None:
            scores = scores.join(self.ev.evaluate(mask).select("doc_id"), "doc_id", "left_anti")

        if final is not None:
            joined = scores.join(self.ix.docs, "doc_id", "left")
            scores = joined.select("doc_id", final(F.col("score")).alias("score"))

        if collapse is not None:
            scores = self._collapse(scores, collapse, collapse_limit,
                                    collapse_order)

        if sortedby is not None:
            # multi-level sort facet (``sorting.py::MultiFacet ≈L500``): a
            # list of column names sorts by each in turn; ``reverse``
            # applies to every level (upstream semantics)
            sort_cols = [sortedby] if isinstance(sortedby, (str, ScoreFacet)) \
                else list(sortedby)
            stored_cols = [c for c in sort_cols if not isinstance(c, ScoreFacet)]
            if stored_cols:
                scores = scores.join(
                    self.ix.docs.select("doc_id", *stored_cols), "doc_id")
            keys = [
                # ScoreFacet keys on 0-score: ascending facet order = best
                # score first; reverse flips it like every stored level
                (F.col("score").asc() if reverse else F.col("score").desc())
                if isinstance(c, ScoreFacet)
                else (F.col(c).desc() if reverse else F.col(c).asc())
                for c in sort_cols
            ]
            order_keys = [*keys, F.col("doc_id").asc()]
            ordered = scores.orderBy(*order_keys)
        else:
            order_keys = [F.col("score").desc(), F.col("doc_id").asc()]
            ordered = scores.orderBy(*order_keys)

        if offset:
            # search_page semantics: top (offset+limit), slice off the head.
            # With a limit, TakeOrderedAndProject reduces the frame to
            # offset+limit rows FIRST, so the global rank window only ever
            # sees one page worth of rows (limit=None pays the full sort —
            # inherent to an unbounded page).
            if limit is not None:
                ordered = ordered.limit(offset + limit)
            w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            if sortedby is not None:
                w = Window.orderBy(*order_keys)
            ordered = (
                ordered.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") > offset)
                .drop("_rn")
            )
        if limit is not None:
            ordered = ordered.limit(limit)
        if with_stored:
            # re-apply the CHOSEN ordering after the join (a sortedby result
            # must not fall back to score order), and skip columns the frame
            # already carries (sortedby joins its key in above)
            extra = [c for c in with_stored if c not in ordered.columns]
            ordered = ordered.join(
                self.ix.docs.select("doc_id", *extra), "doc_id", "left"
            ).orderBy(*order_keys) if extra else ordered.orderBy(*order_keys)
        return ordered

    # ------------------------------------------------------------------
    def reader(self):
        """The index's low-level read surface (``searching.py::
        Searcher.reader ≈L330`` → ``reading.py::IndexReader``)."""
        return self.ix.reader()

    def doc_count(self) -> int:
        """Undeleted doc count (``searching.py::Searcher.doc_count ≈L340``)."""
        return self.reader().doc_count()

    def doc_count_all(self) -> int:
        """Total docs incl. deleted-but-unpurged (``≈L345``) — BM25's N."""
        return self.reader().doc_count_all()

    def idf(self, text: str, fieldname: str | None = None) -> float:
        """``searching.py::Searcher.idf (≈L355)`` — the engine's exact idf
        (ln(N/(df+1))+1) for one term, from the O(1) stats tables."""
        from whoosh_spark.execution.score import idf_value

        if hasattr(self.ix, "index_for"):
            ixf = self.ix.index_for(fieldname)
        elif fieldname is not None and fieldname != self.ix.field:
            raise KeyError(f"unknown field {fieldname!r} (single-field "
                           f"index {self.ix.field!r})")
        else:
            ixf = self.ix
        n, _ = ixf.global_stats()
        if n == 0:
            return 0.0
        st = ixf.stats_for_terms([text]).get(text)
        return idf_value(n, st["df"] if st else 0)

    def parse(self, qstring: str, **kw) -> Q.Query:
        """Parse a query string against THIS index's schema: field names
        (MultiFieldIndex) and the index's own analyzer chain (manifest
        ``analyzer`` on loaded indexes) are applied automatically — the
        ``QueryParser(schema)`` convenience (``qparser/default.py ≈L100``).
        Keyword args pass through to ``parse_query``."""
        from whoosh_spark.query.parser import parse_query

        if hasattr(self.ix, "index_for"):  # MultiFieldIndex
            kw.setdefault("fields", list(self.ix.indexes))
        an = getattr(self.ix, "analyzer", None)
        if an and an != "standard":
            kw.setdefault("analyzer", an)
        return parse_query(qstring, **kw)

    # ------------------------------------------------------------------
    def search_hits(self, q: Q.Query, limit: int | None = 10,
                    groupedby: str | list[str] | None = None,
                    maptype: str = "list", terms: bool = False, **kw):
        """Run ``search()`` and wrap the collected top-k in a lazy
        ``Results``/``Hit`` view (``searching.py::Results ≈L900``): scores
        and doc ids are materialized (k rows), stored fields load in ONE
        batched job on first ``hit[field]`` access.

        ``groupedby``/``maptype`` mirror upstream's faceted search
        (``searching.py::Searcher.search(groupedby=...) ≈L700`` +
        ``Results.groups ≈L1010``): facet names registered here are
        grouped over ALL matching docs — lazily, one Spark job per facet
        on the first ``results.groups(name)`` call, not at search time."""
        from whoosh_spark.results import Results

        if maptype not in ("list", "count", "best"):
            raise ValueError(f"unknown maptype: {maptype!r}")
        rows = self.search(q, limit=limit, **kw).select("doc_id", "score").collect()
        # a short page proves the total of the search-as-run (filter/mask
        # trim BEFORE top-k, so shortness still counts every surviving
        # match) — only a skipped-head offset breaks that proof
        exact_when_short = not kw.get("offset")
        res = Results(self, q, rows, limit, exact_when_short=exact_when_short)
        if terms:
            # upstream search(terms=True): record which query leaves
            # matched each hit (Hit.matched_terms ≈L1340)
            res._matched = self._matched_terms_by_doc(
                q, [int(r["doc_id"]) for r in rows])
        if groupedby is not None:
            res._groupedby = ([groupedby] if isinstance(groupedby, str)
                              else list(groupedby))
            res._maptype = maptype
            # upstream groups the FILTERED match set (the facet collector
            # sits behind the filter wrapper in the collector chain) —
            # restate search()'s semi/anti joins as query algebra so the
            # lazy facet job sees the same doc set
            gq = q
            if kw.get("filter") is not None:
                gq = Q.Require(gq, kw["filter"])
            if kw.get("mask") is not None:
                gq = Q.AndNot(gq, kw["mask"])
            res._group_q = gq
        return res

    # ------------------------------------------------------------------
    def collector(self, limit: int | None = 10, sortedby=None,
                  reverse: bool = False, groupedby=None,
                  maptype: str = "list", collapse: str | None = None,
                  collapse_limit: int = 1, collapse_order: str | None = None,
                  filter: Q.Query | None = None, mask: Q.Query | None = None,
                  terms: bool = False):
        """Build the standard collector chain — ``searching.py::
        Searcher.collector (≈L660)``.  Wrapping order matches upstream
        (outermost first): filter → collapse → facets → terms → base, so
        facet groups see the filtered+collapsed match set and the terminal
        collector fixes order/limit.  The returned object is a
        :class:`whoosh_spark.collectors.Collector`; run it with
        :meth:`search_with_collector` or stack custom wrappers on top."""
        from whoosh_spark import collectors as C

        if sortedby is not None:
            c: C.Collector = C.SortingCollector(sortedby, reverse=reverse,
                                                limit=limit)
        elif limit is None:
            c = C.UnlimitedCollector()
        else:
            c = C.TopCollector(limit)
        if terms:
            c = C.TermsCollector(c)
        if groupedby is not None:
            c = C.FacetCollector(c, groupedby, maptype=maptype)
        if collapse is not None:
            c = C.CollapseCollector(c, collapse, keep=collapse_limit,
                                    order=collapse_order)
        if filter is not None or mask is not None:
            c = C.FilterCollector(c, allow=filter, restrict=mask)
        return c

    def search_with_collector(self, q: Q.Query, c) -> DataFrame:
        """Run a collector chain against ``q`` — ``searching.py::
        Searcher.search_with_collector (≈L780)``.  Returns the final
        ordered DataFrame (also left on ``c.df``); collectors with
        side-products (facet groups, matched terms, partial rows) expose
        them on themselves afterwards."""
        from whoosh_spark.collectors import CollectorContext

        # evaluate() normalizes; passing q raw avoids the double-normalize
        # hazard pinned by tests/test_queries_normalize.py
        return c.run(CollectorContext(self, q))

    # ------------------------------------------------------------------
    def search_page(self, q: Q.Query, pagenum: int, pagelen: int = 10, **kw):
        """``Searcher.search_page (≈L760)``: collect the top
        pagenum·pagelen hits once, return a ``ResultsPage`` view of page
        ``pagenum`` (1-based)."""
        from whoosh_spark.results import ResultsPage

        if pagenum < 1:
            raise ValueError("pagenum must be >= 1")
        if pagelen < 1:
            raise ValueError("pagelen must be >= 1")
        # fetch ONE row beyond the page so a full page proves whether any
        # further match exists (exact is_last_page without a count job)
        res = self.search_hits(q, limit=pagenum * pagelen + 1, **kw)
        return ResultsPage(res, pagenum, pagelen)

    # ------------------------------------------------------------------
    def search_many(self, queries: dict[str, Q.Query],
                    limit: int = 10) -> DataFrame:
        """Evaluate MANY queries in ONE Spark job: (qname, doc_id, score)
        top-``limit`` per query, each ranked with the reference tie-break
        (score DESC, doc_id ASC — identical rows to ``search(q, limit,
        optimize=False)`` per name).

        Whoosh has no batch API (each ``search()`` walks the matcher tree
        anew); on Spark the fixed job/scheduling overhead dominates a single
        top-k at interactive corpus sizes, so unioning the per-query scored
        subplans and ranking with one window amortizes that overhead across
        the batch — N queries cost ~max (not sum) of their individual
        latencies, the per-query subplans running concurrently within the
        job.  The window partitions by query name, so no query's candidate
        set ever sorts globally against another's."""
        if not queries:
            raise ValueError("search_many needs at least one query")
        flat: dict[str, tuple[str, list[str], int, float]] = {}
        rest: dict[str, Q.Query] = {}
        for name, q in queries.items():
            # normalize BEFORE classifying, exactly like evaluate() does —
            # raw input may carry unanalyzed text ("Data", "big data") or
            # stop-word children that must rewrite/vanish first
            qn = q.normalize()
            spec = self._flat_spec(qn)
            if spec is not None:
                flat[str(name)] = spec
            else:
                rest[str(name)] = qn
        parts = []
        if flat:
            parts.append(self._flat_batch(flat))
        parts.extend(
            self.ev.evaluate(q).select(
                F.lit(name).alias("qname"), "doc_id", "score")
            for name, q in rest.items()
        )
        allq = parts[0]
        for p in parts[1:]:
            allq = allq.unionByName(p)
        w = Window.partitionBy("qname").orderBy(
            F.col("score").desc(), F.col("doc_id").asc())
        ranked = allq.withColumn("_rn", F.row_number().over(w))
        if limit is not None:  # None = all matches, like search(limit=None)
            ranked = ranked.where(F.col("_rn") <= limit)
        return ranked.drop("_rn")

    @staticmethod
    def _flat_spec(q: Q.Query) -> tuple[str, list[str], int, float] | None:
        """(kind, terms, minmatch, tiebreak) if q is a default-field batch-
        aggregatable query: unboosted Term, or And/Or/DisMax whose children
        are all unboosted default-field Terms with unique texts.  These all
        reduce to sum/max/count aggregates over ONE shared postings scan."""

        def flat_texts(children):
            texts = []
            for c in children:
                if not (isinstance(c, Q.Term) and c.boost == 1.0
                        and c.fieldname is None):
                    return None
                texts.append(c.text)
            return texts if len(set(texts)) == len(texts) else None

        if isinstance(q, Q.Term) and q.boost == 1.0 and q.fieldname is None:
            return ("or", [q.text], 1, 0.0)
        if isinstance(q, (Q.And, Q.Or, Q.DisMax)) and q.boost == 1.0:
            texts = flat_texts(q.children)
            if texts is None:
                return None
            if isinstance(q, Q.And):
                return ("and", texts, len(texts), 0.0)
            if isinstance(q, Q.Or):
                return ("or", texts, max(1, q.minmatch), 0.0)
            if 0.0 <= q.tiebreak <= 1.0:
                return ("dismax", texts, 1, q.tiebreak)
        return None

    def _flat_batch(self, flat: dict[str, tuple[str, list[str], int, float]]
                    ) -> DataFrame:
        """All flat queries of the batch from ONE postings scan: score every
        distinct term once (`Evaluator._scored_terms`), fan rows out to the
        queries that reference each term via a broadcast (term, qname) map,
        then one (qname, doc_id) aggregation applies each query's combine
        rule (And: sum gated on full count; Or: sum gated on minmatch;
        DisMax: max + tiebreak·(sum − max)).  N queries over shared terms
        cost one scan + decode instead of N."""
        spark = self.ix.spark
        all_terms = sorted({t for _, ts, _, _ in flat.values() for t in ts})
        scored = self.ev.scored_terms_batch(all_terms)
        tmap = spark.createDataFrame(
            [(t, name) for name, (_, ts, _, _) in flat.items() for t in ts],
            "term string, qname string")
        meta = spark.createDataFrame(
            [(name, kind, len(ts), mm, tb)
             for name, (kind, ts, mm, tb) in flat.items()],
            "qname string, kind string, n_terms int, minmatch int, tiebreak double")
        agg = (
            scored.join(F.broadcast(tmap), "term")
            .groupBy("qname", "doc_id")
            .agg(F.sum("score").alias("_s"), F.max("score").alias("_mx"),
                 F.count("*").alias("_n"))
            .join(F.broadcast(meta), "qname")
        )
        score = (
            F.when(F.col("kind") == "and",
                   F.when(F.col("_n") == F.col("n_terms"), F.col("_s")))
            .when(F.col("kind") == "dismax",
                  F.col("_mx")
                  + F.col("tiebreak") * (F.col("_s") - F.col("_mx")))
            .otherwise(F.when(F.col("_n") >= F.col("minmatch"), F.col("_s")))
        )
        return (
            agg.withColumn("score", score)
            .where(F.col("score").isNotNull())
            .select("qname", "doc_id", "score")
        )

    # ------------------------------------------------------------------
    def _collapse(self, scores: DataFrame, key: str, keep: int,
                  order: str | None = None) -> DataFrame:
        """``collectors.py::CollapseCollector (≈L650)`` → window row_number.

        ``order`` is the collapse_order facet: which docs SURVIVE within a
        collapse group is decided by that stored column ascending (upstream:
        lower sort key wins) instead of by score; the survivors still rank
        by score in the final result."""
        cols = list(dict.fromkeys(
            ["doc_id", key] + ([order] if order is not None else [])))
        with_key = scores.join(self.ix.docs.select(*cols), "doc_id")
        if order is not None:
            # NULL order keys lose (asc_nulls_last) — pins one semantics
            # across engines (Spark asc defaults nulls FIRST, SQL engines
            # commonly last)
            w = Window.partitionBy(key).orderBy(
                F.col(order).asc_nulls_last(), F.col("doc_id").asc())
        else:
            w = Window.partitionBy(key).orderBy(
                F.col("score").desc(), F.col("doc_id").asc())
        return (
            with_key.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= keep)
            .select("doc_id", "score")
        )

    # ------------------------------------------------------------------
    def facet_counts(self, q: Q.Query, facet: str) -> DataFrame:
        """groupedby=FieldFacet with Count maptype (``sorting.py ≈L150``)."""
        scores = self.ev.evaluate(q)
        return (
            scores.join(self.ix.docs.select("doc_id", facet), "doc_id")
            .groupBy(facet)
            .agg(F.count("*").cast("long").alias("n"))
        )

    def facet_doclists(self, q: Q.Query, facet: str) -> DataFrame:
        """FieldFacet with the UnorderedList maptype (``src/whoosh/sorting.py::
        UnorderedList ≈L120``): each facet group carries the LIST of matching
        doc ids, not just a count.  The list is emitted as a comma-joined
        string of ascending ids so every output column stays scalar
        (hash/sort-friendly for the contract canonicalizer); collect_list is
        a single map-side-combined aggregation — same one shuffle as the
        Count maptype."""
        scores = self.ev.evaluate(q)
        return (
            scores.join(self.ix.docs.select("doc_id", facet), "doc_id")
            .groupBy(facet)
            .agg(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(F.col("doc_id")))
                ).alias("doc_ids"),
                F.count("*").cast("long").alias("n"),
            )
        )

    def docs_for_query(self, q: Q.Query) -> DataFrame:
        """All matching doc ids, unscored (``src/whoosh/searching.py::
        Searcher.docs_for_query ≈L560``).  One row per matching doc —
        evaluate() already deduplicates per doc, so no distinct/shuffle is
        added on top of the query plan."""
        return self.ev.evaluate(q).select("doc_id")

    def facet_range(self, q: Q.Query, col: str, start: float, end: float,
                    gap: float) -> DataFrame:
        """RangeFacet (``src/whoosh/sorting.py::RangeFacet ≈L300``): bucket a
        numeric stored column into [start+i·gap, start+(i+1)·gap) bins —
        width_bucket as a column expression; out-of-range → bin -1/overflow."""
        scores = self.ev.evaluate(q)
        c = F.col(col).cast("double")
        # overflow bin = CEIL((end-start)/gap): with a partial last bucket
        # (range not divisible by gap) the floor id would collide with it
        import math as _math

        bin_ = F.when(c < start, F.lit(-1)).when(
            c >= end, F.lit(int(_math.ceil((end - start) / gap)))
        ).otherwise(F.floor((c - start) / gap).cast("int"))
        return (
            scores.join(self.ix.docs.select("doc_id", col), "doc_id")
            .withColumn("bin", bin_)
            .groupBy("bin")
            .agg(F.count("*").cast("long").alias("n"))
        )

    def facet_query(self, base: Q.Query, named: dict[str, Q.Query]) -> DataFrame:
        """QueryFacet (``sorting.py::QueryFacet ≈L380``): count base-query
        matches falling in each named sub-query's doc set."""
        scores = self.ev.evaluate(base).select("doc_id")
        parts = []
        for name, sub in sorted(named.items()):
            member = self.ev.evaluate(sub).select("doc_id")
            parts.append(
                scores.join(member, "doc_id", "left_semi")
                .agg(F.lit(name).alias("facet"), F.count("*").cast("long").alias("n"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def facet_multi(self, q: Q.Query, facets: list[str]) -> DataFrame:
        """MultiFacet (``src/whoosh/sorting.py::MultiFacet ≈L450``): group by
        the composite of several stored columns — one groupBy on the tuple,
        not a facet-product loop."""
        scores = self.ev.evaluate(q)
        return (
            scores.join(self.ix.docs.select("doc_id", *facets), "doc_id")
            .groupBy(*facets)
            .agg(F.count("*").cast("long").alias("n"))
        )

    def facet_function(self, q: Q.Query, expr: str, name: str = "bucket") -> DataFrame:
        """FunctionFacet (``sorting.py::FunctionFacet ≈L420``): an arbitrary
        SQL expression over the stored columns defines the facet key —
        evaluated JVM-side as a column expression, never per-row Python."""
        scores = self.ev.evaluate(q)
        return (
            scores.join(self.ix.docs, "doc_id")
            .withColumn(name, F.expr(expr))
            .groupBy(name)
            .agg(F.count("*").cast("long").alias("n"))
        )

    def facet_daterange(self, q: Q.Query, col: str, start_epoch: int,
                        end_epoch: int, gap_seconds: int) -> DataFrame:
        """DateRangeFacet (``sorting.py::DateRangeFacet ≈L350``): RangeFacet
        over a timestamp column with a timedelta gap; bins are epoch-based so
        both engines agree without timezone parsing."""
        scores = self.ev.evaluate(q)
        ts = F.unix_timestamp(F.col(col))
        import math as _math

        nbins = int(_math.ceil((end_epoch - start_epoch) / gap_seconds))
        bin_ = F.when(ts < start_epoch, F.lit(-1)).when(
            ts >= end_epoch, F.lit(nbins)
        ).otherwise(F.floor((ts - start_epoch) / gap_seconds).cast("int"))
        return (
            scores.join(self.ix.docs.select("doc_id", col), "doc_id")
            .withColumn("bin", bin_)
            .groupBy("bin")
            .agg(F.count("*").cast("long").alias("n"))
        )

    def facet_stored_split(self, q: Q.Query, col: str, sep: str = ",") -> DataFrame:
        """StoredFieldFacet with allow_overlap (``sorting.py::StoredFieldFacet
        ≈L480``): a multi-valued stored string splits on ``sep`` and the doc
        counts toward EVERY value (explode, not groupBy-scalar)."""
        scores = self.ev.evaluate(q)
        return (
            scores.join(self.ix.docs.select("doc_id", col), "doc_id")
            .select("doc_id",
                    F.explode(F.split(F.col(col), __import__("re").escape(sep)))
                    .alias("value"))
            .groupBy("value")
            .agg(F.count("*").cast("long").alias("n"))
        )

    def facet_best(self, q: Q.Query, facet: str) -> DataFrame:
        """groupedby with Best maptype — max_by(doc_id, (score, -doc_id))."""
        scores = self.ev.evaluate(q)
        with_f = scores.join(self.ix.docs.select("doc_id", facet), "doc_id")
        w = Window.partitionBy(facet).orderBy(F.col("score").desc(), F.col("doc_id").asc())
        return (
            with_f.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(facet, "doc_id", "score")
        )

    # ------------------------------------------------------------------
    def search_with_timeout(self, q: Q.Query, timelimit: float,
                            limit: int | None = 10, partial: bool = False,
                            chunks: int = 8, **kw) -> list:
        """``TimeLimitCollector`` analog
        (``src/whoosh/collectors.py::TimeLimitCollector ≈L700``): collect the
        top-k rows, cancelling the distributed job and raising
        :class:`TimeLimitError` if it exceeds ``timelimit`` seconds.

        Default (``partial=False``): Spark's unit of cancellation is the
        job (job-group cancel interrupts every executor task), so an
        expired search yields no partial rows — the honest distributed
        semantics when the whole search is one job.

        ``partial=True`` reproduces upstream's contract — after a timeout
        the rows collected SO FAR are available — by collecting in
        ``chunks`` disjoint doc-space slices (``doc_id % chunks``), each
        its own cancellable job under the shared deadline.  Scoring stats
        (idf, avgdl) stay GLOBAL, so every returned score is identical to
        an unlimited search; when all chunks finish, the merged top-k IS
        the exact result.  On expiry the raised :class:`TimeLimitError`
        carries ``.partial`` (merged top-k over completed chunks — the
        ``TimeLimitedCollector.results()`` analog) and ``.chunks_done``.
        Trade-off, documented for 100 TB honesty: k sequential jobs re-scan
        the postings ≈k times, so partial mode buys bounded staleness with
        scan amplification — keep ``chunks`` small, or pre-bucket the store
        by doc range if partial search is hot.
        """
        if not partial:
            # the WHOLE search runs inside the watchdog scope: WAND's
            # planning collects (theta seed, block-count probe) are
            # themselves Spark jobs and must be cancellable, not just the
            # final collect
            return run_with_timeout(
                self.ix.spark, timelimit,
                lambda: self.search(q, limit=limit, **kw).collect())
        # partial mode merges chunks on (score DESC, doc_id ASC), so search
        # options that impose a DIFFERENT global order can't be honored
        # collapse survivors and reverse order are also global properties a
        # per-chunk top-k can't reproduce
        for bad in ("sortedby", "offset", "collapse", "reverse"):
            if bad in kw:
                raise ValueError(f"partial=True is score-ranked; {bad!r} "
                                 "is not supported with partial results")
        import time as _time

        t0 = _time.monotonic()
        # full search surface (filter/mask/final/with_stored/...) via the
        # ordinary lazy plan; WAND off — its planning collects would burn
        # deadline before the first chunk lands
        scores = run_with_timeout(
            self.ix.spark, timelimit,
            lambda: self.search(q, limit=None, optimize=False, **kw))
        remaining = timelimit - (_time.monotonic() - t0)
        return collect_chunked_with_deadline(scores, max(remaining, 1e-3),
                                             limit, chunks)

    # ------------------------------------------------------------------
    def documents(self, **kw) -> DataFrame:
        """``Searcher.documents(**kw)`` (``src/whoosh/searching.py ≈L330``):
        stored docs matching keyword equalities (deletion-filtered)."""
        df = self.ix.docs
        for k, v in kw.items():
            df = df.where(F.col(k) == F.lit(v))
        return self.ix.not_deleted(df)

    def document(self, **kw):
        """First matching stored doc as a Row, or None (``≈L320``)."""
        rows = self.documents(**kw).limit(1).collect()
        return rows[0] if rows else None

    def document_number(self, **kw) -> int | None:
        """First matching doc_id, or None (``searching.py::Searcher.
        document_number ≈L300``)."""
        rows = (self.documents(**kw).select("doc_id")
                .orderBy("doc_id").limit(1).collect())
        return int(rows[0]["doc_id"]) if rows else None

    def document_numbers(self, **kw) -> list[int]:
        """All matching doc_ids, ascending (``≈L310``).  Driver-
        materializing like upstream's generator; for a distributed result
        use ``documents(**kw).select("doc_id")``."""
        return [int(r["doc_id"]) for r in
                self.documents(**kw).select("doc_id").orderBy("doc_id").collect()]

    # ------------------------------------------------------------------
    def search_with_terms(self, q: Q.Query, limit: int | None = 10) -> DataFrame:
        """``search(..., terms=True)`` / ``Hit.matched_terms()``
        (``src/whoosh/searching.py ≈L640``): top-k plus a ``matched`` column
        listing which of the query's leaf terms occur in each hit (sorted,
        comma-joined — a scalar so downstream sorts/hashes work).  One extra
        postings probe restricted to the k result docs."""
        scores = self.ev.evaluate(q)
        ordered = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        if limit is not None:
            ordered = ordered.limit(limit)
        u = self._query_term_postings(q)
        if u is None:
            return ordered.withColumn("matched", F.lit(""))
        matched = (
            u.join(ordered.select("doc_id"), "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.concat_ws(",", F.array_sort(F.collect_set("term"))).alias("matched"))
        )
        return (
            ordered.join(matched, "doc_id", "left")
            .withColumn("matched", F.coalesce(F.col("matched"), F.lit("")))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )

    def _query_term_postings(self, q: Q.Query) -> DataFrame | None:
        """(doc_id, field, term) postings of ``q``'s leaf terms that exist
        in the index — the shared probe behind ``terms=True`` and
        ``search_with_terms`` (``searching.py ≈L640``).  One term-pushed
        postings scan per field; None when no leaf term exists."""
        qe = self.ev._expand(q.normalize())
        by_field: dict[str | None, set[str]] = {}
        for f, t in set(qe.field_terms()):
            by_field.setdefault(self.ev._fkey(f), set()).add(t)
        parts = []
        for fk, ts in by_field.items():
            ixf = self.ev._ixf(fk)
            stats = ixf.stats_for_terms(sorted(ts))
            present = sorted(t for t in ts if t in stats)
            if present:
                fname = getattr(ixf, "field", None) or "text"
                parts.append(
                    ixf.postings(present)
                    .select("doc_id", F.lit(fname).alias("field"), "term"))
        if not parts:
            return None
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    def _matched_terms_by_doc(self, q: Q.Query,
                              ids: list[int]) -> dict[int, set]:
        """Which (field, term) leaves of ``q`` occur in each of ``ids`` —
        behind ``Hit.matched_terms()``; probe restricted to the k result
        docs (the isin filter pushes through the per-field union)."""
        out: dict[int, set] = {int(d): set() for d in ids}
        u = self._query_term_postings(q) if ids else None
        if u is None:
            return out
        rows = u.where(F.col("doc_id").isin([int(d) for d in ids])).collect()
        for r in rows:
            out[int(r["doc_id"])].add((r["field"], r["term"]))
        return out

    # ------------------------------------------------------------------
    def key_terms(self, doc_ids: list[int], top: int = 5,
                  model: str = "tfidf") -> DataFrame:
        """more_like/key-term extraction (``src/whoosh/classify.py::Expander
        ≈L60``): rank a doc-set's terms against the corpus.

        ``model`` selects the expansion model (``classify.py::Bo1Model
        ≈L120 / Bo2Model ≈L140 / KLModel ≈L160`` — the published DFR
        query-expansion formulas; ``tfidf`` is the engine's default):

        - ``tfidf``: wt · (ln(N/(df+1)) + 1)
        - ``bo1``:   f = cf/N;       wt·log2((1+f)/f) + log2(1+f)
        - ``bo2``:   f = wt·tt/ct;   wt·log2((1+f)/f) + log2(1+f)
        - ``kl``:    t = wt/tt, c = cf/ct;  t·log2(t/c) if t ≥ c else 0

        where wt = term weight inside the doc set, cf = collection
        frequency, ct = total field length, tt = doc set's total length —
        all from the O(1) stats tables plus one doc-pushed postings probe;
        the formulas stay in JVM column expressions."""
        if model not in ("tfidf", "bo1", "bo2", "kl"):
            raise ValueError(f"unknown expansion model: {model!r}")
        if not doc_ids:
            return self.ix.spark.createDataFrame(
                [], "term string, tf long, keyness double")
        n, _ = self.ix.global_stats()
        posts = self.ix.postings_where(
            (F.col("min_id") <= max(doc_ids)) & (F.col("max_id") >= min(doc_ids))
        ).where(F.col("doc_id").isin(doc_ids))
        ts = self.ix.term_stats.select("term", "df", "cf")
        wt = F.col("tf").cast("double")
        if model == "tfidf":
            keyness = wt * (F.log(F.lit(float(n)) / (F.col("df") + 1)) + 1.0)
        elif model == "bo1":
            f = F.col("cf").cast("double") / F.lit(float(n))
            keyness = wt * F.log2((1.0 + f) / f) + F.log2(1.0 + f)
        else:
            ct = float(self.ix.total_field_length())
            tt_rows = (self.ix.doc_lengths
                       .where(F.col("doc_id").isin(doc_ids))
                       .agg(F.sum("len_raw").alias("tt")).collect())
            tt = float(tt_rows[0]["tt"] or 0)
            if model == "bo2":
                f = wt * F.lit(tt) / F.lit(ct)
                keyness = wt * F.log2((1.0 + f) / f) + F.log2(1.0 + f)
            else:  # kl
                t = wt / F.lit(tt)
                c = F.col("cf").cast("double") / F.lit(ct)
                keyness = F.when(t >= c, t * F.log2(t / c)).otherwise(F.lit(0.0))
        scored = (
            posts.groupBy("term").agg(F.sum("tf").alias("tf"))
            .join(F.broadcast(ts), "term")
            .withColumn("keyness", keyness)
            .drop("cf")
        )
        return scored.orderBy(F.col("keyness").desc(), F.col("term").asc()).limit(top)

    def _ranked_text_terms(self, text: str) -> list[tuple[str, int, float]]:
        """(term, tf, tf·idf keyness) of RAW text's terms that exist in the
        index, keyness-descending — driver-side analysis of the one string
        plus an O(terms) broadcast stats lookup.  Shared by
        ``key_terms_from_text`` and ``more_like_text``."""
        from collections import Counter

        from whoosh_spark.analysis.analyzers import ANALYZERS
        from whoosh_spark.execution.score import idf_value

        ixf = self.ix.primary if hasattr(self.ix, "index_for") else self.ix
        an = ANALYZERS.get(getattr(ixf, "analyzer", "standard") or "standard",
                           ANALYZERS["standard"])
        toks, _ = an(text or "")
        tf = Counter(toks)
        stats = ixf.stats_for_terms(sorted(tf))
        if not stats:
            return []
        n, _ = ixf.global_stats()
        return sorted(
            ((t, int(tf[t]), float(tf[t] * idf_value(n, st["df"])))
             for t, st in stats.items()),
            key=lambda r: (-r[2], r[0]))

    def key_terms_from_text(self, text: str, top: int = 5) -> DataFrame:
        """``searching.py::Searcher.key_terms_from_text (≈L700)`` — same
        (term, tf, keyness) shape as ``key_terms``."""
        schema = "term string, tf long, keyness double"
        return self.ix.spark.createDataFrame(
            self._ranked_text_terms(text)[:top], schema)

    def highlights(self, q: Q.Query, limit: int = 10, text_col: str = "text",
                   top: int = 3, **fmt_kw) -> list[tuple[int, float, str]]:
        """Top-k hits with highlighted context fragments
        (``searching.py::Hit.highlights ≈L1300``).  Driver-side over the k
        result rows only — requires the docs table to carry ``text_col``."""
        from whoosh_spark.highlight import highlight as _hl

        terms = {t for t in q.normalize().terms()} | {
            w for w in q.normalize().phrase_terms()}
        rows = self.search(q, limit=limit, with_stored=[text_col]).collect()
        return [
            (int(r["doc_id"]), float(r["score"]),
             _hl(r[text_col] or "", terms, top=top, **fmt_kw))
            for r in rows
        ]

    def highlights_from_index(self, q: Q.Query, chars: DataFrame,
                              limit: int = 10, text_col: str = "text",
                              top: int = 3, **fmt_kw) -> list[tuple[int, float, str]]:
        """Characters-format highlighting (``formats.py::Characters ≈L250``):
        hit char spans come from the ``chars`` side table
        (``whoosh_spark.chars.char_offsets``) instead of re-analyzing the
        stored text — term-pushed scan semi-joined to the k result docs.

        ``fragmenter="context"`` (default) merges surround windows like
        ContextFragmenter; ``fragmenter="pinpoint"`` is upstream's
        PinpointFragmenter (``highlight.py::PinpointFragmenter ≈L430``) —
        greedy match-span grouping, optional ``autotrim``."""
        from whoosh_spark.highlight import (fragments_from_spans, html_format,
                                            pinpoint_fragments)

        qn = q.normalize()
        terms = {t for t in qn.terms()} | set(qn.phrase_terms())
        rows = self.search(q, limit=limit, with_stored=[text_col]).collect()
        ids = [int(r["doc_id"]) for r in rows]
        if not ids:
            return []
        offs = (
            chars.where(F.col("term").isin(sorted(terms))
                        & F.col("doc_id").isin(ids))
            .collect()
        )
        by_doc: dict[int, list[tuple[int, int, str]]] = {}
        for r in offs:
            for s, e in zip(r["starts"], r["ends"]):
                by_doc.setdefault(int(r["doc_id"]), []).append((s, e, r["term"]))
        fmt = fmt_kw.pop("formatter", html_format)
        maxchars = fmt_kw.pop("maxchars", 200)
        surround = fmt_kw.pop("surround", 20)
        sep = fmt_kw.pop("sep", "...")
        fragmenter = fmt_kw.pop("fragmenter", "context")
        autotrim = fmt_kw.pop("autotrim", False)
        out = []
        for r in rows:
            text = r[text_col] or ""
            doc_hits = by_doc.get(int(r["doc_id"]), [])
            if fragmenter == "pinpoint":
                frags = pinpoint_fragments(text, doc_hits, maxchars,
                                           surround, autotrim)
            elif fragmenter == "context":
                frags = fragments_from_spans(text, doc_hits,
                                             maxchars, surround)
            else:
                raise ValueError(f"unknown fragmenter {fragmenter!r} "
                                 "(context | pinpoint)")
            frags.sort(key=lambda f: (-f.score(), f.startchar))
            chosen = sorted(frags[:top], key=lambda f: f.startchar)
            out.append((int(r["doc_id"]), float(r["score"]),
                        sep.join(fmt(text, f) for f in chosen)))
        return out

    def more_like(self, doc_ids: list[int], limit: int = 10,
                  numterms: int = 5, model: str = "tfidf") -> DataFrame:
        """``searching.py::Searcher.more_like (≈L500)``: expand the doc set's
        top key terms (classify.py Expander; ``model`` picks
        tfidf/bo1/bo2/kl) into an Or query, excluding the source docs."""
        kt = [r["term"] for r in
              self.key_terms(doc_ids, top=numterms, model=model).collect()]
        if not kt:
            return self.ix.spark.createDataFrame([], "doc_id long, score double")
        q = Q.Or([Q.Term(t) for t in kt])
        res = self.search(q, limit=limit + len(doc_ids))
        return (
            res.where(~F.col("doc_id").isin([int(d) for d in doc_ids]))
            .limit(limit)
        )

    def more_like_text(self, text: str, limit: int = 10,
                       numterms: int = 5) -> DataFrame:
        """``more_like`` from RAW text (upstream ``Searcher.more_like(text=
        ...)``): rank the text's terms via :meth:`_ranked_text_terms`,
        search the Or of the top key terms."""
        ranked = self._ranked_text_terms(text)
        if not ranked:
            return self.ix.spark.createDataFrame(
                [], "doc_id long, score double")
        q = Q.Or([Q.Term(t) for t, _, _ in ranked[:numterms]])
        return self.search(q, limit=limit)

    def correct_term(self, word: str, maxdist: int = 2, top: int = 3) -> list[str]:
        """Spelling corrector (``src/whoosh/spelling.py::ReaderCorrector ≈L80``):
        most-frequent terms within levenshtein distance, prefix-sharing."""
        rows = (
            self.ix.term_stats.where(
                (F.levenshtein(F.col("term"), F.lit(word)) <= maxdist)
                & F.col("term").startswith(word[:1])
            )
            .orderBy(F.col("cf").desc(), F.col("term").asc())
            .limit(top)
            .collect()
        )
        return [r["term"] for r in rows]

    def corrector(self, fieldname: str | None = None) -> "Corrector":
        """``searching.py::Searcher.corrector (≈L620)`` — a reusable
        suggestion object over one field's lexicon."""
        if hasattr(self.ix, "index_for"):
            ixf = self.ix.index_for(fieldname)
        elif fieldname is not None and fieldname != self.ix.field:
            raise KeyError(f"unknown field {fieldname!r} (single-field "
                           f"index {self.ix.field!r})")
        else:
            ixf = self.ix
        return Corrector(ixf)

    def correct_terms(self, words: list[str], maxdist: int = 2) -> dict[str, str]:
        """Batched ``correct_term``: top correction for EVERY word in ONE
        term_stats scan (one Spark job however many typos the query has).
        The scan filter is the OR of the per-word levenshtein predicates;
        the surviving candidate set (small) is then exploded against the
        word list and ranked per word."""
        import functools

        from pyspark.sql.window import Window

        words = [w for w in dict.fromkeys(words) if w]
        if not words:
            return {}
        pred = functools.reduce(
            lambda a, b: a | b,
            ((F.levenshtein(F.col("term"), F.lit(w)) <= maxdist)
             & F.col("term").startswith(w[:1]) for w in words),
        )
        cand = self.ix.term_stats.where(pred).select("term", "cf")
        matched = (
            cand.withColumn("word", F.explode(F.array(*[F.lit(w) for w in words])))
            .where(
                (F.levenshtein(F.col("term"), F.col("word")) <= maxdist)
                & (F.substring("term", 1, 1) == F.substring("word", 1, 1))
            )
        )
        w = Window.partitionBy("word").orderBy(
            F.col("cf").desc(), F.col("term").asc())
        best = (
            matched.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("word", "term")
            .collect()
        )
        return {r["word"]: r["term"] for r in best}

    def correct_query(self, qstring: str, maxdist: int = 2):
        """``searching.py::Searcher.correct_query (≈L640)``: rewrite the
        query STRING, replacing each plain term absent from the lexicon with
        its top correction (``correct_term`` ranking: most frequent within
        levenshtein ``maxdist``, sharing the first character).  Operator
        keywords and tokens adjacent to query syntax (wildcards, fuzzy,
        boosts, ranges, field prefixes) are left untouched — only bare Term
        and phrase words are corrected, like upstream's token-position
        rewrite.  Returns ``(corrected_string, corrected_query)``."""
        import re as _re

        from whoosh_spark.analysis.analyzers import analyze_text
        from whoosh_spark.query.parser import parse_query

        keywords = {"AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "TO"}
        syntax = set("*?~^[]{}:")
        cands: list[tuple[int, int, str]] = []  # (start, end, analyzed term)
        for m in _re.finditer(r"\w+", qstring):
            w = m.group(0)
            if w in keywords:
                continue
            before = qstring[m.start() - 1] if m.start() else " "
            after = qstring[m.end()] if m.end() < len(qstring) else " "
            if before in syntax or after in syntax:
                continue
            toks, _ = analyze_text(w)
            if len(toks) == 1:
                cands.append((m.start(), m.end(), toks[0]))
        terms = {t for _, _, t in cands}
        known: set[str] = set()
        if terms:
            known = {
                r["term"]
                for r in self.ix.term_stats.where(
                    F.col("term").isin(sorted(terms))).select("term").collect()
            }
        unknown = [t for _, _, t in cands if t not in known]
        repl = self.correct_terms(unknown, maxdist=maxdist)
        pieces, last = [], 0
        for st, en, t in cands:
            if t in repl:
                pieces.append(qstring[last:st])
                pieces.append(repl[t])
                last = en
        pieces.append(qstring[last:])
        corrected = "".join(pieces)
        return corrected, parse_query(corrected)


# ---------------------------------------------------------------------------
# time-limited collection (TimeLimitCollector analog)
# ---------------------------------------------------------------------------

class TimeLimitError(Exception):
    """Raised when a time-limited collection exceeds its budget
    (``src/whoosh/collectors.py::TimeLimit ≈L690``)."""


def run_with_timeout(spark, timelimit: float, fn):
    """Run ``fn()`` (any driver code that launches Spark jobs) under a
    dedicated job group; a watchdog thread cancels the group (interrupting
    executor tasks) once ``timelimit`` seconds elapse.  Cancellation is
    cooperative and distributed — the same mechanism a cluster UI "kill"
    uses — so no orphaned tasks keep burning executors after the deadline."""
    import threading
    import uuid

    sc = spark.sparkContext
    gid = f"whoosh-timelimit-{uuid.uuid4().hex[:8]}"
    done = threading.Event()
    expired = threading.Event()

    def watchdog():
        if not done.wait(timelimit):
            expired.set()
            sc.cancelJobGroup(gid)

    sc.setJobGroup(gid, f"run_with_timeout({timelimit}s)",
                   interruptOnCancel=True)
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        result = fn()
    except Exception as e:
        if expired.is_set():
            raise TimeLimitError(
                f"collection exceeded {timelimit}s") from e
        raise
    finally:
        done.set()
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    if expired.is_set():  # cancelled between last job and result fetch
        raise TimeLimitError(f"collection exceeded {timelimit}s")
    return result


def collect_with_timeout(df: DataFrame, timelimit: float) -> list:
    """Collect ``df`` under :func:`run_with_timeout`."""
    return run_with_timeout(df.sparkSession, timelimit, df.collect)


_SCORE_ORDER = [("score", True), ("doc_id", False)]


def _merge_topk(rows: list, limit: int | None,
                order_spec: list | None = None) -> list:
    """Driver-side merge in ``order_spec`` = [(column, descending), ...]
    order (default reference score order).  Multi-pass stable sort handles
    mixed asc/desc over any comparable type; null keys sort like Spark's
    defaults (asc → nulls first, desc → nulls last)."""
    out = list(rows)
    for name, desc in reversed(order_spec or _SCORE_ORDER):
        out.sort(key=lambda r: (r[name] is not None,
                                r[name] if r[name] is not None else 0),
                 reverse=desc)
    return out if limit is None else out[:limit]


def collect_chunked_with_deadline(scores: DataFrame, timelimit: float,
                                  limit: int | None = 10,
                                  chunks: int = 8,
                                  order_spec: list | None = None) -> list:
    """Partial-results engine behind ``search_with_timeout(partial=True)``:
    collect per-chunk top-k (``doc_id % chunks`` slices) sequentially under
    one deadline; per-chunk top-k ⊇ that chunk's members of the global
    top-k, so the merge is exact when every chunk lands.  On expiry raises
    :class:`TimeLimitError` with ``.partial`` (merged completed rows) and
    ``.chunks_done`` — upstream's collector keeps what it has seen; the
    distributed restatement keeps whole completed slices."""
    import time as _time

    if chunks <= 0:
        raise ValueError(f"chunks must be >= 1, got {chunks}")
    spec = order_spec or _SCORE_ORDER
    keys = [F.col(c).desc() if d else F.col(c).asc() for c, d in spec]
    deadline = _time.monotonic() + timelimit
    rows: list = []
    done = 0
    for i in range(chunks):
        chunk = (scores.where(F.col("doc_id") % chunks == i)
                 .orderBy(*keys))
        if limit is not None:
            chunk = chunk.limit(limit)
        remaining = deadline - _time.monotonic()
        try:
            if remaining <= 0:
                raise TimeLimitError(f"deadline hit before chunk {i}")
            rows.extend(run_with_timeout(
                scores.sparkSession, remaining, chunk.collect))
            done += 1
        except TimeLimitError:
            err = TimeLimitError(
                f"collection exceeded {timelimit}s "
                f"({done}/{chunks} chunks completed)")
            err.partial = _merge_topk(rows, limit, spec)
            err.chunks_done = done
            err.chunks = chunks
            raise err from None
    return _merge_topk(rows, limit, spec)


class Corrector:
    """``src/whoosh/spelling.py::Corrector/ReaderCorrector (≈L40-120)`` —
    reusable spelling suggestions over one field's lexicon.

    Upstream walks an FSA of the term dictionary distance-band by band
    (closest first, frequency-ranked within a band).  The Spark restatement
    is ONE term_stats scan with the levenshtein + shared-prefix predicate,
    ranked (distance ASC, cf DESC, term ASC) — identical suggestion order,
    TakeOrderedAndProject plan, no driver-side vocabulary."""

    def __init__(self, ix):
        self.ix = ix

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 1) -> list[str]:
        """Closest-first suggestions for ``text``; ``prefix`` leading chars
        must match (upstream's prefix= pruning — also what keeps the scan
        predicate selective on a 100 TB lexicon)."""
        if not text:
            return []
        dist = F.levenshtein(F.col("term"), F.lit(text))
        pred = dist <= maxdist
        if prefix > 0:
            pred = pred & F.col("term").startswith(text[:prefix])
        rows = (
            self.ix.term_stats.where(pred)
            .select("term", "cf", dist.alias("_d"))
            .where(F.col("term") != text)
            .orderBy(F.col("_d").asc(), F.col("cf").desc(),
                     F.col("term").asc())
            .limit(limit)
            .collect()
        )
        return [r["term"] for r in rows]


class ListCorrector:
    """``spelling.py::ListCorrector (≈L130)`` — suggestions from a static
    word list, driver-side (no index, no Spark jobs): ranked distance ASC,
    then list position ASC (upstream preserves caller order within a
    distance band)."""

    def __init__(self, wordlist: list[str]):
        self.wordlist = list(wordlist)

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 1) -> list[str]:
        from whoosh_spark.oracle.engine import _lev

        if not text:
            return []
        out = []
        for i, w in enumerate(self.wordlist):
            if w == text or (prefix > 0 and not w.startswith(text[:prefix])):
                continue
            d = _lev(w, text)
            if d <= maxdist:
                out.append((d, i, w))
        out.sort()
        seen, res = set(), []
        for _, _, w in out:
            if w not in seen:
                seen.add(w)
                res.append(w)
        return res[:limit]


class MultiCorrector:
    """``spelling.py::MultiCorrector (≈L150)`` — merge several correctors'
    suggestion streams: distance band by band, sub-correctors in caller
    order within a band, first occurrence wins."""

    def __init__(self, correctors: list):
        self.correctors = list(correctors)

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 1) -> list[str]:
        from whoosh_spark.oracle.engine import _lev

        ranked = []
        for ci, c in enumerate(self.correctors):
            for ri, w in enumerate(
                    c.suggest(text, limit=limit, maxdist=maxdist,
                              prefix=prefix)):
                ranked.append((_lev(w, text), ci, ri, w))
        ranked.sort()
        seen, res = set(), []
        for _, _, _, w in ranked:
            if w not in seen:
                seen.add(w)
                res.append(w)
        return res[:limit]
