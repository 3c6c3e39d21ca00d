"""Collector API — upstream ``collectors.py::Collector (≈L60)`` as a
composable DataFrame-transformation chain.

Upstream collectors observe one matched document at a time: ``Collector.
collect_matches (≈L380)`` loops the matcher and each (possibly wrapped)
collector's ``collect(sub_docnum)`` decides what to keep.  On Spark the
match set is a distributed ``(doc_id, score)`` frame, so the honest
re-expression of the same extension point is a transformation over that
frame: each collector's :meth:`Collector.collect` receives the scored
DataFrame and returns a transformed one, wrappers delegate to a child
exactly like upstream's ``WrappingCollector (≈L300)``, and the terminal
collector's :meth:`Collector.order_keys` fixes the result order (the
reference tie-break ``score DESC, doc_id ASC`` by default).

A CUSTOM collector subclasses :class:`Collector` (or
:class:`WrappingCollector` to stack on the standard chain) and overrides
``collect`` — because the hook works on the DataFrame, custom logic is
automatically distributed; there is no driver-side per-document loop to
opt out of.

Built-ins mirror the upstream set: ``TopCollector (≈L370)``,
``UnlimitedCollector (≈L470)``, ``SortingCollector (≈L520)``,
``FilterCollector (≈L500)``, ``FacetCollector (≈L560)``,
``CollapseCollector (≈L650)``, ``TermsCollector (≈L860)`` and
``TimeLimitCollector (≈L800)``.  ``Searcher.collector(...)`` builds the
same chain ``searching.py::Searcher.collector (≈L660)`` would, and
``Searcher.search_with_collector(q, c)`` runs it; chain output is pinned
rank-identical to ``Searcher.search(...)`` by tests
(tests/test_collectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


class CollectorContext:
    """What a collector may see while running: the searcher (and through
    it the index, docs table and evaluator) plus the active query."""

    def __init__(self, searcher, q):
        self.searcher = searcher
        self.q = q

    @property
    def docs(self) -> DataFrame:
        return self.searcher.ix.docs


class Collector:
    """Base collector: identity pass, reference ordering, no limit.

    Override :meth:`collect` to transform the scored frame and
    :meth:`order_keys` to change the result order.  After
    ``search_with_collector`` runs, :attr:`df` holds the final ordered
    DataFrame and :meth:`results` materializes it (only meaningful while
    the frame still carries ``doc_id``/``score`` columns)."""

    limit: int | None = None

    def __init__(self):
        self.df: DataFrame | None = None

    # -- extension points ------------------------------------------------
    def collect(self, ctx: CollectorContext, scores: DataFrame) -> DataFrame:
        return scores

    def order_spec(self, ctx: CollectorContext) -> list:
        """Result order as ``[(column, descending), ...]`` — the one
        declaration both :meth:`order_keys` (Spark sort) and the
        TimeLimit chunk merge (driver-side sort) are derived from, so a
        collector that changes the order changes BOTH consistently."""
        return [("score", True), ("doc_id", False)]

    def order_keys(self, ctx: CollectorContext) -> list:
        return [F.col(c).desc() if d else F.col(c).asc()
                for c, d in self.order_spec(ctx)]

    def finish(self, ctx: CollectorContext, out: DataFrame) -> None:
        """Post-run hook, called ONCE with the final ordered frame and
        propagated down the whole chain (wrappers delegate to their child),
        so a nested collector's side-products (matched terms, partial rows)
        compute no matter where it sits in the chain."""
        self._ctx = ctx
        self.df = out

    # -- driver ------------------------------------------------------------
    def _transformed(self, ctx: CollectorContext) -> DataFrame:
        """The chain's transformed match frame BEFORE order/limit — what a
        deadline-chunked collection slices (each chunk must NOT have to
        recompute a global top-k first)."""
        scores = ctx.searcher.ev.evaluate(ctx.q)
        return self.collect(ctx, scores)

    def run(self, ctx: CollectorContext) -> DataFrame:
        self._ctx = ctx
        out = self._transformed(ctx)
        keys = self.order_keys(ctx)
        if keys:
            out = out.orderBy(*keys)
        if self.limit is not None:
            out = out.limit(self.limit)
        self.finish(ctx, out)
        return self.df

    def results(self, limit_hint: int | None = None):
        """Collected rows as a :class:`whoosh_spark.results.Results`
        (``search_with_collector(q, c); c.results()`` — upstream shape).
        Reuses rows a finish hook already materialized (TermsCollector)
        instead of re-executing the search."""
        from whoosh_spark.results import Results

        if self.df is None:
            raise RuntimeError("run search_with_collector() first")
        rows = getattr(self, "_rows", None)
        if rows is None:
            if not {"doc_id", "score"} <= set(self.df.columns):
                raise TypeError(
                    "this collector's frame has no (doc_id, score); "
                    "read .df directly")
            rows = self.df.select("doc_id", "score").collect()
        return Results(self._ctx.searcher, self._ctx.q, rows,
                       limit_hint if limit_hint is not None else self.limit)


class TopCollector(Collector):
    """Top-k by (score DESC, doc_id ASC) — ``collectors.py::TopCollector
    (≈L370)``.  The bounded order-by lowers to TakeOrderedAndProject, the
    distributed equivalent of upstream's min-heap."""

    def __init__(self, limit: int = 10):
        super().__init__()
        self.limit = limit


class UnlimitedCollector(Collector):
    """Every match, reference-ordered — ``UnlimitedCollector (≈L470)``."""


class SortingCollector(Collector):
    """Order by stored field(s) instead of score — ``SortingCollector
    (≈L520)``.  ``sortedby`` is a stored column name or list of them;
    ``reverse`` flips every level (upstream semantics)."""

    def __init__(self, sortedby, reverse: bool = False,
                 limit: int | None = None):
        super().__init__()
        self.sortedby = ([sortedby] if isinstance(sortedby, str)
                         else list(sortedby))
        self.reverse = reverse
        self.limit = limit

    def collect(self, ctx, scores):
        missing = [c for c in self.sortedby if c not in scores.columns]
        if missing:
            scores = scores.join(ctx.docs.select("doc_id", *missing),
                                 "doc_id")
        return scores

    def order_spec(self, ctx):
        return [*((c, self.reverse) for c in self.sortedby),
                ("doc_id", False)]


class WrappingCollector(Collector):
    """Delegating base — ``collectors.py::WrappingCollector (≈L300)``:
    ordering, limit and results come from the wrapped child; subclasses
    transform before/after the child's ``collect``."""

    def __init__(self, child: Collector):
        super().__init__()
        self.child = child

    @property
    def limit(self):  # type: ignore[override]
        return self.child.limit

    @limit.setter
    def limit(self, v):  # Collector.__init__ never sets it; guard anyway
        self.child.limit = v

    def collect(self, ctx, scores):
        return self.child.collect(ctx, scores)

    def order_spec(self, ctx):
        return self.child.order_spec(ctx)

    def order_keys(self, ctx):
        return self.child.order_keys(ctx)

    def finish(self, ctx, out):
        super().finish(ctx, out)
        self.child.finish(ctx, out)


class FilterCollector(WrappingCollector):
    """allow/restrict by query — ``FilterCollector (≈L500)``: ``allow``
    semi-joins the match set, ``restrict`` anti-joins it, both BEFORE the
    child sees the frame (upstream wraps the chain the same way, so facet
    groups and top-k both see the filtered set)."""

    def __init__(self, child: Collector, allow=None, restrict=None):
        super().__init__(child)
        self.allow = allow
        self.restrict = restrict

    def collect(self, ctx, scores):
        ev = ctx.searcher.ev
        if self.allow is not None:
            scores = scores.join(ev.evaluate(self.allow).select("doc_id"),
                                 "doc_id", "left_semi")
        if self.restrict is not None:
            scores = scores.join(ev.evaluate(self.restrict).select("doc_id"),
                                 "doc_id", "left_anti")
        return self.child.collect(ctx, scores)


class CollapseCollector(WrappingCollector):
    """Keep ≤ ``keep`` best results per stored-field key —
    ``CollapseCollector (≈L650)``; ``order`` names a stored column that
    picks survivors instead of score (``collapse_order`` upstream)."""

    def __init__(self, child: Collector, field: str, keep: int = 1,
                 order: str | None = None):
        super().__init__(child)
        self.field = field
        self.keep = keep
        self.order = order

    def collect(self, ctx, scores):
        scores = ctx.searcher._collapse(scores, self.field, self.keep,
                                        self.order)
        return self.child.collect(ctx, scores)


class FacetCollector(WrappingCollector):
    """Group the FULL match set by stored-field facet(s) while the child
    collects top-k — ``FacetCollector (≈L560)``.  After ``run``,
    :attr:`groups` maps facet name → one DataFrame per maptype with the
    SAME schema/semantics as the ``Searcher.facet_*`` front doors
    (``n`` counts, UnorderedList ascending doc_ids, Best = max_by
    (score, -doc_id)) — one extra aggregation per facet, not a
    re-search."""

    def __init__(self, child: Collector, groupedby, maptype: str = "list"):
        super().__init__(child)
        if maptype not in ("list", "count", "best"):
            raise ValueError(f"unknown maptype: {maptype!r}")
        self.groupedby = ([groupedby] if isinstance(groupedby, str)
                          else list(groupedby))
        self.maptype = maptype
        self.groups: dict[str, DataFrame] = {}

    def collect(self, ctx, scores):
        for facet in self.groupedby:
            joined = scores.join(ctx.docs.select("doc_id", facet), "doc_id")
            if self.maptype == "count":
                g = joined.groupBy(facet).agg(
                    F.count("*").cast("long").alias("n"))
            elif self.maptype == "best":
                g = joined.groupBy(facet).agg(
                    F.max_by(F.struct("doc_id", "score"), F.struct(
                        F.col("score"), (-F.col("doc_id")).alias("_nd"))
                    ).alias("_b")
                ).select(facet, F.col("_b.doc_id").alias("doc_id"),
                         F.col("_b.score").alias("score"))
            else:
                # IDENTICAL shape to Searcher.facet_doclists: comma-joined
                # ascending ids + n, so code written against the front door
                # reads collector groups unchanged
                g = joined.groupBy(facet).agg(
                    F.concat_ws(",", F.sort_array(
                        F.collect_list("doc_id"))).alias("doc_ids"),
                    F.count("*").cast("long").alias("n"))
            self.groups[facet] = g
        return self.child.collect(ctx, scores)


class TermsCollector(WrappingCollector):
    """Record which query leaves matched each collected hit —
    ``TermsCollector (≈L860)``.  After ``run``, :meth:`matched_for` maps
    doc_id → {(field, term), ...} for the collected rows."""

    def __init__(self, child: Collector):
        super().__init__(child)
        self._matched: dict[int, set] | None = None

    def finish(self, ctx, out):
        super().finish(ctx, out)
        # collect the final rows ONCE and keep them: results() reuses
        # self._rows instead of re-executing the whole search
        if {"doc_id", "score"} <= set(out.columns):
            self._rows = out.select("doc_id", "score").collect()
            ids = [int(r["doc_id"]) for r in self._rows]
        else:  # custom terminal frame without score: ids only, no reuse
            ids = [int(r["doc_id"])
                   for r in out.select("doc_id").collect()]
        self._matched = ctx.searcher._matched_terms_by_doc(ctx.q, ids)

    def matched_for(self, doc_id: int) -> set:
        if self._matched is None:
            raise RuntimeError("run search_with_collector() first")
        return self._matched.get(int(doc_id), set())


class TimeLimitCollector(WrappingCollector):
    """Abort collection after ``timelimit`` seconds —
    ``TimeLimitCollector (≈L800)``.  ``partial=True`` returns whatever the
    chunked collection had gathered when the deadline hit (upstream
    semantics); ``partial=False`` raises :class:`TimeLimitError`.  Because
    the deadline applies to materialization, ``run`` COLLECTS: read
    :attr:`rows` (rows in the child's order) instead of :attr:`df`.

    The chunked collection slices the chain's PRE-order/limit frame
    (``doc_id % chunks``) so each chunk job scans only its slice — chunking
    the final top-k frame would force every chunk to recompute the global
    top-k first.  Chunk ordering and the driver-side merge both come from
    the child's :meth:`order_spec`, so a SortingCollector child keeps its
    stored-field order in partial mode.  The wrapped chain's ``finish``
    hooks (facet groups, matched terms) fire AFTER the timed collection
    and are not themselves deadline-bounded."""

    def __init__(self, child: Collector, timelimit: float,
                 partial: bool = True):
        super().__init__(child)
        self.timelimit = timelimit
        self.partial = partial
        self.rows: list | None = None

    def run(self, ctx):
        from whoosh_spark.search import (TimeLimitError,
                                         collect_chunked_with_deadline,
                                         run_with_timeout)

        self._ctx = ctx
        pre = self._transformed(ctx)          # chain transform, no order/limit
        keys = self.order_keys(ctx)
        out = pre.orderBy(*keys) if keys else pre
        if self.limit is not None:
            out = out.limit(self.limit)
        self.timed_out = False
        if self.partial:
            spec = self.order_spec(ctx)
            missing = [c for c, _ in spec if c not in pre.columns]
            if "doc_id" not in pre.columns:
                missing.append("doc_id")
            if missing:
                raise TypeError(
                    f"partial=True needs columns {missing} in the "
                    "collector frame for chunked collection; use "
                    "partial=False for custom frames")
            try:
                self.rows = collect_chunked_with_deadline(
                    pre, self.timelimit, self.limit, order_spec=spec)
            except TimeLimitError as e:
                self.rows = getattr(e, "partial", [])
                self.timed_out = True
        else:
            self.rows = run_with_timeout(
                out.sparkSession, self.timelimit, out.collect)
        self.finish(ctx, out)
        return out
