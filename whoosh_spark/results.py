"""Results / Hit — ranked-result API parity with upstream Whoosh.

Reimplements the user-facing surface of ``src/whoosh/searching.py::Results
(≈L900)`` and ``::Hit (≈L1300)`` over the Spark engine: a ``Results`` holds
the collected top-k ``(doc_id, score)`` rows (k is small — same footprint as
upstream's heap output), and ``Hit.__getitem__`` loads stored fields lazily.

Spark-first adaptation of the laziness: upstream fetches stored fields one
doc at a time from the per-doc storage; here the FIRST stored-field access
fetches the stored rows for ALL k hits in ONE job (a broadcast-friendly
``doc_id IN (...)`` lookup against the docs table) and caches them, so a
page render costs one Spark job instead of k.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class Hit:
    """One ranked result (``searching.py::Hit ≈L1300``): mapping-style
    access to stored fields, plus score/docnum/rank and highlights."""

    def __init__(self, results: "Results", rank: int):
        self.results = results
        self.rank = rank

    @property
    def doc_id(self) -> int:
        return self.results.docnum(self.rank)

    docnum = doc_id

    @property
    def score(self) -> float:
        return self.results.score(self.rank)

    # -- stored fields --------------------------------------------------
    def fields(self) -> dict:
        """All stored fields of this hit (lazy batch fetch, cached)."""
        return self.results._stored_fields(self.doc_id)

    def __getitem__(self, fieldname: str):
        flds = self.fields()
        if fieldname not in flds:
            raise KeyError(fieldname)
        return flds[fieldname]

    def get(self, fieldname: str, default=None):
        return self.fields().get(fieldname, default)

    def __contains__(self, fieldname: str) -> bool:
        return fieldname in self.fields()

    def keys(self):
        return self.fields().keys()

    def items(self):
        return self.fields().items()

    def matched_terms(self) -> set:
        """(field, term) query leaves that occur in THIS hit
        (``searching.py::Hit.matched_terms ≈L1340``).  Requires the search
        to have run with ``terms=True``."""
        return self.results._matched_for(self.doc_id)

    def more_like_this(self, limit: int = 10, numterms: int = 5):
        """Docs similar to this hit (``Hit.more_like_this ≈L1360``):
        tf·idf key-term expansion, excluding the hit itself — returns the
        engine's (doc_id, score) DataFrame."""
        return self.results.searcher.more_like(
            [self.doc_id], limit=limit, numterms=numterms)

    def highlights(self, fieldname: str = "text", top: int = 3,
                   **fmt_kw) -> str:
        """Highlighted context fragments of a stored text field for THIS
        hit (``Hit.highlights ≈L1370``) — driver-side re-analysis of the
        one stored string, no extra Spark job beyond the stored fetch."""
        from whoosh_spark.highlight import highlight as _hl

        text = self.get(fieldname) or ""
        return _hl(text, self.results._terms(), top=top, **fmt_kw)

    def __repr__(self) -> str:
        return f"<Hit doc_id={self.doc_id} score={self.score:.6f}>"

    def __eq__(self, other) -> bool:
        if isinstance(other, Hit):
            return self.doc_id == other.doc_id
        if isinstance(other, dict):
            return self.fields() == other
        return NotImplemented


class Results:
    """Ranked search results (``searching.py::Results ≈L900``)."""

    def __init__(self, searcher, q, rows, limit: int | None,
                 exact_when_short: bool = True):
        self.searcher = searcher
        self.q = q
        self._rows = [(int(r["doc_id"]), float(r["score"])) for r in rows]
        self.limit = limit
        # a page shorter than limit counts every match ONLY if no offset
        # trimmed it (filter/mask apply before top-k, so they preserve
        # exactness; search_hits sets this)
        self._exact_when_short = exact_when_short
        self._est: int | None = None
        self._stored: dict[int, dict] | None = None
        self._terms_cache: set[str] | None = None
        # terms=True probe results: {doc_id: {(field, term)}} — set by
        # Searcher.search_hits(terms=True); None = search ran without it
        self._matched: dict[int, set] | None = None
        # groupedby facets (searching.py::Results.groups ≈L1010) — set by
        # Searcher.search_hits(groupedby=...); computed lazily per facet
        self._groupedby: list[str] = []
        self._maptype: str = "list"
        self._groups_cache: dict[str, dict] = {}
        # the query whose doc set the facets group — q plus any filter/mask
        # the search ran with (search_hits overrides when they were given)
        self._group_q = q

    # -- sequence protocol ----------------------------------------------
    def __len__(self) -> int:
        return self.scored_length()

    def __getitem__(self, n):
        if isinstance(n, slice):
            return [Hit(self, i) for i in range(*n.indices(len(self._rows)))]
        if n < 0:
            n += len(self._rows)
        if not 0 <= n < len(self._rows):
            raise IndexError(n)
        return Hit(self, n)

    def __iter__(self):
        return (Hit(self, i) for i in range(len(self._rows)))

    def __bool__(self) -> bool:
        return bool(self._rows)

    def is_empty(self) -> bool:
        return not self._rows

    def __repr__(self) -> str:
        # never launch Spark work from repr — show the estimate only if a
        # caller already computed it
        est = f" estimated_length={self._est}" if self._est is not None else ""
        return f"<Results top={len(self._rows)} limit={self.limit}{est}>"

    # -- upstream accessors ----------------------------------------------
    def score(self, n: int) -> float:
        return self._rows[n][1]

    def docnum(self, n: int) -> int:
        return self._rows[n][0]

    def docs(self) -> set[int]:
        return {d for d, _ in self._rows}

    def fields(self, n: int) -> dict:
        return self._stored_fields(self.docnum(n))

    def scored_length(self) -> int:
        return len(self._rows)

    def estimated_length(self) -> int:
        """Upper bound on total matching docs (``Results.estimated_length
        ≈L960``) — the query's estimate_size from broadcast term stats; the
        scored length when every match was provably collected (limit=None
        or a short page with no offset; filter/mask trim before top-k so
        they keep short pages exact).  Memoized — the stats lookup runs
        once per Results."""
        if self._est is None:
            if self._exact_when_short and (
                    self.limit is None or len(self._rows) < self.limit):
                self._est = len(self._rows)
            else:
                self._est = max(len(self._rows),
                                self.searcher.ev.estimate(self.q))
        return self._est

    def groups(self, name: str | None = None) -> dict:
        """Facet groups of a ``groupedby=`` search (``searching.py::
        Results.groups ≈L1010``): the grouping covers ALL matching docs
        (upstream semantics), not just the collected top-k.  Lazy — the
        facet job runs once per name on first access.  maptype ``list`` →
        {key: [doc_id ascending]}, ``count`` → {key: n}, ``best`` →
        {key: best-scoring doc_id}."""
        if not self._groupedby:
            raise KeyError("search was not run with groupedby=")
        if name is None:
            if len(self._groupedby) != 1:
                raise KeyError(
                    f"several facets were registered {self._groupedby}; "
                    "pass a name")
            name = self._groupedby[0]
        if name not in self._groupedby:
            raise KeyError(name)
        if name not in self._groups_cache:
            s = self.searcher
            if self._maptype == "count":
                rows = s.facet_counts(self._group_q, name).collect()
                got = {r[name]: int(r["n"]) for r in rows}
            elif self._maptype == "best":
                rows = s.facet_best(self._group_q, name).collect()
                got = {r[name]: int(r["doc_id"]) for r in rows}
            else:
                rows = s.facet_doclists(self._group_q, name).collect()
                got = {r[name]: ([int(x) for x in r["doc_ids"].split(",")]
                                 if r["doc_ids"] else [])
                       for r in rows}
            self._groups_cache[name] = got
        return self._groups_cache[name]

    # -- combination ops (searching.py::Results.extend/filter/upgrade
    # ≈L1100-1160) — driver-side over the collected top-k rows, exactly
    # like upstream's list surgery over Results.top_n; no Spark jobs -----
    def extend(self, results: "Results") -> None:
        """Append hits from ``results`` not already present, at the end."""
        have = self.docs()
        self._rows.extend(
            (d, s) for d, s in results._rows if d not in have)
        self._mutated()

    def filter(self, results: "Results") -> None:
        """Keep only hits that also appear in ``results``."""
        keep = results.docs()
        self._rows = [(d, s) for d, s in self._rows if d in keep]
        self._mutated()

    def upgrade(self, results: "Results") -> None:
        """Raise hits that also appear in ``results`` above the rest,
        preserving relative order within each group (stable partition)."""
        up = results.docs()
        self._rows = ([r for r in self._rows if r[0] in up]
                      + [r for r in self._rows if r[0] not in up])
        self._mutated()

    def upgrade_and_extend(self, results: "Results") -> None:
        """``upgrade`` then ``extend`` — upstream's combined operation."""
        self.upgrade(results)
        self.extend(results)

    def _mutated(self) -> None:
        # the row set changed: the stored-field batch cache may be stale /
        # incomplete and the length-based estimate no longer reflects the
        # original query alone
        self._stored = None
        self._est = None
        self._exact_when_short = False
        if self._matched is not None:
            # extend() can introduce docs the terms=True probe never saw;
            # keep only entries for rows still present (probe-covered docs
            # keep their sets, foreign rows read as "no matched info")
            live = {r[0] for r in self._rows}
            self._matched = {d: s for d, s in self._matched.items()
                             if d in live}

    def has_matched_terms(self) -> bool:
        """True if the search ran with ``terms=True`` (``Results.
        has_matched_terms ≈L1040``)."""
        return self._matched is not None

    def matched_terms(self) -> set:
        """Union of every hit's matched (field, term) leaves
        (``Results.matched_terms ≈L1045``)."""
        if self._matched is None:
            raise RuntimeError("search was not run with terms=True")
        out: set = set()
        for s in self._matched.values():
            out |= s
        return out

    def _matched_for(self, doc_id: int) -> set:
        if self._matched is None:
            raise RuntimeError("search was not run with terms=True")
        return self._matched.get(int(doc_id), set())

    def key_terms(self, numterms: int = 5) -> list[str]:
        """Most distinctive terms of the result docs (``Results.key_terms
        ≈L1050``) — tf·idf expansion over the hit set."""
        kt = self.searcher.key_terms(sorted(self.docs()), top=numterms)
        return [r["term"] for r in kt.collect()]

    # -- internals --------------------------------------------------------
    def _stored_fields(self, doc_id: int) -> dict:
        if self._stored is None:
            if self._rows:
                ids = [d for d, _ in self._rows]
                docs = self.searcher.ix.docs
                got = docs.where(F.col("doc_id").isin(ids)).collect()
                self._stored = {int(r["doc_id"]): r.asDict() for r in got}
            else:
                self._stored = {}
        return self._stored.get(doc_id, {})

    def _terms(self) -> set[str]:
        if self._terms_cache is None:
            qn = self.q.normalize()
            self._terms_cache = set(qn.terms()) | set(qn.phrase_terms())
        return self._terms_cache


class ResultsPage:
    """One page of results (``searching.py::ResultsPage ≈L1500``): a view
    over the TOP pagenum·pagelen hits, sliced driver-side — same shape as
    upstream (one search collects the whole prefix; the page is a slice)."""

    def __init__(self, results: Results, pagenum: int, pagelen: int):
        if pagenum < 1:
            raise ValueError("pagenum must be >= 1")
        if pagelen < 1:
            raise ValueError("pagelen must be >= 1")
        self.results = results
        self.pagenum = pagenum
        self.pagelen = pagelen
        self.offset = (pagenum - 1) * pagelen

    @property
    def total(self) -> int:
        # lazy: exact when the fetched prefix ran short of its limit
        # (search_page fetches one row beyond the page to arrange that),
        # else the query's upper-bound estimate — computed only on demand
        return self.results.estimated_length()

    @property
    def pagecount(self) -> int:
        # upstream: ceil(total / pagelen) over the (possibly estimated) total
        return max(1, -(-self.total // self.pagelen))

    def __len__(self) -> int:
        hi = min(len(self.results), self.offset + self.pagelen)
        return max(0, hi - self.offset)

    def __getitem__(self, n):
        if isinstance(n, slice):
            lo, hi, step = n.indices(len(self))
            return [self.results[self.offset + i] for i in range(lo, hi, step)]
        if n < 0:
            n += len(self)
        if not 0 <= n < len(self):
            raise IndexError(n)
        return self.results[self.offset + n]

    def __iter__(self):
        return (self.results[i]
                for i in range(self.offset, self.offset + len(self)))

    def is_last_page(self) -> bool:
        # the fetched prefix ran short of its own limit → every match was
        # collected, so the answer is exact; otherwise fall back to the
        # (upper-bound) total estimate
        fetched_all = (self.results.limit is None
                       or len(self.results._rows) < self.results.limit)
        if fetched_all:
            return len(self.results._rows) <= self.offset + self.pagelen
        if len(self.results._rows) > self.offset + self.pagelen:
            # the full prefix already extends past this page — a later row
            # provably exists, no estimate (and no Spark work) needed
            return False
        return self.total <= self.offset + self.pagelen

    def __repr__(self) -> str:
        # never launch Spark work from repr: show the page count only if
        # the underlying estimate is already memoized
        pc = self.pagecount if self.results._est is not None else "?"
        return (f"<ResultsPage {self.pagenum}/{pc} "
                f"pagelen={self.pagelen}>")
