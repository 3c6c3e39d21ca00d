"""Pure-Python mini-index + BM25 oracle (SURVEY.md §5 item 2).

A few hundred lines implementing the SAME semantics as the Spark engine —
analysis chain, quantized lengths, BM25 (idf = ln(N/(df+1))+1), boolean
algebra, stop-gap phrase positions, tie-break (score DESC, doc_id ASC) —
entirely with dicts and floats, independent of Spark.  Tests assert
rank-identity (doc ids AND float64 scores) between the two.

The reference checkout at /root/reference was empty (see SURVEY provenance
caveat), so this oracle — derived from the published Whoosh 2.7.x formulas —
is the executable ground truth; if a real Whoosh checkout ever appears,
swap it in here.
"""

from __future__ import annotations

import math
from collections import defaultdict

from whoosh_spark.analysis.analyzers import analyze_text
from whoosh_spark.config import BM25_B, BM25_K1, quantize_length
from whoosh_spark.query import ast as Q

# same literals as execution/score.py (kept local: the oracle must not
# import pyspark)
_LN2 = 0.6931471805599453
_LOG2_E = 1.4426950408889634


class PyIndex:
    def __init__(self, docs: list[tuple[int, str]],
                 stored: dict[int, dict] | None = None,
                 b: float = BM25_B):
        """docs: [(doc_id, text)]; stored: optional doc_id -> stored fields;
        b: BM25 length-normalization (per-field override under BM25F)."""
        self.b = b
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.len_raw: dict[int, int] = {}
        self.dl: dict[int, int] = {}
        self.stored = stored or {}
        for doc_id, text in docs:
            toks, poss = analyze_text(text or "")
            self.len_raw[doc_id] = len(toks)
            self.dl[doc_id] = quantize_length(len(toks))
            for t, p in zip(toks, poss):
                self.postings[t].setdefault(doc_id, []).append(p)
        self.n = len(self.len_raw)
        total = sum(self.len_raw.values())
        self.avgdl = total / self.n if self.n else 0.0
        self.fl = float(total)  # total raw field length (DFR models)
        self.weighting = "bm25"  # active model (swapped by Q.Weighted)

    # ------------------------------------------------------------------
    # per-term constants, memoized: score() runs once per (term, doc) and
    # cf() is O(df) to compute — without the cache a hot term under
    # dfree/pl2 fuzzing is quadratic in df per query
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> float:
        cache = self.__dict__.setdefault("_cf_cache", {})
        if term not in cache:
            cache[term] = float(sum(
                len(ps) for ps in self.postings.get(term, {}).values()))
        return cache[term]

    def idf(self, term: str) -> float:
        cache = self.__dict__.setdefault("_idf_cache", {})
        if term not in cache:
            cache[term] = math.log(self.n / (self.df(term) + 1)) + 1.0
        return cache[term]

    def bm25(self, term: str, doc_id: int) -> float:
        tf = float(len(self.postings[term][doc_id]))
        dl = float(self.dl[doc_id])
        comp = (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * ((1.0 - self.b) + self.b * dl / self.avgdl)
        )
        return self.idf(term) * comp

    def score(self, term: str, doc_id: int) -> float:
        """Per-(term, doc) score under the ACTIVE weighting model — mirrors
        execution/score.py::score_postings literal-for-literal (same op
        order, same LN2/LOG2_E constants) so Spark and oracle agree."""
        w = self.weighting
        rev = w.startswith("reverse:")
        if rev:
            w = w[len("reverse:"):]
        if w == "bm25":
            s = self.bm25(term, doc_id)
        else:
            tf = float(len(self.postings[term][doc_id]))
            dl = float(self.dl[doc_id])
            log2 = lambda x: math.log(x) / _LN2  # noqa: E731
            if w == "tfidf":
                s = tf * self.idf(term)
            elif w == "frequency":
                s = tf
            elif w == "dfree":
                cf = self.cf(term)
                prior = tf / dl
                post = (tf + 1.0) / (dl + 1.0)
                invprior = self.fl / cf
                norm = tf * log2(post / prior)
                s = norm * (tf * log2(prior * invprior)
                            + (tf + 1.0) * log2(post * invprior)
                            + 0.5 * log2(post / prior))
            elif w == "pl2":
                cf = self.cf(term)
                TF = tf * log2(1.0 + (1.0 * self.avgdl) / dl)
                norm = 1.0 / (TF + 1.0)
                f = cf / float(self.n)
                s = norm * (TF * log2(1.0 / f) + f * _LOG2_E
                            + 0.5 * log2(2.0 * math.pi * TF)
                            + TF * (log2(TF) - _LOG2_E))
            else:
                raise ValueError(f"unknown weighting {w!r}")
        return 0.0 - s if rev else s

    # ------------------------------------------------------------------
    def eval(self, q: Q.Query) -> dict[int, float]:
        q = q.normalize()
        return self._eval(q)

    def _eval(self, q: Q.Query) -> dict[int, float]:
        if q is Q.NullQuery:
            return {}
        m = getattr(self, f"_eval_{type(q).__name__.lower()}")
        return m(q)

    def _eval_term(self, q: Q.Term) -> dict[int, float]:
        if q.text not in self.postings:
            return {}
        return {d: self.score(q.text, d) * q.boost for d in self.postings[q.text]}

    def _eval_and(self, q: Q.And) -> dict[int, float]:
        sets = [self._eval(c) for c in q.children]
        common = set(sets[0])
        for s in sets[1:]:
            common &= set(s)
        return {d: sum(s[d] for s in sets) * q.boost for d in common}

    def _eval_or(self, q: Q.Or) -> dict[int, float]:
        acc: dict[int, float] = defaultdict(float)
        cnt: dict[int, int] = defaultdict(int)
        for c in q.children:
            for d, s in self._eval(c).items():
                acc[d] += s
                cnt[d] += 1
        mm = max(1, q.minmatch)
        return {d: s * q.boost for d, s in acc.items() if cnt[d] >= mm}

    def _eval_dismax(self, q: Q.DisMax) -> dict[int, float]:
        per: dict[int, list[float]] = defaultdict(list)
        for c in q.children:
            for d, s in self._eval(c).items():
                per[d].append(s)
        return {
            d: (max(v) + q.tiebreak * (sum(v) - max(v))) * q.boost for d, v in per.items()
        }

    def _eval_not(self, q: Q.Not) -> dict[int, float]:
        inner = set(self._eval(q.child))
        return {d: 1.0 * q.boost for d in self.len_raw if d not in inner}

    def _eval_andnot(self, q: Q.AndNot) -> dict[int, float]:
        a = self._eval(q.a)
        b = set(self._eval(q.b))
        return {d: s * q.boost for d, s in a.items() if d not in b}

    def _eval_andmaybe(self, q: Q.AndMaybe) -> dict[int, float]:
        a = self._eval(q.a)
        b = self._eval(q.b)
        return {d: (s + b.get(d, 0.0)) * q.boost for d, s in a.items()}

    def _eval_require(self, q: Q.Require) -> dict[int, float]:
        a = self._eval(q.a)
        b = set(self._eval(q.b))
        return {d: s * q.boost for d, s in a.items() if d in b}

    def _eval_every(self, q: Q.Every) -> dict[int, float]:
        return {d: 1.0 * q.boost for d in self.len_raw}

    def _eval_otherwise(self, q: Q.Otherwise) -> dict[int, float]:
        a = self._eval(q.a)
        out = a if a else self._eval(q.b)
        return {d: s * q.boost for d, s in out.items()} if q.boost != 1.0 else out

    def _eval_constant(self, q: Q.Constant) -> dict[int, float]:
        return {d: float(q.score) * q.boost for d in self._eval(q.child)}

    def _weighting_targets(self) -> list["PyIndex"]:
        return [self]

    def _eval_weighted(self, q: "Q.Weighted") -> dict[int, float]:
        """WeightingQuery: swap the model for the subtree (mirrors
        Evaluator._eval_weighted's scoped swap)."""
        targets = self._weighting_targets()
        saved = [(t, t.weighting) for t in targets]
        for t in targets:
            t.weighting = q.weighting if q.weighting is not None \
                else t.weighting
        try:
            out = self._eval(q.child)
        finally:
            for t, w in saved:
                t.weighting = w
        if q.boost != 1.0:
            out = {d: s * q.boost for d, s in out.items()}
        return out

    def _eval_phrase(self, q: Q.Phrase) -> dict[int, float]:
        words = list(q.words)
        if any(w not in self.postings for w in set(words)):
            return {}
        docs = set(self.postings[words[0]])
        for w in words[1:]:
            docs &= set(self.postings[w])
        out: dict[int, float] = {}
        for d in docs:
            cur = set(self.postings[words[0]][d])
            for w in words[1:]:
                nxt = set(self.postings[w][d])
                cur = {p for c in cur for p in range(c + 1, c + q.slop + 1) if p in nxt}
                if not cur:
                    break
            if cur:
                out[d] = sum(self.score(w, d) for w in sorted(set(words))) * q.boost
        return out

    def _eval_sequence(self, q: Q.Sequence) -> dict[int, float]:
        """Ordered proximity of term-set slots (evaluate.py:_eval_sequence):
        slot i+1 matches at a position in (p_i, p_i + slop].  Score = Σ over
        slots of slot-child boost × Σ present slot terms' BM25 (a term in
        two slots scores once per slot); an Or slot with minmatch > 1 also
        gates the doc set on the child's own semantics — mirrors the Spark
        evaluator exactly."""
        slots = []
        wmap: dict[str, float] = {}
        gates: list[Q.Query] = []
        for c in q.children:
            ts = self._slot_terms(c)
            if ts is None:
                raise ValueError(f"Sequence slot not positional: {c!r}")
            present = [t for t in ts if t in self.postings]
            if not present:
                return {}
            slots.append(present)
            cb = float(getattr(c, "boost", 1.0))
            for t in present:
                wmap[t] = wmap.get(t, 0.0) + cb
            if isinstance(c, Q.Or) and getattr(c, "minmatch", 1) > 1:
                gates.append(c)
        gate_docs = [set(self._eval(g)) for g in gates]
        docs: set | None = None
        for s in slots:
            ds = set().union(*(set(self.postings[t]) for t in s))
            docs = ds if docs is None else docs & ds
        out: dict[int, float] = {}
        for d in docs or ():
            cur = {p for t in slots[0] if d in self.postings[t]
                   for p in self.postings[t][d]}
            for s in slots[1:]:
                nxt = {p for t in s if d in self.postings[t]
                       for p in self.postings[t][d]}
                cur = {p for c0 in cur
                       for p in range(c0 + 1, c0 + q.slop + 1) if p in nxt}
                if not cur:
                    break
            if cur and all(d in g for g in gate_docs):
                out[d] = sum(self.score(t, d) * w for t, w in wmap.items()
                             if d in self.postings.get(t, {})) * q.boost
        return out

    def _slot_terms(self, c: Q.Query) -> list[str] | None:
        """Term texts a Sequence slot can match, expanding multiterm leaves
        against the lexicon (the evaluator expands before slotting)."""
        if isinstance(c, Q.Term):
            return [c.text]
        if isinstance(c, Q.Or) and all(isinstance(k, Q.Term) for k in c.children):
            return [k.text for k in c.children]
        if isinstance(c, (Q.Prefix, Q.Wildcard, Q.Fuzzy, Q.Regex, Q.TermRange)):
            return self._expand_terms(c)
        return None

    def _eval_expansion(self, q) -> dict[int, float]:
        """Prefix/Wildcard/Fuzzy/Regex/TermRange → Or of matching lexicon
        terms (one expansion rule shared with the span path: _expand_terms)."""
        terms = self._expand_terms(q)
        return self._eval(Q.Or([Q.Term(t) for t in terms],
                               boost=q.boost)) if terms else {}

    _eval_prefix = _eval_expansion
    _eval_wildcard = _eval_expansion
    _eval_fuzzy = _eval_expansion
    _eval_regex = _eval_expansion
    _eval_termrange = _eval_expansion

    # ------------------------------------------------------------------
    # span queries (positional algebra — mirrors evaluate.py:_spans_df):
    # spans are (s, e) position pairs; only non-emptiness gates scoring,
    # which is the plain sum of the a-side terms' BM25 over matched docs.
    def _span_tree(self, q):
        """(doc -> [(s, e)], scoring terms) or None when a required leaf
        term is absent (empty result; SpanNot degenerates to its a side)."""
        if isinstance(q, Q.Term):
            if q.text not in self.postings:
                return None
            return ({d: [(p, p) for p in ps]
                     for d, ps in self.postings[q.text].items()}, [q.text])
        if isinstance(q, Q.Or) and all(isinstance(c, Q.Term) for c in q.children):
            present = [c.text for c in q.children if c.text in self.postings]
            if not present:
                return None
            spans: dict[int, list] = defaultdict(list)
            for t in present:
                for d, ps in self.postings[t].items():
                    spans[d].extend((p, p) for p in ps)
            return {d: sorted(sp) for d, sp in spans.items()}, sorted(present)
        if isinstance(q, (Q.Prefix, Q.Wildcard, Q.Fuzzy, Q.Regex, Q.TermRange)):
            # expand against the lexicon exactly like the evaluator's
            # _expand, then recurse as an Or of Terms
            terms = self._expand_terms(q)
            if not terms:
                return None
            return self._span_tree(Q.Or([Q.Term(t) for t in terms]))
        if isinstance(q, (Q.Phrase, Q.Sequence)):
            if getattr(q, "slop", 1) > 1:
                raise ValueError("span sub-queries require slop=1 phrases")
            if isinstance(q, Q.Sequence) and not all(
                    isinstance(c, Q.Term) for c in q.children):
                raise ValueError("span Sequence slots must be single terms")
            words = list(q.words) if isinstance(q, Q.Phrase) else [
                c.text for c in q.children]
            if any(w not in self.postings for w in set(words)):
                return None
            docs = set(self.postings[words[0]])
            for w in words[1:]:
                docs &= set(self.postings[w])
            k = len(words)
            out: dict[int, list] = {}
            for d in docs:
                cur = set(self.postings[words[0]][d])
                for w in words[1:]:
                    cur = {p + 1 for p in cur} & set(self.postings[w][d])
                if cur:
                    out[d] = sorted((e - (k - 1), e) for e in cur)
            return (out, sorted(set(words))) if out else ({}, sorted(set(words)))
        if isinstance(q, Q.SpanFirst):
            sub = self._span_tree(q.child)
            if sub is None:
                return None
            sp, terms = sub
            kept = {d: [x for x in v if x[1] <= q.limit] for d, v in sp.items()}
            return {d: v for d, v in kept.items() if v}, terms
        if isinstance(q, Q.SpanOr):
            subs = [self._span_tree(c) for c in q.children]
            subs = [s for s in subs if s is not None]
            if not subs:
                return None
            terms = sorted({t for _, ts in subs for t in ts})
            spans: dict[int, list] = defaultdict(list)
            for sp, _ in subs:
                for d, v in sp.items():
                    spans[d].extend(v)
            return {d: sorted(v) for d, v in spans.items()}, terms
        if isinstance(q, (Q.SpanNear, Q.SpanNot, Q.SpanContains, Q.SpanBefore,
                          Q.SpanCondition)):
            sa = self._span_tree(q.a)
            sb = self._span_tree(q.b)
            if sa is None:
                return None
            if sb is None:
                return sa if isinstance(q, Q.SpanNot) else None
            (da, ta), (db, tb) = sa, sb
            out = {}
            if isinstance(q, Q.SpanCondition):
                # doc-level gate: a's spans survive intact where b matches
                return {d: da[d] for d in set(da) & set(db)}, ta
            if isinstance(q, Q.SpanNear):
                for d in set(da) & set(db):
                    comb = []
                    for a in da[d]:
                        for b in db[d]:
                            after = b[0] > a[1] and (b[0] - a[1]) <= q.slop
                            before = a[0] > b[1] and (a[0] - b[1]) <= q.slop
                            if after or (not q.ordered and before):
                                comb.append((min(a[0], b[0]), max(a[1], b[1])))
                    if comb:
                        out[d] = comb
                return out, sorted(set(ta + tb))
            if isinstance(q, Q.SpanNot):
                for d, va in da.items():
                    vb = db.get(d)
                    kept = va if vb is None else [
                        a for a in va
                        if not any(a[0] <= b[1] and b[0] <= a[1] for b in vb)]
                    if kept:
                        out[d] = kept
                return out, ta
            if isinstance(q, Q.SpanContains):
                for d in set(da) & set(db):
                    kept = [a for a in da[d]
                            if any(a[0] <= b[0] and b[1] <= a[1] for b in db[d])]
                    if kept:
                        out[d] = kept
                return out, ta
            for d in set(da) & set(db):  # SpanBefore
                kept = [a for a in da[d] if any(a[1] < b[0] for b in db[d])]
                if kept:
                    out[d] = kept
            return out, ta
        raise ValueError(f"not span-capable: {q!r}")

    def _expand_terms(self, q) -> list[str]:
        if isinstance(q, Q.Prefix):
            return sorted(t for t in self.postings if t.startswith(q.text))
        if isinstance(q, Q.Wildcard):
            import fnmatch

            return sorted(t for t in self.postings
                          if fnmatch.fnmatchcase(t, q.pattern))
        if isinstance(q, Q.Fuzzy):
            return sorted(t for t in self.postings
                          if t.startswith(q.text[: q.prefixlength])
                          and _lev(t, q.text) <= q.maxdist)
        if isinstance(q, Q.Regex):
            import re

            # Spark's rlike is an UNANCHORED search (Java regex); mirror
            # with re.search (test patterns stay in the RE2-safe subset)
            rx = re.compile(q.pattern)
            return sorted(t for t in self.postings if rx.search(t))
        if isinstance(q, Q.TermRange):
            def ok(t):
                if q.lo is not None and (t < q.lo or (t == q.lo and not q.incl_lo)):
                    return False
                if q.hi is not None and (t > q.hi or (t == q.hi and not q.incl_hi)):
                    return False
                return True

            return sorted(t for t in self.postings if ok(t))
        raise ValueError(f"not expandable: {q!r}")

    def _eval_span(self, q) -> dict[int, float]:
        sub = self._span_tree(q)
        if sub is None:
            return {}
        spans, terms = sub
        return {
            d: sum(self.score(t, d) for t in terms
                   if d in self.postings.get(t, {})) * q.boost
            for d, v in spans.items() if v
        }

    _eval_spanfirst = _eval_span
    _eval_spannear = _eval_span
    _eval_spannot = _eval_span
    _eval_spancontains = _eval_span
    _eval_spanbefore = _eval_span
    _eval_spanor = _eval_span
    _eval_spancondition = _eval_span

    def _eval_filter(self, q: Q.Filter) -> dict[int, float]:
        raise NotImplementedError("PyIndex.eval(Filter) — use stored-field predicates in tests")

    def _eval_numericrange(self, q: Q.NumericRange) -> dict[int, float]:
        out = {}
        for d, fields in self.stored.items():
            v = fields.get(q.column)
            if v is None:
                continue
            if q.lo is not None and (v < q.lo or (v == q.lo and not q.incl_lo)):
                continue
            if q.hi is not None and (v > q.hi or (v == q.hi and not q.incl_hi)):
                continue
            out[d] = 1.0 * q.boost
        return out

    # ------------------------------------------------------------------
    def search(self, q: Q.Query, limit: int = 10) -> list[tuple[int, float]]:
        scores = self.eval(q)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:limit] if limit is not None else ranked


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class PyMultiIndex(PyIndex):
    """Fielded oracle: one ``PyIndex`` per schema field, BM25F composition.

    Mirrors ``MultiFieldIndex`` + the evaluator's fielded routing
    (``scoring.py::BM25F ≈L140`` semantics): each leaf scores against ITS
    field's statistics (df/avgdl/lengths) times that field's boost, and the
    compound algebra (inherited unchanged from ``PyIndex``) mixes fields.
    Per-field ``B`` overrides: build each sub-``PyIndex`` with its field's
    ``b``; per-field boosts go in the ``boosts`` dict.
    """

    def __init__(self, fields: dict[str, "PyIndex"], default_field: str,
                 boosts: dict[str, float] | None = None):
        if default_field not in fields:
            raise ValueError(f"default_field {default_field!r} not in fields")
        self.fields = fields
        self.default_field = default_field
        self.boosts = boosts or {}
        base = fields[default_field]
        # doc universe for Not/Every/NumericRange — the engine routes these
        # through the primary (default-field) index
        self.len_raw = base.len_raw
        self.dl = base.dl
        self.stored = base.stored
        self.n = base.n
        self.avgdl = base.avgdl
        self.b = base.b
        self.fl = base.fl
        self.weighting = "bm25"
        self.postings = base.postings  # default-field compat for callers

    def _fx(self, fieldname: str | None) -> "PyIndex":
        return self.fields[fieldname or self.default_field]

    def _weighting_targets(self) -> list["PyIndex"]:
        # a Weighted subtree applies to every field its leaves route to
        return [self, *self.fields.values()]

    def _route(self, q: Q.Query) -> dict[int, float]:
        from dataclasses import replace

        sub = self._fx(q.fieldname)
        res = sub._eval(replace(q, fieldname=None))
        fb = self.boosts.get(q.fieldname or self.default_field, 1.0)
        return {d: s * fb for d, s in res.items()} if fb != 1.0 else res

    _eval_term = _route
    _eval_phrase = _route
    _eval_prefix = _route
    _eval_wildcard = _route
    _eval_fuzzy = _route
    _eval_regex = _route
    _eval_termrange = _route


def _strip_fields(q: Q.Query) -> Q.Query:
    """Recursively clear leaf fieldnames (single-field sub-index form)."""
    from dataclasses import replace

    if isinstance(q, (Q.SpanNear, Q.SpanNot, Q.SpanContains, Q.SpanBefore,
                      Q.SpanCondition)):
        return replace(q, a=_strip_fields(q.a), b=_strip_fields(q.b))
    if isinstance(q, Q.SpanFirst):
        return replace(q, child=_strip_fields(q.child))
    if isinstance(q, (Q.And, Q.Or, Q.DisMax, Q.Sequence, Q.SpanOr)):
        return type(q)(tuple(_strip_fields(c) for c in q.children),
                       **{k: getattr(q, k)
                          for k in ("boost", "minmatch", "tiebreak", "slop")
                          if hasattr(q, k)})
    if hasattr(q, "fieldname") and q.fieldname is not None:
        return replace(q, fieldname=None)
    return q


def _leaf_fields(q: Q.Query) -> set:
    """All leaf ``fieldname`` values in a span tree — including expansion
    leaves (Prefix/Wildcard/Fuzzy/Regex/TermRange), whose ``field_terms()``
    is empty because their terms aren't known until lexicon expansion."""
    if isinstance(q, (Q.SpanNear, Q.SpanNot, Q.SpanContains, Q.SpanBefore,
                      Q.SpanCondition)):
        return _leaf_fields(q.a) | _leaf_fields(q.b)
    if isinstance(q, Q.SpanFirst):
        return _leaf_fields(q.child)
    if hasattr(q, "children"):
        out = set()
        for c in q.children:
            out |= _leaf_fields(c)
        return out
    if hasattr(q, "fieldname"):
        return {q.fieldname}
    return set()


def _multi_span(self, q) -> dict[int, float]:
    """Route a (single-field) span tree to its field's sub-index and apply
    the field boost — the evaluator's _span_fk + per-field scoring.  The
    default field's own name canonicalizes to None (evaluator _fkey
    behavior), so None/default mixes are still single-field."""
    fields = {None if f in (None, self.default_field) else f
              for f in _leaf_fields(q)}
    if len(fields) > 1:
        raise ValueError("span query must target a single field")
    fn = next(iter(fields)) if fields else None
    sub = self._fx(fn)
    res = sub._eval(_strip_fields(q))
    fb = self.boosts.get(fn or self.default_field, 1.0)
    return {d: s * fb for d, s in res.items()} if fb != 1.0 else res


PyMultiIndex._eval_spanfirst = _multi_span
PyMultiIndex._eval_spannear = _multi_span
PyMultiIndex._eval_spannot = _multi_span
PyMultiIndex._eval_spancontains = _multi_span
PyMultiIndex._eval_spanbefore = _multi_span
PyMultiIndex._eval_spanor = _multi_span
PyMultiIndex._eval_spancondition = _multi_span
# Sequence slots are field-local too (evaluate.py derives ONE fk from the
# slots' field_terms and raises on a mix) — same routing as span trees
PyMultiIndex._eval_sequence = _multi_span
