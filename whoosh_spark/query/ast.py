"""Query AST mirroring Whoosh's query algebra (SURVEY.md §2.4).

Each class documents its Whoosh counterpart
(``src/whoosh/query/*.py``, ≈ line anchors per SURVEY provenance caveat) and
its Spark dataflow mapping.  ``normalize()`` reproduces
``qcore.py::Query.normalize (≈L300)`` / ``compound.py::CompoundQuery.normalize
(≈L120)``: flatten same-class nesting, dedupe children, drop NullQuery,
unwrap single children, Every absorption.

Scoring conventions (single ``text`` field engine):
* Term score  = BM25 (config.K1/B, quantized dl) × ``boost``.
* And/Or      = sum of child scores; DisMax = max + tiebreak·rest.
* Phrase      = matches docs where the analyzed words occur at consecutive
  tokenizer positions (gap ≤ slop, default 1 — stop-gap semantics: a removed
  stopword leaves a hole that defeats slop=1); score = sum of the constituent
  term scores over matching docs (And semantics).
* MultiTerm (Prefix/Wildcard/Fuzzy/TermRange) = Or over expanded terms.
* Every / Filter / NumericRange = constant score 1.0 × boost.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from whoosh_spark.analysis.analyzers import analyze_text


class Query:
    boost: float = 1.0

    def __post_init__(self):
        # every node dataclass inherits this: a non-numeric boost (classic
        # slip: Term("field", "word") putting the field name in the boost
        # slot) otherwise surfaces as an opaque Spark CAST_INVALID_INPUT
        # deep inside plan construction
        b = getattr(self, "boost", 1.0)
        if not isinstance(b, (int, float)):
            raise TypeError(
                f"{type(self).__name__}.boost must be a number, got {b!r} — "
                "note Term's signature is Term(text, boost=1.0, fieldname=None)")

    def normalize(self) -> "Query":
        return self

    def terms(self) -> list[str]:
        """Exact leaf term texts needed to evaluate this query (post-analysis)."""
        return []

    def field_terms(self) -> list[tuple[str | None, str]]:
        """(fieldname, term) leaf pairs — fieldname None = index default
        (``qcore.py::Query.iter_all_terms ≈L230`` is the upstream analog)."""
        return [(None, t) for t in self.terms()]

    def phrase_terms(self) -> list[str]:
        return []

    def accept(self, fn) -> "Query":
        """Bottom-up tree rebuild (``qcore.py::Query.accept ≈L230``):
        every child subtree is rebuilt through ``accept`` first, then
        ``fn(node)`` is applied to the (possibly rebuilt) node and its
        return value takes the node's place.  Nodes are frozen
        dataclasses, so this always returns a copy-on-change and never
        mutates the original.  Works generically over every node shape:
        any dataclass field holding a Query (``child``, ``a``/``b``) or a
        tuple of Queries (``children``) recurses; leaves pass straight to
        ``fn``."""
        import dataclasses

        if dataclasses.is_dataclass(self):
            changes = {}
            for f in dataclasses.fields(self):
                v = getattr(self, f.name)
                if isinstance(v, Query):
                    nv = v.accept(fn)
                    if nv is not v:
                        changes[f.name] = nv
                elif (isinstance(v, tuple) and v
                      and all(isinstance(x, Query) for x in v)):
                    nv = tuple(x.accept(fn) for x in v)
                    if nv != v:
                        changes[f.name] = nv
            node = dataclasses.replace(self, **changes) if changes else self
        else:
            node = self
        return fn(node)

    def replace(self, fieldname: str | None, oldtext: str,
                newtext: str) -> "Query":
        """Copy of this query with every occurrence of ``oldtext`` in the
        given field replaced by ``newtext`` (``qcore.py::Query.replace
        ≈L260`` — upstream's spelling-correction rewrite primitive).
        ``fieldname=None`` targets unfielded leaves (the index default
        field).  Applies to text leaves (Term/Prefix/Fuzzy/Variations,
        any node with a ``text`` attribute), pattern leaves
        (Wildcard/Regex store the string as ``pattern`` — upstream keeps
        both in ``text``, so replace covers them too), and Phrase/
        Sequence word slots.  Never mutates; returns a copy."""
        import dataclasses

        def rw(node: "Query") -> "Query":
            if getattr(node, "fieldname", None) != fieldname:
                return node
            if getattr(node, "text", None) == oldtext:
                return dataclasses.replace(node, text=newtext)
            if getattr(node, "pattern", None) == oldtext:
                return dataclasses.replace(node, pattern=newtext)
            words = getattr(node, "words", None)
            if words and oldtext in words:
                return dataclasses.replace(
                    node, words=tuple(newtext if w == oldtext else w
                                      for w in words))
            return node

        return self.accept(rw)


class _Null(Query):
    def __repr__(self):
        return "NullQuery"


NullQuery = _Null()


@dataclass(frozen=True)
class Term(Query):
    """``src/whoosh/query/terms.py::Term (≈L40)`` → filter+decode on blocks.

    ``fieldname`` None = the index's default field (single-field compat).
    ``analyzed=True`` marks the text as already in index-term form (upstream
    Term semantics — the parser analyzes, Query objects hold final terms);
    needed when the index analyzer emits terms the standard chain would
    re-split (biword "a-b" shingles, char n-grams)."""

    text: str
    boost: float = 1.0
    fieldname: str | None = None
    analyzed: bool = False

    def normalize(self) -> Query:
        if self.analyzed:
            return self
        toks, _ = analyze_text(self.text)
        if not toks:
            return NullQuery
        if len(toks) == 1:
            return self if toks[0] == self.text else replace(self, text=toks[0])
        # multi-token input behaves like the parser: implicit And
        return And([Term(t, self.boost, self.fieldname) for t in toks]).normalize()

    def terms(self):
        return [self.text]

    def field_terms(self):
        return [(self.fieldname, self.text)]


def _norm_compound(cls, children, **kw):
    flat: list[Query] = []
    for c in children:
        c = c.normalize()
        if c is NullQuery:
            continue
        # flatten same-class nesting — EXCEPT a child whose own minmatch
        # gate is semantic (Or with minmatch > 1): hoisting its children
        # would silently drop the gate.  Normalized children contain no
        # further flattenable same-class nesting (their own normalize ran
        # with the same rule), so one pass is idempotent.
        if (isinstance(c, cls) and type(c) is cls and c.boost == 1.0
                and not kw.get("keep_nested")
                and getattr(c, "minmatch", 0) <= 1):
            flat.extend(c.children)
        else:
            flat.append(c)
    seen, out = set(), []
    for c in flat:
        k = repr(c)
        if k not in seen:
            seen.add(k)
            out.append(c)
    return out


@dataclass(frozen=True)
class And(Query):
    """``compound.py::And (≈L330)`` → n-way inner join on doc_id, score=sum;
    children joined smallest-estimated-df first (And._matcher ≈L350)."""

    children: tuple
    boost: float = 1.0

    def __init__(self, children, boost=1.0):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "boost", boost)
        self.__post_init__()

    def normalize(self) -> Query:
        out = _norm_compound(And, self.children)
        evs = [c for c in out if isinstance(c, Every)]
        if evs and len(out) > len(evs):  # Every absorption inside And
            out = [c for c in out if not isinstance(c, Every)]
        if not out:
            return NullQuery
        if len(out) == 1 and self.boost == 1.0:
            return out[0]
        return And(out, self.boost)

    def terms(self):
        return [t for c in self.children for t in c.terms()]

    def field_terms(self):
        return [ft for c in self.children for ft in c.field_terms()]

    def phrase_terms(self):
        return [t for c in self.children for t in c.phrase_terms()]


@dataclass(frozen=True)
class Or(Query):
    """``compound.py::Or (≈L380)`` → union + groupBy(doc_id).sum;
    minmatch → HAVING count >= m."""

    children: tuple
    boost: float = 1.0
    minmatch: int = 0

    def __init__(self, children, boost=1.0, minmatch=0):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "minmatch", minmatch)
        self.__post_init__()

    def normalize(self) -> Query:
        # minmatch > 1 counts matching CHILDREN, so hoisting a nested Or's
        # children into this node would inflate the count; minmatch <= 1
        # ("any") is count-insensitive and flattens freely
        out = _norm_compound(Or, self.children, keep_nested=self.minmatch > 1)
        if not out:
            return NullQuery
        if len(out) == 1 and self.boost == 1.0 and self.minmatch <= 1:
            return out[0]
        return Or(out, self.boost, self.minmatch)

    def terms(self):
        return [t for c in self.children for t in c.terms()]

    def field_terms(self):
        return [ft for c in self.children for ft in c.field_terms()]

    def phrase_terms(self):
        return [t for c in self.children for t in c.phrase_terms()]


@dataclass(frozen=True)
class DisMax(Query):
    """``compound.py::DisjunctionMax (≈L560)`` → groupBy max + tiebreak·(sum−max)."""

    children: tuple
    boost: float = 1.0
    tiebreak: float = 0.0

    def __init__(self, children, boost=1.0, tiebreak=0.0):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "tiebreak", tiebreak)
        self.__post_init__()

    def normalize(self) -> Query:
        out = [c.normalize() for c in self.children]
        out = [c for c in out if c is not NullQuery]
        if not out:
            return NullQuery
        if len(out) == 1 and self.boost == 1.0:
            return out[0]
        return DisMax(out, self.boost, self.tiebreak)

    def terms(self):
        return [t for c in self.children for t in c.terms()]

    def field_terms(self):
        return [ft for c in self.children for ft in c.field_terms()]

    def phrase_terms(self):
        return [t for c in self.children for t in c.phrase_terms()]


@dataclass(frozen=True)
class Not(Query):
    """``wrappers.py::Not (≈L60)`` → Every anti-join child."""

    child: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if c is NullQuery:
            return NullQuery
        return Not(c, self.boost)

    def terms(self):
        return self.child.terms()

    def field_terms(self):
        return self.child.field_terms()


@dataclass(frozen=True)
class AndNot(Query):
    """``compound.py::AndNot (≈L690)`` → left anti join, scores from a."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if a is NullQuery:
            return NullQuery
        if b is NullQuery:
            return a
        return AndNot(a, b, self.boost)

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()

    def phrase_terms(self):
        return self.a.phrase_terms() + self.b.phrase_terms()


@dataclass(frozen=True)
class AndMaybe(Query):
    """``compound.py::AndMaybe (≈L720)`` → left outer join, a + coalesce(b,0)."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if a is NullQuery:
            return NullQuery
        if b is NullQuery:
            return a
        return AndMaybe(a, b, self.boost)

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()

    def phrase_terms(self):
        return self.a.phrase_terms() + self.b.phrase_terms()


@dataclass(frozen=True)
class Sequence(Query):
    """``src/whoosh/query/positional.py::Sequence (≈L40)`` / ``Ordered``:
    ordered proximity of sub-queries — each slot may be any term-expanding
    query (Term/Prefix/Wildcard/Fuzzy/Or-of-terms); slot i+1 must match at a
    position in (p_i, p_i + slop].  Phrase is the all-Term special case."""

    children: tuple
    slop: int = 1
    boost: float = 1.0

    def __init__(self, children, slop: int = 1, boost: float = 1.0):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)
        self.__post_init__()

    def normalize(self) -> Query:
        kids = tuple(c.normalize() for c in self.children)
        if any(k is NullQuery for k in kids):
            return NullQuery
        if len(kids) == 1:
            return kids[0]
        return Sequence(kids, self.slop, self.boost)

    def terms(self):
        return [t for c in self.children for t in c.terms()]

    def field_terms(self):
        return [ft for c in self.children for ft in c.field_terms()]

    def phrase_terms(self):
        return self.terms()


@dataclass(frozen=True)
class Otherwise(Query):
    """``compound.py::Otherwise (≈L750)``: results of a if any, else b —
    a driver-side conditional on a cheap count."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if a is NullQuery:
            return b
        if b is NullQuery:
            return a
        return Otherwise(a, b, self.boost)

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()

    def phrase_terms(self):
        return self.a.phrase_terms() + self.b.phrase_terms()


@dataclass(frozen=True)
class Constant(Query):
    """``wrappers.py::ConstantScoreQuery (≈L120)``: child's matches with a
    fixed score."""

    child: Query
    score: float = 1.0
    boost: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if c is NullQuery:
            return NullQuery
        return Constant(c, self.score, self.boost)

    def terms(self):
        return self.child.terms()

    def field_terms(self):
        return self.child.field_terms()

    def phrase_terms(self):
        return self.child.phrase_terms()


@dataclass(frozen=True)
class Weighted(Query):
    """``wrappers.py::WeightingQuery (≈L160)``: score the subtree with a
    DIFFERENT weighting model than the searcher's (e.g. one branch PL2,
    the rest BM25); matches are unchanged.  ``weighting=None`` keeps the
    searcher's model and only applies the boost — the generic wrapper for
    boosting an arbitrary subtree (parser pseudo-field ``^boost``)."""

    child: Query
    weighting: str | None = "bm25"
    boost: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if c is NullQuery:
            return NullQuery
        return Weighted(c, self.weighting, self.boost)

    def terms(self):
        return self.child.terms()

    def field_terms(self):
        return self.child.field_terms()

    def phrase_terms(self):
        return self.child.phrase_terms()


@dataclass(frozen=True)
class Require(Query):
    """``compound.py::Require (≈L660)`` → left semi join, score from a only."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if a is NullQuery or b is NullQuery:
            return NullQuery
        return Require(a, b, self.boost)

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()

    def phrase_terms(self):
        return self.a.phrase_terms() + self.b.phrase_terms()


@dataclass(frozen=True)
class Phrase(Query):
    """``src/whoosh/query/positional.py::Phrase (≈L170)`` → positional join.

    ``words`` may be given raw; normalize() runs query-time analysis and drops
    stopwords (the doc-side position GAP remains, so a phrase across a removed
    stopword does not match at slop=1 — the classic Whoosh gotcha)."""

    words: tuple
    slop: int = 1
    boost: float = 1.0
    fieldname: str | None = None
    scoring: str = "terms"  # "terms" (sum of term BM25) | "freq" (phrase-
    #                         frequency BM25: tf = occurrence count, idf
    #                         from the phrase's own doc frequency)
    analyzed: bool = False  # words already in index-term form (a tee'd
    #                         parser chain ran) — skip re-analysis

    def __init__(self, words, slop=1, boost=1.0, fieldname=None,
                 scoring="terms", analyzed=False):
        object.__setattr__(self, "words", tuple(words))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "fieldname", fieldname)
        object.__setattr__(self, "scoring", scoring)
        object.__setattr__(self, "analyzed", analyzed)
        self.__post_init__()

    def normalize(self) -> Query:
        if self.analyzed:
            return self
        toks: list[str] = []
        for w in self.words:
            t, _ = analyze_text(w)
            toks.extend(t)
        if not toks:
            return NullQuery
        if len(toks) == 1:
            return Term(toks[0], self.boost, self.fieldname)
        return Phrase(toks, self.slop, self.boost, self.fieldname,
                      self.scoring)

    def terms(self):
        return list(self.words)

    def field_terms(self):
        return [(self.fieldname, w) for w in self.words]

    def phrase_terms(self):
        return list(self.words)


@dataclass(frozen=True)
class Every(Query):
    """``qcore.py::Every (≈L540)`` → all doc ids, score 1.0."""

    boost: float = 1.0


@dataclass(frozen=True)
class Prefix(Query):
    """``terms.py::Prefix (≈L330)`` → term LIKE 'p%' expansion → Or."""

    text: str
    boost: float = 1.0
    fieldname: str | None = None


@dataclass(frozen=True)
class Wildcard(Query):
    """``terms.py::Wildcard (≈L350)`` — glob pattern (* ?) over term dict."""

    pattern: str
    boost: float = 1.0
    fieldname: str | None = None


@dataclass(frozen=True)
class Fuzzy(Query):
    """``terms.py::FuzzyTerm (≈L440)`` — levenshtein ≤ maxdist, shared prefix."""

    text: str
    maxdist: int = 1
    prefixlength: int = 1
    boost: float = 1.0
    fieldname: str | None = None


@dataclass(frozen=True)
class TermRange(Query):
    """``ranges.py::TermRange (≈L60)`` — lexicographic term BETWEEN."""

    lo: str | None
    hi: str | None
    incl_lo: bool = True
    incl_hi: bool = True
    boost: float = 1.0
    fieldname: str | None = None


@dataclass(frozen=True)
class Regex(Query):
    """``terms.py::Regex (≈L400)`` — raw regular-expression match over the
    term dictionary (Java-regex ``rlike`` on term_stats; keep patterns
    RE2-compatible for oracle parity).  Expansion → Or of Terms."""

    pattern: str
    boost: float = 1.0
    fieldname: str | None = None


@dataclass(frozen=True)
class Variations(Query):
    """``terms.py::Variations (≈L500)`` — morphological variations of the
    word (``lang/morph_en.py::variations`` analog: rule-based English
    inflection) that exist in the term dictionary, as an Or."""

    text: str
    boost: float = 1.0
    fieldname: str | None = None


@dataclass(frozen=True)
class DateRange(Query):
    """``ranges.py::DateRange (≈L350)`` — native timestamp predicate over a
    stored timestamp column (upstream's ``datetime_to_long`` tiered term
    expansion is obsolete under Parquet min/max stats + partition pruning:
    the predicate pushes to the scan).  Bounds are ISO strings or epoch
    seconds; constant score 1.0."""

    column: str
    lo: object = None
    hi: object = None
    incl_lo: bool = True
    incl_hi: bool = True
    boost: float = 1.0


# ---------------------------------------------------------------------------
# Span queries (``src/whoosh/query/spans.py ≈L100-600``).  A span is a token
# position interval [s, e]; Term leaves yield unit spans (p, p), Phrase /
# Sequence at slop=1 yield (end−k+1, end) spans.  Scores follow the engine's
# And convention: sum of the scoring side's term BM25 over matching docs.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpanFirst(Query):
    """``spans.py::SpanFirst (≈L250)``: child spans ending at or before
    token position ``limit``."""

    child: Query
    limit: int = 0
    boost: float = 1.0

    def terms(self):
        return self.child.terms()

    def field_terms(self):
        return self.child.field_terms()


@dataclass(frozen=True)
class SpanNear(Query):
    """``spans.py::SpanNear2 (≈L350)``: spans of ``a`` and ``b`` within
    ``slop`` tokens (gap between the two spans), ordered or not; the match
    span covers both."""

    a: Query
    b: Query
    slop: int = 1
    ordered: bool = True
    boost: float = 1.0

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()


@dataclass(frozen=True)
class SpanNot(Query):
    """``spans.py::SpanNot (≈L450)``: spans of ``a`` that do not overlap any
    span of ``b``; scored from ``a``."""

    a: Query
    b: Query
    boost: float = 1.0

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()


@dataclass(frozen=True)
class SpanContains(Query):
    """``spans.py::SpanContains (≈L500)``: spans of ``a`` that fully contain
    a span of ``b``; scored from ``a``."""

    a: Query
    b: Query
    boost: float = 1.0

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()


@dataclass(frozen=True)
class SpanBefore(Query):
    """``spans.py::SpanBefore (≈L550)``: spans of ``a`` ending before some
    span of ``b`` starts; scored from ``a``."""

    a: Query
    b: Query
    boost: float = 1.0

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()


@dataclass(frozen=True)
class SpanOr(Query):
    """``spans.py::SpanOr (≈L300)``: per-document union of the children's
    span sets (a doc matches when ANY child yields a span); scored from the
    union of the children's terms (engine And/Or sum convention)."""

    children: tuple
    boost: float = 1.0

    def __init__(self, children, boost=1.0):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "boost", boost)
        self.__post_init__()

    def terms(self):
        return [t for c in self.children for t in c.terms()]

    def field_terms(self):
        return [ft for c in self.children for ft in c.field_terms()]


@dataclass(frozen=True)
class SpanCondition(Query):
    """``spans.py::SpanCondition (≈L600)``: spans of ``a`` in documents
    where ``b`` also yields at least one span (doc-level gate — b's span
    positions are irrelevant); scored from ``a``."""

    a: Query
    b: Query
    boost: float = 1.0

    def terms(self):
        return self.a.terms() + self.b.terms()

    def field_terms(self):
        return self.a.field_terms() + self.b.field_terms()


def SpanNear2(children, slop: int = 1, ordered: bool = True,
              boost: float = 1.0) -> Query:
    """``spans.py::SpanNear2 (≈L350)`` list form: every child within
    ``slop`` of the previous one's combined span.  Upstream chains the
    binary matcher pairwise left-to-right; this factory desugars to the
    same left-nested binary :class:`SpanNear` tree at construction, so
    the evaluator, oracle, and normalize() only ever see the binary node
    (no new enumeration sites)."""
    kids = list(children)
    if not kids:
        raise ValueError("SpanNear2 needs at least one child")
    if len(kids) == 1:
        return kids[0] if boost == 1.0 else replace(kids[0], boost=boost)
    out = kids[0]
    for c in kids[1:]:
        out = SpanNear(out, c, slop=slop, ordered=ordered)
    return out if boost == 1.0 else replace(out, boost=boost)


@dataclass(frozen=True)
class NestedParent(Query):
    """``src/whoosh/query/nested.py::NestedParent (≈L40)``: block-join —
    parent docs (matching ``parents``) whose child block contains a doc
    matching ``child``.  A block is the doc-id run from a parent (inclusive)
    to the next parent (exclusive), the upstream indexing-order contract.
    ``score_fn``: 'sum' | 'max' | 'avg' over child scores per parent."""

    parents: Query
    child: Query
    score_fn: str = "sum"
    boost: float = 1.0

    def terms(self):
        return self.parents.terms() + self.child.terms()

    def field_terms(self):
        return self.parents.field_terms() + self.child.field_terms()


@dataclass(frozen=True)
class NestedChildren(Query):
    """``nested.py::NestedChildren (≈L150)``: the inverse — child docs whose
    enclosing parent matches ``parents`` AND that match ``child``; children
    keep their own scores."""

    parents: Query
    child: Query
    boost: float = 1.0

    def terms(self):
        return self.parents.terms() + self.child.terms()

    def field_terms(self):
        return self.parents.field_terms() + self.child.field_terms()


@dataclass(frozen=True)
class NumericRange(Query):
    """``ranges.py::NumericRange (≈L220)`` — native column predicate on the
    docs table (tiered term expansion obsolete under Parquet min/max)."""

    column: str
    lo: object = None
    hi: object = None
    incl_lo: bool = True
    incl_hi: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class Filter(Query):
    """Arbitrary SQL predicate over the stored docs table (facet filters like
    ``lang = 'en'``) — constant score 1.0."""

    predicate: str
    boost: float = 1.0
