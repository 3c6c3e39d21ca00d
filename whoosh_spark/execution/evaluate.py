"""Query AST → Spark dataflow (SURVEY.md §2.4/§2.5 Spark mappings).

Every node evaluates to a ``(doc_id long, score double)`` DataFrame:

    Term        filter+decode posting blocks → BM25 column expr
    And         inner joins on doc_id (smallest estimated df first,
                the And._matcher ≈L350 selectivity ordering), score=sum
    Or          unionByName → groupBy(doc_id).sum, minmatch = HAVING cnt≥m
    DisMax      groupBy max + tiebreak·(sum−max)
    Not         all-docs anti-join child
    AndNot      left anti;  AndMaybe  left outer;  Require  left semi
    Phrase      positional join: per-word position arrays joined on doc_id,
                adjacency folded via array_intersect/transform (JVM-side)
    MultiTerm   (Prefix/Wildcard/Fuzzy/TermRange) driver-side expansion
                against term_stats (LIMIT-guarded) → Or of Terms
    Every/Filter/NumericRange   docs-table scans, constant score

Boolean joins are left to Catalyst/AQE for physical strategy (broadcast vs
shuffled hash); we contribute the selectivity ordering Catalyst cannot know
(posting-list lengths live in term_stats).
"""

from __future__ import annotations

from dataclasses import replace
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_spark.execution.score import idf_value, score_postings
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q


def _glob_to_rlike(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(ch if ch.isalnum() else "\\" + ch)
    return "^" + "".join(out) + "$"


def pair_gate_fires(rarest_df: int, dfs: list[int], n_docs: int) -> bool:
    """The k-word chained-pair gate's payoff decision (round 5 — the
    constants and the 1M/5M/10M measurements behind them are documented at
    config.py PAIR_GATE_*).  Pure arithmetic over term stats so the
    decision itself is unit-testable against the measured scenarios:

      * benefit — posting rows the candidate filter keeps out of the
        positional decode, estimated conservatively as
        ``sum_w max(0, df(w) - rarest_pair_df)``;
      * cost — the probe's scan+collect (scales with rarest_df) plus a
        fixed job overhead, expressed as the four config thresholds.
    """
    import whoosh_spark.config as C

    saved = sum(max(0, df - rarest_df) for df in dfs)
    return not (rarest_df > C.PAIR_GATE_MAX_DF
                or rarest_df > C.PAIR_GATE_MAX_CAND_FRAC * float(n_docs)
                or saved < C.PAIR_GATE_MIN_SAVED_ROWS
                or saved < C.PAIR_GATE_MIN_SAVED_FRAC * sum(dfs))


class Evaluator:
    def __init__(self, ix: InvertedIndex, weighting: str = "bm25"):
        self.ix = ix
        # multi-field: fielded query nodes route to the right sub-index; the
        # default field keeps the single-field behavior bit-identical
        from whoosh_spark.multifield import MultiFieldIndex

        self.mf = ix if isinstance(ix, MultiFieldIndex) else None
        # §2.6 model switch: bm25 | tfidf | frequency | dfree | pl2, each
        # optionally "reverse:"-prefixed.  A dict {fieldname_or_None: model}
        # is MultiWeighting (``scoring.py::MultiWeighting ≈L430``): per-field
        # model with the None entry as the default.
        self.weighting = weighting
        # per-evaluator memo consumed by _bucketed_range_join
        self._max_doc: int | None = None

    def _weighting_for(self, fk: str | None) -> str:
        if isinstance(self.weighting, dict):
            default = self.weighting.get(None, "bm25")
            if fk is None:
                # the default field's own NAME may key the dict — on both
                # multi-field and single-field indexes
                name = (self.mf.default_field if self.mf is not None
                        else self.ix.field)
                return self.weighting.get(name, default)
            return self.weighting.get(fk, default)
        return self.weighting

    # -- field routing ---------------------------------------------------
    def _fkey(self, field: str | None) -> str | None:
        """Canonical stats key: None = the default field."""
        if field is None:
            return None
        if self.mf is not None:
            return None if field == self.mf.default_field else field
        if field != self.ix.field:
            raise KeyError(f"unknown field {field!r} (single-field index "
                           f"{self.ix.field!r})")
        return None

    def _ixf(self, field: str | None) -> InvertedIndex:
        if self.mf is not None:
            return self.mf.index_for(field)
        self._fkey(field)  # validate
        return self.ix

    def _bb(self, field: str | None) -> tuple[float | None, float]:
        """(per-field B override, field boost) — BM25F field weighting."""
        if self.mf is not None:
            return self.mf.bm25_b(field), self.mf.field_boost(field)
        return None, 1.0

    # ------------------------------------------------------------------
    def evaluate(self, q: Q.Query) -> DataFrame:
        """Normalize, expand multi-terms, evaluate → (doc_id, score)."""
        q = q.normalize()
        q = self._expand(q)
        if q is Q.NullQuery:
            return self._empty()
        self._prime_stats(q)
        # soft-delete overlay: drop deleted docs from the match set (stats
        # still count them — Whoosh deleted-but-unpurged semantics)
        return self.ix.not_deleted(self._eval(q))

    def _empty(self) -> DataFrame:
        return self.ix.spark.createDataFrame([], "doc_id long, score double")

    def _prime_stats(self, q: Q.Query) -> None:
        """Load per-field term stats for q's terms into the evaluator's
        broadcast caches: {(fkey, term): {df, cf, max_weight}} + globals."""
        self._stats = {}
        self._fglobal = {}
        by_field: dict[str | None, set[str]] = {}
        for f, t in set(q.field_terms()):
            by_field.setdefault(self._fkey(f), set()).add(t)
        for fk in set(by_field) | {None}:
            ixf = self._ixf(fk)
            self._fglobal[fk] = ixf.global_stats()
            st = ixf.stats_for_terms(sorted(by_field.get(fk, ())))
            self._stats.update({(fk, t): v for t, v in st.items()})
        self._n, self._avgdl = self._fglobal[None]

    def estimate(self, q: Q.Query) -> int:
        """Public ``Query.estimate_size()`` analog (qcore.py ≈L260): an
        upper bound on matching docs from broadcast term stats, without
        running the query.  Primes the same per-field stats cache
        ``evaluate()`` uses (tiny collect, memoized per index snapshot)."""
        q = self._expand(q.normalize())
        if q is Q.NullQuery:
            return 0
        self._prime_stats(q)
        return min(self._estimate(q), self._n)

    # -- multi-term expansion (driver-side, term dict is term_stats) ----
    def _expand(self, q: Q.Query) -> Q.Query:
        if isinstance(q, Q.Prefix):
            return self._or_terms(
                self._ixf(q.fieldname).expand_terms(F.col("term").startswith(q.text)),
                q.boost, q.fieldname)
        if isinstance(q, Q.Wildcard):
            return self._or_terms(
                self._ixf(q.fieldname).expand_terms(
                    F.col("term").rlike(_glob_to_rlike(q.pattern))),
                q.boost, q.fieldname)
        if isinstance(q, Q.Fuzzy):
            pred = F.levenshtein(F.col("term"), F.lit(q.text)) <= q.maxdist
            if q.prefixlength:
                pred = pred & F.col("term").startswith(q.text[: q.prefixlength])
            return self._or_terms(self._ixf(q.fieldname).expand_terms(pred),
                                  q.boost, q.fieldname)
        if isinstance(q, Q.TermRange):
            pred = F.lit(True)
            if q.lo is not None:
                pred = pred & (F.col("term") >= q.lo if q.incl_lo else F.col("term") > q.lo)
            if q.hi is not None:
                pred = pred & (F.col("term") <= q.hi if q.incl_hi else F.col("term") < q.hi)
            return self._or_terms(self._ixf(q.fieldname).expand_terms(pred),
                                  q.boost, q.fieldname)
        if isinstance(q, Q.Regex):
            return self._or_terms(
                self._ixf(q.fieldname).expand_terms(F.col("term").rlike(q.pattern)),
                q.boost, q.fieldname)
        if isinstance(q, Q.Variations):
            from whoosh_spark.analysis.morph import variations

            forms = variations(q.text)
            return self._or_terms(
                self._ixf(q.fieldname).expand_terms(F.col("term").isin(forms)),
                q.boost, q.fieldname)
        if isinstance(q, (Q.SpanNear, Q.SpanNot, Q.SpanContains, Q.SpanBefore,
                          Q.SpanCondition)):
            a, b = self._expand(q.a), self._expand(q.b)
            if a is Q.NullQuery or b is Q.NullQuery:
                return a if (isinstance(q, Q.SpanNot) and a is not Q.NullQuery) else Q.NullQuery
            return replace(q, a=a, b=b)
        if isinstance(q, Q.SpanFirst):
            c = self._expand(q.child)
            return Q.NullQuery if c is Q.NullQuery else replace(q, child=c)
        if isinstance(q, (Q.NestedParent, Q.NestedChildren)):
            p, c = self._expand(q.parents), self._expand(q.child)
            if p is Q.NullQuery or c is Q.NullQuery:
                return Q.NullQuery
            return replace(q, parents=p, child=c)
        for attr in ("children",):
            if hasattr(q, attr):
                kids = tuple(self._expand(c) for c in getattr(q, attr))
                # conjunctive containers: ONE empty-expanding child (e.g. a
                # Prefix matching no terms) empties the whole query — same
                # as a missing Term; dropping the slot would WIDEN the query
                # (a one-slot Sequence matches far more than the original)
                if isinstance(q, (Q.And, Q.Sequence)) and \
                        any(k is Q.NullQuery for k in kids):
                    return Q.NullQuery
                kids = tuple(k for k in kids if k is not Q.NullQuery)
                if not kids:
                    return Q.NullQuery
                q = type(q)(kids, **{k: getattr(q, k)
                                     for k in ("boost", "minmatch", "tiebreak", "slop")
                                     if hasattr(q, k)})
        if isinstance(q, (Q.AndNot, Q.AndMaybe, Q.Require, Q.Otherwise)):
            a, b = self._expand(q.a), self._expand(q.b)
            if a is Q.NullQuery:
                return b if isinstance(q, Q.Otherwise) else Q.NullQuery
            if b is Q.NullQuery:
                return Q.NullQuery if isinstance(q, Q.Require) else a
            return type(q)(a, b, q.boost)
        if isinstance(q, Q.Not):
            c = self._expand(q.child)
            # a child that EXPANDS to nothing (e.g. a Prefix/TermRange over
            # zero terms) inverts to everything — matcher-layer semantics
            # (``matching.InverseMatcher`` over a null child yields all
            # docs, score 1.0).  Parse-layer Not(NullQuery) → NullQuery is
            # handled in ast.normalize, same split as upstream.
            return Q.Every(q.boost) if c is Q.NullQuery else Q.Not(c, q.boost)
        if isinstance(q, Q.Constant):
            c = self._expand(q.child)
            return Q.NullQuery if c is Q.NullQuery else Q.Constant(c, q.score, q.boost)
        if isinstance(q, Q.Weighted):
            c = self._expand(q.child)
            return (Q.NullQuery if c is Q.NullQuery
                    else Q.Weighted(c, q.weighting, q.boost))
        return q

    def _or_terms(self, terms: list[str], boost: float,
                  fieldname: str | None = None) -> Q.Query:
        if not terms:
            return Q.NullQuery
        if len(terms) == 1:
            return Q.Term(terms[0], boost, fieldname)
        return Q.Or([Q.Term(t, fieldname=fieldname) for t in terms], boost=boost)

    # -- selectivity estimates (estimate_size analog, qcore.py ≈L260) ---
    def _estimate(self, q: Q.Query) -> int:
        if isinstance(q, Q.Term):
            return self._stats.get((self._fkey(q.fieldname), q.text), {"df": 0})["df"]
        if isinstance(q, Q.Phrase):
            fk = self._fkey(q.fieldname)
            return min((self._stats.get((fk, w), {"df": 0})["df"] for w in q.words),
                       default=0)
        if isinstance(q, Q.And):
            return min(self._estimate(c) for c in q.children)
        if isinstance(q, (Q.Or, Q.DisMax)):
            return sum(self._estimate(c) for c in q.children)
        if isinstance(q, (Q.AndNot, Q.AndMaybe, Q.Require, Q.Otherwise)):
            return self._estimate(q.a)
        if isinstance(q, (Q.Constant, Q.Weighted)):
            return self._estimate(q.child)
        if isinstance(q, Q.SpanOr):
            return sum(self._estimate(c) for c in q.children)
        if isinstance(q, (Q.SpanNot, Q.SpanContains, Q.SpanBefore,
                          Q.SpanCondition)):
            return self._estimate(q.a)
        return self._n

    # -- node dispatch ---------------------------------------------------
    def _eval(self, q: Q.Query) -> DataFrame:
        if q is Q.NullQuery:
            return self._empty()
        name = type(q).__name__
        return getattr(self, f"_eval_{name.lower()}")(q)

    def scored_terms_batch(self, terms: list[str]) -> DataFrame:
        """Score a default-field term batch OUTSIDE ``evaluate()`` (the
        ``Searcher.search_many`` shared-scan path): primes the per-field
        stats cache ``_scored_terms`` reads, then applies the same
        soft-delete overlay ``evaluate()`` would."""
        ixf = self._ixf(None)
        self._fglobal = {None: ixf.global_stats()}
        st = ixf.stats_for_terms(sorted(set(terms)))
        self._stats = {(None, t): v for t, v in st.items()}
        self._n, self._avgdl = self._fglobal[None]
        return self.ix.not_deleted(self._scored_terms(terms))

    def _scored_terms(self, terms: list[str],
                      fieldname: str | None = None,
                      posts: DataFrame | None = None,
                      keep: tuple[str, ...] = ()) -> DataFrame:
        """Decode + score postings for a set of exact terms in ONE scan of
        the given field (BM25F: per-field idf/avgdl/B + field boost).

        ``posts`` injects an already-decoded postings frame (the phrase path
        scores and folds positions off ONE decode instead of two); ``keep``
        names extra decoded columns to carry through (e.g. ``positions``)."""
        fk = self._fkey(fieldname)
        present = [t for t in set(terms) if (fk, t) in self._stats]
        if not present:
            return self.ix.spark.createDataFrame([], "term string, doc_id long, score double")
        n, avgdl = self._fglobal[fk]
        idf_map = {t: idf_value(n, self._stats[(fk, t)]["df"]) for t in present}
        cf_map = {t: float(self._stats[(fk, t)]["cf"]) for t in present}
        ixf = self._ixf(fieldname)
        if posts is None:
            posts = ixf.postings(present)
        ov = getattr(ixf, "boosts", None)
        if ov is not None:
            # PositionBoosts overlay (boosts.py): weight = Σ occurrence
            # boosts where it deviates from tf, else tf.  Both sides of the
            # join are already term-pruned to the query's terms.
            ovp = ov.where(F.col("term").isin(present)) \
                    .withColumnRenamed("w", "_bw")
            posts = (
                posts.join(ovp, ["term", "doc_id"], "left")
                .withColumn("tf", F.coalesce(F.col("_bw"),
                                             F.col("tf").cast("double")))
                .drop("_bw")
            )
        b, fboost = self._bb(fieldname)
        return score_postings(
            posts, idf_map, avgdl, weighting=self._weighting_for(fk),
            b=b, mult=fboost, cf_by_term=cf_map, n_docs=n,
            total_len=ixf.total_field_length(),
        ).select("term", "doc_id", "score", *keep)

    def _eval_term(self, q: Q.Term) -> DataFrame:
        df = self._scored_terms([q.text], q.fieldname).select("doc_id", "score")
        if q.boost != 1.0:
            df = df.withColumn("score", F.col("score") * q.boost)
        return df

    def _split_term_children(self, children):
        """({fkey: {term text: child multiplicity}}, other children) — each
        field's Term batch is evaluable in ONE postings scan + aggregation
        instead of per-child scans and a join chain (Whoosh's
        ArrayUnionMatcher TAAT insight, ``src/whoosh/matching/combo.py ≈L40``
        — Spark is natively TAAT).  Multiplicity matters: distinct children
        (e.g. a Prefix and a Wildcard) can expand to the SAME term, and each
        child contributes its own score in the compound's matcher — only
        identical pre-expansion children are deduped (by ast.normalize)."""
        batches: dict[str | None, dict[str, int]] = {}
        others = []
        for c in children:
            if isinstance(c, Q.Term) and c.boost == 1.0:
                mult = batches.setdefault(self._fkey(c.fieldname), {})
                mult[c.text] = mult.get(c.text, 0) + 1
            else:
                others.append(c)
        return batches, others

    @staticmethod
    def _mult_weighted(df: DataFrame, mult: dict[str, int]) -> DataFrame:
        """Add ``_w`` = how many compound children each (term, doc) score
        row stands for; all-1 batches skip the map lookup."""
        if all(m == 1 for m in mult.values()):
            return df.withColumn("_w", F.lit(1))
        wmap = F.create_map(*[lit for t, m in mult.items()
                              for lit in (F.lit(t), F.lit(m))])
        return df.withColumn(
            "_w", F.coalesce(wmap[F.col("term")], F.lit(1)))

    def _eval_and(self, q: Q.And) -> DataFrame:
        batches, others = self._split_term_children(q.children)
        dfs = []
        for fk, mult in batches.items():
            # one scan per field, doc-at-a-time conjunction within the field
            present = [t for t in mult if (fk, t) in self._stats]
            if len(present) < len(mult):
                return self._empty()  # a missing term empties the And
            batch = (
                self._mult_weighted(self._scored_terms(present, fk), mult)
                .groupBy("doc_id")
                .agg(F.sum(F.col("score") * F.col("_w")).alias("score"),
                     F.count("*").alias("_m"))
                .where(F.col("_m") == len(present))
                .select("doc_id", "score")
            )
            dfs.append(batch)
        dfs.extend(self._eval(c) for c in sorted(others, key=self._estimate))
        if not dfs:
            return self._empty()
        dfs = [d.withColumnRenamed("score", f"_s{i}") for i, d in enumerate(dfs)]
        joined = reduce(lambda a, b: a.join(b, "doc_id", "inner"), dfs)
        total = reduce(lambda a, b: a + b, [F.col(f"_s{i}") for i in range(len(dfs))])
        return joined.select("doc_id", (total * q.boost).alias("score"))

    def _eval_or(self, q: Q.Or) -> DataFrame:
        batches, others = self._split_term_children(q.children)
        parts = []
        for fk, mult in batches.items():
            parts.append(
                self._mult_weighted(self._scored_terms(list(mult), fk), mult)
                .select("doc_id",
                        (F.col("score") * F.col("_w")).alias("score"),
                        F.col("_w")))
        parts.extend(self._eval(c).select("doc_id", "score",
                                          F.lit(1).alias("_w"))
                     for c in others)
        u = reduce(lambda a, b: a.unionByName(b), parts)
        # minmatch counts matching CHILDREN (union sub-matchers), so a term
        # two children expanded to counts twice — hence sum(_w), not count
        agg = u.groupBy("doc_id").agg(
            F.sum("score").alias("score"), F.sum("_w").alias("_m"))
        if q.minmatch > 1:
            agg = agg.where(F.col("_m") >= q.minmatch)
        return agg.select("doc_id", (F.col("score") * q.boost).alias("score"))

    def _eval_dismax(self, q: Q.DisMax) -> DataFrame:
        # Term children batch into ONE postings scan per field (same TAAT
        # reformulation as And/Or): each term's per-doc score row feeds the
        # max/sum aggregation directly — the per-child scan+decode of the
        # naive plan is gone (round-1 verdict perf-weak item).  Duplicate
        # term children ride the same scan: they can't raise the max and
        # contribute ×mult to the tiebreak sum.
        batches, others = self._split_term_children(q.children)
        dfs = [self._mult_weighted(self._scored_terms(list(mult), fk), mult)
               .select("doc_id", "score",
                       (F.col("score") * F.col("_w")).alias("_ws"))
               for fk, mult in batches.items()]
        dfs.extend(self._eval(c).select("doc_id", "score",
                                        F.col("score").alias("_ws"))
                   for c in others)
        u = reduce(lambda a, b: a.unionByName(b), dfs)
        agg = u.groupBy("doc_id").agg(
            F.max("score").alias("_mx"), F.sum("_ws").alias("_sm"))
        score = (F.col("_mx") + q.tiebreak * (F.col("_sm") - F.col("_mx"))) * q.boost
        return agg.select("doc_id", score.alias("score"))

    def _eval_not(self, q: Q.Not) -> DataFrame:
        child = self._eval(q.child).select("doc_id")
        return (
            self.ix.all_doc_ids()
            .join(child, "doc_id", "left_anti")
            .select("doc_id", (F.lit(1.0) * q.boost).alias("score"))
        )

    # -- binary ops (AndNot / AndMaybe / Require) ------------------------
    def _term_batch_of(self, node) -> tuple[str, list[str], str] | None:
        """(fkey, term texts, 'all'|'any') if ``node`` is a single-field
        unboosted term batch — Term, And of Terms, or Or (minmatch ≤ 1) of
        Terms — else None."""
        if isinstance(node, Q.Term) and node.boost == 1.0:
            return self._fkey(node.fieldname), [node.text], "any"
        if (isinstance(node, (Q.And, Q.Or)) and node.boost == 1.0
                and getattr(node, "minmatch", 1) <= 1
                and all(isinstance(c, Q.Term) and c.boost == 1.0
                        for c in node.children)):
            fks = {self._fkey(c.fieldname) for c in node.children}
            if len(fks) == 1:
                mode = "all" if isinstance(node, Q.And) else "any"
                return fks.pop(), [c.text for c in node.children], mode
        return None

    def _eval_pair_batched(self, q) -> DataFrame | None:
        """One-scan plan for AndNot/AndMaybe/Require when BOTH sides are
        term batches on the same field: decode all terms in a single
        postings scan, then express the pair semantics as conditional
        aggregates over the per-(doc, term) score rows — no second scan, no
        join (the TAAT reformulation And/Or/DisMax already use)."""
        pa, pb = self._term_batch_of(q.a), self._term_batch_of(q.b)
        if pa is None or pb is None or pa[0] != pb[0]:
            return None
        fk, a_terms, a_mode = pa
        _, b_terms, b_mode = pb
        # duplicate texts = distinct children that expanded to the same term;
        # each still contributes its own score (see _split_term_children)
        a_mult = {t: a_terms.count(t) for t in dict.fromkeys(a_terms)}
        b_mult = {t: b_terms.count(t) for t in dict.fromkeys(b_terms)}
        a_present = [t for t in a_mult if (fk, t) in self._stats]
        b_present = [t for t in b_mult if (fk, t) in self._stats]
        if a_mode == "all" and len(a_present) < len(a_mult):
            return self._empty()
        if not a_present:
            return self._empty()
        if b_mode == "all" and len(b_present) < len(b_mult):
            # an And b-side with a missing term matches NO docs — for
            # Require that empties the result; for AndNot/AndMaybe the b
            # side is inert (do NOT test against the present subset only)
            if isinstance(q, Q.Require):
                return self._empty()
            b_present = []
        if not b_present:
            if isinstance(q, Q.Require):
                return self._empty()
            # b matches nothing: AndNot/AndMaybe degrade to the a side
            agg = (self._mult_weighted(self._scored_terms(a_present, fk),
                                       a_mult)
                   .groupBy("doc_id")
                   .agg(F.sum(F.col("score") * F.col("_w")).alias("score"),
                        F.count("*").alias("_m")))
            if a_mode == "all":
                agg = agg.where(F.col("_m") == len(a_present))
            return agg.select("doc_id",
                              (F.col("score") * q.boost).alias("score"))
        scored = self._scored_terms(a_present + b_present, fk)
        in_a = F.col("term").isin(a_present)
        in_b = F.col("term").isin(b_present)
        scored = self._mult_weighted(scored, a_mult) \
            .withColumnRenamed("_w", "_wa")
        scored = self._mult_weighted(scored, b_mult) \
            .withColumnRenamed("_w", "_wb")
        agg = scored.groupBy("doc_id").agg(
            F.sum(F.when(in_a, F.col("score") * F.col("_wa"))).alias("_sa"),
            F.sum(F.when(in_a, 1).otherwise(0)).alias("_ma"),
            F.sum(F.when(in_b, F.col("score") * F.col("_wb"))).alias("_sb"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("_mb"),
        )
        a_ok = (F.col("_ma") == len(a_present)) if a_mode == "all" \
            else (F.col("_ma") >= 1)
        b_hit = (F.col("_mb") == len(b_present)) if b_mode == "all" \
            else (F.col("_mb") >= 1)
        if isinstance(q, Q.AndNot):
            cond, score = a_ok & ~b_hit, F.col("_sa")
        elif isinstance(q, Q.Require):
            cond, score = a_ok & b_hit, F.col("_sa")
        else:  # AndMaybe
            cond = a_ok
            score = F.col("_sa") + F.when(b_hit, F.col("_sb")).otherwise(0.0)
        return agg.where(cond).select(
            "doc_id", (score * q.boost).alias("score"))

    def _eval_andnot(self, q: Q.AndNot) -> DataFrame:
        fast = self._eval_pair_batched(q)
        if fast is not None:
            return fast
        a = self._eval(q.a)
        b = self._eval(q.b).select("doc_id")
        out = a.join(b, "doc_id", "left_anti")
        return out.select("doc_id", (F.col("score") * q.boost).alias("score"))

    def _eval_andmaybe(self, q: Q.AndMaybe) -> DataFrame:
        fast = self._eval_pair_batched(q)
        if fast is not None:
            return fast
        a = self._eval(q.a)
        b = self._eval(q.b).withColumnRenamed("score", "_bs")
        out = a.join(b, "doc_id", "left")
        score = (F.col("score") + F.coalesce(F.col("_bs"), F.lit(0.0))) * q.boost
        return out.select("doc_id", score.alias("score"))

    def _eval_require(self, q: Q.Require) -> DataFrame:
        fast = self._eval_pair_batched(q)
        if fast is not None:
            return fast
        a = self._eval(q.a)
        b = self._eval(q.b).select("doc_id")
        out = a.join(b, "doc_id", "left_semi")
        return out.select("doc_id", (F.col("score") * q.boost).alias("score"))

    def _eval_otherwise(self, q: Q.Otherwise) -> DataFrame:
        # materialize a's plan once (localCheckpoint, same device as
        # _bucketed_range_join) so the existence probe below doesn't
        # re-execute the whole a subtree when the caller collects
        a = self._eval(q.a).localCheckpoint(eager=False)
        # cheap existence probe (driver-side if/else, compound.py ≈L750) —
        # through the deletion overlay, else a side whose every match is
        # soft-deleted wins and yields an empty result
        if self.ix.not_deleted(a).limit(1).count() > 0:
            out = a
        else:
            out = self._eval(q.b)
        if q.boost != 1.0:
            out = out.withColumn("score", F.col("score") * q.boost)
        return out

    def _eval_weighted(self, q: Q.Weighted) -> DataFrame:
        """WeightingQuery (``wrappers.py ≈L160``): swap the scoring model
        for the subtree.  Score expressions are CONSTRUCTED during _eval
        (the returned DataFrame is lazy but its columns are fixed), so a
        scoped swap of self.weighting is sound."""
        saved = self.weighting
        self.weighting = q.weighting if q.weighting is not None else saved
        try:
            child = self._eval(q.child)
        finally:
            self.weighting = saved
        if q.boost != 1.0:
            child = child.select(
                "doc_id", (F.col("score") * q.boost).alias("score"))
        return child

    def _eval_constant(self, q: Q.Constant) -> DataFrame:
        child = self._eval(q.child).select("doc_id")
        return child.select(
            "doc_id", (F.lit(float(q.score)) * q.boost).alias("score"))

    def _eval_every(self, q: Q.Every) -> DataFrame:
        return self.ix.all_doc_ids().select(
            "doc_id", (F.lit(1.0) * q.boost).alias("score"))

    def _eval_filter(self, q: Q.Filter) -> DataFrame:
        return (
            self.ix.docs.where(F.expr(q.predicate))
            .select("doc_id", (F.lit(1.0) * q.boost).alias("score"))
        )

    def _eval_daterange(self, q: Q.DateRange) -> DataFrame:
        """Native timestamp predicate — pushes to the parquet scan (row-group
        min/max + partition pruning), the 100 TB replacement for upstream's
        tiered DATETIME terms.

        A column the index does not store matches NOTHING, like upstream's
        unknown-field queries (``query.Term`` on an unindexed field), rather
        than surfacing an AnalysisException from the docs scan."""
        if q.column not in self.ix.docs.columns:
            return self._empty()
        c = F.col(q.column)

        def ts(v):
            if isinstance(v, (int, float)):
                # keep fractional epoch seconds — int() would shift an
                # exclusive bound by up to a second
                return F.timestamp_seconds(F.lit(v))
            return F.lit(str(v)).cast("timestamp")

        pred = F.lit(True)
        if q.lo is not None:
            pred = pred & (c >= ts(q.lo) if q.incl_lo else c > ts(q.lo))
        if q.hi is not None:
            pred = pred & (c <= ts(q.hi) if q.incl_hi else c < ts(q.hi))
        return self.ix.docs.where(pred).select(
            "doc_id", (F.lit(1.0) * q.boost).alias("score"))

    def _eval_numericrange(self, q: Q.NumericRange) -> DataFrame:
        if q.column not in self.ix.docs.columns:
            return self._empty()  # unknown stored column matches nothing
        c = F.col(q.column)
        pred = F.lit(True)
        if q.lo is not None:
            pred = pred & (c >= q.lo if q.incl_lo else c > q.lo)
        if q.hi is not None:
            pred = pred & (c <= q.hi if q.incl_hi else c < q.hi)
        return self.ix.docs.where(pred).select(
            "doc_id", (F.lit(1.0) * q.boost).alias("score"))

    # -- Sequence: ordered proximity of term-set slots -------------------
    def _slot_terms(self, c: Q.Query) -> list[str] | None:
        """Term texts a slot can match (post-expansion), or None if the
        subquery isn't positional-capable."""
        c = self._expand(c)
        if isinstance(c, Q.Term):
            return [c.text]
        if isinstance(c, Q.Or) and all(isinstance(k, Q.Term) for k in c.children):
            return [k.text for k in c.children]
        return None

    def _eval_sequence(self, q: Q.Sequence) -> DataFrame:
        # positions are field-local: every slot must target the same field.
        # Derive the field from the slots' TERM pairs — expanded multiterm
        # slots (Or-of-Terms) have no fieldname attribute of their own, but
        # their Terms carry it
        fks = {self._fkey(f) for c in q.children
               for f, _ in c.field_terms()} or {None}
        if len(fks) > 1:
            raise ValueError("Sequence slots must share one field")
        fk = next(iter(fks))
        ixf = self._ixf(fk)
        slots = []
        # per-term score weight = Σ over slots containing the term of the
        # slot child's boost (a term in two slots scores once per slot,
        # like compound dup-expansion); Or slots with minmatch > 1 gate the
        # doc match set on the child's own semantics
        wmap: dict[str, float] = {}
        gates: list[Q.Query] = []
        for c in q.children:
            ce = self._expand(c)
            ts = self._slot_terms(ce)
            if ts is None:
                raise ValueError(f"Sequence slot not positional: {c!r}")
            st = ixf.stats_for_terms(ts)
            present = [t for t in ts if t in st]
            if not present:
                return self._empty()
            slots.append(present)
            cb = float(getattr(ce, "boost", 1.0))
            for t in present:
                wmap[t] = wmap.get(t, 0.0) + cb
            if isinstance(ce, Q.Or) and getattr(ce, "minmatch", 1) > 1:
                gates.append(ce)
        all_terms = sorted(wmap)
        self._stats.update(
            {(fk, t): v for t, v in ixf.stats_for_terms(all_terms).items()})
        # two/three single-term slots at slop 1 with no gates/boosts have
        # exactly Phrase's match set and terms scoring — route through the
        # adjacent pair/trigram accelerator when one is attached (saves
        # BOTH decode scans this plan would otherwise run)
        if (q.slop == 1 and len(slots) in (2, 3) and not gates
                and all(len(s) == 1 for s in slots)
                and all(w == 1.0 for w in wmap.values())):
            words = [s[0] for s in slots]
            paired = self._eval_phrase_paired(
                Q.Phrase(words, 1, analyzed=True),
                words, sorted(set(words)), fk)
            if paired is not None:
                if q.boost != 1.0:
                    paired = paired.withColumn(
                        "score", F.col("score") * q.boost)
                return paired
        # same gate cascade as Phrase: rare-slot first, else the pair chain
        # (all-single-term slots at slop 1 only — a multiterm slot's pairs
        # would be the cross product of its terms)
        cand = self._phrase_candidates(slots, fk)
        if cand is None and q.slop == 1 and all(len(s) == 1 for s in slots):
            cand = self._pair_candidates([s[0] for s in slots], fk)
            if cand is not None and len(cand) == 0:
                return self._empty()
        pos = ixf.postings(
            all_terms, with_positions=True,
            candidate_ids=cand).select(
            "term", "doc_id", "positions")
        # ONE groupBy(doc_id): every slot's positions as a conditional
        # aggregate over the same decoded scan (see _slot_agg) — empty
        # array ⇒ the slot has no term in the doc ⇒ not a candidate
        joined = (pos.groupBy("doc_id").agg(*self._slot_agg(slots))
                  .where(reduce(lambda a, b: a & b,
                                [F.size(F.col(f"_p{i}")) > 0
                                 for i in range(len(slots))])))
        cur = self._fold_expr(len(slots), q.slop)
        matched = joined.where(F.size(cur) > 0).select("doc_id")
        for g in gates:
            matched = matched.join(
                self._eval(g).select("doc_id"), "doc_id", "left_semi")
        scored_src = self._scored_terms(all_terms, fk)
        if any(w != 1.0 for w in wmap.values()):
            wm = F.create_map(*[x for t, w in wmap.items()
                                for x in (F.lit(t), F.lit(float(w)))])
            scored_src = scored_src.withColumn(
                "score",
                F.col("score") * F.coalesce(wm[F.col("term")], F.lit(1.0)))
        scored = (
            scored_src
            .groupBy("doc_id").agg(F.sum("score").alias("score"))
            .join(matched, "doc_id", "left_semi")
        )
        if q.boost != 1.0:
            scored = scored.withColumn("score", F.col("score") * q.boost)
        return scored

    @staticmethod
    def _adjacency_fold(slot_dfs, n: int, slop: int):
        """Positional join kernel (span paths): df-ordered reduce-join of
        per-slot ``(doc_id, _p{i})`` position frames, then the fold —
        returns (joined frame, end-position array column).  The phrase /
        sequence hot paths use :meth:`_slot_agg` instead (one shuffle)."""
        ordered = sorted(slot_dfs, key=lambda t: t[0])
        joined = reduce(lambda a, b: a.join(b, "doc_id", "inner"),
                        [d for _, _, d in ordered])
        return joined, Evaluator._fold_expr(n, slop)

    @staticmethod
    def _fold_expr(n: int, slop: int):
        """The adjacency fold C_{i+1} = (C_i ⊕ [1..slop]) ∩ P_{i+1} over
        per-slot position columns ``_p0.._p{n-1}`` — pure JVM array exprs."""
        cur = F.col("_p0")
        for i in range(1, n):
            if slop <= 1:
                cand = F.transform(cur, lambda c: c + 1)
            else:
                cand = F.flatten(
                    F.transform(cur, lambda c: F.sequence(c + 1, c + slop)))
            cur = F.array_intersect(cand, F.col(f"_p{i}"))
        return cur

    @staticmethod
    def _slot_agg(slot_terms: list[list[str]]):
        """Per-slot position aggregates for ONE ``groupBy(doc_id)`` over the
        flat positions frame: slot i's positions = sorted union of its
        terms' position lists in the doc (empty array ⇒ slot unmatched).

        This replaces the per-slot frame + reduce-join plan: every slot is
        a conditional aggregate over the SAME decoded scan, so a k-slot
        phrase costs one shuffle of each posting row once — not a k-way
        join shuffling the fat position arrays once per side (measured 5M
        docs, 2 hot terms: the join plan moved each side's arrays through
        the exchange separately; this halves the shuffled volume and drops
        the join entirely)."""
        return [
            F.array_sort(F.flatten(F.collect_list(
                F.when(F.col("term").isin(ts), F.col("positions"))
            ))).alias(f"_p{i}")
            for i, ts in enumerate(slot_terms)
        ]

    def _phrase_candidates(self, uniq, fk) -> list[int] | None:
        """Rare-slot candidate pruning gate for positional queries.

        ``uniq`` is either a word list (Phrase) or a list of per-slot term
        lists (Sequence).  Only docs matching EVERY slot can match, so the
        rarest slot's doc set is a superset of the matches.  When that set
        is small (df sum <= PHRASE_PRUNE_MAX_DF) and meaningfully smaller
        than the hottest slot's (PHRASE_PRUNE_RATIO), collect it and return
        it for a broadcast membership filter INSIDE the Arrow block decoder
        — the hot slots' fat position rows then never materialize, never
        cross Python->JVM, and never hit the groupBy exchange.  Returns
        None (no pruning) otherwise; stats are already primed, so the gate
        itself costs no extra job beyond the rare-slot id collect."""
        from whoosh_spark.config import PHRASE_PRUNE_MAX_DF, PHRASE_PRUNE_RATIO

        slots = [[w] for w in uniq] if uniq and isinstance(uniq[0], str) \
            else uniq
        if len(slots) < 2:
            return None
        # a slot's candidate set is the union of its terms' doc sets; its
        # size is bounded by the df sum
        totals = [sum(self._stats[(fk, t)]["df"] for t in s) for s in slots]
        i = min(range(len(slots)), key=totals.__getitem__)
        if (totals[i] > PHRASE_PRUNE_MAX_DF
                or totals[i] * PHRASE_PRUNE_RATIO > max(totals)):
            return None
        cand = self._ixf(fk).postings(slots[i]).select("doc_id")
        if len(slots[i]) > 1:
            cand = cand.distinct()
        return [r[0] for r in cand.collect()]

    def _pair_candidates(self, words: list[str], fk) -> list[int] | None:
        """Adjacent-pair candidate gate for k-word slop-1 phrases (the WZB
        combined-index chaining step, ACM TOIS 2004 §4: resolve long
        phrases by intersecting nextword entries).

        A slop-1 match of ``w0 .. w(k-1)`` puts every adjacent pair
        ``"wi wi+1"`` in the doc, so each pair's doc set is a SUPERSET of
        the phrase's — and ``df(pair) <= min(df(a), df(b))``, so the
        rarest pair is at least as selective as the rarest constituent
        (strictly more for hot-hot phrases, where the rare-slot gate can't
        fire by design).  Returns the rarest pair's doc ids for a broadcast
        membership filter inside the Arrow decoder; the positional plan
        then verifies exactly over that set.  ``[]`` means a pair is absent
        from the whole corpus — exact proof of zero matches at slop 1.
        On a hot-only segment (pair_min_df > 0) only pairs whose BOTH
        constituents are hot were indexed, so cold-constituent pairs are
        skipped: their absence proves nothing, and only indexed pairs may
        serve as candidates or absence proofs.  Returns None when no pair
        segment is attached, no adjacent pair is indexable, or the
        estimated decode savings don't cover the gate's own (roughly
        fixed) cost — the saved-posting-rows payoff model, constants and
        the 1M/5M/10M measurements behind them in config.py PAIR_GATE_*.
        Non-empty
        candidate sets return as a sorted numpy int64 array (Arrow-collected
        — no per-row Python)."""
        import numpy as np

        ixf = self._ixf(fk)
        pairs_ix = getattr(ixf, "pairs", None)
        if pairs_ix is None or len(words) < 2:
            return None
        thr = getattr(ixf, "pair_min_df", 0)

        def _hot(w: str) -> bool:
            return not thr or self._stats[(fk, w)]["df"] >= thr

        pair_terms = sorted({f"{a} {b}" for a, b in zip(words, words[1:])
                             if _hot(a) and _hot(b)})
        if not pair_terms:
            return None
        pstats = pairs_ix.stats_for_terms(pair_terms)
        if any(p not in pstats for p in pair_terms):
            return []
        by_df = sorted(pair_terms, key=lambda p: (int(pstats[p]["df"]), p))
        rarest_df = int(pstats[by_df[0]]["df"])
        n_docs, _ = ixf.global_stats()
        dfs = [self._stats[(fk, w)]["df"] for w in set(words)]
        # payoff model (round 5; config.py PAIR_GATE_* has the
        # measurements behind every constant): the probe scan+collect is
        # NOT free — it scales with df(pair) and costs seconds per million
        # rows on cold storage — so the gate fires only for a genuinely
        # selective rarest pair, where the probe is sub-second and the
        # decode savings are unambiguous.  A second-pair intersection
        # probe was measured at +16-47 s for zero candidate shrink and
        # was removed.
        if not pair_gate_fires(rarest_df, dfs, n_docs):
            return None
        pdf = pairs_ix.postings([by_df[0]]).select("doc_id").toPandas()
        return np.sort(pdf["doc_id"].to_numpy(dtype=np.int64))

    def _eval_phrase_paired(self, q: Q.Phrase, words, uniq, fk):
        """Nextword-index fast path for two-word (pair segment) and
        three-word (trigram segment) slop-1 Phrases (Williams, Zobel &
        Bahle, ACM TOIS 2004): the adjacent-k-gram sub-index
        (``InvertedIndex.pairs`` / ``.trigrams``) stores one frequency
        posting per doc per "a b"/"a b c" adjacency, so the phrase MATCH
        SET — and for scoring='freq' the phrase tf — comes from a single
        cheap term lookup.  The constituents' fat position streams are
        never decoded, never cross Python→JVM, and the blocks scan never
        reads the positions column; that decode is the dominant query cost
        for all-hot phrases, where the rare-slot candidate gate
        (``_phrase_candidates``) cannot fire by design — and for trigrams
        it is exactly the adversarial case the chained pair gate declines
        on payoff grounds.

        Returns None when the path doesn't apply (no matching segment
        attached, word count not 2/3, slop>1, a constituent below the hot
        threshold) — the caller falls through to the positional plan.
        Results are rank-identical either way (pinned by tests)."""
        ixf = self._ixf(fk)
        if q.slop != 1:
            return None
        if len(words) == 2:
            pairs_ix = getattr(ixf, "pairs", None)
        elif len(words) == 3:
            pairs_ix = getattr(ixf, "trigrams", None)
        else:
            pairs_ix = None
        if pairs_ix is None:
            return None
        # hot-only segment (pair_min_df > 0): k-grams with a below-
        # threshold constituent were never indexed — those phrases take the
        # positional plan, where the rare-slot gate usually fires anyway
        thr = getattr(ixf, "pair_min_df", 0)
        if len(words) == 3 and thr <= 0:
            # trigram segments are ALWAYS hot-gated; thr==0 here means an
            # inconsistent attach — decline rather than claim absence
            return None
        if thr and min(self._stats[(fk, w)]["df"] for w in uniq) < thr:
            return None
        from whoosh_spark.config import PHRASE_PRUNE_MAX_DF

        pair = " ".join(words)
        pstats = pairs_ix.stats_for_terms([pair])
        if pair not in pstats:
            return self._empty()  # no adjacency anywhere in the corpus
        pair_df = int(pstats[pair]["df"])
        if getattr(q, "scoring", "terms") == "freq":
            # mirror of the positional freq plan: tf = adjacency count
            # (the pair posting's tf), idf from the phrase's own df, dl
            # from the MAIN field (the pair stream's dl is meaningless)
            from whoosh_spark.execution.score import bm25_component

            model = self._weighting_for(fk)
            rev = model.startswith("reverse:")
            if rev:
                model = model[len("reverse:"):]
            if model not in ("bm25", "tfidf", "frequency"):
                raise ValueError(
                    f"Phrase(scoring='freq') supports bm25/tfidf/frequency "
                    f"weighting, not {model!r}")
            n, avgdl = self._fglobal[fk]
            b, fboost = self._bb(fk)
            # same operation order as the in-plan F.log variant: both are
            # IEEE-double ln(N/(df+1))+1
            ptf = pairs_ix.postings([pair]).select(
                "doc_id", F.col("tf").cast("int").alias("_ptf"))
            idf = F.log(F.lit(float(n))
                        / (F.lit(float(pair_df)) + F.lit(1.0))) + F.lit(1.0)
            if model == "bm25":
                comp = (bm25_component(F.col("_ptf"), F.col("dl"), avgdl)
                        if b is None else
                        bm25_component(F.col("_ptf"), F.col("dl"), avgdl,
                                       b=float(b)))
                expr = idf * comp
            elif model == "tfidf":
                expr = F.col("_ptf").cast("double") * idf
            else:
                expr = F.col("_ptf").cast("double")
            if rev:
                expr = F.lit(0.0) - expr
            return (ptf.join(ixf.doc_lengths.select("doc_id", "dl"), "doc_id")
                    .select("doc_id", (expr * float(fboost)).alias("score")))
        # default scoring: sum of constituent term BM25 over the pair-
        # certified docs.  Small match set → broadcast it INTO the decoder
        # (same machinery as the rare-slot gate); large → frequency-decode
        # the constituents and equi-join the pair doc set (still no
        # positions anywhere in the plan).
        pair_docs = pairs_ix.postings([pair]).select("doc_id")
        if pair_df <= PHRASE_PRUNE_MAX_DF:
            cand = [r[0] for r in pair_docs.collect()]
            src = self._scored_terms(uniq, fk,
                                     posts=ixf.postings(uniq,
                                                        candidate_ids=cand))
            return (src.groupBy("doc_id")
                    .agg(F.sum("score").alias("score")))
        src = self._scored_terms(uniq, fk)
        return (src.groupBy("doc_id").agg(F.sum("score").alias("score"))
                .join(pair_docs, "doc_id"))

    # -- Phrase: positional join (SURVEY.md §2.4 Phrase row) -------------
    def _eval_phrase(self, q: Q.Phrase) -> DataFrame:
        words = list(q.words)
        uniq = sorted(set(words))
        fk = self._fkey(q.fieldname)
        if any((fk, w) not in self._stats for w in uniq):
            return self._empty()
        paired = self._eval_phrase_paired(q, words, uniq, fk)
        if paired is not None:
            if q.boost != 1.0:
                paired = paired.withColumn("score", F.col("score") * q.boost)
            return paired
        # candidate gate cascade: rare-slot first (when it fires its set is
        # tiny and costs one small collect), else the adjacent-pair chain
        # (k-word slop-1 — covers the all-hot case the rare-slot gate
        # declines by design, and any case its 4x ratio condition rejects)
        cand = self._phrase_candidates(uniq, fk)
        if cand is None and q.slop == 1:
            cand = self._pair_candidates(words, fk)
            if cand is not None and len(cand) == 0:
                return self._empty()  # an adjacency is absent corpus-wide
        # ONE positions decode feeds BOTH the adjacency fold and the BM25
        # scoring pass; one groupBy(doc_id) computes every slot's positions
        # AND the doc score (no per-slot join chain, no second decode scan)
        pos = self._ixf(fk).postings(
            uniq, with_positions=True, candidate_ids=cand)
        slot_aggs = self._slot_agg([[w] for w in words])
        cur = self._fold_expr(len(words), q.slop)
        slot_present = reduce(
            lambda a, b: a & b,
            [F.size(F.col(f"_p{i}")) > 0 for i in range(len(words))])
        if getattr(q, "scoring", "terms") == "freq":
            joined = (pos.select("term", "doc_id", "positions")
                      .groupBy("doc_id").agg(*slot_aggs)
                      .where(slot_present))
            # phrase-frequency scoring: tf = number of phrase occurrences
            # (distinct end positions of the adjacency fold), idf from the
            # phrase's OWN doc frequency — computed in-plan as a broadcast
            # one-row aggregate, no driver round-trip.  Honors the model
            # switch for models definable on (tf, dl, idf); DFR models need
            # a phrase collection frequency the index doesn't store.
            from whoosh_spark.execution.score import bm25_component

            model = self._weighting_for(fk)
            rev = model.startswith("reverse:")
            if rev:
                model = model[len("reverse:"):]
            if model not in ("bm25", "tfidf", "frequency"):
                raise ValueError(
                    f"Phrase(scoring='freq') supports bm25/tfidf/frequency "
                    f"weighting, not {model!r}")
            n, avgdl = self._fglobal[fk]
            ptf = (joined.select("doc_id", F.size(cur).alias("_ptf"))
                   .where(F.col("_ptf") > 0))
            pdf = ptf.agg(F.count("*").cast("long").alias("_pdf"))
            b, fboost = self._bb(fk)
            idf = F.log(F.lit(float(n))
                        / (F.col("_pdf").cast("double") + F.lit(1.0))) + F.lit(1.0)
            if model == "bm25":
                comp = (bm25_component(F.col("_ptf"), F.col("dl"), avgdl)
                        if b is None else
                        bm25_component(F.col("_ptf"), F.col("dl"), avgdl,
                                       b=float(b)))
                expr = idf * comp
            elif model == "tfidf":
                expr = F.col("_ptf").cast("double") * idf
            else:  # frequency
                expr = F.col("_ptf").cast("double")
            if rev:
                expr = F.lit(0.0) - expr
            scored = (
                ptf.join(self._ixf(fk).doc_lengths.select("doc_id", "dl"),
                         "doc_id")
                .crossJoin(F.broadcast(pdf))
                .select("doc_id", (expr * float(fboost)).alias("score"))
            )
        else:
            # score = sum of constituent term BM25 over matching docs
            # (And semantics) — scored off the SAME decoded rows, inside
            # the same aggregate
            src = self._scored_terms(uniq, fk, posts=pos, keep=("positions",))
            scored = (
                src.groupBy("doc_id")
                .agg(F.sum("score").alias("score"), *slot_aggs)
                .where(slot_present)
                .where(F.size(cur) > 0)
                .select("doc_id", "score")
            )
        if q.boost != 1.0:
            scored = scored.withColumn("score", F.col("score") * q.boost)
        return scored

    # ------------------------------------------------------------------
    # Span queries (spans.py ≈L100-600): each sub-query → (doc_id, spans) where
    # spans = array<struct<s,e>> of token intervals; combinators are JVM
    # higher-order array functions (filter/exists/transform) — no Python.
    # ------------------------------------------------------------------
    def _unit_spans(self, terms: list[str], fk,
                    cand=None) -> tuple[DataFrame, list[str]] | None:
        ixf = self._ixf(fk)
        st = ixf.stats_for_terms(terms)
        present = [t for t in terms if t in st]
        if not present:
            return None
        self._stats.update({(fk, t): v for t, v in st.items()})
        pos = ixf.postings(present, with_positions=True, candidate_ids=cand)
        df = (
            pos.groupBy("doc_id")
            .agg(F.array_sort(F.flatten(F.collect_list("positions"))).alias("_pp"))
            .select(
                "doc_id",
                F.transform("_pp", lambda p: F.struct(p.alias("s"), p.alias("e"))).alias("spans"),
            )
        )
        return df, present

    def _phrase_spans(self, words: list[str], fk,
                      cand=None) -> tuple[DataFrame, list[str]] | None:
        """slop=1 phrase → spans (end−k+1, end); start is derivable only at
        slop=1 (each step advances exactly one position)."""
        uniq = sorted(set(words))
        ixf = self._ixf(fk)
        st = ixf.stats_for_terms(uniq)
        if any(w not in st for w in uniq):
            return None
        self._stats.update({(fk, t): v for t, v in st.items()})
        if cand is None:
            cand = self._phrase_candidates(uniq, fk)
        pos = ixf.postings(uniq, with_positions=True,
                           candidate_ids=cand).select(
            "term", "doc_id", "positions")
        slot_dfs = []
        for i, w in enumerate(words):
            slot_dfs.append(
                (st[w]["df"], i,
                 pos.where(F.col("term") == w).select("doc_id", F.col("positions").alias(f"_p{i}")))
            )
        joined, cur = self._adjacency_fold(slot_dfs, len(words), 1)
        k = len(words)
        spans = F.transform(cur, lambda e: F.struct((e - (k - 1)).alias("s"), e.alias("e")))
        out = joined.select("doc_id", spans.alias("spans")).where(F.size("spans") > 0)
        return out, uniq

    @staticmethod
    def _span_leaf_terms(q: Q.Query) -> list[str]:
        """Every leaf term under a span-capable subtree.  ANY span match
        requires at least one leaf term present (SpanNot needs its ``a``,
        SpanOr one child), so docs-containing-some-leaf-term is a superset
        of the subtree's match docs — usable as a pruning candidate set."""
        if isinstance(q, Q.Term):
            return [q.text]
        if isinstance(q, Q.Or):
            return [t for c in q.children
                    for t in Evaluator._span_leaf_terms(c)]
        if isinstance(q, Q.Phrase):
            return list(q.words)
        if isinstance(q, Q.Sequence):
            return [t for c in q.children
                    for t in Evaluator._span_leaf_terms(c)]
        if isinstance(q, Q.SpanFirst):
            return Evaluator._span_leaf_terms(q.child)
        if isinstance(q, Q.SpanOr):
            return [t for c in q.children
                    for t in Evaluator._span_leaf_terms(c)]
        if isinstance(q, (Q.SpanNear, Q.SpanNot, Q.SpanContains,
                          Q.SpanBefore, Q.SpanCondition)):
            return (Evaluator._span_leaf_terms(q.a)
                    + Evaluator._span_leaf_terms(q.b))
        return []

    def _span_conj_candidates(self, q, fk) -> list[int] | None:
        """Candidate doc set for a conjunctive span combinator: both sides
        must match the doc (SpanNot: side ``a`` must), so the rarer side's
        leaf-term doc set prunes BOTH subtrees' position decodes.  Same
        cap/ratio gate as _phrase_candidates; None when pruning wouldn't
        pay."""
        from whoosh_spark.config import PHRASE_PRUNE_MAX_DF, PHRASE_PRUNE_RATIO

        ixf = self._ixf(fk)

        def side_df(terms):
            st = ixf.stats_for_terms(sorted(set(terms)))
            self._stats.update({(fk, t): v for t, v in st.items()})
            return sum(v["df"] for v in st.values()), \
                [t for t in st]
        ta, tb = self._span_leaf_terms(q.a), self._span_leaf_terms(q.b)
        if not ta or not tb:
            return None
        (dfa, pa), (dfb, pb) = side_df(ta), side_df(tb)
        sides = [(dfa, pa)]
        if not isinstance(q, Q.SpanNot):  # b is not required by SpanNot
            sides.append((dfb, pb))
        sides = [s for s in sides if s[0] > 0 and s[1]]
        if not sides:
            return None
        low, terms = min(sides, key=lambda s: s[0])
        if (low > PHRASE_PRUNE_MAX_DF
                or low * PHRASE_PRUNE_RATIO > max(dfa, dfb)):
            return None
        cand = ixf.postings(terms).select("doc_id")
        if len(terms) > 1:
            cand = cand.distinct()
        return [r[0] for r in cand.collect()]

    def _spans_df(self, q: Q.Query, fk,
                  cand=None) -> tuple[DataFrame, list[str]] | None:
        """(doc_id, spans) frame + the terms that score this sub-tree, or
        None when a required leaf term is absent (empty result).

        ``cand``: candidate doc ids threaded down from an enclosing
        conjunctive combinator — every leaf decode is pruned to them inside
        the Arrow decoder (see _span_conj_candidates for soundness)."""
        if isinstance(q, Q.Term):
            return self._unit_spans([q.text], fk, cand)
        if isinstance(q, Q.Or) and all(isinstance(c, Q.Term) for c in q.children):
            return self._unit_spans([c.text for c in q.children], fk, cand)
        if isinstance(q, (Q.Phrase, Q.Sequence)):
            slop = q.slop
            if slop > 1:
                raise ValueError("span sub-queries require slop=1 phrases")
            words = list(q.words) if isinstance(q, Q.Phrase) else [
                t for c in q.children for t in (self._slot_terms(c) or [])]
            if isinstance(q, Q.Sequence):
                # sequence slots must be single-term for span start tracking
                for c in q.children:
                    ts = self._slot_terms(c)
                    if ts is None or len(ts) != 1:
                        raise ValueError("span Sequence slots must be single terms")
                words = [self._slot_terms(c)[0] for c in q.children]
            return self._phrase_spans(words, fk, cand)
        if isinstance(q, Q.SpanFirst):
            sub = self._spans_df(q.child, fk, cand)
            if sub is None:
                return None
            df, terms = sub
            kept = F.filter("spans", lambda sp: sp["e"] <= q.limit)
            return df.select("doc_id", kept.alias("spans")).where(F.size("spans") > 0), terms
        if isinstance(q, Q.SpanOr):
            subs = [self._spans_df(c, fk, cand) for c in q.children]
            subs = [s for s in subs if s is not None]
            if not subs:
                return None
            terms = sorted({t for _, ts in subs for t in ts})
            if len(subs) == 1:
                return subs[0][0], terms
            u = subs[0][0].select("doc_id", "spans")
            for df, _ in subs[1:]:
                u = u.unionByName(df.select("doc_id", "spans"))
            merged = (
                u.groupBy("doc_id")
                .agg(F.array_sort(F.flatten(F.collect_list("spans"))).alias("spans"))
            )
            return merged, terms
        if isinstance(q, (Q.SpanNear, Q.SpanNot, Q.SpanContains, Q.SpanBefore,
                          Q.SpanCondition)):
            if cand is None:
                cand = self._span_conj_candidates(q, fk)
            sa = self._spans_df(q.a, fk, cand)
            sb = self._spans_df(q.b, fk, cand)
            if sa is None:
                return None
            if sb is None:
                # b absent: SpanNot degenerates to a; the rest are empty
                return sa if isinstance(q, Q.SpanNot) else None
            (da, ta), (db, tb) = sa, sb
            da = da.withColumnRenamed("spans", "_sa")
            db = db.withColumnRenamed("spans", "_sb")
            if isinstance(q, Q.SpanNear):
                j = da.join(db, "doc_id", "inner")

                def near(sa_, sb_):
                    after = (sb_["s"] > sa_["e"]) & ((sb_["s"] - sa_["e"]) <= q.slop)
                    before = (sa_["s"] > sb_["e"]) & ((sa_["s"] - sb_["e"]) <= q.slop)
                    return after if q.ordered else (after | before)

                comb = F.flatten(F.transform(
                    "_sa",
                    lambda sa_: F.transform(
                        F.filter("_sb", lambda sb_: near(sa_, sb_)),
                        lambda sb_: F.struct(
                            F.least(sa_["s"], sb_["s"]).alias("s"),
                            F.greatest(sa_["e"], sb_["e"]).alias("e"))),
                ))
                out = j.select("doc_id", comb.alias("spans"))
                return out.where(F.size("spans") > 0), sorted(set(ta + tb))
            if isinstance(q, Q.SpanNot):
                j = da.join(db, "doc_id", "left")
                kept = F.when(F.col("_sb").isNull(), F.col("_sa")).otherwise(
                    F.filter("_sa", lambda sa_: ~F.exists(
                        "_sb", lambda sb_: (sa_["s"] <= sb_["e"]) & (sb_["s"] <= sa_["e"]))))
                out = j.select("doc_id", kept.alias("spans"))
                return out.where(F.size("spans") > 0), ta
            if isinstance(q, Q.SpanContains):
                j = da.join(db, "doc_id", "inner")
                kept = F.filter("_sa", lambda sa_: F.exists(
                    "_sb", lambda sb_: (sa_["s"] <= sb_["s"]) & (sb_["e"] <= sa_["e"])))
                out = j.select("doc_id", kept.alias("spans"))
                return out.where(F.size("spans") > 0), ta
            if isinstance(q, Q.SpanCondition):
                # doc-level gate: keep a's spans wholesale in docs where b
                # yields any span (a semi-join — b's positions never read)
                out = (da.join(db.select("doc_id"), "doc_id", "left_semi")
                       .select("doc_id", F.col("_sa").alias("spans")))
                return out.where(F.size("spans") > 0), ta
            # SpanBefore
            j = da.join(db, "doc_id", "inner")
            kept = F.filter("_sa", lambda sa_: F.exists(
                "_sb", lambda sb_: sa_["e"] < sb_["s"]))
            out = j.select("doc_id", kept.alias("spans"))
            return out.where(F.size("spans") > 0), ta
        raise ValueError(f"not span-capable: {q!r}")

    def _span_fk(self, q: Q.Query):
        fks = {self._fkey(f) for f, _ in q.field_terms()}
        if len(fks) > 1:
            raise ValueError("span query must target a single field")
        return next(iter(fks)) if fks else None

    def _eval_span_common(self, q) -> DataFrame:
        fk = self._span_fk(q)
        sub = self._spans_df(q, fk)
        if sub is None:
            return self._empty()
        df, terms = sub
        matched = df.select("doc_id")
        scored = (
            self._scored_terms(terms, fk)
            .groupBy("doc_id").agg(F.sum("score").alias("score"))
            .join(matched, "doc_id", "left_semi")
        )
        if q.boost != 1.0:
            scored = scored.withColumn("score", F.col("score") * q.boost)
        return scored

    _eval_spanfirst = _eval_span_common
    _eval_spannear = _eval_span_common
    _eval_spannot = _eval_span_common
    _eval_spancontains = _eval_span_common
    _eval_spanbefore = _eval_span_common
    _eval_spanor = _eval_span_common
    _eval_spancondition = _eval_span_common

    # ------------------------------------------------------------------
    # Nested block-join (nested.py ≈L40/L150).  Blocks are doc-id runs from
    # a parent (inclusive) to the next parent (exclusive).  Parent ranges
    # [p, next_p) come from a window over the PARENT set only (small relative
    # to the corpus); the child→parent assignment is a range join Catalyst
    # broadcasts when the parent set is small — at larger parent cardinality,
    # bucket both sides on doc_id>>16 and range-join within buckets.
    # ------------------------------------------------------------------
    def _parent_ranges(self, parents_q: Q.Query, bucket_bits: int = 16) -> DataFrame:
        """(parent doc_id, next parent doc_id) — successor computed with a
        PARTITIONED window (doc-id buckets) plus a per-bucket boundary fill,
        not a global Window.orderBy whose single-partition sort serializes
        at scale.  The boundary frame is one row per non-empty bucket —
        broadcast-sized regardless of parent count."""
        from pyspark.sql.window import Window

        parents = self._eval(parents_q).select("doc_id")
        b = parents.withColumn("_bkt", F.shiftright("doc_id", bucket_bits))
        w = Window.partitionBy("_bkt").orderBy("doc_id")
        within = b.withColumn("_next", F.lead("doc_id").over(w))
        # successor of each bucket's LAST parent = the next bucket's min;
        # chain via a lead over the (tiny) per-bucket min frame
        mins = (b.groupBy("_bkt").agg(F.min("doc_id").alias("_bmin"))
                .withColumn("_nextmin",
                            F.lead("_bmin").over(Window.orderBy("_bkt"))))
        return (within.join(F.broadcast(mins.select("_bkt", "_nextmin")),
                            "_bkt", "left")
                .select(F.col("doc_id").alias("_parent"),
                        F.coalesce(F.col("_next"),
                                   F.col("_nextmin")).alias("_next")))

    def _bucketed_range_join(self, kids: DataFrame, ranges: DataFrame,
                             how: str) -> DataFrame:
        """Equi-join child docs to their parent range via doc-id buckets:
        parents explode to the buckets their range spans (bucket width ≈
        the mean range span, so replication ≈ 2 rows per parent), children
        hash on their own bucket, and the range test runs as a post-filter.
        Compiles to a hash join keyed on bucket — NOT the
        BroadcastNestedLoopJoin a raw interval predicate produces, whose
        every-child-probes-every-parent work is quadratic at scale."""
        # localCheckpoint (eager) materializes the parents frame once — the
        # stats collect below would otherwise re-run the whole parents
        # subquery (window included) a second time inside the join lineage.
        # Unlike persist(), the checkpoint blocks are released by the
        # ContextCleaner when the frame goes out of scope, so repeated
        # nested queries don't accumulate pinned cache entries
        ranges = ranges.localCheckpoint(eager=True)
        stats = ranges.agg(
            F.count("*").alias("n"), F.min("_parent").alias("lo"),
            F.max("_parent").alias("hi_p")).collect()[0]
        if not stats["n"]:
            return None
        if self._max_doc is None:
            self._max_doc = int(
                self.ix.doc_lengths.agg(F.max("doc_id")).collect()[0][0] or 0)
        end = self._max_doc + 1
        span = max(1, end - int(stats["lo"]))
        k = max(0, (span // max(1, int(stats["n"]))).bit_length())
        filled = ranges.withColumn(
            "_next_f", F.coalesce(F.col("_next"), F.lit(end)))
        exploded = filled.withColumn(
            "_bucket",
            F.explode(F.sequence(F.shiftright(F.col("_parent"), k),
                                 F.shiftright(F.col("_next_f") - 1, k))))
        kb = kids.withColumn("_bucket", F.shiftright(F.col("doc_id"), k))
        cond = ((kb["_bucket"] == exploded["_bucket"])
                & (kb["doc_id"] > exploded["_parent"])
                & (kb["doc_id"] < exploded["_next_f"]))
        # no broadcast hint: the equi-key lets Catalyst/AQE pick broadcast
        # for small parent sets and a shuffled hash join for large ones —
        # forcing broadcast would OOM exactly the at-scale case this join
        # exists for
        return kb.join(exploded, cond, how)

    def _eval_nestedparent(self, q: Q.NestedParent) -> DataFrame:
        ranges = self._parent_ranges(q.parents)
        # soft-deleted children must not match/score parents (upstream
        # wraps child matchers in the deletion filter); evaluate()'s final
        # overlay only filters the returned PARENT ids
        kids = self.ix.not_deleted(
            self._eval(q.child)).withColumnRenamed("score", "_cs")
        joined = self._bucketed_range_join(kids, ranges, "inner")
        if joined is None:
            return self._empty()
        agg = {"sum": F.sum, "max": F.max, "avg": F.avg}[q.score_fn]
        return (
            joined.groupBy("_parent")
            .agg(agg("_cs").alias("score"))
            .select(F.col("_parent").alias("doc_id"),
                    (F.col("score") * q.boost).alias("score"))
        )

    def _eval_nestedchildren(self, q: Q.NestedChildren) -> DataFrame:
        # (no deletion filter needed here: the output ids ARE the child
        # ids, so evaluate()'s final overlay covers them)
        ranges = self._parent_ranges(q.parents)
        kids = self._eval(q.child)
        joined = self._bucketed_range_join(kids, ranges, "left_semi")
        if joined is None:
            return self._empty()
        return joined.select("doc_id", (F.col("score") * q.boost).alias("score"))
