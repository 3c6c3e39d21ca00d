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


class Evaluator:
    def __init__(self, ix: InvertedIndex, weighting: str = "bm25"):
        self.ix = ix
        # multi-field: fielded query nodes route to the right sub-index; the
        # default field keeps the single-field behavior bit-identical
        from whoosh_spark.multifield import MultiFieldIndex

        self.mf = ix if isinstance(ix, MultiFieldIndex) else None
        self.weighting = weighting  # bm25 | tfidf | frequency (§2.6)

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
        # per-field stats: {(fkey, term): {df, cf, max_weight}} + globals
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
        # soft-delete overlay: drop deleted docs from the match set (stats
        # still count them — Whoosh deleted-but-unpurged semantics)
        return self.ix.not_deleted(self._eval(q))

    def _empty(self) -> DataFrame:
        return self.ix.spark.createDataFrame([], "doc_id long, score double")

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
        for attr in ("children",):
            if hasattr(q, attr):
                kids = tuple(self._expand(c) for c in getattr(q, attr))
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
            return Q.NullQuery if c is Q.NullQuery else Q.Not(c, q.boost)
        if isinstance(q, Q.Constant):
            c = self._expand(q.child)
            return Q.NullQuery if c is Q.NullQuery else Q.Constant(c, q.score, q.boost)
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
        return self._n

    # -- node dispatch ---------------------------------------------------
    def _eval(self, q: Q.Query) -> DataFrame:
        if q is Q.NullQuery:
            return self._empty()
        name = type(q).__name__
        return getattr(self, f"_eval_{name.lower()}")(q)

    def _scored_terms(self, terms: list[str],
                      fieldname: str | None = None) -> DataFrame:
        """Decode + score postings for a set of exact terms in ONE scan of
        the given field (BM25F: per-field idf/avgdl/B + field boost)."""
        fk = self._fkey(fieldname)
        present = [t for t in set(terms) if (fk, t) in self._stats]
        if not present:
            return self.ix.spark.createDataFrame([], "term string, doc_id long, score double")
        n, avgdl = self._fglobal[fk]
        idf_map = {t: idf_value(n, self._stats[(fk, t)]["df"]) for t in present}
        posts = self._ixf(fieldname).postings(present)
        b, fboost = self._bb(fieldname)
        return score_postings(
            posts, idf_map, avgdl, weighting=self.weighting, b=b, mult=fboost
        ).select("term", "doc_id", "score")

    def _eval_term(self, q: Q.Term) -> DataFrame:
        df = self._scored_terms([q.text], q.fieldname).select("doc_id", "score")
        if q.boost != 1.0:
            df = df.withColumn("score", F.col("score") * q.boost)
        return df

    def _split_term_children(self, children):
        """({fkey: unique unboosted Term texts}, other children) — each
        field's Term batch is evaluable in ONE postings scan + aggregation
        instead of per-child scans and a join chain (Whoosh's
        ArrayUnionMatcher TAAT insight, ``src/whoosh/matching/combo.py ≈L40``
        — Spark is natively TAAT)."""
        batches: dict[str | None, list[str]] = {}
        others = []
        for c in children:
            if isinstance(c, Q.Term) and c.boost == 1.0:
                lst = batches.setdefault(self._fkey(c.fieldname), [])
                if c.text not in lst:
                    lst.append(c.text)
            else:
                others.append(c)
        return batches, others

    def _eval_and(self, q: Q.And) -> DataFrame:
        batches, others = self._split_term_children(q.children)
        dfs = []
        for fk, terms in batches.items():
            # one scan per field, doc-at-a-time conjunction within the field
            present = [t for t in terms if (fk, t) in self._stats]
            if len(present) < len(terms):
                return self._empty()  # a missing term empties the And
            batch = (
                self._scored_terms(present, fk)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"), F.count("*").alias("_m"))
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
        for fk, terms in batches.items():
            parts.append(self._scored_terms(terms, fk).select("doc_id", "score"))
        parts.extend(self._eval(c) for c in others)
        u = reduce(lambda a, b: a.unionByName(b), parts)
        agg = u.groupBy("doc_id").agg(
            F.sum("score").alias("score"), F.count("*").alias("_m"))
        if q.minmatch > 1:
            agg = agg.where(F.col("_m") >= q.minmatch)
        return agg.select("doc_id", (F.col("score") * q.boost).alias("score"))

    def _eval_dismax(self, q: Q.DisMax) -> DataFrame:
        dfs = [self._eval(c) for c in q.children]
        u = reduce(lambda a, b: a.unionByName(b), dfs)
        agg = u.groupBy("doc_id").agg(
            F.max("score").alias("_mx"), F.sum("score").alias("_sm"))
        score = (F.col("_mx") + q.tiebreak * (F.col("_sm") - F.col("_mx"))) * q.boost
        return agg.select("doc_id", score.alias("score"))

    def _eval_not(self, q: Q.Not) -> DataFrame:
        child = self._eval(q.child).select("doc_id")
        return (
            self.ix.all_doc_ids()
            .join(child, "doc_id", "left_anti")
            .select("doc_id", (F.lit(1.0) * q.boost).alias("score"))
        )

    def _eval_andnot(self, q: Q.AndNot) -> DataFrame:
        a = self._eval(q.a)
        b = self._eval(q.b).select("doc_id")
        out = a.join(b, "doc_id", "left_anti")
        return out.select("doc_id", (F.col("score") * q.boost).alias("score"))

    def _eval_andmaybe(self, q: Q.AndMaybe) -> DataFrame:
        a = self._eval(q.a)
        b = self._eval(q.b).withColumnRenamed("score", "_bs")
        out = a.join(b, "doc_id", "left")
        score = (F.col("score") + F.coalesce(F.col("_bs"), F.lit(0.0))) * q.boost
        return out.select("doc_id", score.alias("score"))

    def _eval_require(self, q: Q.Require) -> DataFrame:
        a = self._eval(q.a)
        b = self._eval(q.b).select("doc_id")
        out = a.join(b, "doc_id", "left_semi")
        return out.select("doc_id", (F.col("score") * q.boost).alias("score"))

    def _eval_otherwise(self, q: Q.Otherwise) -> DataFrame:
        a = self._eval(q.a)
        # cheap existence probe (driver-side if/else, compound.py ≈L750)
        if a.limit(1).count() > 0:
            out = a
        else:
            out = self._eval(q.b)
        if q.boost != 1.0:
            out = out.withColumn("score", F.col("score") * q.boost)
        return out

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

    def _eval_numericrange(self, q: Q.NumericRange) -> DataFrame:
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
        # positions are field-local: every slot must target the same field
        fks = {self._fkey(getattr(c, "fieldname", None)) for c in q.children}
        if len(fks) > 1:
            raise ValueError("Sequence slots must share one field")
        fk = next(iter(fks))
        ixf = self._ixf(fk)
        slots = []
        for c in q.children:
            ts = self._slot_terms(c)
            if ts is None:
                raise ValueError(f"Sequence slot not positional: {c!r}")
            st = ixf.stats_for_terms(ts)
            present = [t for t in ts if t in st]
            if not present:
                return self._empty()
            slots.append(present)
        all_terms = sorted({t for s in slots for t in s})
        self._stats.update(
            {(fk, t): v for t, v in ixf.stats_for_terms(all_terms).items()})
        pos = ixf.postings(all_terms, with_positions=True).select(
            "term", "doc_id", "positions")
        # per-slot: union of its terms' position lists per doc, sorted
        slot_dfs = []
        for i, terms in enumerate(slots):
            df_est = sum(self._stats.get((fk, t), {"df": 0})["df"] for t in terms)
            sdf = (
                pos.where(F.col("term").isin(terms))
                .groupBy("doc_id")
                .agg(F.array_sort(F.flatten(F.collect_list("positions"))).alias(f"_p{i}"))
            )
            slot_dfs.append((df_est, i, sdf))
        ordered = sorted(slot_dfs, key=lambda t: t[0])
        joined = reduce(lambda a, b: a.join(b, "doc_id", "inner"),
                        [d for _, _, d in ordered])
        cur = F.col("_p0")
        for i in range(1, len(slots)):
            if q.slop <= 1:
                cand = F.transform(cur, lambda c: c + 1)
            else:
                cand = F.flatten(F.transform(cur, lambda c: F.sequence(c + 1, c + q.slop)))
            cur = F.array_intersect(cand, F.col(f"_p{i}"))
        matched = joined.where(F.size(cur) > 0).select("doc_id")
        scored = (
            self._scored_terms(all_terms, fk)
            .groupBy("doc_id").agg(F.sum("score").alias("score"))
            .join(matched, "doc_id", "left_semi")
        )
        if q.boost != 1.0:
            scored = scored.withColumn("score", F.col("score") * q.boost)
        return scored

    # -- Phrase: positional join (SURVEY.md §2.4 Phrase row) -------------
    def _eval_phrase(self, q: Q.Phrase) -> DataFrame:
        words = list(q.words)
        uniq = sorted(set(words))
        fk = self._fkey(q.fieldname)
        if any((fk, w) not in self._stats for w in uniq):
            return self._empty()
        pos = self._ixf(fk).postings(uniq, with_positions=True).select(
            "term", "doc_id", "positions")
        # one (doc_id, p_i) frame per phrase slot, joined smallest-df-first
        slot_dfs = []
        for i, w in enumerate(words):
            slot_dfs.append(
                (self._stats[(fk, w)]["df"], i,
                 pos.where(F.col("term") == w).select("doc_id", F.col("positions").alias(f"_p{i}")))
            )
        ordered = sorted(slot_dfs, key=lambda t: t[0])
        joined = reduce(lambda a, b: a.join(b, "doc_id", "inner"), [d for _, _, d in ordered])
        # adjacency fold in phrase order: C_{i+1} = (C_i ⊕ [1..slop]) ∩ P_{i+1}
        cur = F.col("_p0")
        for i in range(1, len(words)):
            if q.slop <= 1:
                cand = F.transform(cur, lambda c: c + 1)
            else:
                cand = F.flatten(F.transform(cur, lambda c: F.sequence(c + 1, c + q.slop)))
            cur = F.array_intersect(cand, F.col(f"_p{i}"))
        matched = joined.where(F.size(cur) > 0).select("doc_id")
        # score = sum of constituent term BM25 over matching docs (And semantics)
        scored = (
            self._scored_terms(uniq, fk)
            .groupBy("doc_id").agg(F.sum("score").alias("score"))
            .join(matched, "doc_id", "left_semi")
        )
        if q.boost != 1.0:
            scored = scored.withColumn("score", F.col("score") * q.boost)
        return scored
