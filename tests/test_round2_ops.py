"""Round-2 operator units: span queries, nested block-join, DFR weightings,
Regex/Variations/DateRange — engine behavior on a hand-built corpus where
expected matches are enumerable by eye.

Reference semantics: ``src/whoosh/query/spans.py ≈L100-600``,
``query/nested.py ≈L40``, ``scoring.py::DFree/PL2 ≈L220-260`` (per SURVEY.md
provenance caveat — public whoosh 2.7.4 layout)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from whoosh_spark.analysis.morph import variations
from whoosh_spark.execution.evaluate import Evaluator
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q

DOCS = [
    # doc 0: "big data" adjacent, then "merge" right after ("big data merge")
    (0, "big data merge table scan", "en", "s0", 25),
    # doc 1: "big data" adjacent, no merge following
    (1, "big data table scan filter", "en", "s0", 27),
    # doc 2: big ... data with gap 2 (near, not phrase)
    (2, "big table data scan merge", "en", "s1", 25),
    # doc 3: data before big (reverse order)
    (3, "data table big scan window", "en", "s1", 26),
    # doc 4: data only, late position
    (4, "table scan window filter vector data", "en", "s2", 36),
    # doc 5: vector then small
    (5, "vector small table", "en", "s2", 18),
    # doc 6: small then vector
    (6, "small table vector", "en", "s2", 18),
    # docs 7..9 filler so nested blocks have children
    (7, "data query", "en", "s3", 10),
    (8, "query vector", "en", "s3", 12),
    (9, "table scan", "en", "s3", 10),
]


@pytest.fixture(scope="module")
def ix(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long")
    return InvertedIndex.build(docs)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


class TestSpans:
    def test_span_first(self, ix):
        ev = Evaluator(ix)
        # "data" at position <= 1 (docs 0,1 pos 1; docs 3,7 pos 0)
        assert _ids(ev.evaluate(Q.SpanFirst(Q.Term("data"), limit=1))) == [0, 1, 3, 7]

    def test_span_near_ordered(self, ix):
        ev = Evaluator(ix)
        # big then data with gap <= 2: docs 0,1 (gap1), 2 (gap2); NOT 3 (reverse)
        q = Q.SpanNear(Q.Term("big"), Q.Term("data"), slop=2, ordered=True)
        assert _ids(ev.evaluate(q)) == [0, 1, 2]

    def test_span_near_unordered(self, ix):
        ev = Evaluator(ix)
        q = Q.SpanNear(Q.Term("big"), Q.Term("data"), slop=2, ordered=False)
        assert _ids(ev.evaluate(q)) == [0, 1, 2, 3]

    def test_span_not(self, ix):
        ev = Evaluator(ix)
        # "big data" spans not overlapped by "data merge" spans → doc 1 only
        # (doc 0's span [0,1] overlaps b-span [1,2] at position 1)
        q = Q.SpanNot(Q.Phrase(["big", "data"]), Q.Phrase(["data", "merge"]))
        assert _ids(ev.evaluate(q)) == [1]

    def test_span_not_b_absent(self, ix):
        ev = Evaluator(ix)
        q = Q.SpanNot(Q.Phrase(["big", "data"]), Q.Phrase(["zzz", "qqq"]))
        assert _ids(ev.evaluate(q)) == [0, 1]

    def test_span_contains_nested_near(self, ix):
        ev = Evaluator(ix)
        # near-span (big..merge, gap<=4 ordered) containing a "data" position:
        # doc 0 span [0,2] contains data@1; doc 2 span [0,4] contains data@2
        q = Q.SpanContains(
            Q.SpanNear(Q.Term("big"), Q.Term("merge"), slop=4, ordered=True),
            Q.Term("data"))
        assert _ids(ev.evaluate(q)) == [0, 2]

    def test_span_before(self, ix):
        ev = Evaluator(ix)
        # vector strictly before small: doc 5 yes, doc 6 no
        q = Q.SpanBefore(Q.Term("vector"), Q.Term("small"))
        assert _ids(ev.evaluate(q)) == [5]

    def test_span_or_union(self, ix):
        ev = Evaluator(ix)
        # "big data" phrase spans (docs 0,1) ∪ "merge" unit spans (docs 0,2)
        q = Q.SpanOr([Q.Phrase(["big", "data"]), Q.Term("merge")])
        assert _ids(ev.evaluate(q)) == [0, 1, 2]

    def test_span_or_inside_combinator(self, ix):
        ev = Evaluator(ix)
        # SpanOr spans not overlapping any "table" position: doc 0 keeps
        # both spans ([0,1] phrase, [2,2] merge — table@3); doc 1 keeps
        # [0,1] (table@2); doc 2's merge@4 survives (table@1)
        q = Q.SpanNot(
            Q.SpanOr([Q.Phrase(["big", "data"]), Q.Term("merge")]),
            Q.Term("table"))
        assert _ids(ev.evaluate(q)) == [0, 1, 2]

    def test_span_condition(self, ix):
        ev = Evaluator(ix)
        # docs with a "big data" span where "merge" also matches: {0,1}∩{0,2}
        q = Q.SpanCondition(Q.Phrase(["big", "data"]), Q.Term("merge"))
        assert _ids(ev.evaluate(q)) == [0]
        # scored from the a side only: equals And(big, data) score on doc 0
        s = {r["doc_id"]: r["score"] for r in ev.evaluate(q).collect()}
        both = {r["doc_id"]: r["score"] for r in
                ev.evaluate(Q.And([Q.Term("big"), Q.Term("data")])).collect()}
        assert s[0] == pytest.approx(both[0], rel=1e-12)

    def test_span_condition_b_absent(self, ix):
        ev = Evaluator(ix)
        q = Q.SpanCondition(Q.Phrase(["big", "data"]), Q.Term("zzzq"))
        assert _ids(ev.evaluate(q)) == []

    def test_span_score_is_term_sum(self, ix):
        ev = Evaluator(ix)
        spans = {r["doc_id"]: r["score"] for r in
                 ev.evaluate(Q.SpanNear(Q.Term("big"), Q.Term("data"),
                                        slop=2, ordered=True)).collect()}
        both = {r["doc_id"]: r["score"] for r in
                ev.evaluate(Q.And([Q.Term("big"), Q.Term("data")])).collect()}
        for d, s in spans.items():
            assert s == pytest.approx(both[d], rel=1e-12)


class TestNested:
    def test_nested_parent_sum(self, ix):
        ev = Evaluator(ix)
        # parents = docs 0 and 5 → blocks (0,5) and (5,∞)
        q = Q.NestedParent(Q.Filter("doc_id % 5 = 0"), Q.Term("data"))
        rows = {r["doc_id"]: r["score"] for r in ev.evaluate(q).collect()}
        # children with data: 1,2,3,4 in block 0; 7 in block 5
        assert sorted(rows) == [0, 5]
        term = {r["doc_id"]: r["score"] for r in ev.evaluate(Q.Term("data")).collect()}
        assert rows[0] == pytest.approx(sum(term[d] for d in (1, 2, 3, 4)), rel=1e-12)
        assert rows[5] == pytest.approx(term[7], rel=1e-12)

    def test_nested_parent_max_avg(self, ix):
        ev = Evaluator(ix)
        term = {r["doc_id"]: r["score"] for r in ev.evaluate(Q.Term("data")).collect()}
        mx = {r["doc_id"]: r["score"] for r in ev.evaluate(
            Q.NestedParent(Q.Filter("doc_id % 5 = 0"), Q.Term("data"), "max")).collect()}
        assert mx[0] == pytest.approx(max(term[d] for d in (1, 2, 3, 4)), rel=1e-12)
        av = {r["doc_id"]: r["score"] for r in ev.evaluate(
            Q.NestedParent(Q.Filter("doc_id % 5 = 0"), Q.Term("data"), "avg")).collect()}
        assert av[0] == pytest.approx(
            sum(term[d] for d in (1, 2, 3, 4)) / 4.0, rel=1e-12)

    def test_nested_children(self, ix):
        ev = Evaluator(ix)
        # children of parents (docs 0,5) matching "vector": 4 (block 0) and
        # 6, 8 (block 5); doc 5 itself is a parent, not a child of its block
        q = Q.NestedChildren(Q.Filter("doc_id % 5 = 0"), Q.Term("vector"))
        assert _ids(ev.evaluate(q)) == [4, 6, 8]


class TestWeightings:
    def test_pl2_formula(self, ix):
        ev = Evaluator(ix, weighting="pl2")
        rows = {r["doc_id"]: r["score"] for r in ev.evaluate(Q.Term("data")).collect()}
        # cross-check one doc against the published PL2 formula
        st = ix.stats_for_terms(["data"])["data"]
        n, avgdl = ix.global_stats()
        dl = {r["doc_id"]: r["dl"] for r in ix.doc_lengths.collect()}
        log2 = lambda x: math.log(x) / 0.6931471805599453
        log2e = 1.4426950408889634
        tf = 1.0
        TF = tf * log2(1.0 + (1.0 * avgdl) / dl[4])
        f = st["cf"] / n
        want = (1.0 / (TF + 1.0)) * (
            TF * log2(1.0 / f) + f * log2e
            + 0.5 * log2(2 * math.pi * TF) + TF * (log2(TF) - log2e))
        assert rows[4] == pytest.approx(want, rel=1e-12)

    def test_dfree_formula(self, ix):
        ev = Evaluator(ix, weighting="dfree")
        rows = {r["doc_id"]: r["score"] for r in ev.evaluate(Q.Term("data")).collect()}
        st = ix.stats_for_terms(["data"])["data"]
        fl = ix.total_field_length()
        dl = {r["doc_id"]: r["dl"] for r in ix.doc_lengths.collect()}
        log2 = lambda x: math.log(x) / 0.6931471805599453
        tf, cf, d = 1.0, st["cf"], dl[4]
        prior, post, invprior = tf / d, (tf + 1.0) / (d + 1.0), fl / cf
        norm = tf * log2(post / prior)
        want = norm * (tf * log2(prior * invprior)
                       + (tf + 1.0) * log2(post * invprior)
                       + 0.5 * log2(post / prior))
        assert rows[4] == pytest.approx(want, rel=1e-12)

    def test_reverse_negates(self, ix):
        fwd = Evaluator(ix).evaluate(Q.Term("data")).collect()
        rev = {r["doc_id"]: r["score"]
               for r in Evaluator(ix, weighting="reverse:bm25")
               .evaluate(Q.Term("data")).collect()}
        for r in fwd:
            assert rev[r["doc_id"]] == pytest.approx(-r["score"], rel=1e-12)

    def test_multiweighting_dict_single_field(self, ix):
        # MultiWeighting: default model via the None key
        ev = Evaluator(ix, weighting={None: "frequency"})
        rows = {r["doc_id"]: r["score"] for r in ev.evaluate(Q.Term("data")).collect()}
        assert all(v == 1.0 for v in rows.values())


class TestExpansions:
    def test_regex(self, ix):
        ev = Evaluator(ix)
        ids_regex = _ids(ev.evaluate(Q.Regex("^d.t.$")))
        ids_term = _ids(ev.evaluate(Q.Term("data")))
        assert ids_regex == ids_term

    def test_variations_generates_inflections(self):
        v = variations("query")
        assert "query" in v and "queries" in v and "querying" in v
        v2 = variations("merging")
        assert "merge" in v2 and "merged" in v2
        v3 = variations("scans")
        assert "scan" in v3 and "scanning" in v3

    def test_variations_query(self, ix):
        ev = Evaluator(ix)
        # "query" and "queries"... corpus has only "query"; matches docs 7,8
        assert _ids(ev.evaluate(Q.Variations("query"))) == [7, 8]

    def test_date_range(self, spark):
        docs = spark.createDataFrame(
            DOCS, "doc_id long, text string, lang string, source string, n_chars long"
        ).withColumn("warc_ts", F.timestamp_seconds(F.lit(1577836800) + F.col("doc_id") * 3600))
        ix2 = InvertedIndex.build(docs)
        ev = Evaluator(ix2)
        q = Q.DateRange("warc_ts", 1577836800 + 2 * 3600, 1577836800 + 5 * 3600,
                        incl_hi=False)
        assert _ids(ev.evaluate(q)) == [2, 3, 4]

    def test_final_hook(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        res = s.search(Q.Term("data"), limit=3,
                       final=lambda sc: sc * F.col("n_chars"))
        base = {r["doc_id"]: r["score"] for r in
                s.search(Q.Term("data"), limit=None, optimize=False).collect()}
        nch = {d[0]: d[4] for d in DOCS}
        for r in res.collect():
            assert r["score"] == pytest.approx(base[r["doc_id"]] * nch[r["doc_id"]], rel=1e-12)


class TestIVF:
    def test_ivf_assignment_deterministic_and_topk_recall(self, spark):
        import numpy as np

        from whoosh_spark.pipeline import similarity as S

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = S.query_vector(emb, 0)
        assign = S.ivf_assign(emb, n_cells=16)
        cells = {r["vec_id"]: r["cell"] for r in assign.collect()}
        # deterministic re-run
        cells2 = {r["vec_id"]: r["cell"] for r in S.ivf_assign(emb, n_cells=16).collect()}
        assert cells == cells2
        assert 0 <= min(cells.values()) and max(cells.values()) < 16
        # recall vs exact top-k: probing all cells IS the exact scan
        exact = [r["vec_id"] for r in S.cosine_topk(emb, qv, k=10).collect()]
        full = [r["vec_id"] for r in
                S.ivf_topk(emb, qv, k=10, n_cells=16, n_probe=16).collect()]
        assert full == exact
        # partial probe keeps the query's own vector and decent overlap
        part = [r["vec_id"] for r in
                S.ivf_topk(emb, qv, k=10, n_cells=16, n_probe=4).collect()]
        assert 0 in part
        assert len(set(part) & set(exact)) >= 3


class TestDocumentLookup:
    def test_documents_and_document(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        assert s.documents(source="s3").count() == 3
        row = s.document(doc_id=7)
        assert row is not None and row["text"] == "data query"
        assert s.document(source="nope") is None

    def test_documents_respects_deletes(self, ix, spark):
        from whoosh_spark.search import Searcher

        deleted = spark.createDataFrame([(7,)], "doc_id long")
        s = Searcher(ix.with_deleted(deleted))
        assert s.document(doc_id=7) is None
        assert s.documents(source="s3").count() == 2


class TestTimeLimit:
    def test_expired_collection_raises(self, spark):
        import time

        from pyspark.sql import functions as F
        from whoosh_spark.search import TimeLimitError, collect_with_timeout

        @F.udf("long")
        def slow(x):
            time.sleep(30)
            return x

        df = spark.range(0, 8, numPartitions=8).select(slow("id").alias("v"))
        t0 = time.monotonic()
        with pytest.raises(TimeLimitError):
            collect_with_timeout(df, timelimit=2.0)
        assert time.monotonic() - t0 < 20  # cancelled, not run to completion

    def test_fast_search_returns_rows(self, ix):
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        rows = s.search_with_timeout(Q.Term("data"), timelimit=120, limit=5)
        assert rows and rows == s.search(Q.Term("data"), limit=5).collect()


class TestFunctionWeighting:
    def test_custom_matches_builtin(self, ix):
        from whoosh_spark.execution.score import register_weighting
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        register_weighting("mytfidf", lambda ctx: ctx["tf"] * ctx["idf"])
        q = Q.Or([Q.Term("data"), Q.Term("query")])
        got = Searcher(ix, weighting="mytfidf").search(q, limit=20).collect()
        want = Searcher(ix, weighting="tfidf").search(q, limit=20).collect()
        assert got == want

    def test_unknown_weighting_raises(self, ix):
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        with pytest.raises(ValueError):
            Searcher(ix, weighting="nope").search(Q.Term("data")).collect()


class TestPhraseFreq:
    def test_occurrences_rank_higher(self, spark):
        from whoosh_spark.index import InvertedIndex
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        rows = [
            (0, "big data twice big data here pad pad pad"),
            (1, "big data once here word word word pad pad"),
            (2, "no phrase here at all pad pad pad pad"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        s = Searcher(InvertedIndex.build(docs))
        out = s.search(Q.Phrase(["big", "data"], scoring="freq"),
                       limit=10).collect()
        assert [r["doc_id"] for r in out] == [0, 1]
        assert out[0]["score"] > out[1]["score"]

    def test_terms_mode_unchanged(self, ix):
        from whoosh_spark.query import ast as Q
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        a = s.search(Q.Phrase(["big", "data"]), limit=10).collect()
        b = s.search(Q.Phrase(["big", "data"], scoring="terms"),
                     limit=10).collect()
        assert a == b


class TestCorrectQuery:
    def test_rewrites_unknown_terms(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        corrected, q = s.correct_query("dta AND tabel")
        assert corrected == "data AND table"
        assert sorted(t for t in q.terms()) == ["data", "table"]

    def test_known_terms_untouched(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        corrected, _ = s.correct_query("data AND query")
        assert corrected == "data AND query"

    def test_syntax_adjacent_tokens_skipped(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        corrected, _ = s.correct_query("dta* AND tabl~1")
        assert corrected == "dta* AND tabl~1"

    def test_phrase_words_corrected(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        corrected, _ = s.correct_query('"big dta"')
        assert corrected == '"big data"'


class TestSearchMany:
    def test_matches_individual_searches(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        qs = {
            "t": Q.Term("data"),
            "a": Q.And([Q.Term("big"), Q.Term("data")]),
            "o": Q.Or([Q.Term("data"), Q.Term("vector")]),
            "d": Q.DisMax([Q.Term("data"), Q.Term("vector")], tiebreak=0.5),
            "none": Q.Term("zzzabsent"),
        }
        batch = s.search_many(qs, limit=3)
        got: dict[str, list] = {}
        for r in batch.collect():
            got.setdefault(r["qname"], []).append(
                (r["doc_id"], round(r["score"], 9)))
        assert "none" not in got  # no matches -> no rows for that name
        for name, q in qs.items():
            want = [(r["doc_id"], round(r["score"], 9))
                    for r in s.search(q, limit=3, optimize=False).collect()]
            assert got.get(name, []) == want, name

    def test_empty_batch_raises(self, ix):
        from whoosh_spark.search import Searcher

        with pytest.raises(ValueError):
            Searcher(ix).search_many({})

    def test_normalizes_raw_input_like_search(self, ix):
        """Raw (unanalyzed) query text must hit the same normalize() path
        as search(): capitalization, multi-word terms, stop-word children."""
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        qs = {
            "cap": Q.Term("Data"),                      # lowercases
            "multi": Q.Term("big data"),                # → And(big, data)
            "stop": Q.And([Q.Term("the"), Q.Term("data")]),  # stop drops
        }
        batch = s.search_many(qs, limit=3)
        got: dict[str, list] = {}
        for r in batch.collect():
            got.setdefault(r["qname"], []).append(
                (r["doc_id"], round(r["score"], 9)))
        for name, q in qs.items():
            want = [(r["doc_id"], round(r["score"], 9))
                    for r in s.search(q, limit=3, optimize=False).collect()]
            assert want, name  # the fixture corpus matches all three
            assert got.get(name, []) == want, name

    def test_limit_none_returns_all_matches(self, ix):
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        q = Q.Term("data")
        n_all = s.search(q, limit=None).count()
        batch = s.search_many({"q": q}, limit=None)
        assert batch.count() == n_all > 3


class TestSearchManyNormalizeParity:
    def test_nested_minmatch_query_matches_single_search(self, ix):
        """search_many normalizes at classify time and evaluate() normalizes
        again — a non-idempotent normalize() made the two paths diverge on
        nested minmatch Ors (gate flattened away on the second pass; found
        by tests/fuzz_campaign.py --many, seed 649038824)."""
        from whoosh_spark.search import Searcher

        s = Searcher(ix)
        q = Q.Or([
            Q.Wildcard("*dow"),
            Q.Or([
                Q.TermRange(None, "z"),
                Q.TermRange(None, "dz"),
                Q.Or([Q.TermRange("da", "m", incl_hi=False),
                      Q.Fuzzy("vectr", maxdist=1, prefixlength=1)],
                     minmatch=2),
            ], minmatch=3),
        ], minmatch=0)
        direct = [(int(r["doc_id"]), round(float(r["score"]), 9))
                  for r in s.search(q, limit=10).collect()]
        many = sorted(((int(r["doc_id"]), round(float(r["score"]), 9))
                       for r in s.search_many({"q": q}, limit=10).collect()),
                      key=lambda t: (-t[1], t[0]))
        assert many == direct


class TestReviewRegressions2:
    """Round-2 execution-core review findings (session 2026-08-19)."""

    def test_nested_parent_deleted_child(self, ix, spark):
        # soft-deleted children must not match/score parents
        term = {r["doc_id"]: r["score"] for r in
                Evaluator(ix).evaluate(Q.Term("data")).collect()}
        dead = spark.createDataFrame([(1,), (7,)], "doc_id long")
        ev = Evaluator(ix.with_deleted(dead))
        q = Q.NestedParent(Q.Filter("doc_id % 5 = 0"), Q.Term("data"))
        rows = {r["doc_id"]: r["score"] for r in ev.evaluate(q).collect()}
        # block 5's only data-child (7) is deleted → parent 5 gone;
        # parent 0 rescored without child 1
        assert sorted(rows) == [0]
        assert rows[0] == pytest.approx(
            sum(term[d] for d in (2, 3, 4)), rel=1e-12)

    def test_sequence_or_slot_minmatch_gates(self, ix):
        ev = Evaluator(ix)
        base = Q.Sequence(
            [Q.Or([Q.Term("big"), Q.Term("fast")]), Q.Term("data")], slop=2)
        gated = Q.Sequence(
            [Q.Or([Q.Term("big"), Q.Term("fast")], minmatch=2),
             Q.Term("data")], slop=2)
        ids_base = _ids(ev.evaluate(base))
        ids_gated = _ids(ev.evaluate(gated))
        assert set(ids_gated) <= set(ids_base)
        # the gate = docs containing BOTH or-terms
        both = set(_ids(ev.evaluate(Q.And([Q.Term("big"), Q.Term("fast")]))))
        assert set(ids_gated) == set(ids_base) & both

    def test_sequence_slot_boost_scores(self, ix):
        ev = Evaluator(ix)
        plain = {r["doc_id"]: r["score"] for r in ev.evaluate(
            Q.Sequence([Q.Term("big"), Q.Term("data")], slop=1)).collect()}
        boosted = {r["doc_id"]: r["score"] for r in ev.evaluate(
            Q.Sequence([Q.Term("big", boost=3.0), Q.Term("data")],
                       slop=1)).collect()}
        assert sorted(plain) == sorted(boosted) and plain
        term_big = {r["doc_id"]: r["score"] for r in
                    ev.evaluate(Q.Term("big")).collect()}
        for d in plain:
            # boosted = plain + 2x the big-term component
            assert boosted[d] == pytest.approx(
                plain[d] + 2.0 * term_big[d], rel=1e-9)

    def test_date_range_fractional_bound(self, spark):
        docs = spark.createDataFrame(
            [(0, "x", 1000.2), (1, "y", 1000.9)],
            "doc_id long, text string, _es double"
        ).withColumn("ts", F.timestamp_seconds(F.col("_es"))).drop("_es")
        ix2 = InvertedIndex.build(docs.select("doc_id", "text", "ts"))
        ev = Evaluator(ix2)
        # exclusive fractional lower bound 1000.5 must exclude t=1000.2
        got = _ids(ev.evaluate(
            Q.DateRange("ts", lo=1000.5, hi=None, incl_lo=False)))
        assert got == [1]


class TestSpanNear2:
    """ast.SpanNear2 list form — desugars to left-nested binary SpanNear."""

    def test_desugar_structure(self):
        q = Q.SpanNear2([Q.Term("a"), Q.Term("b"), Q.Term("c")],
                        slop=2, ordered=False)
        assert q == Q.SpanNear(
            Q.SpanNear(Q.Term("a"), Q.Term("b"), slop=2, ordered=False),
            Q.Term("c"), slop=2, ordered=False)

    def test_single_child_and_empty(self):
        assert Q.SpanNear2([Q.Term("a")]) == Q.Term("a")
        assert Q.SpanNear2([Q.Term("a")], boost=2.0) == Q.Term("a", boost=2.0)
        with pytest.raises(ValueError, match="at least one child"):
            Q.SpanNear2([])

    def test_three_term_chain(self, ix):
        ev = Evaluator(ix)
        # doc 0: big@0 data@1 merge@2 (gaps 1,1); doc 2: big@0 data@2
        # merge@4 (gaps 2,2); doc 3 has reverse order -> excluded
        q = Q.SpanNear2([Q.Term("big"), Q.Term("data"), Q.Term("merge")],
                        slop=2)
        assert _ids(ev.evaluate(q)) == [0, 2]
        tight = Q.SpanNear2([Q.Term("big"), Q.Term("data"), Q.Term("merge")],
                            slop=1)
        assert _ids(ev.evaluate(tight)) == [0]
