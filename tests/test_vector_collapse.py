"""Term vectors (``src/whoosh/reading.py::IndexReader.vector ≈L430``) and
collapse_order (``src/whoosh/collectors.py::CollapseCollector ≈L650``):
the forward-index read surface and order-keyed collapse survivors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import FieldSpec, MultiFieldIndex, Searcher
from whoosh_spark.analysis.analyzers import analyze_text
from whoosh_spark.query import ast as Q


def _expected_vector(text: str) -> dict[str, list[int]]:
    toks, poss = analyze_text(text or "")
    agg: dict[str, list[int]] = {}
    for t, p in zip(toks, poss):
        agg.setdefault(t, []).append(p)
    return agg


def test_vector_parity_with_analyzer(ix, docs_rows):
    r = ix.reader()
    doc_id, text = docs_rows[3]
    exp = _expected_vector(text)
    got = dict(r.vector_as("positions", doc_id))
    assert got == exp
    freqs = dict(r.vector_as("frequency", doc_id))
    assert freqs == {t: len(ps) for t, ps in exp.items()}
    weights = list(r.vector(doc_id))
    assert weights == sorted((t, float(len(ps))) for t, ps in exp.items())
    assert r.has_vector(doc_id)


def test_vector_df_shape_and_order(ix, docs_rows):
    doc_id, text = docs_rows[5]
    df = ix.reader().vector_df(doc_id)
    rows = df.collect()
    terms = [row["term"] for row in rows]
    assert terms == sorted(terms)
    exp = _expected_vector(text)
    assert {row["term"]: row["tf"] for row in rows} == {
        t: len(ps) for t, ps in exp.items()}
    # positions CSV is ascending tokenizer ordinals
    for row in rows:
        ps = [int(p) for p in row["positions"].split(",")]
        assert ps == sorted(ps) == exp[row["term"]]


def test_vector_missing_and_deleted(spark, ix):
    r = ix.reader()
    with pytest.raises(KeyError):
        r.vector(10_000_000)
    assert not r.has_vector(10_000_000)
    dead = spark.createDataFrame([(0,)], "doc_id long")
    ixd = ix.with_deleted(dead)
    with pytest.raises(KeyError):
        ixd.reader().vector(0)
    assert not ixd.reader().has_vector(0)
    assert ix.reader().has_vector(0)  # original snapshot untouched


def test_vector_multifield_routing(spark):
    rows = [
        (0, "spark spark engine", "fast distributed search"),
        (1, "whoosh library", "pure python search library"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, title string, body string")
    mix = MultiFieldIndex.build(
        docs, fields={"title": FieldSpec("title"), "body": FieldSpec("body")},
        default_field="body")
    r = mix.reader()
    assert dict(r.vector_as("frequency", 0, "title")) == {
        "spark": 2, "engine": 1}
    assert dict(r.vector_as("frequency", 1, "body")) == {
        "pure": 1, "python": 1, "search": 1, "library": 1}
    # unfielded routes to the default field (body)
    assert dict(r.vector_as("frequency", 0)) == {
        "fast": 1, "distributed": 1, "search": 1}
    with pytest.raises(ValueError):
        list(r.vector_as("nope", 0))


def test_collapse_order_survivor(searcher, ix):
    # default collapse keeps the best-scoring doc per key; collapse_order
    # keeps the doc with the LOWEST order column instead — ranking of the
    # survivors stays score desc
    q = Q.Term("data")
    plain = searcher.search(q, limit=None, collapse="source")
    ordered = searcher.search(q, limit=None, collapse="source",
                              collapse_order="n_chars")
    scores = searcher.ev.evaluate(q)
    keyed = scores.join(ix.docs.select("doc_id", "source", "n_chars"),
                        "doc_id").collect()
    by_key: dict[str, list] = {}
    for row in keyed:
        by_key.setdefault(row["source"], []).append(row)
    exp_plain = {max(v, key=lambda r: (r["score"], -r["doc_id"]))["doc_id"]
                 for v in by_key.values()}
    exp_order = {min(v, key=lambda r: (r["n_chars"], r["doc_id"]))["doc_id"]
                 for v in by_key.values()}
    assert {r["doc_id"] for r in plain.collect()} == exp_plain
    assert {r["doc_id"] for r in ordered.collect()} == exp_order
    assert exp_plain != exp_order or len(by_key) == 0  # the corpus separates them


def test_corrector_suggest(searcher, ix):
    # spelling.py::Corrector.suggest — closest-first, frequency within band
    c = searcher.corrector()
    sug = c.suggest("dta", limit=3)
    assert sug and sug[0] == "data"
    assert "dta" not in sug
    # distance band ordering: a dist-1 term beats any dist-2 term
    import pyspark.sql.functions as SF
    stats = {r["term"]: int(r["cf"]) for r in
             ix.term_stats.where(SF.levenshtein(SF.col("term"), SF.lit("dta")) <= 2)
             .where(SF.col("term").startswith("d")).collect()}
    def lev(a, b):
        import functools
        @functools.lru_cache(maxsize=None)
        def rec(i, j):
            if i == 0: return j
            if j == 0: return i
            return min(rec(i-1, j) + 1, rec(i, j-1) + 1,
                       rec(i-1, j-1) + (a[i-1] != b[j-1]))
        return rec(len(a), len(b))
    exp = sorted((t for t in stats if t != "dta"),
                 key=lambda t: (lev(t, "dta"), -stats[t], t))[:3]
    assert sug == exp
    # prefix pruning + empty input
    assert c.suggest("") == []
    assert all(s.startswith("q") for s in c.suggest("quury"))


def test_register_analyzer_end_to_end(spark):
    # §2.9 custom-Analyzer extension point: registered chains work in the
    # build AND the query-time tee, like any built-in name
    from whoosh_spark.analysis.analyzers import ANALYZERS, register_analyzer
    from whoosh_spark.index import InvertedIndex

    def shouty(text):
        toks, poss = [], []
        for pos, w in enumerate((text or "").split()):
            w = w.strip(".,").upper()
            if w:
                toks.append(w)
                poss.append(pos)
        return toks, poss

    with pytest.raises(ValueError):
        register_analyzer("standard", shouty)  # built-ins are immutable
    with pytest.raises(TypeError):
        register_analyzer("broken", lambda t: "nope")
    register_analyzer("shouty_test", shouty)
    try:
        docs = spark.createDataFrame(
            [(0, "big data engine"), (1, "small data tool")],
            "doc_id long, text string")
        ix = InvertedIndex.build(docs, analyzer="shouty_test")
        s = Searcher(ix)
        # Query objects hold index-term form: analyzed=True skips the
        # standard-chain re-analysis (upstream Term semantics; the
        # parse_query(analyzer=) tee sets this for parsed strings)
        got = {r["doc_id"] for r in
               s.search(Q.Term("DATA", analyzed=True), limit=10).collect()}
        assert got == {0, 1}
        assert s.search(Q.Term("data", analyzed=True),
                        limit=10).count() == 0  # chain applied at build
        assert dict(ix.reader().vector_as("frequency", 0)) == {
            "BIG": 1, "DATA": 1, "ENGINE": 1}
    finally:
        ANALYZERS.pop("shouty_test", None)


def test_vector_review_regressions(spark, tmp_path):
    # (a) empty-but-existing vector: stopword-only text yields an EMPTY
    # iterator, not the missing-doc KeyError; has_vector stays True
    from whoosh_spark.index import InvertedIndex

    docs = spark.createDataFrame(
        [(0, "the of and"), (1, "big data engine")],
        "doc_id long, text string")
    ix = InvertedIndex.build(docs)
    r = ix.reader()
    assert r.has_vector(0)
    assert list(r.vector(0)) == []
    assert list(r.vector_as("positions", 0)) == []

    # (b) non-default text_col: the build records it; vectors read the
    # right column even when an unrelated "text" column exists
    docs2 = spark.createDataFrame(
        [(0, "decoy words here", "real body tokens")],
        "doc_id long, text string, body string")
    ix2 = InvertedIndex.build(docs2, text_col="body")
    assert dict(ix2.reader().vector_as("frequency", 0)) == {
        "real": 1, "body": 1, "tokens": 1}
    # snapshot clones carry it
    dead = spark.createDataFrame([(99,)], "doc_id long")
    assert ix2.with_deleted(dead).text_col == "body"

    # (c) unknown analyzer chain = hard KeyError, never a silent
    # standard-chain fallback
    ix3 = InvertedIndex.build(docs)
    ix3.analyzer = "not_registered_chain"
    with pytest.raises(KeyError):
        ix3.reader().vector(1)

    # (d) store_text=False persisted index: has_vector False, vector
    # raises the explicit ValueError
    from whoosh_spark import store as S
    p = str(tmp_path / "ixnt")
    S.write_index(docs, p, store_text=False)
    lx = S.load_index(spark, p)
    assert lx.text_col == "text"
    assert not lx.reader().has_vector(1)
    with pytest.raises(ValueError):
        lx.reader().vector(1)

    # (e) boost overlay: vector_as('weight') returns the same
    # coalesce(w, tf) weights the scorer uses; 'frequency' stays tf
    overlay = spark.createDataFrame(
        [("data", 1, 5.0)], "term string, doc_id long, w double")
    ixb = ix.with_boosts(overlay)
    wts = dict(ixb.reader().vector_as("weight", 1))
    assert wts == {"big": 1.0, "data": 5.0, "engine": 1.0}
    assert dict(ixb.reader().vector_as("frequency", 1)) == {
        "big": 1, "data": 1, "engine": 1}


def test_collapse_order_doc_id_and_nulls(spark):
    # collapse_order='doc_id' must not produce an ambiguous-column plan,
    # and NULL order keys lose (asc_nulls_last — matches the SQL oracle)
    from whoosh_spark.index import InvertedIndex

    docs = spark.createDataFrame(
        [(0, "data alpha", "s1", None),
         (1, "data beta", "s1", 10),
         (2, "data gamma", "s2", 7)],
        "doc_id long, text string, source string, n_chars int")
    s = Searcher(InvertedIndex.build(docs))
    by_id = s.search(Q.Term("data"), limit=None, collapse="source",
                     collapse_order="doc_id")
    assert {r["doc_id"] for r in by_id.collect()} == {0, 2}
    by_nc = s.search(Q.Term("data"), limit=None, collapse="source",
                     collapse_order="n_chars")
    # NULL n_chars (doc 0) loses to doc 1 within s1
    assert {r["doc_id"] for r in by_nc.collect()} == {1, 2}


def test_searcher_stats_conveniences(searcher, ix, spark):
    # searching.py::Searcher.doc_count/doc_count_all/idf (≈L340-360)
    import math
    n = ix.docs.count()
    assert searcher.doc_count_all() == n
    assert searcher.doc_count() == n
    df = int(ix.term_stats.where(F.col("term") == "data").collect()[0]["df"])
    assert searcher.idf("data") == pytest.approx(math.log(n / (df + 1)) + 1)
    # absent term: df=0 in the same formula (upstream semantics)
    assert searcher.idf("zzzabsent") == pytest.approx(math.log(n / 1) + 1)
    with pytest.raises(KeyError):
        searcher.idf("data", "no_such_field")
    dead = spark.createDataFrame([(0,), (1,)], "doc_id long")
    sd = Searcher(ix.with_deleted(dead))
    assert sd.doc_count() == n - 2
    assert sd.doc_count_all() == n  # BM25's N keeps counting until purge


def test_list_and_multi_corrector(searcher):
    # spelling.py::ListCorrector (≈L130) / MultiCorrector (≈L150)
    from whoosh_spark.search import ListCorrector, MultiCorrector

    lc = ListCorrector(["date", "data", "dat", "dta", "other"])
    sug = lc.suggest("dta", limit=5, maxdist=2)
    # distance bands first (data d=1; date/dat d=2), LIST order within a band
    assert sug == ["data", "date", "dat"]
    assert lc.suggest("dta", limit=1) == ["data"]
    assert lc.suggest("") == []
    # prefix pruning
    assert lc.suggest("xta", prefix=1) == []
    # merged streams: closest band first across correctors, index corrector
    # first within a band, dedup keeps the first occurrence
    mc = MultiCorrector([searcher.corrector(), lc])
    merged = mc.suggest("dta", limit=5, maxdist=1)
    assert merged[0] == "data" and merged.count("data") == 1
    ix_only = searcher.corrector().suggest("dta", limit=5, maxdist=1)
    assert set(ix_only) <= set(merged)
