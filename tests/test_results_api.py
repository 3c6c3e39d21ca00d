"""Results / Hit API (``src/whoosh/searching.py::Results ≈L900``,
``::Hit ≈L1300``): lazy stored fields, accessors, estimated_length,
key_terms, per-hit highlights."""

from __future__ import annotations

from whoosh_spark.query import ast as Q


def test_results_matches_search(searcher):
    q = Q.And([Q.Term("data"), Q.Term("query")])
    rows = searcher.search(q, limit=10).collect()
    res = searcher.search_hits(q, limit=10)
    assert len(res) == len(rows)
    for n, r in enumerate(rows):
        assert res.docnum(n) == int(r["doc_id"])
        assert res.score(n) == float(r["score"])
        assert res[n].doc_id == int(r["doc_id"])
        assert abs(res[n].score - float(r["score"])) == 0.0


def test_hit_lazy_stored_fields(searcher):
    res = searcher.search_hits(Q.Term("data"), limit=5)
    assert res._stored is None  # nothing fetched yet
    h = res[0]
    assert isinstance(h["text"], str) and "data" in h["text"].lower()
    assert res._stored is not None and len(res._stored) == len(res)
    # every hit served from the one cached batch
    fetched = res._stored
    assert all(res[i]["lang"] is not None or True for i in range(len(res)))
    assert res._stored is fetched
    assert h.get("no_such_field", "dflt") == "dflt"
    assert "text" in h and sorted(h.keys())  # mapping surface


def test_results_sequence_protocol(searcher):
    res = searcher.search_hits(Q.Term("data"), limit=7)
    assert bool(res) and not res.is_empty()
    assert [h.doc_id for h in res] == [res.docnum(i) for i in range(len(res))]
    assert [h.doc_id for h in res[1:3]] == [res.docnum(1), res.docnum(2)]
    assert res[-1].doc_id == res.docnum(len(res) - 1)
    assert res.docs() == {res.docnum(i) for i in range(len(res))}
    assert res.fields(0) == res[0].fields()


def test_estimated_length_bounds(searcher, py):
    # full page: estimate >= true match count, >= scored length
    q = Q.Term("data")
    res = searcher.search_hits(q, limit=5)
    true_n = len(py.eval_docset(q)) if hasattr(py, "eval_docset") else None
    est = res.estimated_length()
    assert est >= len(res)
    if true_n is not None:
        assert est >= true_n or est == len(res)
    # short page (fewer matches than limit): exact
    rare = searcher.search_hits(Q.Term("zzzabsent"), limit=5)
    assert rare.is_empty() and rare.estimated_length() == 0
    allres = searcher.search_hits(q, limit=None)
    assert allres.estimated_length() == len(allres)


def test_hit_highlights_and_key_terms(searcher):
    res = searcher.search_hits(Q.Term("data"), limit=3)
    frag = res[0].highlights("text")
    assert "<b" in frag and "data" in frag.lower()
    kt = res.key_terms(numterms=3)
    assert len(kt) == 3 and all(isinstance(t, str) for t in kt)


def test_results_page(searcher):
    full = searcher.search_hits(Q.Term("data"), limit=15)
    page2 = searcher.search_page(Q.Term("data"), pagenum=2, pagelen=5)
    assert page2.offset == 5 and len(page2) == 5
    assert [h.doc_id for h in page2] == [full.docnum(i) for i in range(5, 10)]
    assert page2[0].doc_id == full.docnum(5)
    assert page2[-1].doc_id == full.docnum(9)
    assert not page2.is_last_page()  # "data" is hot: many pages remain
    assert page2.total >= 15 and page2.pagecount >= 3
    # a term with few matches: the prefix runs short → last page
    n_vec = len(searcher.search_hits(Q.Term("vector"), limit=None))
    lastpage = searcher.search_page(Q.Term("vector"), pagenum=2,
                                    pagelen=n_vec)
    assert lastpage.is_last_page() and len(lastpage) == 0
    import pytest as _p
    with _p.raises(ValueError):
        searcher.search_page(Q.Term("data"), pagenum=0)


def test_results_page_past_end(searcher):
    rare = searcher.search_page(Q.Term("zzzabsent"), pagenum=3, pagelen=5)
    assert len(rare) == 0 and list(rare) == []
    assert rare.is_last_page()


def test_is_last_page_full_page_skips_estimate(searcher):
    # the +1 over-fetch proves a later row exists: is_last_page must answer
    # False WITHOUT running the estimate (no Spark/stats work on the hot
    # paging path) — _est stays unmemoized
    page = searcher.search_page(Q.Term("data"), pagenum=1, pagelen=5)
    assert not page.is_last_page()
    assert page.results._est is None


def test_results_combination_ops(searcher):
    """extend/filter/upgrade/upgrade_and_extend (``searching.py::Results
    ≈L1100-1160``): driver-side list surgery, stable order, cache reset."""
    a = searcher.search_hits(Q.Term("data"), limit=8)
    b = searcher.search_hits(Q.Term("vector"), limit=8)
    a_ids = [h.doc_id for h in a]
    b_ids = [h.doc_id for h in b]
    aset, bset = set(a_ids), set(b_ids)
    assert aset - bset and bset - aset  # both ops below must do real work

    ext = searcher.search_hits(Q.Term("data"), limit=8)
    ext.extend(b)
    assert ([h.doc_id for h in ext]
            == a_ids + [d for d in b_ids if d not in aset])

    flt = searcher.search_hits(Q.Term("data"), limit=8)
    flt.filter(b)
    assert [h.doc_id for h in flt] == [d for d in a_ids if d in bset]

    upg = searcher.search_hits(Q.Term("data"), limit=8)
    upg.upgrade(b)
    assert ([h.doc_id for h in upg]
            == [d for d in a_ids if d in bset]
            + [d for d in a_ids if d not in bset])

    both = searcher.search_hits(Q.Term("data"), limit=8)
    both.upgrade_and_extend(b)
    assert ([h.doc_id for h in both]
            == [d for d in a_ids if d in bset]
            + [d for d in a_ids if d not in bset]
            + [d for d in b_ids if d not in aset])
    # mutation drops the stored cache and the short-page exactness claim
    assert both._stored is None and both._est is None
    assert both._exact_when_short is False
    # and stored fields re-fetch covers the extended row set
    last = both[len(both) - 1]
    assert last.fields().get("doc_id") == last.doc_id


def test_docs_for_query_matches_unlimited_search(searcher):
    q = Q.And([Q.Term("data"), Q.Term("vector")])
    via_docs = {int(r["doc_id"])
                for r in searcher.docs_for_query(q).collect()}
    via_search = {int(r["doc_id"])
                  for r in searcher.search(q, limit=None).collect()}
    assert via_docs == via_search and via_docs


def test_facet_doclists_consistent_with_counts(searcher):
    counts = {r["source"]: r["n"]
              for r in searcher.facet_counts(Q.Term("data"), "source").collect()}
    lists = searcher.facet_doclists(Q.Term("data"), "source").collect()
    assert {r["source"] for r in lists} == set(counts)
    for r in lists:
        ids = [int(x) for x in r["doc_ids"].split(",")]
        assert len(ids) == r["n"] == counts[r["source"]]
        assert ids == sorted(ids)


def test_results_groups(searcher):
    """search_hits(groupedby=) + Results.groups() (``searching.py::
    Results.groups ≈L1010``): groups cover ALL matches, lazy per facet."""
    res = searcher.search_hits(Q.Term("data"), limit=5, groupedby="source")
    assert res._groups_cache == {}  # nothing computed yet
    groups = res.groups()  # single facet: name optional
    all_ids = {int(r["doc_id"])
               for r in searcher.docs_for_query(Q.Term("data")).collect()}
    assert {d for ids in groups.values() for d in ids} == all_ids
    assert all(ids == sorted(ids) for ids in groups.values())
    assert res.groups("source") is groups  # cached

    counts = searcher.search_hits(Q.Term("data"), limit=5,
                                  groupedby="source", maptype="count").groups()
    assert counts == {k: len(v) for k, v in groups.items()}

    best = searcher.search_hits(Q.Term("data"), limit=5,
                                groupedby="source", maptype="best").groups()
    assert set(best) == set(groups)
    assert all(best[k] in groups[k] for k in best)

    import pytest as _p
    with _p.raises(KeyError):
        searcher.search_hits(Q.Term("data"), limit=5).groups()
    with _p.raises(KeyError):
        res.groups("no_such_facet")
    multi = searcher.search_hits(Q.Term("data"), limit=5,
                                 groupedby=["source", "lang"])
    with _p.raises(KeyError):
        multi.groups()  # ambiguous without a name
    assert set(multi.groups("lang")) and set(multi.groups("source"))
    with _p.raises(ValueError):
        searcher.search_hits(Q.Term("data"), limit=5, groupedby="source",
                             maptype="bogus")


def test_results_groups_honor_filter_and_mask(searcher):
    """groups() of a filtered search covers the FILTERED match set —
    upstream's facet collector sits behind the filter wrapper, so docs the
    filter/mask removed never reach a group."""
    q = Q.Term("data")
    flt = Q.Term("query")
    msk = Q.Term("vector")
    res = searcher.search_hits(q, limit=5, filter=flt, mask=msk,
                               groupedby="source")
    grouped = {d for ids in res.groups().values() for d in ids}
    want = {int(r["doc_id"]) for r in searcher.docs_for_query(
        Q.AndNot(Q.Require(q, flt), msk)).collect()}
    assert grouped == want
    # and the unfiltered set differs (the fixture corpus makes this real)
    full = {int(r["doc_id"])
            for r in searcher.docs_for_query(q).collect()}
    assert grouped < full


def test_matched_terms_surface(searcher):
    # searching.py::Hit.matched_terms (≈L1340) / Results.matched_terms
    q = Q.Or([Q.Term("data"), Q.Term("zzzabsent"), Q.Term("query")])
    res = searcher.search_hits(q, limit=5, terms=True)
    assert res.has_matched_terms()
    union = res.matched_terms()
    # absent leaf never appears; present leaves carry the field name
    assert ("text", "zzzabsent") not in union
    assert union <= {("text", "data"), ("text", "query")}
    for h in res:
        mt = h.matched_terms()
        assert mt and mt <= union
        # every reported term really occurs in the stored text
        text = h["text"].lower()
        assert all(t in text for _, t in mt)
    # without terms=True the API refuses (upstream NoTermsException)
    plain = searcher.search_hits(q, limit=5)
    assert not plain.has_matched_terms()
    try:
        plain.matched_terms()
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_hit_more_like_this(searcher):
    res = searcher.search_hits(Q.Term("data"), limit=3, terms=True)
    h = res[0]
    alike = h.more_like_this(limit=5).collect()
    assert 0 < len(alike) <= 5
    assert h.doc_id not in {int(r["doc_id"]) for r in alike}


def test_document_numbers(searcher, ix):
    row = ix.docs.orderBy("doc_id").limit(1).collect()[0]
    lang = row["lang"]
    want = sorted(int(r["doc_id"]) for r in
                  ix.docs.where(f"lang = '{lang}'").collect())
    got = searcher.document_numbers(lang=lang)
    assert got == want
    assert searcher.document_number(lang=lang) == want[0]
    assert searcher.document_number(lang="xx_nope") is None
    assert searcher.document_numbers(lang="xx_nope") == []


def test_key_terms_from_text(searcher):
    df = searcher.key_terms_from_text(
        "data data data query window zzzabsent", top=3)
    rows = df.collect()
    assert [r["term"] for r in rows][0] == "data"  # tf=3 dominates
    assert all(r["keyness"] > 0 for r in rows)
    assert "zzzabsent" not in {r["term"] for r in rows}  # df=0 → no stats row
    assert searcher.key_terms_from_text("", top=3).count() == 0


def test_key_terms_expansion_models(searcher):
    # classify.py::Bo1Model/Bo2Model/KLModel (≈L120-170): every model ranks
    # a sane top set; values positive for genuinely-overrepresented terms
    ids = [0, 1, 2]
    base = {r["term"] for r in searcher.key_terms(ids, top=5).collect()}
    for model in ("bo1", "bo2", "kl"):
        rows = searcher.key_terms(ids, top=5, model=model).collect()
        assert len(rows) == 5
        assert all(r["keyness"] >= 0 for r in rows)
        # DFR models and tf·idf broadly agree on what's key
        assert base & {r["term"] for r in rows}
    try:
        searcher.key_terms(ids, top=5, model="nope")
        assert False, "expected ValueError"
    except ValueError:
        pass
    # more_like threads the model through
    got = searcher.more_like([0], limit=3, model="bo1").collect()
    assert len(got) == 3 and 0 not in {int(r["doc_id"]) for r in got}
