"""Rare-slot candidate pruning for positional queries (evaluate.py
``_phrase_candidates`` + the ``candidates`` filter inside
``decode_blocks_arrow``).

The pruning is an exactness-preserving plan change: the rarest slot's doc
set is a superset of any phrase/sequence match, so forcing the prune ON
(cap above every df) and OFF (cap 0) must produce identical ranked results.
"""

from __future__ import annotations

import pytest

from whoosh_spark import config
from whoosh_spark.query import ast as Q


def _ranked(searcher, q):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in searcher.search(q, limit=50).collect()]


_CASES = [
    Q.Phrase(["big", "data"]),
    Q.Phrase(["big", "data"], slop=2),
    Q.Phrase(["big", "data"], scoring="freq"),
    Q.Sequence([Q.Term("big"), Q.Or([Q.Term("data"), Q.Term("merge")])]),
]


@pytest.mark.parametrize("q", _CASES, ids=lambda q: type(q).__name__)
def test_pruned_matches_unpruned(searcher, q, monkeypatch):
    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 0)
    base = _ranked(searcher, q)
    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 10**9)
    monkeypatch.setattr(config, "PHRASE_PRUNE_RATIO", 0)
    pruned = _ranked(searcher, q)
    assert base == pruned
    assert base, f"degenerate case — no matches for {q!r}"


def test_decoder_candidate_filter_equals_post_filter(ix):
    """Decode-with-candidates == decode-then-filter, row for row, including
    the ragged positions column."""
    full = ix.postings(["big", "data"], with_positions=True).collect()
    cand = sorted({int(r["doc_id"]) for r in full})[::3]  # every 3rd doc
    want = sorted(
        ((r["term"], int(r["doc_id"]), float(r["tf"]), int(r["dl"]),
          tuple(r["positions"])) for r in full if int(r["doc_id"]) in set(cand))
    )
    got = sorted(
        ((r["term"], int(r["doc_id"]), float(r["tf"]), int(r["dl"]),
          tuple(r["positions"])) for r in
         ix.postings(["big", "data"], with_positions=True,
                     candidate_ids=cand).collect())
    )
    assert got == want


def test_decoder_candidate_filter_no_positions(ix):
    full = ix.postings(["data"]).collect()
    cand = [int(r["doc_id"]) for r in full][:5]
    got = ix.postings(["data"], candidate_ids=cand).collect()
    assert sorted(int(r["doc_id"]) for r in got) == sorted(cand)


def test_empty_candidates_short_circuit(ix):
    df = ix.postings(["data"], with_positions=True, candidate_ids=[])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "field", "term", "doc_id", "tf", "dl", "positions"]


def test_gate_respects_cap_and_ratio(searcher, monkeypatch):
    """With cap 0 no candidate list is built (gate returns None)."""
    ev = searcher.ev
    ev.evaluate(Q.Phrase(["big", "data"]))  # primes stats
    fk = ev._fkey(None)
    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 0)
    assert ev._phrase_candidates(["big", "data"], fk) is None
    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 10**9)
    # rarest must be 1e9x rarer than the hottest: never on this corpus
    monkeypatch.setattr(config, "PHRASE_PRUNE_RATIO", 10**9)
    assert ev._phrase_candidates(["big", "data"], fk) is None

_SPAN_CASES = [
    Q.SpanNear(Q.Term("big"), Q.Term("data"), slop=3),
    Q.SpanNear(Q.Term("big"), Q.Term("data"), slop=5, ordered=False),
    Q.SpanNot(Q.Term("data"), Q.Phrase(["big", "data"])),
    Q.SpanContains(Q.Phrase(["big", "data"]), Q.Term("data")),
    Q.SpanBefore(Q.Term("big"), Q.Term("merge")),
    Q.SpanCondition(Q.Term("big"), Q.Term("merge")),
    Q.SpanNear(Q.SpanOr([Q.Term("big"), Q.Term("merge")]),
               Q.Term("data"), slop=4),
]


@pytest.mark.parametrize(
    "q", _SPAN_CASES,
    ids=lambda q: type(q).__name__ + "_" + type(getattr(q, "b", q)).__name__)
def test_span_pruned_matches_unpruned(searcher, q, monkeypatch):
    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 0)
    base = _ranked(searcher, q)
    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 10**9)
    monkeypatch.setattr(config, "PHRASE_PRUNE_RATIO", 0)
    pruned = _ranked(searcher, q)
    assert base == pruned
    assert base, f"degenerate case — no matches for {q!r}"


def test_span_not_prunes_by_required_side_only(searcher, monkeypatch):
    """SpanNot's b side is optional: candidates must come from a.  A doc
    with b-terms but no a-terms must not appear either way."""
    monkeypatch.setattr(config, "PHRASE_PRUNE_MAX_DF", 10**9)
    monkeypatch.setattr(config, "PHRASE_PRUNE_RATIO", 0)
    q = Q.SpanNot(Q.Term("merge"), Q.Term("data"))
    got = {d for d, _ in _ranked(searcher, q)}
    ev = searcher.ev
    fk = ev._fkey(None)
    ev.evaluate(Q.Term("merge"))  # primes stats
    cand = set(ev._span_conj_candidates(q, fk) or [])
    assert cand, "gate should open with ratio 0"
    assert got <= cand
