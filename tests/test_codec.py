"""Posting-block codec roundtrip tests, incl. hypothesis property tests
(reference tests/test_postings.py / test_codecs.py style — block edges,
all-equal weights, single-posting terms; SURVEY.md §5 item 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_spark.codec.blocks import (
    decode_blocks_pdf,
    decode_positions,
    encode_positions,
    encode_term_bucket,
    varint_decode,
    varint_encode,
)
from whoosh_spark.config import BLOCK_SIZE


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=50, deadline=None, derandomize=True)
def test_varint_roundtrip(values):
    a = np.asarray(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a)), a)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=20).map(sorted),
        max_size=30,
    )
)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_positions_roundtrip(pos_lists):
    dec = decode_positions(encode_positions(pos_lists), len(pos_lists))
    assert [list(x) for x in dec] == pos_lists


def _roundtrip(n_postings, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(10**7, size=n_postings, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=n_postings)
    dls = rng.integers(1, 1400, size=n_postings)
    pls = [sorted(rng.integers(0, 500, size=int(t)).tolist()) for t in tfs]
    rows = encode_term_bucket("text", "t", 0, ids, tfs, dls, pls)
    flat = (decode_blocks_pdf(pd.DataFrame(rows), want_positions=True)
            .sort_values("doc_id"))  # impact layout: block order ≠ id order
    assert flat.doc_id.tolist() == ids.tolist()
    assert flat.tf.astype(int).tolist() == tfs.tolist()
    assert flat.dl.tolist() == dls.tolist()
    assert [list(p) for p in flat.positions] == pls
    return rows


def test_single_posting_term():
    rows = _roundtrip(1)
    assert len(rows) == 1 and rows[0]["n"] == 1


def test_block_edges():
    for n in (BLOCK_SIZE - 1, BLOCK_SIZE, BLOCK_SIZE + 1, 3 * BLOCK_SIZE):
        rows = _roundtrip(n, seed=n)
        assert sum(r["n"] for r in rows) == n
        assert all(r["n"] <= BLOCK_SIZE for r in rows)
        # impact layout (default): block max_weight non-increasing across
        # the group — the separation block-max WAND prunes on
        for a, b in zip(rows, rows[1:]):
            assert a["max_weight"] >= b["max_weight"]
            assert a["min_id"] <= a["max_id"]


def test_block_edges_docid_layout(monkeypatch):
    """Classic doc-ordered carving (layout opt-out): blocks are doc-range
    disjoint and ordered."""
    from whoosh_spark import config

    monkeypatch.setattr(config, "BLOCK_LAYOUT", "docid")
    for n in (BLOCK_SIZE + 1, 3 * BLOCK_SIZE):
        rows = _roundtrip(n, seed=n)
        for a, b in zip(rows, rows[1:]):
            assert a["max_id"] < b["min_id"]


def test_all_equal_weight_shortcut():
    ids = np.arange(10, dtype=np.int64)
    rows = encode_term_bucket("text", "t", 0, ids, np.full(10, 3), np.full(10, 7), [[0]] * 10)
    assert rows[0]["w_const"] == 3.0 and rows[0]["weights"] is None
    flat = decode_blocks_pdf(pd.DataFrame(rows))
    assert flat.tf.tolist() == [3.0] * 10


def test_block_metadata():
    rows = _roundtrip(300, seed=1)
    for r in rows:
        assert r["max_weight"] >= 1.0
        assert r["min_id"] <= r["max_id"]
        assert r["min_len"] >= 1
