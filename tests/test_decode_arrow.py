"""decode_blocks_arrow ≡ decode_blocks_pdf (the query-side hot path).

The Arrow decoder whole-batch-vectorizes what the pandas decoder does
row-by-row; these tests pin exact equivalence on mixed const/non-const
blocks, exercise the verified counts==tf fast path AND the sequential
fallback (counts != tf), and cover empty/zero-count postings.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from whoosh_spark.codec.blocks import (
    _positions_counts,
    _segmented_cumsum,
    decode_blocks_arrow,
    decode_blocks_pdf,
    encode_positions_flat,
    encode_term_bucket_flat,
    varint_decode,
)

_ARROW_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("n", pa.int32()),
        ("w_const", pa.float64()),
        ("ids", pa.binary()),
        ("weights", pa.binary()),
        ("lens", pa.binary()),
        ("positions", pa.binary()),
    ]
)


def _rows_to_batch(rows):
    cols = {k: [r[k] for r in rows] for k in _ARROW_SCHEMA.names}
    cols["n"] = [int(v) for v in cols["n"]]
    return pa.RecordBatch.from_pydict(cols, schema=_ARROW_SCHEMA)


def _mk_rows(n_docs=300, seed=7, vocab=("alpha", "beta")):
    rng = np.random.default_rng(seed)
    rows = []
    for term in vocab:
        ids = np.sort(rng.choice(np.arange(1, 5000), size=n_docs, replace=False))
        tfs = rng.integers(1, 6, size=n_docs)
        dls = rng.integers(5, 200, size=n_docs)
        pos_counts = tfs.copy()
        flat = np.concatenate(
            [np.sort(rng.choice(np.arange(0, 500), size=c, replace=False))
             for c in pos_counts])
        rows.extend(
            encode_term_bucket_flat("text", term, 0, ids, tfs, dls,
                                    flat, pos_counts))
    return rows


def _arrow_to_pdf(rows, want_positions):
    fn = decode_blocks_arrow(want_positions=want_positions)
    out = list(fn(iter([_rows_to_batch(rows)])))
    pdf = pa.Table.from_batches(out).to_pandas()
    if want_positions:
        pdf["positions"] = pdf["positions"].map(list)
    return pdf.sort_values(["term", "doc_id"]).reset_index(drop=True)


@pytest.mark.parametrize("want_positions", [False, True])
def test_arrow_equals_pandas(want_positions):
    rows = _mk_rows()
    ref = decode_blocks_pdf(pd.DataFrame(rows), want_positions=want_positions)
    ref = ref.sort_values(["term", "doc_id"]).reset_index(drop=True)
    if want_positions:
        ref["positions"] = ref["positions"].map(list)
    got = _arrow_to_pdf(rows, want_positions)
    assert list(got.columns) == list(ref.columns)
    for c in ("field", "term", "doc_id", "tf", "dl"):
        assert got[c].tolist() == ref[c].tolist(), c
    if want_positions:
        assert got["positions"].tolist() == ref["positions"].tolist()


def test_const_weight_blocks():
    # every tf identical in a block → w_const path (weights column None)
    n = 150
    ids = np.arange(10, 10 + n)
    tfs = np.full(n, 3)
    dls = np.full(n, 42)
    flat = np.tile(np.array([1, 5, 9]), n)
    rows = encode_term_bucket_flat("text", "c", 0, ids, tfs, dls, flat,
                                   tfs.copy())
    assert all(r["w_const"] == 3.0 for r in rows)
    got = _arrow_to_pdf(rows, True)
    assert got["tf"].tolist() == [3.0] * n
    assert got["positions"].tolist() == [[1, 5, 9]] * n


def test_positions_counts_fallback_when_counts_differ_from_tf():
    # counts deliberately != tf: the verified fast path must detect the
    # mismatch and the sequential walk must still decode correctly
    counts = np.array([2, 0, 3], dtype=np.int64)
    flat = np.array([4, 7, 1, 2, 9], dtype=np.int64)
    buf = encode_positions_flat(flat, counts)
    vals = varint_decode(buf)
    tfs = np.array([5.0, 1.0, 2.0])  # wrong on purpose
    got = _positions_counts(vals, tfs)
    assert got.tolist() == [2, 0, 3]
    # and the fast path agrees when tf IS the count
    fast = _positions_counts(vals, counts.astype(np.float64))
    assert fast.tolist() == [2, 0, 3]


def test_zero_count_postings_roundtrip():
    counts = np.array([0, 2, 0, 1, 0], dtype=np.int64)
    flat = np.array([3, 8, 5], dtype=np.int64)
    buf = encode_positions_flat(flat, counts)
    vals = varint_decode(buf)
    cts = _positions_counts(vals, counts.astype(np.float64))
    assert cts.tolist() == counts.tolist()
    cnt_idx = np.arange(len(counts)) + (np.cumsum(cts) - cts)
    dmask = np.ones(vals.size, dtype=bool)
    dmask[cnt_idx] = False
    abs_pos = _segmented_cumsum(vals[dmask], cts)
    assert abs_pos.tolist() == [3, 8, 5]


def test_segmented_cumsum_basic():
    deltas = np.array([5, 2, 3, 10, 1, 1, 1], dtype=np.int64)
    counts = np.array([3, 1, 3], dtype=np.int64)
    assert _segmented_cumsum(deltas, counts).tolist() == [5, 7, 10, 10, 1, 2, 3]
    assert _segmented_cumsum(np.zeros(0, np.int64),
                             np.zeros(0, np.int64)).tolist() == []
