"""Posting-block codec: delta + varint doc ids, FOR-packed weights, varint
position streams, per-block max-weight / id-range / min-length metadata.

Mirrors the *computation* of whoosh's W3 codec
(``src/whoosh/codec/whoosh3.py::W3PostingsWriter ≈L520`` — 128-posting blocks,
per-block maxweight/maxid, delta-compressed ids, all-equal-weight shortcut;
SURVEY.md §2.3) as numpy kernels that run inside ``applyInPandas`` groups.

Block identity is deterministic on doc ids only (blocks are carved from the
``(term, doc_id >> DOC_BUCKET_BITS)`` group sorted by doc_id), so the encoded
table is invariant under input partitioning AND hot terms are spread over
bounded-size groups (skew handling, SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from whoosh_spark.config import BLOCK_SIZE

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("blk", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("min_id", T.LongType(), False),
        T.StructField("max_id", T.LongType(), False),
        T.StructField("max_weight", T.DoubleType(), False),
        T.StructField("min_len", T.IntegerType(), False),
        T.StructField("w_const", T.DoubleType(), True),  # all-equal shortcut
        T.StructField("ids", T.BinaryType(), False),      # delta+varint
        T.StructField("weights", T.BinaryType(), True),   # FOR uint32, None if const
        T.StructField("positions", T.BinaryType(), True), # varint stream
        T.StructField("lens", T.BinaryType(), False),     # quantized dl, FOR uint16
    ]
)


# ---------------------------------------------------------------------------
# varint kernels (vectorized: loops over byte-position, not elements)
# ---------------------------------------------------------------------------

def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encoding of a uint64 array."""
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    nb = np.ones(a.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (a >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    for k in range(int(nb.max())):
        mask = nb > k
        chunk = (a[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = np.where(nb[mask] > k + 1, 0x80, 0).astype(np.uint8)
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a varint stream back to uint64 array."""
    if not buf:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(ends.size, dtype=np.uint64)
    widths = ends - starts + 1
    for k in range(int(widths.max())):
        mask = widths > k
        out[mask] |= (b[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return out


def _pack_for(values: np.ndarray, dtype: str) -> bytes:
    return np.asarray(values).astype(dtype).tobytes()


def _unpack_for(buf: bytes, dtype: str) -> np.ndarray:
    return np.frombuffer(buf, dtype=dtype)


def encode_positions(pos_lists: list[list[int]]) -> bytes:
    """Per posting: varint(count) then delta-varint sorted positions."""
    stream: list[np.ndarray] = []
    for pl in pos_lists:
        p = np.asarray(pl, dtype=np.uint64)
        deltas = np.diff(p, prepend=np.uint64(0)) if p.size else p
        stream.append(np.concatenate(([np.uint64(p.size)], deltas)))
    if not stream:
        return b""
    return varint_encode(np.concatenate(stream))


def decode_positions(buf: bytes, n_postings: int) -> list[np.ndarray]:
    vals = varint_decode(buf)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_postings):
        cnt = int(vals[i]); i += 1
        out.append(np.cumsum(vals[i:i + cnt].astype(np.int64)))
        i += cnt
    return out


# ---------------------------------------------------------------------------
# block encode (one (field, term, bucket) group → ≤⌈w/128⌉ block rows)
# ---------------------------------------------------------------------------

def encode_term_bucket(field: str, term: str, bucket: int,
                       doc_ids: np.ndarray, tfs: np.ndarray,
                       dls: np.ndarray, pos_lists: list[list[int]]) -> list[dict]:
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    dls = np.asarray(dls, dtype=np.int64)[order]
    pos_lists = [pos_lists[i] for i in order]
    rows: list[dict] = []
    for blk, s in enumerate(range(0, doc_ids.size, BLOCK_SIZE)):
        e = min(s + BLOCK_SIZE, doc_ids.size)
        ids = doc_ids[s:e]
        w = tfs[s:e]
        deltas = np.diff(ids.astype(np.uint64), prepend=np.uint64(ids[0]))
        deltas[0] = np.uint64(ids[0])
        const = float(w[0]) if np.all(w == w[0]) else None
        rows.append(
            {
                "field": field,
                "term": term,
                "bucket": int(bucket),
                "blk": blk,
                "n": int(e - s),
                "min_id": int(ids[0]),
                "max_id": int(ids[-1]),
                "max_weight": float(w.max()),
                "min_len": int(dls[s:e].min()),
                "w_const": const,
                "ids": varint_encode(deltas),
                "weights": None if const is not None else _pack_for(w, "<u4"),
                "positions": encode_positions(pos_lists[s:e]),
                "lens": _pack_for(dls[s:e], "<u2"),
            }
        )
    return rows


def decode_blocks_pdf(pdf: pd.DataFrame, want_positions: bool = False) -> pd.DataFrame:
    """Decode block rows → flat postings (field, term, doc_id, tf, dl[, positions])."""
    cols: dict[str, list] = {"field": [], "term": [], "doc_id": [], "tf": [], "dl": []}
    if want_positions:
        cols["positions"] = []
    for row in pdf.itertuples(index=False):
        ids = np.cumsum(varint_decode(row.ids).astype(np.int64))
        n = int(row.n)
        if row.w_const is not None and not (isinstance(row.w_const, float) and np.isnan(row.w_const)):
            tf = np.full(n, float(row.w_const))
        else:
            tf = _unpack_for(row.weights, "<u4").astype(np.float64)
        dl = _unpack_for(row.lens, "<u2").astype(np.int64)
        cols["field"].extend([row.field] * n)
        cols["term"].extend([row.term] * n)
        cols["doc_id"].extend(ids.tolist())
        cols["tf"].extend(tf.tolist())
        cols["dl"].extend(dl.tolist())
        if want_positions:
            cols["positions"].extend([p.tolist() for p in decode_positions(row.positions, n)])
    return pd.DataFrame(cols)
