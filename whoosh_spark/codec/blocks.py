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
        T.StructField("sum_tf", T.LongType(), False),
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


def encode_positions_flat(flat: np.ndarray, counts: np.ndarray) -> bytes:
    """Vectorized positions stream: per posting varint(count) + delta-varints.

    ``flat`` is the concatenation of each posting's sorted position list,
    ``counts`` the per-posting list lengths.  Entirely numpy — no per-posting
    Python loop (the Spark-build hot path).
    """
    flat = np.asarray(flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    n_post = counts.size
    if n_post == 0:
        return b""
    starts = np.cumsum(counts) - counts            # into flat
    deltas = np.diff(flat, prepend=0)
    deltas[starts[counts > 0]] = flat[starts[counts > 0]]  # list-start: abs value
    out = np.empty(n_post + flat.size, dtype=np.uint64)
    cnt_idx = np.arange(n_post) + starts           # where each count lands
    out[cnt_idx] = counts.astype(np.uint64)
    mask = np.ones(out.size, dtype=bool)
    mask[cnt_idx] = False
    out[mask] = deltas.astype(np.uint64)
    return varint_encode(out)


def encode_positions(pos_lists: list[list[int]]) -> bytes:
    """Per posting: varint(count) then delta-varint sorted positions."""
    counts = np.asarray([len(p) for p in pos_lists], dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_lists if len(p)])
        if counts.sum()
        else np.zeros(0, dtype=np.int64)
    )
    return encode_positions_flat(flat, counts)


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

def _ragged_gather(values: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
                   order: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reorder ragged lists (flat ``values`` + per-list starts/lengths) by
    ``order`` without a per-list Python loop.  Returns (new_flat, new_lengths)."""
    ln = lengths[order]
    st = starts[order]
    total = int(ln.sum())
    if total == 0:
        return np.zeros(0, dtype=values.dtype), ln
    grp_start = np.cumsum(ln) - ln
    idx = np.arange(total, dtype=np.int64) - np.repeat(grp_start, ln) + np.repeat(st, ln)
    return values[idx], ln


def encode_term_bucket_flat(field: str, term: str, bucket: int,
                            doc_ids: np.ndarray, tfs: np.ndarray,
                            dls: np.ndarray, pos_flat: np.ndarray,
                            pos_counts: np.ndarray) -> list[dict]:
    """Encode one (field, term, bucket) group given FLAT position buffers.

    The vectorized hot path used by the Spark build (positions arrive as an
    Arrow ListArray = values + offsets; no Python list materialization).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    pos_counts = np.asarray(pos_counts, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    starts = np.cumsum(pos_counts) - pos_counts
    pos_flat, pos_counts = _ragged_gather(
        np.asarray(pos_flat, dtype=np.int64), starts, pos_counts, order)
    doc_ids = doc_ids[order]
    tfs = tfs[order]
    dls = dls[order]
    pstarts = np.cumsum(pos_counts) - pos_counts
    rows: list[dict] = []
    for blk, s in enumerate(range(0, doc_ids.size, BLOCK_SIZE)):
        e = min(s + BLOCK_SIZE, doc_ids.size)
        ids = doc_ids[s:e]
        w = tfs[s:e]
        deltas = np.diff(ids.astype(np.uint64), prepend=np.uint64(ids[0]))
        deltas[0] = np.uint64(ids[0])
        const = float(w[0]) if np.all(w == w[0]) else None
        ps = int(pstarts[s])
        pe = int(pstarts[e - 1] + pos_counts[e - 1])
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
                "sum_tf": int(w.sum()),
                "min_len": int(dls[s:e].min()),
                "w_const": const,
                "ids": varint_encode(deltas),
                "weights": None if const is not None else _pack_for(w, "<u4"),
                "positions": encode_positions_flat(pos_flat[ps:pe], pos_counts[s:e]),
                "lens": _pack_for(dls[s:e], "<u2"),
            }
        )
    return rows


def encode_term_bucket_blobs(field: str, term: str, bucket: int,
                             doc_ids: np.ndarray, tfs: np.ndarray,
                             dls: np.ndarray, blob_flat: np.ndarray,
                             blob_lens: np.ndarray) -> list[dict]:
    """Encode one group whose positions are PRE-ENCODED per-posting varint
    blobs (``varint(count) + delta-varints`` — produced by the analyzer UDF).
    The block positions stream is the byte concatenation in doc order, which
    is byte-identical to what ``encode_term_bucket_flat`` emits.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    blob_lens = np.asarray(blob_lens, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    bstarts = np.cumsum(blob_lens) - blob_lens
    blob_flat, blob_lens = _ragged_gather(
        np.asarray(blob_flat, dtype=np.uint8), bstarts, blob_lens, order)
    doc_ids = doc_ids[order]
    tfs = tfs[order]
    dls = dls[order]
    bstarts = np.cumsum(blob_lens) - blob_lens
    rows: list[dict] = []
    for blk, s in enumerate(range(0, doc_ids.size, BLOCK_SIZE)):
        e = min(s + BLOCK_SIZE, doc_ids.size)
        ids = doc_ids[s:e]
        w = tfs[s:e]
        deltas = np.diff(ids.astype(np.uint64), prepend=np.uint64(ids[0]))
        deltas[0] = np.uint64(ids[0])
        const = float(w[0]) if np.all(w == w[0]) else None
        bs = int(bstarts[s])
        be = int(bstarts[e - 1] + blob_lens[e - 1])
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
                "sum_tf": int(w.sum()),
                "min_len": int(dls[s:e].min()),
                "w_const": const,
                "ids": varint_encode(deltas),
                "weights": None if const is not None else _pack_for(w, "<u4"),
                "positions": blob_flat[bs:be].tobytes(),
                "lens": _pack_for(dls[s:e], "<u2"),
            }
        )
    return rows


def encode_term_bucket(field: str, term: str, bucket: int,
                       doc_ids: np.ndarray, tfs: np.ndarray,
                       dls: np.ndarray, pos_lists: list[list[int]]) -> list[dict]:
    counts = np.asarray([len(p) for p in pos_lists], dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_lists if len(p)])
        if counts.sum()
        else np.zeros(0, dtype=np.int64)
    )
    return encode_term_bucket_flat(field, term, bucket, doc_ids, tfs, dls, flat, counts)


_ARROW_FIELDS = [
    ("field", "string"), ("term", "string"), ("bucket", "int64"),
    ("blk", "int32"), ("n", "int32"), ("min_id", "int64"), ("max_id", "int64"),
    ("max_weight", "float64"), ("sum_tf", "int64"), ("min_len", "int32"),
    ("w_const", "float64"), ("ids", "binary"), ("weights", "binary"),
    ("positions", "binary"), ("lens", "binary"),
]


def _binary_column_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """BinaryArray column → (contiguous uint8 flat buffer, per-row byte lens).

    Normalizes arbitrary slicing/chunking with one vectorized ragged gather.
    """
    arr = col.combine_chunks()
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=len(arr) + 1, offset=arr.offset * 4).astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offsets)
    flat, lens = _ragged_gather(
        data, offsets[:-1], lens, np.arange(lens.size, dtype=np.int64))
    return flat, lens


def encode_group_arrow(key, table):
    """``groupBy(field, term, bucket).applyInArrow`` encoder.

    Positions come in as an Arrow ListArray; we use its raw value buffer +
    offsets directly (zero-copy) and never build Python lists.
    """
    import pyarrow as pa

    field, term, bucket = (k.as_py() if hasattr(k, "as_py") else k for k in key)
    doc_ids = table.column("doc_id").to_numpy(zero_copy_only=False)
    tfs = table.column("tf").to_numpy(zero_copy_only=False)
    dls = table.column("dl").to_numpy(zero_copy_only=False)
    blob_flat, blob_lens = _binary_column_buffers(table.column("pos_blob"))
    rows = encode_term_bucket_blobs(
        field, term, int(bucket), doc_ids, tfs, dls, blob_flat, blob_lens)
    cols = {name: [r[name] for r in rows] for name, _ in _ARROW_FIELDS}
    arrays = [pa.array(cols[name], type=getattr(pa, t)()) for name, t in _ARROW_FIELDS]
    return pa.table(arrays, names=[name for name, _ in _ARROW_FIELDS])


def encode_sorted_stream(batches):
    """``mapInArrow`` encoder over a partition hash-partitioned by
    (field, term, bucket) and sorted by (field, term, bucket, doc_id).

    Encodes EVERY group in a batch in one Python call (numpy run detection on
    the sort key), carrying the trailing partial group across Arrow batch
    boundaries — per-group overhead is a numpy slice, not a Spark UDF call.
    This is the build hot path; ``encode_group_arrow`` (applyInArrow) is kept
    as the simple/reference formulation.
    """
    import pyarrow as pa

    carry: "pa.Table | None" = None
    out_schema = pa.schema([(n, getattr(pa, t)()) for n, t in _ARROW_FIELDS])

    def _encode_table(tbl: "pa.Table") -> "pa.RecordBatch | None":
        if tbl.num_rows == 0:
            return None
        fields = np.asarray(tbl.column("field").to_pylist(), dtype=object)
        terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
        buckets = tbl.column("bucket").to_numpy(zero_copy_only=False)
        doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = tbl.column("tf").to_numpy(zero_copy_only=False)
        dls = tbl.column("dl").to_numpy(zero_copy_only=False)
        blob_flat, blob_lens = _binary_column_buffers(tbl.column("pos_blob"))
        bstarts = np.cumsum(blob_lens) - blob_lens
        chg = np.nonzero((terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
                         | (fields[1:] != fields[:-1]))[0] + 1
        bounds = np.concatenate(([0], chg, [terms.size]))
        rows: list[dict] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            bs = int(bstarts[s])
            be = int(bstarts[e - 1] + blob_lens[e - 1])
            rows.extend(
                encode_term_bucket_blobs(
                    fields[s], terms[s], int(buckets[s]),
                    doc_ids[s:e], tfs[s:e], dls[s:e],
                    blob_flat[bs:be], blob_lens[s:e],
                )
            )
        cols = {name: [r[name] for r in rows] for name, _ in _ARROW_FIELDS}
        arrays = [pa.array(cols[n], type=getattr(pa, t)()) for n, t in _ARROW_FIELDS]
        return pa.RecordBatch.from_arrays(arrays, names=[n for n, _ in _ARROW_FIELDS])

    def _split_tail(tbl: "pa.Table"):
        """Split off the trailing (possibly incomplete) group."""
        n = tbl.num_rows
        # groups are bounded (≤ 2^DOC_BUCKET_BITS docs); scan a bounded suffix
        from whoosh_spark.config import DOC_BUCKET_BITS

        win = min(n, (1 << DOC_BUCKET_BITS) + 1)
        terms = tbl.column("term").slice(n - win).to_pylist()
        buckets = tbl.column("bucket").slice(n - win).to_pylist()
        last_t, last_b = terms[-1], buckets[-1]
        s = win - 1
        while s > 0 and terms[s - 1] == last_t and buckets[s - 1] == last_b:
            s -= 1
        if s == 0 and win < n:
            # pathological: group larger than window — fall back to full scan
            terms = tbl.column("term").to_pylist()
            buckets = tbl.column("bucket").to_pylist()
            s = n - 1
            while s > 0 and terms[s - 1] == last_t and buckets[s - 1] == last_b:
                s -= 1
            return tbl.slice(0, s), tbl.slice(s)
        return tbl.slice(0, n - win + s), tbl.slice(n - win + s)

    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        if carry is not None:
            tbl = pa.concat_tables([carry, tbl]).combine_chunks()
        head, carry = _split_tail(tbl)
        rb = _encode_table(head)
        if rb is not None and rb.num_rows:
            yield rb
    if carry is not None:
        rb = _encode_table(carry.combine_chunks())
        if rb is not None and rb.num_rows:
            yield rb
    if carry is None:
        # empty partition: yield nothing (schema known to Spark)
        return


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
