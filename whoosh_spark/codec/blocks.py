"""Posting-block codec: delta + varint doc ids, FOR-packed weights, varint
position streams, per-block max-weight / id-range / min-length metadata.

Mirrors the *computation* of whoosh's W3 codec
(``src/whoosh/codec/whoosh3.py::W3PostingsWriter ≈L520`` — 128-posting blocks,
per-block maxweight/maxid, delta-compressed ids, all-equal-weight shortcut;
SURVEY.md §2.3) as numpy kernels that run inside ``applyInPandas`` groups.

Block identity is deterministic on the group's (doc_id, tf, dl) content only
(blocks are carved from the ``(term, doc_id >> DOC_BUCKET_BITS)`` group in
``_carve_order`` — impact order by default, see config.BLOCK_LAYOUT), so the
encoded table is invariant under input partitioning AND hot terms are spread
over bounded-size groups (skew handling, SURVEY.md §4.2).
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


def varint_decode(buf) -> np.ndarray:
    """Decode a varint stream (bytes or contiguous uint8 array) back to
    uint64 array."""
    if len(buf) == 0:
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


def positions_stream(flat: np.ndarray,
                     counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved positions stream values (pre-varint): per posting
    ``count`` then delta-encoded positions.  Returns ``(stream, cnt_idx)``
    where ``cnt_idx`` marks each posting's count slot — the one place the
    stream format lives (encode_positions_flat AND the plaintext codec's
    re-blob both build from it)."""
    flat = np.asarray(flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    n_post = counts.size
    starts = np.cumsum(counts) - counts            # into flat
    deltas = np.diff(flat, prepend=0)
    deltas[starts[counts > 0]] = flat[starts[counts > 0]]  # list-start: abs value
    stream = np.empty(n_post + flat.size, dtype=np.uint64)
    cnt_idx = np.arange(n_post, dtype=np.int64) + starts  # count slots
    stream[cnt_idx] = counts.astype(np.uint64)
    mask = np.ones(stream.size, dtype=bool)
    mask[cnt_idx] = False
    stream[mask] = deltas.astype(np.uint64)
    return stream, cnt_idx


def encode_positions_flat(flat: np.ndarray, counts: np.ndarray) -> bytes:
    """Vectorized positions stream: per posting varint(count) + delta-varints.

    ``flat`` is the concatenation of each posting's sorted position list,
    ``counts`` the per-posting list lengths.  Entirely numpy — no per-posting
    Python loop (the Spark-build hot path).
    """
    if np.asarray(counts).size == 0:
        return b""
    stream, _ = positions_stream(flat, counts)
    return varint_encode(stream)


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


def _carve_order(doc_ids: np.ndarray, tfs: np.ndarray,
                 dls: np.ndarray) -> np.ndarray:
    """Permutation deciding block MEMBERSHIP and intra-block order.

    "docid" layout: plain doc_id sort (blocks = contiguous id ranges).
    "impact" layout (default): membership from the (tf desc, dl asc,
    doc_id asc) order — block b gets the b-th 128-slice of that ranking,
    so (max_weight, min_len) is tight per block and non-increasing across
    blocks — then ids re-sorted ASC within each block so the delta-varint
    stream and the decoder's per-block binary searches are unchanged.
    Deterministic (total order includes doc_id), so build invariance
    (1≡4≡32 writers) is preserved.  Single-block groups are identical
    under both layouts."""
    from whoosh_spark.config import BLOCK_LAYOUT

    if BLOCK_LAYOUT != "impact" or doc_ids.size <= BLOCK_SIZE:
        return np.argsort(doc_ids, kind="stable")
    o = np.lexsort((doc_ids, dls, -tfs))
    blk = np.empty(o.size, dtype=np.int64)
    blk[o] = np.arange(o.size, dtype=np.int64) // BLOCK_SIZE
    return np.lexsort((doc_ids, blk))


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
    order = _carve_order(doc_ids, tfs, dls)
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
    order = _carve_order(doc_ids, tfs, dls)
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
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
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

    def _group_change_mask(tbl: "pa.Table") -> np.ndarray:
        """bool[n-1]: True where row i+1 starts a new (field, term, bucket)
        group — vectorized in Arrow C kernels, no Python string loop."""
        import pyarrow.compute as pc

        n = tbl.num_rows
        out = np.zeros(n - 1, dtype=bool) if n else np.zeros(0, dtype=bool)
        for colname in ("field", "term", "bucket"):
            col = tbl.column(colname).combine_chunks()
            neq = pc.invert(pc.equal(col.slice(1), col.slice(0, n - 1)))
            out |= neq.to_numpy(zero_copy_only=False)
        return out

    def _encode_table(tbl: "pa.Table") -> "pa.RecordBatch | None":
        if tbl.num_rows == 0:
            return None
        term_col = tbl.column("term")
        field_col = tbl.column("field")
        buckets = tbl.column("bucket").to_numpy(zero_copy_only=False)
        doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = tbl.column("tf").to_numpy(zero_copy_only=False)
        dls = tbl.column("dl").to_numpy(zero_copy_only=False)
        blob_flat, blob_lens = _binary_column_buffers(tbl.column("pos_blob"))
        bstarts = np.cumsum(blob_lens) - blob_lens
        chg = np.nonzero(_group_change_mask(tbl))[0] + 1
        bounds = np.concatenate(([0], chg, [tbl.num_rows]))
        rows: list[dict] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            bs = int(bstarts[s])
            be = int(bstarts[e - 1] + blob_lens[e - 1])
            rows.extend(
                encode_term_bucket_blobs(
                    field_col[s].as_py(), term_col[s].as_py(), int(buckets[s]),
                    doc_ids[s:e], tfs[s:e], dls[s:e],
                    blob_flat[bs:be], blob_lens[s:e],
                )
            )
        cols = {name: [r[name] for r in rows] for name, _ in _ARROW_FIELDS}
        arrays = [pa.array(cols[n], type=getattr(pa, t)()) for n, t in _ARROW_FIELDS]
        return pa.RecordBatch.from_arrays(arrays, names=[n for n, _ in _ARROW_FIELDS])

    def _split_tail(tbl: "pa.Table"):
        """Split off the trailing (possibly incomplete) group (vectorized)."""
        n = tbl.num_rows
        chg = _group_change_mask(tbl)
        nz = np.nonzero(chg)[0]
        s = int(nz[-1]) + 1 if nz.size else 0
        return tbl.slice(0, s), tbl.slice(s)

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


# ---------------------------------------------------------------------------
# Two-level build: per-partition RUNS → shuffle → merge into blocks.
#
# Whoosh's MpWriter has each subprocess build a sorted sub-segment and the
# parent merge them (``src/whoosh/multiproc.py::MpWriter ≈L150``).  The Spark
# restatement: each analyze partition emits ONE compressed run row per
# (term, doc-bucket) — ids delta-varint, tfs varint, dls u2, position blobs
# concatenated with a u2 length directory — so the wide shuffle moves
# ~#partitions × #terms×buckets small rows instead of one row per posting
# (measured ~6x fewer bytes, ~200x fewer rows at 1M docs).  The reduce side
# k-way-merges runs per group by doc_id (vectorized argsort) and carves the
# standard 128-posting blocks with the same kernels as the direct path.
# ---------------------------------------------------------------------------

RUNS_SCHEMA_PA = [
    ("term", "string"), ("bucket", "int64"), ("n", "int32"),
    ("min_id", "int64"), ("max_id", "int64"), ("sum_tf", "int64"),
    ("max_tf", "int64"), ("min_dl", "int32"),
    ("ids", "binary"), ("tfs", "binary"), ("dls", "binary"),
    ("blobs", "binary"), ("blob_lens", "binary"),
]


def _varint_lens(values: np.ndarray) -> np.ndarray:
    # full 10-byte LEB128 width table — must match varint_encode exactly for
    # every value (byte offsets of run slices are derived from these lens; a
    # truncated table silently misaligns postings for ids >= 2^42, e.g.
    # hashed 64-bit doc ids cast to long)
    v = values.astype(np.uint64)
    lens = np.ones(v.size, dtype=np.int64)
    for shift in (7, 14, 21, 28, 35, 42, 49, 56, 63):
        lens += v >= np.uint64(1 << shift)
    return lens


def build_runs_arrow(field: str, bucket_bits: int):
    """mapInArrow fn over ANALYZED rows → per-partition run rows.

    Whole-partition vectorization: one dictionary-encode for terms, one
    lexsort, whole-stream varint encodes sliced per run by byte prefix sums.
    """
    import pyarrow as pa

    def fn(batches):
        doc_ids_l, dls_l, term_chunks, tf_l, blob_v_l, blob_l_l = [], [], [], [], [], []
        for batch in batches:
            t = pa.Table.from_batches([batch])
            terms = t.column("terms").combine_chunks()
            toff = terms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            counts = np.diff(toff)
            doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            dls = t.column("dl").to_numpy(zero_copy_only=False)
            doc_ids_l.append(np.repeat(doc_ids, counts))
            dls_l.append(np.repeat(dls, counts))
            term_chunks.append(terms.values)  # flat string array
            tfs = t.column("tfs").combine_chunks()
            tf_l.append(tfs.values.to_numpy(zero_copy_only=False))
            blobs = t.column("pos_blobs").combine_chunks()
            bval, blens = _binary_column_buffers(blobs.values)
            blob_v_l.append(bval)
            blob_l_l.append(blens)
        if not doc_ids_l:
            return
        doc_ids = np.concatenate(doc_ids_l)
        if doc_ids.size == 0:
            return
        dls = np.concatenate(dls_l)
        tfs = np.concatenate(tf_l)
        blob_vals = np.concatenate(blob_v_l) if blob_v_l else np.zeros(0, np.uint8)
        blob_lens = np.concatenate(blob_l_l)
        term_arr = pa.concat_arrays(
            [c.cast(pa.string()) for c in term_chunks]).dictionary_encode()
        term_idx = term_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = term_arr.dictionary

        buckets = doc_ids >> bucket_bits
        order = np.lexsort((doc_ids, buckets, term_idx))
        term_idx = term_idx[order]
        buckets = buckets[order]
        doc_ids = doc_ids[order]
        dls = dls[order]
        tfs = tfs[order]
        bstarts = np.cumsum(blob_lens) - blob_lens
        blob_vals, blob_lens = _ragged_gather(blob_vals, bstarts, blob_lens, order)

        chg = np.nonzero((term_idx[1:] != term_idx[:-1]) | (buckets[1:] != buckets[:-1]))[0] + 1
        bounds = np.concatenate(([0], chg, [term_idx.size]))
        n_runs = bounds.size - 1
        run_lens = np.diff(bounds)

        # ids: delta within run (first = absolute), whole-stream varint
        deltas = np.diff(doc_ids, prepend=0)
        deltas[bounds[:-1]] = doc_ids[bounds[:-1]]
        ids_stream = varint_encode(deltas.astype(np.uint64))
        ids_b = np.cumsum(np.concatenate(([0], _varint_lens(deltas))))
        tfs_stream = varint_encode(tfs.astype(np.uint64))
        tfs_b = np.cumsum(np.concatenate(([0], _varint_lens(tfs))))
        dls_u2 = dls.astype("<u2").tobytes()
        blob_b = np.cumsum(np.concatenate(([0], blob_lens)))
        ids_np = np.frombuffer(ids_stream, dtype=np.uint8)
        tfs_np = np.frombuffer(tfs_stream, dtype=np.uint8)
        dls_np = np.frombuffer(dls_u2, dtype=np.uint8)

        # per-run aggregates (vectorized segment reductions)
        min_ids = doc_ids[bounds[:-1]]
        max_ids = doc_ids[bounds[1:] - 1]
        sum_tf = np.add.reduceat(tfs, bounds[:-1])
        max_tf = np.maximum.reduceat(tfs, bounds[:-1])
        min_dl = np.minimum.reduceat(dls, bounds[:-1])

        run_terms = dictionary.take(pa.array(term_idx[bounds[:-1]], type=pa.int64()))
        bl_prefix = np.cumsum(np.concatenate(([0], _varint_lens(blob_lens))))
        blob_lens_stream = np.frombuffer(varint_encode(blob_lens.astype(np.uint64)),
                                         dtype=np.uint8)
        dls_prefix = np.arange(doc_ids.size + 1, dtype=np.int64) * 2
        blob_flat = np.frombuffer(blob_vals.tobytes(), dtype=np.uint8)

        def _bin_col(flat: np.ndarray, prefix: np.ndarray, r0: int, r1: int):
            # Arrow binary offsets are int32; slice the flat stream so each
            # emitted batch's offsets restart at 0 (the emission loop below
            # caps every slice under 2**30 bytes — a whole-partition batch
            # would silently wrap negative past 2 GiB)
            offs = prefix[bounds[r0:r1 + 1]].astype(np.int64)
            start = int(offs[0])
            offs32 = (offs - start).astype(np.int32)
            return pa.BinaryArray.from_buffers(
                pa.binary(), r1 - r0,
                [None, pa.py_buffer(offs32.tobytes()),
                 pa.py_buffer(flat[start:int(offs[-1])].tobytes())],
            )

        streams = [(ids_np, ids_b), (tfs_np, tfs_b), (dls_np, dls_prefix),
                   (blob_flat, blob_b), (blob_lens_stream, bl_prefix)]
        byte_cap = 1 << 30
        r0 = 0
        while r0 < n_runs:
            r1 = n_runs
            for _flat, pref in streams:
                cap = int(pref[bounds[r0]]) + byte_cap
                j = int(np.searchsorted(pref[bounds], cap, side="right")) - 1
                r1 = min(r1, max(j, r0 + 1))
            arrays = [
                run_terms.slice(r0, r1 - r0).cast(pa.string()),
                pa.array(buckets[bounds[r0:r1]], type=pa.int64()),
                pa.array(run_lens[r0:r1].astype(np.int32)),
                pa.array(min_ids[r0:r1], type=pa.int64()),
                pa.array(max_ids[r0:r1], type=pa.int64()),
                pa.array(sum_tf[r0:r1].astype(np.int64)),
                pa.array(max_tf[r0:r1].astype(np.int64)),
                pa.array(min_dl[r0:r1].astype(np.int32)),
                *[_bin_col(flat, pref, r0, r1) for flat, pref in streams],
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[n for n, _ in RUNS_SCHEMA_PA])
            r0 = r1

    return fn


def merge_runs_stream(field: str):
    """mapInArrow fn over (term, bucket)-partitioned+sorted RUN rows →
    BLOCKS_SCHEMA rows.  Per group: decode each run, k-way merge by doc_id
    (argsort over the concatenation), carve 128-posting blocks."""
    import pyarrow as pa

    out_schema_names = [n for n, _ in _ARROW_FIELDS]

    def _mask(tbl):
        import pyarrow.compute as pc

        n = tbl.num_rows
        out = np.zeros(max(n - 1, 0), dtype=bool)
        for colname in ("term", "bucket"):
            col = tbl.column(colname).combine_chunks()
            neq = pc.invert(pc.equal(col.slice(1), col.slice(0, n - 1)))
            out |= neq.to_numpy(zero_copy_only=False)
        return out

    def _encode(tbl):
        if tbl.num_rows == 0:
            return None
        term_col = tbl.column("term")
        buckets = tbl.column("bucket").to_numpy(zero_copy_only=False)
        ns = tbl.column("n").to_numpy(zero_copy_only=False)
        ids_f, ids_l = _binary_column_buffers(tbl.column("ids"))
        tfs_f, tfs_l = _binary_column_buffers(tbl.column("tfs"))
        dls_f, dls_l = _binary_column_buffers(tbl.column("dls"))
        blob_f, blob_l = _binary_column_buffers(tbl.column("blobs"))
        bl_f, bl_l = _binary_column_buffers(tbl.column("blob_lens"))
        ids_starts = np.cumsum(ids_l) - ids_l
        tfs_starts = np.cumsum(tfs_l) - tfs_l
        dls_starts = np.cumsum(dls_l) - dls_l
        blob_starts = np.cumsum(blob_l) - blob_l
        bl_starts = np.cumsum(bl_l) - bl_l
        chg = np.nonzero(_mask(tbl))[0] + 1
        bounds = np.concatenate(([0], chg, [tbl.num_rows]))
        rows: list[dict] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            ids_parts, tf_parts, dl_parts, blen_parts, bloblist = [], [], [], [], []
            for r in range(s, e):
                ids = np.cumsum(varint_decode(
                    ids_f[ids_starts[r]:ids_starts[r] + ids_l[r]].tobytes()
                ).astype(np.int64))
                tfv = varint_decode(
                    tfs_f[tfs_starts[r]:tfs_starts[r] + tfs_l[r]].tobytes()
                ).astype(np.int64)
                dlv = np.frombuffer(
                    dls_f[dls_starts[r]:dls_starts[r] + dls_l[r]].tobytes(), "<u2"
                ).astype(np.int64)
                blv = varint_decode(
                    bl_f[bl_starts[r]:bl_starts[r] + bl_l[r]].tobytes()
                ).astype(np.int64)
                ids_parts.append(ids)
                tf_parts.append(tfv)
                dl_parts.append(dlv)
                blen_parts.append(blv)
                bloblist.append(blob_f[blob_starts[r]:blob_starts[r] + blob_l[r]])
            doc_ids = np.concatenate(ids_parts)
            tfs_m = np.concatenate(tf_parts)
            dls_m = np.concatenate(dl_parts)
            blens = np.concatenate(blen_parts)
            blobs = np.concatenate(bloblist)
            rows.extend(
                encode_term_bucket_blobs(
                    field, term_col[s].as_py(), int(buckets[s]),
                    doc_ids, tfs_m, dls_m, blobs, blens,
                )
            )
        cols = {name: [r[name] for r in rows] for name, _ in _ARROW_FIELDS}
        arrays = [pa.array(cols[n], type=getattr(pa, t)()) for n, t in _ARROW_FIELDS]
        return pa.RecordBatch.from_arrays(arrays, names=out_schema_names)

    def fn(batches):
        carry = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            chg = _mask(tbl)
            nz = np.nonzero(chg)[0]
            split = int(nz[-1]) + 1 if nz.size else 0
            head, carry = tbl.slice(0, split), tbl.slice(split)
            rb = _encode(head)
            if rb is not None and rb.num_rows:
                yield rb
        if carry is not None and carry.num_rows:
            rb = _encode(carry.combine_chunks())
            if rb is not None and rb.num_rows:
                yield rb

    return fn


def decode_blocks_pdf(pdf: pd.DataFrame, want_positions: bool = False) -> pd.DataFrame:
    """Decode block rows → flat postings (field, term, doc_id, tf, dl[, positions]).

    Vectorized over the batch: per-block varint decodes land in
    pre-concatenated numpy arrays (one np.repeat for the string columns, no
    per-posting Python lists) — this is the query-side hot loop, so the
    per-row Python work is one slice per ≤128-posting block, not per posting."""
    n_rows = len(pdf)
    ns = pdf["n"].to_numpy(dtype=np.int64) if n_rows else np.zeros(0, np.int64)
    total = int(ns.sum())
    ids_out = np.empty(total, dtype=np.int64)
    tf_out = np.empty(total, dtype=np.float64)
    dl_out = np.empty(total, dtype=np.int64)
    pos_out: list | None = [] if want_positions else None
    off = 0
    for row in pdf.itertuples(index=False):
        n = int(row.n)
        ids_out[off:off + n] = np.cumsum(varint_decode(row.ids).astype(np.int64))
        if row.w_const is not None and not (isinstance(row.w_const, float) and np.isnan(row.w_const)):
            tf_out[off:off + n] = float(row.w_const)
        else:
            tf_out[off:off + n] = _unpack_for(row.weights, "<u4")
        dl_out[off:off + n] = _unpack_for(row.lens, "<u2")
        if pos_out is not None:
            pos_out.extend(p.tolist() for p in decode_positions(row.positions, n))
        off += n
    cols = {
        "field": np.repeat(pdf["field"].to_numpy(), ns) if n_rows else [],
        "term": np.repeat(pdf["term"].to_numpy(), ns) if n_rows else [],
        "doc_id": ids_out,
        "tf": tf_out,
        "dl": dl_out,
    }
    if want_positions:
        cols["positions"] = pos_out
    return pd.DataFrame(cols)

def _segmented_cumsum(deltas: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Absolute values from per-segment delta streams, fully vectorized:
    one global cumsum, then subtract each segment's preceding prefix."""
    if deltas.size == 0:
        return deltas.astype(np.int64)
    cs = np.cumsum(deltas.astype(np.int64))
    starts = np.cumsum(counts) - counts
    prefix = np.concatenate(([0], cs))[starts]          # cumsum BEFORE segment
    return cs - np.repeat(prefix, counts)


def _positions_counts(vals: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Per-posting position counts from a concatenated positions stream.

    Fast path: in this codec the analyzer emits one position per occurrence,
    so counts == tf.  That coupling is VERIFIED, not assumed: the implied
    count slots must hold exactly the tf values and account for the whole
    stream; any mismatch (e.g. a foreign writer with boost-scaled weights)
    falls back to the sequential self-describing walk."""
    n_post = tfs.size
    counts = tfs.astype(np.int64)
    if counts.min(initial=0) >= 0:
        cnt_idx = np.arange(n_post, dtype=np.int64) + (np.cumsum(counts) - counts)
        if (vals.size == n_post + int(counts.sum())
                and cnt_idx.size
                and int(cnt_idx[-1]) < vals.size
                and np.array_equal(vals[cnt_idx].astype(np.int64), counts)):
            return counts
    # fallback: walk varint(count) + count deltas per posting
    out = np.empty(n_post, dtype=np.int64)
    vl = vals.tolist()
    i = 0
    for k in range(n_post):
        c = int(vl[i])
        out[k] = c
        i += 1 + c
    if i != len(vl):
        raise ValueError("corrupt positions stream: trailing bytes")
    return out


def decode_blocks_arrow(want_positions: bool = False, candidates=None):
    """``mapInArrow`` decoder: block rows → flat postings RecordBatches.

    Whole-BATCH vectorization (the query-side hot loop — the pandas variant
    above does one Python iteration per block row; at 5M docs a two-hot-term
    phrase decodes ~76k blocks/9.7M postings, where per-row slicing and the
    per-posting ``cumsum``/``tolist`` dominated the measured latency):

      * ids     — ONE ``varint_decode`` over the batch's concatenated id
                  blobs, then one segmented cumsum (delta → absolute).
      * weights — ONE ``frombuffer`` over the concatenated FOR streams,
                  scattered into const/non-const rows by mask.
      * lens    — ONE ``frombuffer``.
      * positions — ONE ``varint_decode`` + verified counts==tf fast path
                  (see ``_positions_counts``) + one segmented cumsum, emitted
                  as an Arrow ``ListArray`` (values + offsets, no Python
                  list-of-lists, no pandas object column).

    Output schema matches ``index._DECODE[_POS]_SCHEMA``.

    ``candidates`` (optional): a pyspark Broadcast of a SORTED int64 numpy
    array of doc ids.  Postings for other docs are dropped INSIDE the
    decoder — before they materialize as Arrow rows — so the Python→JVM
    transfer and every downstream exchange carry only candidate docs.  The
    phrase path uses this with the rarest word's doc set (a superset of any
    phrase match, so results are untouched).  Block parsing itself is not
    skipped: doc ids are delta-coded, so membership is only known after the
    varint decode + cumsum.
    """
    import pyarrow as pa

    def fn(batches):
        cand = candidates.value if candidates is not None else None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            t = pa.Table.from_batches([batch])
            ns = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            total = int(ns.sum())
            row_idx = np.repeat(np.arange(len(ns), dtype=np.int64), ns)

            # binary columns via the zero-copy Arrow buffer helper — ONE
            # contiguous uint8 view per column, never a Python bytes object
            # per block row (this is the query-side hot loop)
            ids_flat, _ = _binary_column_buffers(t.column("ids"))
            ids_all = varint_decode(ids_flat)
            doc_ids = _segmented_cumsum(ids_all, ns)

            # weights: w_const rows broadcast a scalar, others unpack FOR u4
            wc = t.column("w_const").to_numpy(zero_copy_only=False)
            const_row = ~np.isnan(wc)
            tf_out = np.empty(total, dtype=np.float64)
            const_post = const_row[row_idx]
            if const_post.any():
                tf_out[const_post] = np.repeat(wc[const_row], ns[const_row])
            if (~const_row).any():
                w_flat, w_lens = _binary_column_buffers(t.column("weights"))
                w_starts = np.cumsum(w_lens) - w_lens
                nc = np.nonzero(~const_row)[0]
                w_sel, _ = _ragged_gather(w_flat, w_starts, w_lens, nc)
                tf_out[~const_post] = w_sel.view("<u4")

            l_flat, _ = _binary_column_buffers(t.column("lens"))
            dl_out = l_flat.view("<u2").astype(np.int64)

            # candidate pruning: drop non-candidate postings HERE, before
            # any Arrow row is built (counts/offsets for the positions
            # stream still need every posting's tf, computed above)
            keep = None
            if cand is not None:
                if cand.size == 0:
                    continue
                at = np.minimum(np.searchsorted(cand, doc_ids),
                                cand.size - 1)
                keep = cand[at] == doc_ids
                if not keep.any():
                    continue
                if keep.all():
                    keep = None

            sel_rows = row_idx if keep is None else row_idx[keep]
            arrays = [
                t.column("field").combine_chunks().take(pa.array(sel_rows)),
                t.column("term").combine_chunks().take(pa.array(sel_rows)),
                pa.array(doc_ids if keep is None else doc_ids[keep],
                         type=pa.int64()),
                pa.array(tf_out if keep is None else tf_out[keep],
                         type=pa.float64()),
                pa.array(dl_out if keep is None else dl_out[keep],
                         type=pa.int64()),
            ]
            names = ["field", "term", "doc_id", "tf", "dl"]
            if want_positions:
                p_flat, _ = _binary_column_buffers(t.column("positions"))
                vals = varint_decode(p_flat)
                counts = _positions_counts(vals, tf_out)
                cnt_idx = (np.arange(total, dtype=np.int64)
                           + (np.cumsum(counts) - counts))
                dmask = np.ones(vals.size, dtype=bool)
                dmask[cnt_idx] = False
                data_vals = vals[dmask]
                if keep is not None:
                    # gather the kept postings' delta segments; each
                    # segment's cumsum is independent, so filtering before
                    # the decode is exact
                    data_vals, counts = _ragged_gather(
                        data_vals, np.cumsum(counts) - counts, counts,
                        np.nonzero(keep)[0])
                flat = _segmented_cumsum(data_vals, counts)
                offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
                arrays.append(pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()),
                    pa.array(flat, type=pa.int64())))
                names.append("positions")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return fn
