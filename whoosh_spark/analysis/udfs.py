"""Vectorized (Arrow-batched) analysis UDFs for the Spark build/query paths.

The hot path transfers whole Arrow batches between JVM and Python
(``pandas_udf``), loops documents inside the batch with the SAME CPython
function the oracle uses (``analysis.analyzers.analyze_text``), and returns
struct-of-arrays columns.  No per-row Spark↔Python roundtrip (input_hint:
"vectorized pandas/Arrow UDFs, no per-row Python").

Everything downstream of this UDF (explode, groupBy, joins, scoring) is pure
JVM / whole-stage-codegen DataFrame ops.
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whoosh_spark.analysis.analyzers import analyze_text
from whoosh_spark.config import BYTE_TO_LENGTH, LENGTH_BOUNDARIES

_ANALYZE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


@F.pandas_udf(_ANALYZE_SCHEMA)
def analyze_udf(texts: pd.Series) -> pd.DataFrame:
    """text → struct(tokens array<string>, positions array<int>).

    Positions keep stop-filter gaps (see analyzers.py).
    """
    toks: list[list[str]] = []
    poss: list[list[int]] = []
    for t in texts:
        tk, ps = analyze_text(t if isinstance(t, str) else "")
        toks.append(tk)
        poss.append(ps)
    return pd.DataFrame({"tokens": toks, "positions": poss})


# numpy views of the shared quantization table (config.py) for vectorized use.
_BOUNDS = np.asarray(LENGTH_BOUNDARIES, dtype=np.int64)
_B2L = np.asarray(BYTE_TO_LENGTH, dtype=np.int64)


@F.pandas_udf(T.IntegerType())
def quantize_len_udf(raw: pd.Series) -> pd.Series:
    """Raw token count → byte-quantized length (vectorized searchsorted)."""
    n = raw.fillna(0).to_numpy(dtype=np.int64)
    codes = np.searchsorted(_BOUNDS, n, side="right")
    return pd.Series(_B2L[codes].astype(np.int32))


def quantize_len_np(raw: np.ndarray) -> np.ndarray:
    """Vectorized quantization over a numpy int array (same table)."""
    codes = np.searchsorted(_BOUNDS, np.asarray(raw, dtype=np.int64), side="right")
    return _B2L[codes]


# ---------------------------------------------------------------------------
# One-pass analyze + per-doc posting aggregation (mapInArrow).
#
# Tokens of a document are doc-local, so the (term, doc) tf/position
# aggregation needs NO shuffle — it happens in the same CPython loop that the
# tokenizer already runs (SURVEY.md §3.1 Spark restatement).  The output is
# one compact row per document; pyarrow arrays are assembled from flat
# buffers + offsets (no per-row Python list construction on the Arrow side).
# ---------------------------------------------------------------------------

ANALYZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("len_raw", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("tfs", T.ArrayType(T.LongType()), False),
        # per term-entry varint stream: varint(count) + delta-varint positions.
        # Pre-encoded in the analyzer so the build shuffle moves ~1 byte per
        # position instead of 8 (this is the same byte format the posting
        # block stores, so the block encoder just concatenates).
        T.StructField("pos_blobs", T.ArrayType(T.BinaryType()), False),
    ]
)


def _analyze_rows(texts, fn_for_row):
    """Shared per-batch accumulation loop for every analyze kernel.

    ``fn_for_row(i) -> analyze_fn | None`` picks the chain for row i; None
    runs the inlined StandardAnalyzer loop (fast path, identical output to
    ``analyzers.analyze_text``).  One implementation on purpose: the routed
    kernel's contract is byte-identical output to the dedicated-chain
    kernel for the same (text, chain) pairs."""
    from whoosh_spark.analysis.analyzers import _TOKEN_RE_NC
    from whoosh_spark.config import MIN_WORD_SIZE, STOP_WORDS

    stop = STOP_WORDS
    minsize = MIN_WORD_SIZE
    findall = _TOKEN_RE_NC.findall

    len_raws: list[int] = []
    all_terms: list[str] = []
    all_tfs: list[int] = []
    flat_pos: list[int] = []
    entry_counts: list[int] = []  # positions per term-entry
    term_offsets = [0]            # per doc -> into all_terms

    for i, text in enumerate(texts):
        d: dict[str, list[int]] = {}
        fn = fn_for_row(i)
        if text and fn is None:
            for pos, t in enumerate(findall(text)):
                t = t.lower()
                if len(t) >= minsize and t not in stop:
                    lst = d.get(t)
                    if lst is None:
                        d[t] = [pos]
                    else:
                        lst.append(pos)
        elif text:
            toks, poss = fn(text)
            for t, pos in zip(toks, poss):
                lst = d.get(t)
                if lst is None:
                    d[t] = [pos]
                else:
                    lst.append(pos)
        n = 0
        for t, plist in d.items():
            all_terms.append(t)
            all_tfs.append(len(plist))
            entry_counts.append(len(plist))
            flat_pos.extend(plist)
            n += len(plist)
        term_offsets.append(len(all_terms))
        len_raws.append(n)

    return len_raws, all_terms, all_tfs, entry_counts, flat_pos, term_offsets


def make_analyze_batches(analyze_fn=None):
    """Factory for the mapInArrow analyze kernel.

    ``analyze_fn(text) -> (tokens, positions)`` swaps the analyzer chain
    (e.g. ``analyzers.analyze_text_stemming`` for a StemmingAnalyzer field);
    None uses the inlined StandardAnalyzer loop (fast path, identical output
    to ``analyzers.analyze_text``)."""

    def run(batches):
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            bufs = _analyze_rows(texts, lambda i: analyze_fn)
            yield _assemble_analyzed_batch(doc_ids, *bufs)

    return run


def make_routed_analyze_batches(routes: dict):
    """Per-row language-routed analyze kernel (mapInArrow over batches of
    ``(doc_id, text, lang)``): each document is analyzed by the chain
    registered for ITS language (``routes[lang]``), falling back to the
    inlined StandardAnalyzer loop for unrouted codes — upstream's
    per-language ``LanguageAnalyzer`` made corpus-shaped (the input_hint
    table carries a ``lang`` column; a 10^12-doc crawl is multilingual, so
    routing must happen inside the ONE analyze pass, not as one job per
    language)."""

    def run(batches):
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            langs = batch.column(2).to_pylist()
            fns = [routes.get(lang) if lang is not None else None
                   for lang in langs]
            bufs = _analyze_rows(texts, fns.__getitem__)
            yield _assemble_analyzed_batch(doc_ids, *bufs)

    return run


def _assemble_analyzed_batch(doc_ids, len_raws, all_terms, all_tfs,
                             entry_counts, flat_pos, term_offsets):
    """Flat per-batch analysis buffers → one ANALYZED_SCHEMA RecordBatch
    (shared by the raw-text analyze kernel and the pair-derivation kernel,
    so both produce byte-identical output for the same token stream)."""
    import pyarrow as pa

    from whoosh_spark.codec.blocks import varint_encode

    # ---- vectorized varint encode of ALL entries at once ----
    counts = np.asarray(entry_counts, dtype=np.int64)
    flat = np.asarray(flat_pos, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    deltas = np.diff(flat, prepend=0)
    nz = counts > 0
    deltas[starts[nz]] = flat[starts[nz]]
    # interleave: [count, d1..dk] per entry
    n_ent = counts.size
    stream = np.empty(n_ent + flat.size, dtype=np.uint64)
    cnt_idx = np.arange(n_ent) + starts
    stream[cnt_idx] = counts.astype(np.uint64)
    mask = np.ones(stream.size, dtype=bool)
    mask[cnt_idx] = False
    stream[mask] = deltas.astype(np.uint64)
    data = varint_encode(stream)
    # per-value byte widths → per-entry blob byte lengths →
    # offsets — the codec's OWN width table, so the two can never
    # desynchronize (blob offsets derive from these widths)
    from whoosh_spark.codec.blocks import _varint_lens

    val_bounds = np.concatenate(([0], np.cumsum(_varint_lens(stream))))
    ent_val_starts = cnt_idx  # index of each entry's first value (its count)
    ent_byte_off = np.empty(n_ent + 1, dtype=np.int32)
    ent_byte_off[:-1] = val_bounds[ent_val_starts]
    ent_byte_off[-1] = val_bounds[-1]
    blobs = pa.BinaryArray.from_buffers(
        pa.binary(), n_ent,
        [None, pa.py_buffer(ent_byte_off.tobytes()), pa.py_buffer(data)],
    )

    len_arr = np.asarray(len_raws, dtype=np.int32)
    dl_arr = quantize_len_np(len_arr).astype(np.int32)
    t_off = pa.array(term_offsets, type=pa.int32())
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, type=pa.int64()),
            pa.array(len_arr),
            pa.array(dl_arr),
            pa.ListArray.from_arrays(t_off, pa.array(all_terms, type=pa.string())),
            pa.ListArray.from_arrays(t_off, pa.array(all_tfs, type=pa.int64())),
            pa.ListArray.from_arrays(t_off, blobs),
        ],
        names=["doc_id", "len_raw", "dl", "terms", "tfs", "pos_blobs"],
    )


# default StandardAnalyzer kernel (the name the build path imports)
analyze_batches_arrow = make_analyze_batches()


def make_pairs_from_analyzed(hot=None, k: int = 2):
    """mapInArrow kernel: parent ANALYZED rows (positions format) → the
    adjacent-k-gram ANALYZED rows (k=2 pairs, k=3 trigrams), WITHOUT
    re-tokenizing the raw corpus.

    The persisted ``analyzed/`` segment already holds every (term,
    positions) entry per doc, so the pair stream ("a b" wherever
    ``pos(b) == pos(a)+1``, both constituents in ``hot`` when a threshold
    is set) is derivable by inverting positions → tokens — skipping the
    regex tokenize + lowercase + stop pass over raw web-page text that
    made the pair build cost ≈the main build (measured 0.92-1.0×; the
    round-4 scale-soak watch item).  Decode and re-encode are vectorized
    (the codec's own varint/segmented-cumsum kernels); only pair-string
    assembly loops in Python, over matched adjacencies.

    Output is byte-identical to running ``make_analyze_batches(
    make_hot_pairs_fn(hot))`` over the raw text: entries appear in
    first-occurrence order of the pair stream because positions are
    iterated ascending, exactly like the text-path loop (pinned by
    tests/test_pairs_from_analyzed.py)."""

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from whoosh_spark.codec.blocks import (
            _binary_column_buffers,
            _ragged_gather,
            _segmented_cumsum,
            varint_decode,
        )

        hs = hot
        hot_arr = None  # pyarrow value_set, built once per task
        for batch in batches:
            if hs is not None and hasattr(hs, "value"):
                hs = hs.value  # pyspark Broadcast → resolve once
            if hs is not None and hot_arr is None:
                hot_arr = pa.array(sorted(hs), type=pa.string())
            n_docs = batch.num_rows
            doc_ids = batch.column(0).to_pylist()
            terms_col = batch.column(3)
            terms_col = (terms_col.combine_chunks()
                         if hasattr(terms_col, "combine_chunks") else terms_col)
            t_off = np.frombuffer(
                terms_col.buffers()[1], dtype=np.int32,
                count=n_docs + 1,
                offset=terms_col.offset * 4).astype(np.int64)
            terms_arr = terms_col.flatten()
            tfs_col = batch.column(4)
            tfs_col = (tfs_col.combine_chunks()
                       if hasattr(tfs_col, "combine_chunks") else tfs_col)
            tfs_all = tfs_col.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            blob_col = batch.column(5)
            blob_col = (blob_col.combine_chunks()
                        if hasattr(blob_col, "combine_chunks") else blob_col)
            blob_flat, blob_lens = _binary_column_buffers(blob_col.flatten())

            n_ent_all = tfs_all.size
            ent_per_doc = np.diff(t_off)
            doc_of_ent_all = np.repeat(
                np.arange(n_docs, dtype=np.int64), ent_per_doc)

            # hot filter FIRST, vectorized in Arrow C++ (pc.is_in): only
            # hot-term entries can contribute a pair, and a dropped
            # neighbor leaves a position GAP, which is exactly the
            # no-adjacency outcome its pairs must have — so decode, sort,
            # and string materialization all shrink to the hot share
            if hot_arr is not None and n_ent_all:
                hot_mask = pc.is_in(terms_arr, value_set=hot_arr) \
                    .to_numpy(zero_copy_only=False)
                hot_mask = np.asarray(hot_mask, dtype=bool)
                kept = np.nonzero(hot_mask)[0]
            else:
                kept = np.arange(n_ent_all, dtype=np.int64)
            n_ent = kept.size
            tfs_flat = tfs_all[kept]
            # decode ONLY the kept entries' blobs: ragged-gather their
            # byte ranges into one stream, then one vectorized varint pass
            byte_off = np.concatenate(
                ([0], np.cumsum(blob_lens))).astype(np.int64)
            if n_ent != n_ent_all:
                blob_kept, _ = _ragged_gather(
                    blob_flat, byte_off[:-1], blob_lens, kept)
            else:
                blob_kept = blob_flat
            vals = varint_decode(blob_kept)
            cnt_idx = (np.arange(n_ent, dtype=np.int64)
                       + (np.cumsum(tfs_flat) - tfs_flat))
            if vals.size != n_ent + int(tfs_flat.sum()) or (
                    n_ent and not np.array_equal(
                        vals[cnt_idx].astype(np.int64), tfs_flat)):
                raise ValueError(
                    "pair derivation needs the positions posting format — "
                    "this analyzed segment's payload does not carry one "
                    "position per occurrence (rebuild with "
                    "format='positions' or pass the raw corpus)")
            dmask = np.ones(vals.size, dtype=bool)
            dmask[cnt_idx] = False
            pos_flat = _segmented_cumsum(
                vals[dmask].astype(np.int64), tfs_flat)

            # strings only for the kept entries (the ~hot share), via one
            # Arrow take — no full-batch to_pylist
            terms_flat = (terms_arr.take(pa.array(kept)).to_pylist()
                          if n_ent != n_ent_all else terms_arr.to_pylist())
            doc_of_ent = doc_of_ent_all[kept]
            ent_of_pos = np.repeat(
                np.arange(n_ent, dtype=np.int64), tfs_flat)
            doc_of_pos = doc_of_ent[ent_of_pos]
            order = np.lexsort((pos_flat, doc_of_pos))
            sp = pos_flat[order]
            sd = doc_of_pos[order]
            se = ent_of_pos[order]
            if sp.size >= k:
                adj = (sd[1:] == sd[:-1]) & (sp[1:] == sp[:-1] + 1)
                # a k-gram at j needs k-1 consecutive adjacencies
                good = adj if k == 2 else adj[: adj.size - (k - 2)].copy()
                for step in range(1, k - 1):
                    good = good & adj[step: step + good.size]
                matched = np.nonzero(good)[0]
            else:
                matched = np.empty(0, dtype=np.int64)

            len_raws: list[int] = []
            all_terms: list[str] = []
            all_tfs: list[int] = []
            flat_pos: list[int] = []
            entry_counts: list[int] = []
            term_offsets = [0]
            mi, m_n = 0, matched.size
            for di in range(n_docs):
                d: dict[str, list[int]] = {}
                n = 0
                while mi < m_n:
                    j = matched[mi]
                    if sd[j] != di:
                        break
                    pair = " ".join(terms_flat[se[j + t]] for t in range(k))
                    lst = d.get(pair)
                    if lst is None:
                        d[pair] = [int(sp[j])]
                    else:
                        lst.append(int(sp[j]))
                    n += 1
                    mi += 1
                for t, plist in d.items():
                    all_terms.append(t)
                    all_tfs.append(len(plist))
                    entry_counts.append(len(plist))
                    flat_pos.extend(plist)
                term_offsets.append(len(all_terms))
                len_raws.append(n)

            yield _assemble_analyzed_batch(
                doc_ids, len_raws, all_terms, all_tfs, entry_counts,
                flat_pos, term_offsets)

    return run


def quantize_length_py(n: int) -> int:
    """Driver-side helper mirroring quantize_len_udf exactly."""
    return int(_B2L[bisect.bisect_right(LENGTH_BOUNDARIES, int(n))])
