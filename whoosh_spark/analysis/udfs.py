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


def make_analyze_batches(analyze_fn=None):
    """Factory for the mapInArrow analyze kernel.

    ``analyze_fn(text) -> (tokens, positions)`` swaps the analyzer chain
    (e.g. ``analyzers.analyze_text_stemming`` for a StemmingAnalyzer field);
    None uses the inlined StandardAnalyzer loop (fast path, identical output
    to ``analyzers.analyze_text``)."""

    def run(batches):
        import pyarrow as pa

        from whoosh_spark.analysis.analyzers import _TOKEN_RE_NC
        from whoosh_spark.codec.blocks import varint_encode
        from whoosh_spark.config import MIN_WORD_SIZE, STOP_WORDS

        stop = STOP_WORDS
        minsize = MIN_WORD_SIZE
        findall = _TOKEN_RE_NC.findall

        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()

            len_raws: list[int] = []
            all_terms: list[str] = []
            all_tfs: list[int] = []
            flat_pos: list[int] = []
            entry_counts: list[int] = []  # positions per term-entry
            term_offsets = [0]            # per doc → into all_terms

            for text in texts:
                d: dict[str, list[int]] = {}
                if text and analyze_fn is None:
                    for pos, t in enumerate(findall(text)):
                        t = t.lower()
                        if len(t) >= minsize and t not in stop:
                            lst = d.get(t)
                            if lst is None:
                                d[t] = [pos]
                            else:
                                lst.append(pos)
                elif text:
                    toks, poss = analyze_fn(text)
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
            yield pa.RecordBatch.from_arrays(
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

    return run


# default StandardAnalyzer kernel (the name the build path imports)
analyze_batches_arrow = make_analyze_batches()


def quantize_length_py(n: int) -> int:
    """Driver-side helper mirroring quantize_len_udf exactly."""
    return int(_B2L[bisect.bisect_right(LENGTH_BOUNDARIES, int(n))])
