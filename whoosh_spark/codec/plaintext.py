"""Plain-text debug codec — upstream ``src/whoosh/codec/plaintext.py``
(≈450 LoC: a codec that stores the whole index as human-readable text for
debugging) re-expressed over the Spark table layout.

``dump_plaintext`` renders an index's logical content — every posting,
every doc length, a one-line JSON header — as line-oriented text files a
human can ``grep``; ``load_plaintext`` parses them back and re-encodes
real posting blocks, so the text form is a faithful, queryable round-trip
(tests pin rank-identical scores through it).

Both directions are distributed Spark dataflow (text writes/reads over
the cluster FS, vectorized re-encode) — but this is a DEBUG format: the
text is ~an order of magnitude fatter than the block codec and keeps no
block metadata, so it is for inspection and surgery, not serving.

Layout under ``path``:

* ``header.json``   — one JSON object: field, posting_format, n_docs
* ``postings/``     — lines ``field\\tterm\\tdoc_id\\ttf\\tp1,p2,...``
                      (positions column empty under non-positional formats)
* ``doc_lengths/``  — lines ``doc_id\\tlen_raw\\tdl``
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_spark import fs as FS

_HEADER = "header.json"


def dump_plaintext(ix, path: str) -> dict:
    """Render ``ix`` (an InvertedIndex) as the plain-text debug layout."""
    from whoosh_spark.formats import get_format

    with_pos = get_format(ix.posting_format).store_positions
    posts = ix.postings_where(F.lit(True), with_positions=with_pos)
    pos_col = (F.concat_ws(",", F.col("positions").cast("array<string>"))
               if with_pos else F.lit(""))
    lines = posts.select(F.concat_ws(
        "\t", "field", "term",
        F.col("doc_id").cast("string"),
        F.col("tf").cast("long").cast("string"),
        pos_col).alias("value"))
    lines.write.mode("overwrite").text(FS.join(path, "postings"))
    ix.doc_lengths.select(F.concat_ws(
        "\t", F.col("doc_id").cast("string"),
        F.col("len_raw").cast("string"),
        F.col("dl").cast("string")).alias("value")
    ).write.mode("overwrite").text(FS.join(path, "doc_lengths"))
    header = {
        "codec": "whoosh-spark-plaintext/1",
        "field": ix.field,
        "posting_format": ix.posting_format,
        "analyzer": ix.analyzer,
        "n_docs": int(ix.doc_lengths.count()),
    }
    FS.write_text_atomic(FS.join(path, _HEADER), json.dumps(header, indent=1))
    return header


def _reblob_arrow(batches):
    """(field, term, doc_id, tf, positions array, dl) → rows with the
    codec's self-describing ``pos_blob`` (varint(count) + delta varints),
    whole-batch vectorized like the analyzer's emit path.

    The dump is advertised for hand surgery, so malformed edits must fail
    loudly here instead of varint-encoding a negative delta as a 2^64
    garbage position: null / non-numeric / negative position tokens and a
    tf that disagrees with the (non-empty) position list raise ValueError;
    unsorted-but-valid positions are sorted per posting (vectorized)."""
    import pyarrow as pa

    from whoosh_spark.codec.blocks import (_varint_lens, positions_stream,
                                           varint_encode)

    for batch in batches:
        if batch.num_rows == 0:
            continue
        t = pa.Table.from_batches([batch])
        for c in ("doc_id", "tf"):
            if t.column(c).null_count:
                raise ValueError(
                    f"plaintext load: non-numeric or missing {c} in "
                    "postings/ (lines are field\\tterm\\tdoc_id\\ttf\\tpos)")
        pos = t.column("positions").combine_chunks()
        if pos.null_count or pos.values.null_count:
            raise ValueError(
                "plaintext load: missing or non-numeric position token in "
                "postings/ (positions must be comma-joined integers)")
        offsets = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        flat = pos.values.to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(pos.values) else np.zeros(0, np.int64)
        if flat.size and flat.min() < 0:
            raise ValueError(
                "plaintext load: negative position in postings/")
        n = counts.size
        if flat.size:
            # tolerate hand-edited ordering: stable-sort positions within
            # each posting (row id primary key, value secondary)
            row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            flat = flat[np.lexsort((flat, row_of))]
        nz0 = counts > 0
        if nz0.any():
            tfs = t.column("tf").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            bad = nz0 & (tfs != counts)
            if bad.any():
                i = int(np.argmax(bad))
                raise ValueError(
                    "plaintext load: tf disagrees with position count "
                    f"(tf={int(tfs[i])}, {int(counts[i])} positions) — "
                    "fix the edited line in postings/")
        stream, cnt_idx = positions_stream(flat, counts)
        data = varint_encode(stream)
        val_bounds = np.concatenate(
            ([0], np.cumsum(_varint_lens(stream)))).astype(np.int32)
        ent_off = np.empty(n + 1, dtype=np.int32)
        ent_off[:-1] = val_bounds[cnt_idx]
        ent_off[-1] = val_bounds[-1]
        blobs = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(ent_off.tobytes()), pa.py_buffer(data)])
        yield pa.RecordBatch.from_arrays(
            [t.column("field").combine_chunks(),
             t.column("term").combine_chunks(),
             t.column("doc_id").combine_chunks(),
             t.column("tf").combine_chunks(),
             blobs,
             t.column("dl").combine_chunks()],
            names=["field", "term", "doc_id", "tf", "pos_blob", "dl"])


def load_plaintext(spark: SparkSession, path: str):
    """Parse the plain-text layout back into a queryable InvertedIndex
    (re-encodes real posting blocks + stats via the standard build ops)."""
    from whoosh_spark import build as B
    from whoosh_spark.index import InvertedIndex

    raw = FS.read_text(FS.join(path, _HEADER))
    if raw is None:
        raise FileNotFoundError(f"no {_HEADER} under {path!r}: "
                                f"not a plaintext index dump")
    header = json.loads(raw)
    field = header["field"]

    # try_cast everywhere: a hand-edited non-numeric token must surface as
    # the loader's own clear ValueError (null check in _reblob_arrow), not
    # an ANSI CAST_INVALID_INPUT from the middle of the scan
    lens = spark.read.text(FS.join(path, "doc_lengths")).select(
        F.split("value", "\t").alias("p")).select(
        F.col("p")[0].try_cast("long").alias("doc_id"),
        F.col("p")[1].try_cast("int").alias("len_raw"),
        F.col("p")[2].try_cast("int").alias("dl"))

    posts = spark.read.text(FS.join(path, "postings")).select(
        F.split("value", "\t").alias("p")).select(
        F.col("p")[0].alias("field"),
        F.col("p")[1].alias("term"),
        F.col("p")[2].try_cast("long").alias("doc_id"),
        F.col("p")[3].try_cast("long").alias("tf"),
        F.when(F.col("p")[4] == "", F.array().cast("array<long>"))
         .otherwise(F.transform(F.split(F.col("p")[4], ","),
                                lambda s: s.try_cast("long")))
         .alias("positions"))
    posts = posts.join(lens.select("doc_id", "dl"), "doc_id").select(
        "field", "term", "doc_id", "tf", "positions", "dl")
    with_blob = posts.mapInArrow(
        _reblob_arrow,
        schema=("field string, term string, doc_id long, tf long, "
                "pos_blob binary, dl int"))
    blocks = B.posting_blocks(with_blob)
    ix = InvertedIndex(
        spark,
        blocks=blocks.cache(),
        term_stats=B.term_stats(blocks).cache(),
        field_stats=B.field_stats(lens, field),
        doc_lengths=lens,
        docs=None,
        field=field,
    )
    ix.analyzer = header.get("analyzer", "standard")
    ix.posting_format = header.get("posting_format", "positions")
    return ix
