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
    whole-batch vectorized like the analyzer's emit path."""
    import pyarrow as pa

    from whoosh_spark.codec.blocks import _varint_lens, varint_encode

    for batch in batches:
        if batch.num_rows == 0:
            continue
        t = pa.Table.from_batches([batch])
        pos = t.column("positions").combine_chunks()
        offsets = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        flat = pos.values.to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(pos.values) else np.zeros(0, np.int64)
        n = counts.size
        starts = np.cumsum(counts) - counts
        deltas = np.diff(flat, prepend=0)
        nz = counts > 0
        deltas[starts[nz]] = flat[starts[nz]]
        stream = np.empty(n + flat.size, dtype=np.uint64)
        cnt_idx = np.arange(n, dtype=np.int64) + starts
        stream[cnt_idx] = counts.astype(np.uint64)
        mask = np.ones(stream.size, dtype=bool)
        mask[cnt_idx] = False
        stream[mask] = deltas.astype(np.uint64)
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

    lens = spark.read.text(FS.join(path, "doc_lengths")).select(
        F.split("value", "\t").alias("p")).select(
        F.col("p")[0].cast("long").alias("doc_id"),
        F.col("p")[1].cast("int").alias("len_raw"),
        F.col("p")[2].cast("int").alias("dl"))

    posts = spark.read.text(FS.join(path, "postings")).select(
        F.split("value", "\t").alias("p")).select(
        F.col("p")[0].alias("field"),
        F.col("p")[1].alias("term"),
        F.col("p")[2].cast("long").alias("doc_id"),
        F.col("p")[3].cast("long").alias("tf"),
        F.when(F.col("p")[4] == "", F.array().cast("array<long>"))
         .otherwise(F.split(F.col("p")[4], ",").cast("array<long>"))
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
