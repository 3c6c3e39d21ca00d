"""Characters posting format (``src/whoosh/formats.py::Characters ≈L250``)
as a Spark-first SIDE TABLE instead of a fatter postings codec.

Upstream stores per-posting char offsets inside the postings value so
``Hit.highlights`` can mark matches without re-analyzing stored text.  The
columnar restatement: an opt-in table

    chars(doc_id long, term string, starts array<int>, ends array<int>)

written next to the index.  Keeping it OUT of the blocks codec means every
non-highlight query keeps its thin ReadSchema (positions stay the only
phrase-time payload), while highlight lookups are a term-pushed scan of this
table semi-joined to the k result docs — O(k) rows collected.  At 100 TB the
table partitions/sorts exactly like blocks (by term), so the scan prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from whoosh_spark import fs as FS
from whoosh_spark.analysis.analyzers import analyze_text_spans

CHARS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("term", T.StringType()),
    T.StructField("starts", T.ArrayType(T.IntegerType())),
    T.StructField("ends", T.ArrayType(T.IntegerType())),
])


def char_offsets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 analyzer: str = "standard") -> DataFrame:
    """One row per (doc, term) with parallel char-span arrays, produced by
    the SAME tokenizer chain as the index (offset parity by construction).

    ``analyzer`` must match the index build: ``standard`` or ``stem``
    (stemmed term, original token's span).  Shingling analyzers (biword,
    ngram) have no single source span per term — explicitly unsupported."""
    import pandas as pd

    if analyzer not in ("standard", "stem"):
        raise ValueError(
            f"char_offsets supports 'standard' and 'stem' chains, not "
            f"{analyzer!r} (shingling analyzers have no 1:1 term span)")
    stem_fn = None
    if analyzer == "stem":
        from whoosh_spark.analysis.porter import stem as stem_fn

    src = docs.selectExpr(f"cast({id_col} as long) as doc_id",
                          f"{text_col} as _text")

    def gen(batches):
        for pdf in batches:
            out_ids, out_terms, out_s, out_e = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                spans: dict[str, tuple[list[int], list[int]]] = {}
                # SAME chain as the postings (analyzers.analyze_text_spans
                # is the tested span mirror of analyze_text); stem applies
                # after minsize/stop, matching analyze_text_stemming
                for t, ms, me in analyze_text_spans(text or ""):
                    if stem_fn is not None:
                        t = stem_fn(t)
                    s, e = spans.setdefault(t, ([], []))
                    s.append(ms)
                    e.append(me)
                for t, (ss, ee) in spans.items():
                    out_ids.append(doc_id)
                    out_terms.append(t)
                    out_s.append(ss)
                    out_e.append(ee)
            yield pd.DataFrame({"doc_id": out_ids, "term": out_terms,
                                "starts": out_s, "ends": out_e})

    return src.mapInPandas(gen, schema=CHARS_SCHEMA)


def write_char_offsets(docs: DataFrame, path: str, id_col: str = "doc_id",
                       text_col: str = "text",
                       analyzer: str = "standard") -> None:
    """Persist the Characters segment under ``<index>/char_offsets``, range-
    partitioned + sorted by (term, doc_id) so parquet row-group min/max
    stats prune BOTH the term and the doc_id highlight predicates — the same
    layout trick the ``blocks`` table uses (``write_index(store_offsets=
    True)`` calls this; an index without the segment loads with
    ``ix.char_offsets is None``, mirroring upstream's opt-in
    ``TEXT(chars=True)``)."""
    (char_offsets(docs, id_col, text_col, analyzer)
     .repartitionByRange("term", "doc_id")
     .sortWithinPartitions("term", "doc_id")
     .write.mode("overwrite").parquet(FS.join(path, "char_offsets")))


def read_char_offsets(spark, path: str) -> DataFrame:
    return spark.read.parquet(FS.join(path, "char_offsets"))
