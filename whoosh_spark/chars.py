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

from whoosh_spark.analysis.analyzers import _TOKEN_RE
from whoosh_spark.config import MIN_WORD_SIZE, STOP_WORDS

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
                for m in _TOKEN_RE.finditer(text or ""):
                    t = m.group(0).lower()
                    if len(t) >= MIN_WORD_SIZE and t not in STOP_WORDS:
                        if stem_fn is not None:
                            t = stem_fn(t)
                        s, e = spans.setdefault(t, ([], []))
                        s.append(m.start())
                        e.append(m.end())
                for t, (ss, ee) in spans.items():
                    out_ids.append(doc_id)
                    out_terms.append(t)
                    out_s.append(ss)
                    out_e.append(ee)
            yield pd.DataFrame({"doc_id": out_ids, "term": out_terms,
                                "starts": out_s, "ends": out_e})

    return src.mapInPandas(gen, schema=CHARS_SCHEMA)
