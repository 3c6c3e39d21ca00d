"""Per-posting boost weights (PositionBoosts/CharacterBoosts formats,
``src/whoosh/formats.py ≈L300-420``) — columnar restatement.

Upstream stores a float boost per posting occurrence and scores BM25 with
``weight = Σ occurrence boosts`` instead of raw tf.  Rather than widening the
hot block codec with a float payload, the boosted weights live in a SPARSE
overlay table ``(term, doc_id, w)`` holding ONLY the (term, doc) cells whose
summed boost differs from tf (un-boosted tokens dominate web text, so the
overlay is tiny).  At score time the evaluator left-joins the overlay after
the term-pushed postings decode and scores ``coalesce(w, tf)`` — the same
columnar-side-table pattern the Characters format uses (chars.py).

Scale posture: the overlay join is an equi-join on (term, doc_id) AFTER the
term predicate pushed both scans down to the query's terms — per query it
touches only the overlay rows of those terms.  Block-max WAND is disabled
when an overlay is attached (block max_weight metadata doesn't include
boosts, so the pruning bound would not be an upper bound; exhaustive TAAT
scoring stays exact — ``Matcher.supports_block_quality() == False``
semantics, ``mcore.py ≈L200``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whoosh_spark.analysis.analyzers import analyze_text_boosts

_OVERLAY_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("ws", T.ArrayType(T.DoubleType())),
    ]
)


def _make_overlay_udf(analyze_fn):
    @F.pandas_udf(_OVERLAY_SCHEMA)
    def overlay_udf(texts: pd.Series) -> pd.DataFrame:
        out_t: list[list[str]] = []
        out_w: list[list[float]] = []
        for text in texts:
            toks, _, boosts = analyze_fn(text if isinstance(text, str) else "")
            acc: dict[str, list[float]] = {}
            for t, b in zip(toks, boosts):
                e = acc.get(t)
                if e is None:
                    acc[t] = [1.0, float(b)]
                else:
                    e[0] += 1.0
                    e[1] += float(b)
            # keep only cells where Σboost deviates from tf (sparse!)
            keep = [(t, e[1]) for t, e in acc.items() if e[1] != e[0]]
            out_t.append([t for t, _ in keep])
            out_w.append([w for _, w in keep])
        return pd.DataFrame({"terms": out_t, "ws": out_w})

    return overlay_udf


def token_boost_overlay(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        analyze_fn=analyze_text_boosts) -> DataFrame:
    """docs → sparse ``(term, doc_id, w)`` boost-weight overlay.

    ``analyze_fn(text) -> (tokens, positions, boosts)`` must emit the SAME
    token stream as the analyzer the index was built with (the ``"boosted"``
    registry entry pairs with the default here), plus a per-token boost.
    Arrow-batched pandas UDF; the explode and aggregation stay JVM-side.
    """
    udf = _make_overlay_udf(analyze_fn)
    o = docs.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("o")
    )
    return (
        o.select("doc_id", F.explode(F.arrays_zip("o.terms", "o.ws")).alias("z"))
        .select(F.col("z.terms").alias("term"), "doc_id",
                F.col("z.ws").alias("w"))
    )
