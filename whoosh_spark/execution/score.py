"""BM25 scoring expressions (``src/whoosh/scoring.py::BM25F ≈L140``).

    idf   = ln(N / (df + 1)) + 1                 (natural log, N = all docs)
    score = idf * tf*(K1+1) / (tf + K1*((1-B) + B*dl/avgdl))

with K1=1.2, B=0.75 (config), dl = byte-quantized field length, avgdl =
exact total_len / doc_count.  Everything is a float64 column expression —
whole-stage-codegen JVM math, no Python in the scoring hot path.  idf per
term is computed driver-side from term_stats (a handful of rows per query)
and joined in via a broadcast literal map.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whoosh_spark.config import BM25_B, BM25_K1


def idf_value(n_docs: int, df: int) -> float:
    return math.log(n_docs / (df + 1)) + 1.0


def bm25_component(tf: Column, dl: Column, avgdl: float,
                   k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """The tf/length part of BM25 (idf multiplied in separately)."""
    tf = tf.cast("double")
    dl = dl.cast("double")
    return (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / float(avgdl)))


def bm25_upper_bound(n_docs: int, df: int, max_weight: float, min_len: int,
                     avgdl: float, k1: float = BM25_K1, b: float = BM25_B) -> float:
    """Per-block score upper bound for block-max WAND (SURVEY.md §4.1):
    best case = max weight at the minimum quantized length in the block."""
    idf = idf_value(n_docs, df)
    tf = float(max_weight)
    dl = float(min_len)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / float(avgdl)))


def score_postings(postings: DataFrame, idf_by_term: dict[str, float],
                   avgdl: float, boost_by_term: dict[str, float] | None = None,
                   weighting: str = "bm25", b: float | None = None,
                   mult: float = 1.0) -> DataFrame:
    """(field, term, doc_id, tf, dl, …) → + ``score`` column.

    idf (and optional per-term query boost) enter as a literal CASE map —
    tiny per query, folded by Catalyst, no join or shuffle.

    ``weighting`` selects the model (``src/whoosh/scoring.py``):
      bm25       BM25F (default; ≈L140)
      tfidf      score = weight · idf            (::TF_IDF ≈L300)
      frequency  score = raw weight              (::Frequency ≈L280)

    ``b`` overrides the BM25F length-normalization for this posting set
    (per-field ``<fieldname>_B`` kwargs of ``scoring.py::BM25F``); ``mult``
    is a constant multiplier (field boost under multi-field BM25F).
    """
    idf_col = F.lit(0.0)
    for t, v in idf_by_term.items():
        idf_col = F.when(F.col("term") == t, F.lit(float(v))).otherwise(idf_col)
    if weighting == "bm25":
        score = idf_col * bm25_component(
            F.col("tf"), F.col("dl"), avgdl,
            b=BM25_B if b is None else float(b))
    elif weighting == "tfidf":
        score = F.col("tf").cast("double") * idf_col
    elif weighting == "frequency":
        score = F.col("tf").cast("double")
    else:
        raise ValueError(f"unknown weighting {weighting!r}")
    if boost_by_term:
        boost_col = F.lit(1.0)
        for t, v in boost_by_term.items():
            boost_col = F.when(F.col("term") == t, F.lit(float(v))).otherwise(boost_col)
        score = score * boost_col
    if mult != 1.0:
        score = score * float(mult)
    return postings.withColumn("score", score)
