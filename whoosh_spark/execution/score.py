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

# log2(x) = ln(x) / LN2 — spelled identically (same literal, same op order)
# in the DuckDB oracle so 6-dp rounded scores hash-match across engines.
LN2 = 0.6931471805599453
LOG2_E = 1.4426950408889634  # whoosh scoring.py ``rec_log2_of_e`` (≈L30)
PL2_C = 1.0  # whoosh PL2 default c


def idf_value(n_docs: int, df: int) -> float:
    return math.log(n_docs / (df + 1)) + 1.0


def _log2(c: Column) -> Column:
    return F.log(c) / LN2


def _case_map(values: dict[str, float], default: float = 0.0) -> Column:
    """term → literal lookup as a FLAT MapType literal (create_map +
    getItem).  A nested WHEN/OTHERWISE chain is O(n) expression-tree deep —
    at the engine's 1024-term expansion limit that risks quadratic Catalyst
    analysis or a StackOverflowError; the map literal is one node."""
    if not values:
        return F.lit(float(default))
    m = F.create_map(*[x for t, v in values.items()
                       for x in (F.lit(t), F.lit(float(v)))])
    return F.coalesce(m[F.col("term")], F.lit(float(default)))


def dfree_score(tf: Column, dl: Column, cf: Column, fl: float,
                qf: float = 1.0) -> Column:
    """DFR DFree model (``src/whoosh/scoring.py::DFree ≈L220``):
    divergence-from-randomness with no extra parameters.

        prior    = tf/dl          post = (tf+1)/(dl+1)
        invprior = fl/cf          norm = tf·log2(post/prior)
        score    = qf·norm·( tf·log2(prior·invprior)
                           + (tf+1)·log2(post·invprior)
                           + 0.5·log2(post/prior) )

    dl = byte-quantized doc length (WeightLengthScorer semantics), fl = total
    raw field length, cf = collection frequency of the term."""
    tf = tf.cast("double")
    dl = dl.cast("double")
    prior = tf / dl
    post = (tf + 1.0) / (dl + 1.0)
    invprior = F.lit(float(fl)) / cf
    norm = tf * _log2(post / prior)
    return (
        qf * norm
        * (tf * _log2(prior * invprior)
           + (tf + 1.0) * _log2(post * invprior)
           + 0.5 * _log2(post / prior))
    )


def pl2_score(tf: Column, dl: Column, cf: Column, dc: float, avgdl: float,
              c: float = PL2_C, qf: float = 1.0) -> Column:
    """DFR PL2 model (``src/whoosh/scoring.py::PL2 ≈L250``):

        TF   = tf·log2(1 + c·avgdl/dl)      norm = 1/(TF+1)
        f    = cf/dc
        score= norm·qf·( TF·log2(1/f) + f·log2e
                       + 0.5·log2(2π·TF) + TF·(log2(TF) − log2e) )"""
    tf = tf.cast("double")
    dl = dl.cast("double")
    TF = tf * _log2(F.lit(1.0) + (c * float(avgdl)) / dl)
    norm = 1.0 / (TF + 1.0)
    f = cf / F.lit(float(dc))
    return norm * qf * (
        TF * _log2(F.lit(1.0) / f)
        + f * F.lit(LOG2_E)
        + 0.5 * _log2(2.0 * math.pi * TF)
        + TF * (_log2(TF) - F.lit(LOG2_E))
    )


def bm25_component(tf: Column, dl: Column, avgdl: float,
                   k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """The tf/length part of BM25 (idf multiplied in separately)."""
    tf = tf.cast("double")
    dl = dl.cast("double")
    return (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / float(avgdl)))


# (the per-block WAND upper bound lives in wand.py::_ub_col, built from
# bm25_component — one spelling only, so the bound can't drift from the
# score it must dominate)


# FunctionWeighting (``src/whoosh/scoring.py::FunctionWeighting ≈L430``):
# user-registered scorers.  The callable gets a ctx dict of column
# expressions + collection stats and returns the score Column — still pure
# JVM codegen, the custom formula just composes expressions.
_CUSTOM_WEIGHTINGS: dict[str, object] = {}


def register_weighting(name: str, fn) -> None:
    """Register ``fn(ctx) -> Column`` as weighting ``name``.  ``ctx`` keys:
    ``tf``/``dl``/``idf``/``cf`` (columns), ``avgdl``/``n_docs``/
    ``total_len`` (floats).  Use via ``Searcher(ix, weighting=name)``."""
    _CUSTOM_WEIGHTINGS[name] = fn


def score_postings(postings: DataFrame, idf_by_term: dict[str, float],
                   avgdl: float, boost_by_term: dict[str, float] | None = None,
                   weighting: str = "bm25", b: float | None = None,
                   mult: float = 1.0,
                   cf_by_term: dict[str, float] | None = None,
                   n_docs: int | None = None,
                   total_len: int | None = None) -> DataFrame:
    """(field, term, doc_id, tf, dl, …) → + ``score`` column.

    idf (and optional per-term query boost) enter as a literal CASE map —
    tiny per query, folded by Catalyst, no join or shuffle.

    ``weighting`` selects the model (``src/whoosh/scoring.py``):
      bm25       BM25F (default; ≈L140)
      tfidf      score = weight · idf            (::TF_IDF ≈L300)
      frequency  score = raw weight              (::Frequency ≈L280)
      dfree      DFR DFree                       (::DFree ≈L220)
      pl2        DFR PL2 (c=1.0)                 (::PL2 ≈L250)
    a ``reverse:`` prefix wraps the model in ReverseWeighting (::ReverseWeighting
    ≈L460): score = 0 − subscore.

    ``b`` overrides the BM25F length-normalization for this posting set
    (per-field ``<fieldname>_B`` kwargs of ``scoring.py::BM25F``); ``mult``
    is a constant multiplier (field boost under multi-field BM25F).
    ``cf_by_term``/``n_docs``/``total_len`` feed the DFR models.
    """
    reverse = weighting.startswith("reverse:")
    if reverse:
        weighting = weighting[len("reverse:"):]
    idf_col = _case_map(idf_by_term)
    if weighting == "bm25":
        score = idf_col * bm25_component(
            F.col("tf"), F.col("dl"), avgdl,
            b=BM25_B if b is None else float(b))
    elif weighting == "tfidf":
        score = F.col("tf").cast("double") * idf_col
    elif weighting == "frequency":
        score = F.col("tf").cast("double")
    elif weighting == "dfree":
        score = dfree_score(F.col("tf"), F.col("dl"),
                            _case_map(cf_by_term, 1.0), float(total_len))
    elif weighting == "pl2":
        score = pl2_score(F.col("tf"), F.col("dl"),
                          _case_map(cf_by_term, 1.0), float(n_docs), avgdl)
    elif weighting in _CUSTOM_WEIGHTINGS:
        score = _CUSTOM_WEIGHTINGS[weighting]({
            "tf": F.col("tf").cast("double"),
            "dl": F.col("dl").cast("double"),
            "idf": idf_col,
            "cf": _case_map(cf_by_term or {}, 1.0),
            "avgdl": float(avgdl),
            "n_docs": None if n_docs is None else float(n_docs),
            "total_len": None if total_len is None else float(total_len),
        })
    else:
        raise ValueError(f"unknown weighting {weighting!r}")
    if reverse:
        score = F.lit(0.0) - score
    if boost_by_term:
        score = score * _case_map(boost_by_term, 1.0)
    if mult != 1.0:
        score = score * float(mult)
    return postings.withColumn("score", score)
