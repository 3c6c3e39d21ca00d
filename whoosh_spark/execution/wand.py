"""Block-max WAND top-k: batch reformulation of Whoosh's quality pruning.

Whoosh's TopCollector raises a score floor θ as the heap fills and calls
``matcher.skip_to_quality(θ)`` to hop over posting blocks whose block
max-weight bound cannot beat θ (``src/whoosh/collectors.py ≈L400-440``,
``src/whoosh/codec/whoosh3.py::W3LeafMatcher.skip_to_quality ≈L1050``).
There is no cursor in Spark, so the same math becomes a two-pass dataflow
(SURVEY.md §4.1):

  pass A (θ seed):   rank blocks by their BM25 upper bound
                     ub(b) = idf_t · bound(max_weight_b, min_len_b),
                     exact-score only the top few, θ = kth best doc score.
  pass B (pruned):   keep block b of term t iff
                     ub_t(b) ≥ θ − Σ_{t'≠t} max_ub_{t'}
                     — any doc confined to dropped blocks satisfies
                     score(d) < θ strictly, so the exact top-k including
                     θ-ties under the doc_id ASC tie-break is preserved.
  completion:        docs surfaced by surviving blocks may still have
                     contributions inside dropped blocks of OTHER terms;
                     decode dropped blocks whose [min_id, max_id] overlaps
                     the candidate id range and inner-join on candidates.

For a single-term query the bound is simply ub > θ and no completion is
needed — score depends on that term alone.

The block upper bound is a pure column expression over block METADATA
(max_weight, min_len), evaluated without decoding — the parquet scan of the
blocks table prunes on (field, term) and the ub predicate drops most row
groups of hot terms before any Python decode runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_spark.config import BM25_B
from whoosh_spark.execution.score import idf_value, score_postings
from whoosh_spark.index import InvertedIndex

# below this many blocks, exhaustive scoring beats two passes
MIN_BLOCKS_FOR_WAND = 64


def _ub_col(idf_map: dict[str, float], avgdl: float,
            b: float | None = None, mult: float = 1.0) -> F.Column:
    """Block score upper bound as a column expr over block metadata.
    Built from the scorer's OWN kernels (score.py) so the bound can never
    drift from the score it must dominate; ``b``/``mult`` are the per-field
    BM25F length-norm override and field boost."""
    from whoosh_spark.execution.score import _case_map, bm25_component

    comp = bm25_component(F.col("max_weight"),
                          F.col("min_len").cast("double"), avgdl,
                          b=BM25_B if b is None else float(b))
    return _case_map(idf_map) * comp * float(mult)


def wand_topk(ix: InvertedIndex, terms: list[str], k: int,
              theta_blocks: int | None = None, mode: str = "sum",
              tiebreak: float = 0.0, b: float | None = None,
              mult: float = 1.0) -> DataFrame:
    """Exact top-k (doc_id, score) for an Or/Term-batch query via block-max
    pruning.  Falls back to exhaustive scoring for small posting sets.

    ``mode="sum"`` is Or semantics; ``mode="max"`` is DisjunctionMax:
    score(d) = max_t s_t(d) + tiebreak·(Σ_t s_t(d) − max_t s_t(d)).  The
    survivor bound generalizes: a doc confined to block b of term t scores at
    most (1−tb)·max(ub_t(b), M_rest) + tb·(ub_t(b) + S_rest) where
    M_rest/S_rest are the max/sum of the OTHER terms' best block bounds —
    monotone in ub_t(b), so the same per-term block predicate applies."""
    terms = sorted(set(terms))
    if k <= 0:
        return ix.spark.createDataFrame([], "doc_id long, score double")
    stats = ix.stats_for_terms(terms)
    present = [t for t in terms if t in stats]
    n, avgdl = ix.global_stats()
    if not present:
        return ix.spark.createDataFrame([], "doc_id long, score double")
    idf_map = {t: idf_value(n, stats[t]["df"]) for t in present}
    tb = float(tiebreak)

    def _agg(scored) -> DataFrame:
        g = scored.groupBy("doc_id")
        if mode == "sum":
            return g.agg(F.sum("score").alias("score"))
        agg = g.agg(F.max("score").alias("_mx"), F.sum("score").alias("_sm"))
        return agg.select(
            "doc_id",
            (F.col("_mx") + tb * (F.col("_sm") - F.col("_mx"))).alias("score"))

    def _score(blocks_df) -> DataFrame:
        posts = ix._decode(blocks_df, False)
        return ix.not_deleted(_agg(
            score_postings(posts, idf_map, avgdl, b=b, mult=mult)))

    blocks = ix.blocks.where(
        (F.col("field") == ix.field) & F.col("term").isin(present)
    )
    # ceil(df/128) is a LOWER bound on real block count (blocks are carved
    # per (term, doc-bucket), so sparse terms fragment into many small
    # blocks); when it lands under the threshold, confirm with an actual
    # metadata count — a pushed-predicate scan of the thin blocks table
    n_blocks = sum((stats[t]["df"] + 127) // 128 for t in present)
    if n_blocks < MIN_BLOCKS_FOR_WAND:
        n_blocks = blocks.count()
    if n_blocks < MIN_BLOCKS_FOR_WAND:
        return _score(blocks)

    ub = _ub_col(idf_map, avgdl, b=b, mult=mult)
    withub = blocks.withColumn("_ub", ub)

    # ---- pass A: θ seed from the highest-upper-bound blocks --------------
    m = theta_blocks or max(4, (4 * k) // 128 + 2)
    seed = withub.orderBy(F.col("_ub").desc()).limit(m).drop("_ub")
    seed_top = (
        _score(seed)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    )
    if len(seed_top) < k:
        theta = 0.0  # fewer than k docs seen: no safe pruning floor
    else:
        theta = float(seed_top[-1]["score"])

    if theta <= 0.0:
        return _score(blocks)

    # ---- pass B: survivor predicate --------------------------------------
    # max_ub per term (tiny collect over block metadata)
    maxes = {
        r["term"]: float(r["mx"])
        for r in withub.groupBy("term").agg(F.max("_ub").alias("mx")).collect()
    }
    total_max = sum(maxes.values())
    # per-term survivor predicate: ub_t(b) >= θ − Σ_{t'≠t} max_ub_{t'}.
    # >= (not >): a dropped doc then has score < θ strictly, so it can never
    # displace a θ-scoring doc under the (score DESC, doc_id ASC) tie-break —
    # Whoosh's skip_to_quality likewise keeps quality == minquality blocks.
    # With >, a uniform-score corpus (every block ub == θ) would prune
    # everything and return empty instead of top-k.
    pred = F.lit(False)
    for t in present:
        if mode == "sum":
            rest = total_max - maxes[t]
            keep = F.col("_ub") >= theta - rest
        else:
            m_rest = max((maxes[x] for x in present if x != t), default=0.0)
            s_rest = total_max - maxes[t]
            bound = (1.0 - tb) * F.greatest(F.col("_ub"), F.lit(m_rest)) \
                + tb * (F.col("_ub") + s_rest)
            keep = bound >= theta
        pred = pred | ((F.col("term") == t) & keep)
    survivors = withub.where(pred).drop("_ub")

    # No completion pass is needed for exact top-k: a doc with ANY posting
    # in a dropped block of term t has full score ≤ ub_t(b) + Σ_{t'≠t}
    # max_ub_{t'} < θ (strict — dropped means the ≥ predicate failed), while
    # the θ seed guarantees ≥ k docs with full score ≥ θ whose blocks ALL
    # survive (one dropped block would contradict their ≥ θ score).  Those
    # docs therefore score EXACTLY from the survivor set, and every
    # partially-scored doc ranks strictly below them — the survivor-only
    # top-k is the exact top-k (tie-break included).  The same bound is
    # monotone for the DisMax max+tiebreak aggregate.
    return _score(survivors)
