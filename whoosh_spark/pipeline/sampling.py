"""Deterministic corpus sampling and sequence packing.

Training-data prep ops with no Whoosh analog (the reference is a search
library; these belong to the 100 TB pipeline surface next to dedup/quality):

* ``stratified_sample`` — per-stratum hash sampling: a document is kept iff
  an engine-portable md5-prefix hash of its id falls under the stratum's
  threshold.  No RNG state, no ``sample()`` nondeterminism: the same row
  set is selected on any cluster size, any partitioning, any engine — the
  property that makes corpus subsets reproducible and the DuckDB oracle an
  exact twin.  Pure codegen filter: no shuffle at all.

* ``pack_sequences`` — token-budget bin assignment ("sequence packing"):
  documents in doc_id order are laid head-to-tail and cut into bins of
  ``budget`` tokens (bin = exclusive-prefix-sum(n_tokens) div budget; a doc
  whose tokens straddle a boundary belongs to the bin its FIRST token lands
  in, so bins can overhang by at most one document).  The global prefix sum
  is computed scale-safely: per-range-bucket partial sums (one tiny agg),
  exclusive bucket offsets on the driver (``n_buckets`` rows), then a
  window cumsum WITHIN each bucket partition — never a single-partition
  global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whoosh_spark.pipeline.dedup import md5_prefix_long

# 15 md5 hex chars → uniform integer in [0, 2^60); the cross-engine hash
# contract lives in md5_prefix_long / pipeline_sql.md5_prefix_sql
_HASH_SPACE = 1 << 60


def _keep_hash(id_col: str, salt: int):
    key = F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))
    return md5_prefix_long(key)


def sample_thresholds(fractions: dict[str, float]) -> dict[str, int]:
    """Exact integer keep-thresholds per stratum (floor(f · 2^60)) — shared
    by the Spark filter and the SQL oracle so both select identical rows."""
    return {s: int(f * _HASH_SPACE) for s, f in fractions.items()}


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: int = 42) -> DataFrame:
    """Keep each row of stratum ``s`` iff hash(id:salt) < fractions[s]·2^60.

    ``fractions`` maps stratum value → keep fraction; strata not listed are
    dropped (an explicit sampling plan, not a default-keep).  Output:
    (doc_id, stratum, keep_hash) — the hash column makes audits/joins of
    the sampled id set cheap downstream.
    """
    thresholds = sample_thresholds(fractions)
    h = _keep_hash(id_col, salt)
    cond = None
    for s, t in sorted(thresholds.items()):
        c = (F.col(strata_col) == s) & (h < F.lit(t))
        cond = c if cond is None else (cond | c)
    if cond is None:
        cond = F.lit(False)
    else:
        # standalone In() conjunct: parquet-pushable / partition-prunable,
        # unlike the OR-of-(stratum AND hash) expression it guards
        docs = docs.where(F.col(strata_col).isin(sorted(thresholds)))
    return (docs.where(cond)
            .select(F.col(id_col).alias("doc_id"),
                    F.col(strata_col).alias("stratum"),
                    h.alias("keep_hash")))


def pack_sequences(docs: DataFrame, budget: int = 512,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_buckets: int = 64) -> DataFrame:
    """Assign each document a packing ``bin_id`` so concatenating docs in
    doc_id order fills bins of ``budget`` whitespace tokens:
    ``bin_id = floor(exclusive_prefix_tokens / budget)``.

    Distributed prefix sum: range-bucket by id (order-preserving), sum
    tokens per bucket, collect the ``n_buckets`` partial sums to the driver
    for exclusive offsets, then cumsum inside each bucket partition under a
    ``Window.partitionBy(bucket)`` — local sorts only, no global
    single-partition window, so the plan survives any corpus size.
    Token rule matches ``textstats.token_counts``'s ``n_ws``.
    """
    # NULL text counts 0 tokens (coalesce) — an all-NULL bucket would sum
    # to NULL and crash the driver's offset loop; NULL ids have no place in
    # the doc order — drop them explicitly (oracle twin mirrors both)
    n = F.coalesce(
        F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long"),
        F.lit(0).cast("long"))
    base = (docs.where(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    n.alias("n_tokens")))
    lo_hi = base.agg(F.min("doc_id").alias("lo"),
                     F.max("doc_id").alias("hi")).first()
    if lo_hi["lo"] is None:
        return base.withColumn("bin_id", F.lit(0).cast("long")) \
                   .select("doc_id", "n_tokens", "bin_id")
    # range-bucket relative to min_id: an offset or outlier id range must
    # not collapse everything into one bucket (that would BE the global
    # single-partition window this design exists to avoid)
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    span = max(1, (hi - lo + n_buckets) // n_buckets)
    # `div`, not `/`: Spark's `/` on longs goes through a double, which
    # rounds past 2^53 — the oracle's integer `//` never does
    base = base.withColumn(
        "bucket", F.expr(f"(doc_id - {lo}) div {span}"))
    totals = {r["bucket"]: r["t"]
              for r in base.groupBy("bucket")
                           .agg(F.sum("n_tokens").alias("t")).collect()}
    run, offsets = 0, {}
    for b in sorted(totals):
        offsets[b] = run
        run += totals[b]
    spark = docs.sparkSession
    off = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "bucket long, off long")
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (base.join(F.broadcast(off), "bucket")
            .withColumn("cum", F.sum("n_tokens").over(w) + F.col("off"))
            .select("doc_id", "n_tokens",
                    F.expr(f"(cum - n_tokens) div {budget}")
                    .alias("bin_id")))
