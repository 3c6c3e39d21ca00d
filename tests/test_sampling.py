"""sampling.py: deterministic stratified hash sampling and token-budget
sequence packing (distributed prefix sum)."""

from __future__ import annotations

from pyspark.sql import functions as F

from whoosh_spark.pipeline.sampling import (pack_sequences,
                                            sample_thresholds,
                                            stratified_sample)

DOCS = "/root/testdata/sf0.001/documents.parquet"
FRACS = {"en": 0.5, "de": 0.25}


def test_sample_deterministic_and_stratified(spark):
    docs = spark.read.parquet(DOCS)
    a = stratified_sample(docs, FRACS)
    rows1 = sorted(tuple(r) for r in a.collect())
    rows2 = sorted(tuple(r) for r in stratified_sample(docs, FRACS).collect())
    assert rows1 == rows2 and rows1
    # only listed strata appear; rates land near the fractions
    by = {s: n for s, n in a.groupBy("stratum").count().collect()}
    assert set(by) <= set(FRACS)
    totals = {s: n for s, n in docs.groupBy("lang").count().collect()}
    for s, f in FRACS.items():
        rate = by.get(s, 0) / totals[s]
        assert abs(rate - f) < 0.15, (s, rate)
    # threshold rule is the exact keep criterion
    t = sample_thresholds(FRACS)
    assert all(r["keep_hash"] < t[r["stratum"]] for r in a.collect())


def test_sample_salt_changes_selection(spark):
    docs = spark.read.parquet(DOCS)
    a = {r["doc_id"] for r in stratified_sample(docs, FRACS, salt=42).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, FRACS, salt=43).collect()}
    assert a != b and a and b


def test_pack_prefix_sum_bucket_invariant(spark):
    # the distributed decomposition must be invisible: any bucket count
    # yields the identical global prefix sum, hence identical bins
    docs = spark.read.parquet(DOCS)
    ref = sorted(tuple(r) for r in
                 pack_sequences(docs, budget=512, n_buckets=1).collect())
    for nb in (3, 17, 64):
        got = sorted(tuple(r) for r in
                     pack_sequences(docs, budget=512, n_buckets=nb).collect())
        assert got == ref, nb
    assert ref


def test_pack_bins_contiguous_and_bounded(spark):
    docs = spark.read.parquet(DOCS)
    rows = sorted(pack_sequences(docs, budget=512).collect(),
                  key=lambda r: r["doc_id"])
    # bin ids are non-decreasing in doc order and start at 0
    bins = [r["bin_id"] for r in rows]
    assert bins[0] == 0
    assert all(b1 <= b2 for b1, b2 in zip(bins, bins[1:]))
    # a doc starts bin b iff its exclusive prefix lands in [b*512, (b+1)*512)
    cum = 0
    for r in rows:
        assert r["bin_id"] == cum // 512
        cum += r["n_tokens"]


def test_pack_empty_input(spark):
    docs = spark.read.parquet(DOCS).where("doc_id < 0")
    assert pack_sequences(docs, budget=512).count() == 0


def test_contamination_semantics_and_plan(spark):
    from whoosh_spark.pipeline.dedup import contamination
    docs = spark.read.parquet(DOCS)
    probes = docs.where("doc_id <= 4")
    out = contamination(docs, probes, n=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    # total verdict: every corpus doc present
    assert len(rows) == docs.count()
    # the probes are (trivially) contaminated by themselves
    assert all(rows[i]["contaminated"] and rows[i]["n_hits"] > 0
               for i in range(5))
    # flag column is exactly n_hits > 0
    assert all((r["n_hits"] > 0) == r["contaminated"] for r in rows.values())
    # the probe side must broadcast — no shuffle of corpus shingles
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_contamination_disjoint_probes(spark):
    from whoosh_spark.pipeline.dedup import contamination
    docs = spark.read.parquet(DOCS)
    probes = docs.limit(0)
    out = contamination(docs, probes, n=3)
    assert out.where("contaminated").count() == 0
    assert out.count() == docs.count()


def test_pack_offset_id_range(spark):
    # ids far from 0 (e.g. 64-bit hash-derived) must bucket relative to
    # min_id — same bins as the unshifted corpus, and NULL ids are dropped
    docs = spark.read.parquet(DOCS)
    shifted = docs.withColumn("doc_id", F.col("doc_id") + F.lit(10**12))
    ref = [(r["doc_id"], r["bin_id"]) for r in
           pack_sequences(docs, budget=512, n_buckets=8)
           .orderBy("doc_id").collect()]
    got = [(r["doc_id"] - 10**12, r["bin_id"]) for r in
           pack_sequences(shifted, budget=512, n_buckets=8)
           .orderBy("doc_id").collect()]
    assert got == ref and ref
    withnull = docs.unionByName(
        docs.limit(1).withColumn("doc_id", F.lit(None).cast("long")))
    assert pack_sequences(withnull, budget=512).count() == docs.count()
