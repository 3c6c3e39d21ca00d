"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: the query vector is a broadcast
  literal; the dot product is ``F.aggregate(F.zip_with(...))`` — pure JVM
  codegen, one scan, ``TakeOrderedAndProject`` top-k.  The 100 TB posture:
  exact scan parallelizes linearly and is the correctness baseline.
* ``rp_lsh_buckets`` / ``ann_topk`` — random-hyperplane (SimHash-for-vectors)
  LSH: b sign bits → bucket id.  ANN probes the query's bucket plus all
  Hamming-1 neighbors (multi-probe), then exact-scores candidates only.
  Hyperplanes are seeded Philox draws broadcast as literals — deterministic
  across partitionings and sessions.
* ``embedding_near_dups`` — all-pairs cosine ≥ tau via bucket-equi-join
  (candidates) + exact verify, never a full cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine to a literal query vector: (vec_id, cos)."""
    q = [float(x) for x in query_vec]
    qn = float(np.linalg.norm(q)) or 1.0
    qcol = F.array(*[F.lit(x) for x in q])
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, qcol) / (_norm(v) * qn)
    return (
        embeddings.select(F.col(id_col).cast("long").alias("vec_id"),
                          F.round(cos, 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def query_vector(embeddings: DataFrame, vec_id: int,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> list[float]:
    row = embeddings.where(F.col(id_col) == vec_id).select(vec_col).collect()[0]
    return [float(x) for x in row[0]]


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.standard_normal((bits, dim))


def rp_lsh_buckets(embeddings: DataFrame, bits: int = 12, seed: int = 42,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(vec_id, bucket, embedding): bucket = sign-bit code under ``bits``
    seeded random hyperplanes (broadcast literals, JVM dot products)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i in range(bits):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bucket = bucket + F.when(_dot(v, p) > 0,
                                 F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        bucket.alias("bucket"),
        F.col(vec_col).alias("embedding"),
    )


def ann_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             bits: int = 12, seed: int = 42, multiprobe: bool = True,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """LSH-bucketed approximate top-k: probe the query bucket (+ Hamming-1
    buckets), exact cosine on candidates only."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i in range(bits):
        if float(planes[i] @ qv) > 0:
            qsig |= 1 << i
    probes = [qsig] + ([qsig ^ (1 << i) for i in range(bits)] if multiprobe else [])
    bucketed = rp_lsh_buckets(embeddings, bits, seed, vec_col, id_col)
    cand = bucketed.where(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, "embedding", "vec_id")


def embedding_near_dups_exact(embeddings: DataFrame, tau: float = 0.5,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id") -> DataFrame:
    """Exact all-pairs cosine ≥ tau (correctness baseline; quadratic — use
    the LSH variant at scale)."""
    base = embeddings.select(F.col(id_col).cast("long").alias("vec_id"),
                             F.col(vec_col).alias("v"))
    l = base.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    r = base.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        l.crossJoin(r)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= tau)
    )


def embedding_near_dups(embeddings: DataFrame, tau: float = 0.95,
                        bits: int = 8, seed: int = 42,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """(a, b, cos) pairs with cosine ≥ tau — bucket-join candidates + exact
    verify.  High-cosine pairs collide in the sign-bit code w.h.p.; for
    recall-critical settings union several seeds."""
    b1 = rp_lsh_buckets(embeddings, bits, seed, vec_col, id_col)
    l = b1.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"), "bucket")
    r = b1.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"), "bucket")
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        l.join(r, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= tau)
        .distinct()
    )
