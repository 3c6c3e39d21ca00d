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
* ``embedding_near_dups`` — all-pairs cosine ≥ tau via banded buckets
  (candidates, tiered by bucket size like MinHash LSH) + exact verify,
  never a full cross join and never an unbounded in-bucket expansion.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_spark.pipeline.dedup import tiered_bucket_pairs


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    # floored at 1e-12: an all-zero vector (failed encode / padding) then
    # scores cos = 0 instead of 0/0 = NaN — which Spark orders ABOVE every
    # real value, ranking junk first and passing every >= tau filter.  Real
    # norms are far above the floor, so their division is bit-identical.
    return F.greatest(
        F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)),
        F.lit(1e-12))


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


def _vec_dim(embeddings: DataFrame, vec_col: str,
             dim: int | None = None) -> int:
    """Vector dimensionality: caller-provided when already known (saves an
    eager Spark job), else probed from the first non-null embedding; 0 on
    an empty/all-null table (callers return an empty result instead of
    crashing on len(None))."""
    if dim is not None:
        return int(dim)
    row = (embeddings.where(F.col(vec_col).isNotNull())
           .select(vec_col).first())
    return len(row[0]) if row is not None else 0


def rp_lsh_buckets(embeddings: DataFrame, bits: int = 12, seed: int = 42,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   dim: int | None = None) -> DataFrame:
    """(vec_id, bucket, embedding): bucket = sign-bit code under ``bits``
    seeded random hyperplanes (broadcast literals, JVM dot products)."""
    if not 0 < bits <= 63:
        # shiftleft wraps the shift amount mod 64 — bits > 63 would
        # silently collide hyperplane i with hyperplane i-64
        raise ValueError(f"bits must be in 1..63 for a packed long code, "
                         f"got {bits}")
    dim = _vec_dim(embeddings, vec_col, dim)
    if dim == 0:
        return embeddings.where(F.lit(False)).select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.lit(0).cast("long").alias("bucket"),
            F.col(vec_col).alias("embedding"))
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
             n_tables: int = 1, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """LSH-bucketed approximate top-k: probe the query bucket (+ Hamming-1
    buckets), exact cosine on candidates only.

    ``n_tables`` > 1 is classic multi-table LSH (L independent hyperplane
    sets, candidate UNION) — the standard recall lever when one table's
    bucket misses true neighbors; cost grows ~linearly in L but stays a
    tiny pushed-predicate slice of the corpus, never a full scan."""
    dim = len(query_vec)
    qv = np.asarray(query_vec, dtype=np.float64)
    cand = None
    for t in range(max(1, n_tables)):
        tseed = seed + 1000003 * t
        planes = _hyperplanes(dim, bits, tseed)
        qsig = 0
        for i in range(bits):
            if float(planes[i] @ qv) > 0:
                qsig |= 1 << i
        probes = [qsig] + ([qsig ^ (1 << i) for i in range(bits)]
                           if multiprobe else [])
        bucketed = rp_lsh_buckets(embeddings, bits, tseed, vec_col, id_col,
                                  dim=dim)
        part = bucketed.where(F.col("bucket").isin(probes)) \
                       .select("vec_id", "embedding")
        cand = part if cand is None else cand.unionByName(part)
    if n_tables > 1:
        cand = cand.dropDuplicates(["vec_id"])
    return cosine_topk(cand, query_vec, k, "embedding", "vec_id")


def embedding_near_dups_exact(embeddings: DataFrame, tau: float = 0.5,
                              vec_col: str = "embedding", id_col: str = "vec_id",
                              grid: int = 16) -> DataFrame:
    """Exact all-pairs cosine ≥ tau via a BLOCK-PAIR GRID — deliberately
    O(n²) flops (exactness at any tau requires it for dense vectors), but
    distributed: vectors land in ``grid`` blocks by id hash, the grid of
    grid·(grid+1)/2 block pairs becomes the join key, and each pair bucket
    compares 2n/grid vectors in one task.  No cartesian node, no single-task
    blowup, memory per task bounded by the block size — raise ``grid`` with
    the cluster (grid ≈ sqrt(2 · #cores) keeps every core busy).
    """
    spark = embeddings.sparkSession
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(grid)).alias("blk"),
    )
    pairs = [(i, j) for i in range(grid) for j in range(i, grid)]
    grid_df = spark.createDataFrame(
        [(p, i, j, i == j) for p, (i, j) in enumerate(pairs)],
        "pid int, bi int, bj int, diag boolean")
    # every unordered block pair {i,j} is exactly one pid; vec_id order is
    # normalized with least/greatest afterwards, so each vector pair is seen
    # exactly once (diagonal pids additionally filter ia < ib)
    l = base.join(F.broadcast(grid_df.select("pid", "bi", "diag")),
                  base["blk"] == F.col("bi")) \
            .select("pid", "diag", F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    r = base.join(F.broadcast(grid_df.select("pid", "bj")),
                  base["blk"] == F.col("bj")) \
            .select("pid", F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        l.join(r, "pid")
        .where(~F.col("diag") | (F.col("ia") < F.col("ib")))
        .select(F.least("ia", "ib").alias("a"),
                F.greatest("ia", "ib").alias("b"),
                F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= tau)
    )


def embedding_near_dups(embeddings: DataFrame, tau: float = 0.95,
                        bits: int = 128, bands: int = 16, seed: int = 42,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        max_bucket: int | None = 4096,
                        inline_cap: int = 512) -> DataFrame:
    """(a, b, cos) pairs with cosine ≥ tau — banded sign-bit LSH candidates +
    exact verify.  The scale path: candidates come from per-bucket expansion
    on (band, band-key), never an all-pairs comparison.

    Banding math (per-bit flip prob p = acos(cos)/π): a pair collides in a
    band of width w with prob (1−p)^w; missing all ``bands`` bands has prob
    (1−(1−p)^w)^bands.  Defaults (128 bits, 16×8-bit bands) give miss prob
    ≈1.3e-4 at cos 0.95 and ≈6e-9 at cos 0.99; the verify step makes every
    reported pair exact, so errors are only possible as recall misses.

    Bucket sizes are tiered exactly like MinHash LSH
    (``dedup.tiered_bucket_pairs``): all-pairs in-array below ``inline_cap``,
    a distributed per-bucket equi-join up to ``max_bucket``, and above that a
    connectivity-preserving star — the skew armor for the degenerate corpus
    region (thousands of identical/near-zero embeddings sharing every band
    key) whose in-bucket expansion is otherwise quadratic.  As with MinHash,
    the star tier preserves duplicate-CLUSTER connectivity but not pair
    completeness; pass ``max_bucket=None`` for exact all-pairs candidates
    under any skew.  Candidate pairs dedupe across bands BEFORE the verify
    join, so each surviving pair's cosine is computed once."""
    if bits % bands:
        raise ValueError("bits must be divisible by bands")
    w = bits // bands
    if w > 63:
        raise ValueError(f"band width bits/bands = {w} exceeds a packed "
                         "long (63 bits) — raise bands")
    # per-band keys assembled directly from sign bits (bits may exceed 64,
    # so no single packed code); planes are broadcast literals as in
    # rp_lsh_buckets
    dim = _vec_dim(embeddings, vec_col)
    if dim == 0:
        return embeddings.sparkSession.createDataFrame(
            [], "a long, b long, cos double")
    planes = _hyperplanes(dim, bits, seed)
    v = F.col(vec_col).cast("array<double>")
    keys = []
    for b in range(bands):
        key = F.lit(0).cast("long")
        for j in range(w):
            p = F.array(*[F.lit(float(x)) for x in planes[b * w + j]])
            key = key + F.when(_dot(v, p) > 0,
                               F.shiftleft(F.lit(1).cast("long"), j)).otherwise(0)
        keys.append(key)
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("v"))
    banded = embeddings.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), keys[b].alias("bh"))
            for b in range(bands)
        ])).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    cand = tiered_bucket_pairs(buckets, inline_cap=inline_cap,
                               max_bucket=max_bucket)
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        cand
        .join(base.select(F.col("vec_id").alias("a"), F.col("v").alias("va")), "a")
        .join(base.select(F.col("vec_id").alias("b"), F.col("v").alias("vb")), "b")
        .select("a", "b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= tau)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the other classic scale path besides RP-LSH:
# a coarse quantizer assigns each vector to its nearest centroid cell; a
# query exact-scores only the n_probe nearest cells.  Centroids here are
# SEEDED random unit vectors (data-independent), so assignment is a pure
# function of (vector, seed) — deterministic across engines/partitionings
# and exactly reproducible in the DuckDB oracle (a k-means refinement would
# drop in without changing the dataflow: cells are still an equi-filter).
# ---------------------------------------------------------------------------


def _ivf_centroids(dim: int, n_cells: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    c = rng.standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_train(embeddings: DataFrame, n_cells: int = 16, iters: int = 3,
              seed: int = 42, sample: int = 8192,
              vec_col: str = "embedding", id_col: str = "vec_id") -> list:
    """Lloyd-refined IVF centroids (spherical k-means over a bounded
    DETERMINISTIC sample): random seeded init (= the untrained centroids),
    then ``iters`` assign/mean/renormalize steps over at most ``sample``
    vectors picked by md5-of-id order — engine- and partitioning-stable.

    The sample is collected once (TakeOrderedAndProject, never a corpus
    shuffle) and refined driver-side in numpy — O(sample·dim·n_cells·iters)
    on the driver, which is the standard IVF practice (FAISS trains on a
    sample too).  Returns ``n_cells`` unit row-vectors as a list of lists,
    ready for ``ivf_assign/ivf_topk(centroids=...)``.  Empty cells keep
    their previous centroid, so the cell count is stable."""
    dim = _vec_dim(embeddings, vec_col)
    cents = _ivf_centroids(dim, n_cells, seed)
    rows = (embeddings.select(F.col(vec_col).alias("v"),
                              F.md5(F.col(id_col).cast("string")).alias("h"))
            .orderBy("h").limit(sample).collect())
    if rows:
        x = np.asarray([r["v"] for r in rows], dtype=np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = x / norms
        for _ in range(max(0, iters)):
            assign = np.argmax(x @ cents.T, axis=1)
            for c in range(n_cells):
                members = x[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    n = np.linalg.norm(m)
                    if n > 0:
                        cents[c] = m / n
    return [[float(v) for v in c] for c in cents]


def ivf_assign(embeddings: DataFrame, n_cells: int = 16, seed: int = 42,
               vec_col: str = "embedding", id_col: str = "vec_id",
               dim: int | None = None,
               centroids: list | None = None) -> DataFrame:
    """(vec_id, cell, embedding): cell = argmax centroid dot product (first
    max wins on exact ties — mirrored by the oracle's ORDER BY d DESC,
    cid ASC LIMIT 1).  Centroid dots are JVM column expressions over
    broadcast literals; at scale, write this table partitioned BY cell so a
    probe reads only its cells' files.  ``centroids`` (e.g. from
    :func:`ivf_train`) overrides the seeded random cells."""
    dim = _vec_dim(embeddings, vec_col, dim)
    if dim == 0:
        return embeddings.where(F.lit(False)).select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.lit(0).cast("int").alias("cell"),
            F.col(vec_col).alias("embedding"))
    cents = (np.asarray(centroids, dtype=np.float64)
             if centroids is not None else _ivf_centroids(dim, n_cells, seed))
    n_cells = len(cents)
    v = F.col(vec_col).cast("array<double>")
    dots = F.array(*[
        _dot(v, F.array(*[F.lit(float(x)) for x in cents[c]]))
        for c in range(n_cells)
    ])
    cell = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    return embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        cell.alias("cell"),
        F.col(vec_col).alias("embedding"),
    )


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_cells: int = 16, n_probe: int = 4, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: list | None = None) -> DataFrame:
    """IVF-flat approximate top-k: exact cosine over the n_probe cells whose
    centroids are nearest the query.  ``centroids`` (from :func:`ivf_train`)
    swaps the seeded random cells for trained ones — same plan shape."""
    dim = len(query_vec)
    cents = (np.asarray(centroids, dtype=np.float64)
             if centroids is not None else _ivf_centroids(dim, n_cells, seed))
    n_cells = len(cents)
    qd = cents @ np.asarray(query_vec, dtype=np.float64)
    order = sorted(range(n_cells), key=lambda c: (-qd[c], c))
    probes = order[:n_probe]
    cand = ivf_assign(embeddings, n_cells, seed, vec_col, id_col, dim=dim,
                      centroids=centroids) \
        .where(F.col("cell").isin(probes))
    return cosine_topk(cand, query_vec, k, "embedding", "vec_id")
