"""Connected components over duplicate-pair graphs — the grouping step of
corpus-scale dedup (near-dup PAIRS → duplicate CLUSTERS → one canonical doc
per cluster).

Default algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — O(log n)
rounds of pure groupBy/join dataflow, the standard shuffle-based CC at
web scale.  Each round is two aggregations + joins on node id; edges are
re-deduplicated and ``localCheckpoint``-ed so lineage stays flat across
iterations (a 100 TB run is tens of rounds, not a thousand-stage DAG).

``algorithm="labelprop"`` is the simple min-label propagation alternative
(O(diameter) rounds) kept as a differential-testing twin; both converge to
``component = min doc_id reachable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (hi, lo) direction, no loops."""
    return (
        edges.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_sig(edges: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive checksum) — convergence detector."""
    row = edges.select(
        F.count("*").alias("n"),
        # XOR-fold: order-insensitive, overflow-free (edges are distinct)
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every LARGER neighbor to the minimum of
    N(u) ∪ {u}."""
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct edges (hi → lo); for each node u connect all its smaller
    neighbors (and u itself) to the minimum."""
    d = _canon(edges)  # u > v
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    j = d.join(mins, "u")
    rewired = j.where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v"))
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return rewired.unionByName(self_edges)


def connected_components(pairs: DataFrame, a: str = "a", b: str = "b",
                         max_iter: int = 50,
                         algorithm: str = "star") -> DataFrame:
    """(a, b) duplicate pairs → (doc_id, component); component = min doc_id
    of the connected component.  Only nodes that appear in ``pairs`` are
    emitted (singletons are their own trivial component)."""
    edges = _canon(pairs.select(F.col(a).cast("long").alias("u"),
                                F.col(b).cast("long").alias("v")))
    if algorithm == "labelprop":
        return _labelprop(edges, max_iter)
    if algorithm != "star":
        raise ValueError(f"unknown algorithm {algorithm!r}")

    edges = edges.localCheckpoint()
    sig = _edge_sig(edges)
    for _ in range(max_iter):
        edges = _canon(_small_star(_large_star(edges))).localCheckpoint()
        new_sig = _edge_sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components: no convergence in "
                           f"{max_iter} rounds")
    # converged: every edge is (node, component-min) star arm
    members = edges.select(F.col("u").alias("doc_id"),
                           F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("doc_id"),
                         F.col("v").alias("component")).distinct()
    return members.unionByName(roots).distinct()


def _labelprop(edges: DataFrame, max_iter: int) -> DataFrame:
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    und = und.localCheckpoint()
    labels = (
        und.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            und.join(labels, und["v"] == labels["doc_id"])
            .select(und["u"].alias("doc_id"), "component")
        )
        new = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(f"labelprop: no convergence in {max_iter} rounds")


def drop_near_duplicates(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical doc (the component minimum) per duplicate
    cluster: docs anti-joined against the non-canonical members."""
    cc = connected_components(pairs)
    losers = cc.where(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(losers.withColumnRenamed("doc_id", id_col),
                     id_col, "left_anti")
