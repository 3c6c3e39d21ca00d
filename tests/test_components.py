"""Connected components (pipeline/components.py): large-star/small-star and
label propagation vs a pure-Python union-find oracle on random graphs."""

from __future__ import annotations

import random

import pytest

from whoosh_spark.pipeline.components import (
    connected_components,
    drop_near_duplicates,
)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _spark_cc(spark, pairs, algorithm):
    df = spark.createDataFrame(pairs, "a long, b long")
    out = connected_components(df, algorithm=algorithm)
    return {int(r["doc_id"]): int(r["component"]) for r in out.collect()}


CASES = [
    [(1, 2)],
    [(1, 2), (2, 3), (3, 4)],                      # chain
    [(10, 1), (10, 2), (10, 3)],                   # star (hi center)
    [(1, 2), (3, 4), (5, 6), (2, 3)],              # merge of chains
    [(1, 2), (2, 1), (2, 2), (7, 8)],              # dupes + loop + island
    [(i, i + 1) for i in range(1, 20)],            # long chain (log rounds)
]


@pytest.mark.parametrize("algorithm", ["star", "labelprop"])
def test_fixed_graphs(spark, algorithm):
    for pairs in CASES:
        clean = [(a, b) for a, b in pairs if a != b]
        expect = _union_find(clean)
        got = _spark_cc(spark, pairs, algorithm)
        assert got == expect, (pairs, algorithm)


def test_random_graphs_match_union_find(spark):
    for seed in (7, 42, 20260818):
        rng = random.Random(seed)
        n = rng.randint(10, 40)
        pairs = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(n)]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        expect = _union_find(pairs)
        star = _spark_cc(spark, pairs, "star")
        lp = _spark_cc(spark, pairs, "labelprop")
        assert star == expect, seed
        assert lp == expect, seed


def test_drop_near_duplicates(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 4), (3, 5)], "a long, b long")
    kept = sorted(r["doc_id"] for r in drop_near_duplicates(docs, pairs).collect())
    # clusters {1,2,4} -> keep 1; {3,5} -> keep 3; singletons 0 stay
    assert kept == [0, 1, 3]
