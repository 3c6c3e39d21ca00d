"""Multi-table LSH (``ann_topk(n_tables=L)``): the standard recall lever —
L independent hyperplane sets, candidate union, exact re-score."""

from __future__ import annotations

import numpy as np
import pytest

from whoosh_spark.pipeline import similarity


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.Generator(np.random.Philox(key=[99, 0]))
    rows = [(i, [float(x) for x in rng.standard_normal(16)])
            for i in range(300)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").cache()


def _recall(emb, qv, k, **kw):
    exact = {r[0] for r in similarity.cosine_topk(emb, qv, k=k).collect()}
    approx = {r[0] for r in similarity.ann_topk(emb, qv, k=k, **kw).collect()}
    return len(exact & approx) / len(exact)


def test_single_table_unchanged(emb):
    """n_tables=1 is byte-identical to the pre-round-3 path (table 0 uses
    the caller's seed directly) — the sim_ann_lsh oracle depends on it."""
    qv = similarity.query_vector(emb, 0)
    a = similarity.ann_topk(emb, qv, k=5, bits=8).collect()
    b = similarity.ann_topk(emb, qv, k=5, bits=8, n_tables=1).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_more_tables_never_lose_recall(emb):
    """Table 0 of the union IS the single-table case, so the candidate set
    only grows: recall(n_tables=4) >= recall(n_tables=1), per query."""
    for qid in (0, 7, 42):
        qv = similarity.query_vector(emb, qid)
        r1 = _recall(emb, qv, 10, bits=10, multiprobe=False)
        r4 = _recall(emb, qv, 10, bits=10, multiprobe=False, n_tables=4)
        assert r4 >= r1


def test_no_duplicate_candidates(emb):
    """Union across tables dedupes before the exact re-score — each vec_id
    appears at most once in the top-k output."""
    qv = similarity.query_vector(emb, 3)
    rows = similarity.ann_topk(emb, qv, k=50, bits=6, n_tables=5).collect()
    ids = [int(r["vec_id"]) for r in rows]
    assert len(ids) == len(set(ids))
