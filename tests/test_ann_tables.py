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


@pytest.fixture(scope="module")
def clustered(spark):
    """4 tight clusters of 40 vectors — the shape IVF training exists for."""
    rng = np.random.Generator(np.random.Philox(key=[7, 1]))
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(160):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in c + 0.05 * rng.standard_normal(16)]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").cache()


def test_ivf_train_deterministic_unit(clustered):
    a = similarity.ivf_train(clustered, n_cells=8, iters=3)
    b = similarity.ivf_train(clustered, n_cells=8, iters=3)
    assert a == b and len(a) == 8
    for c in a:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_ivf_trained_full_probe_is_exact(clustered):
    """n_probe = n_cells makes IVF exhaustive whatever the centroids —
    pins the centroids= threading through assign/topk."""
    cents = similarity.ivf_train(clustered, n_cells=8, iters=2)
    qv = similarity.query_vector(clustered, 5)
    exact = [tuple(r) for r in
             similarity.cosine_topk(clustered, qv, k=10).collect()]
    full = [tuple(r) for r in
            similarity.ivf_topk(clustered, qv, k=10, n_probe=8,
                                centroids=cents).collect()]
    assert full == exact


def test_ivf_trained_beats_untrained_on_clusters(clustered):
    """On clustered data, Lloyd-refined cells must not lose recall vs the
    random-hyperplane cells (deterministic given the fixed seeds)."""
    def recall(centroids):
        hit = tot = 0
        for qid in (0, 1, 2, 3, 21, 42):
            qv = similarity.query_vector(clustered, qid)
            exact = {r[0] for r in
                     similarity.cosine_topk(clustered, qv, k=10).collect()}
            got = {r[0] for r in similarity.ivf_topk(
                clustered, qv, k=10, n_cells=8, n_probe=2,
                centroids=centroids).collect()}
            hit += len(exact & got)
            tot += len(exact)
        return hit / tot

    trained = recall(similarity.ivf_train(clustered, n_cells=8, iters=3))
    untrained = recall(None)
    assert trained >= untrained
    assert trained >= 0.95  # tight clusters: trained cells keep them whole


def test_no_duplicate_candidates(emb):
    """Union across tables dedupes before the exact re-score — each vec_id
    appears at most once in the top-k output."""
    qv = similarity.query_vector(emb, 3)
    rows = similarity.ann_topk(emb, qv, k=50, bits=6, n_tables=5).collect()
    ids = [int(r["vec_id"]) for r in rows]
    assert len(ids) == len(set(ids))
