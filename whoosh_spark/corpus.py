"""Deterministic Common-Crawl-style corpus generator (BASELINE.json input_hint).

Produces the production input shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus a dense ``doc_id`` for test convenience.  Generation is seeded AND
partition-independent: every document is generated from a counter-based
Philox stream keyed by ``(seed, doc_id)``, so the same (n, seed) yields the
same corpus at any parallelism — required for the build-invariance tests.

The vocabulary is Zipfian, includes Whoosh STOP_WORDS members and hot
stop-adjacent terms (skew exercise), dotted tokens (``example.com`` — the
tokenizer keeps them whole), and non-ASCII tokens to pin CPython ``re``/
``lower`` semantics (FIXTURES.md §B).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_LANGS = ["en", "en", "en", "fr", "es", "de", "zh"]  # en-heavy


def make_vocab() -> list[str]:
    """~2000-word deterministic vocabulary, Zipf-ranked by list order."""
    hot = [
        "data", "web", "index", "search", "spark", "query", "merge", "join",
        "page", "crawl", "text", "token", "score", "rank", "build", "block",
        # stopwords injected as hot terms — they must vanish in analysis:
        "the", "a", "and", "of", "to",
        # stop-adjacent hot terms (NOT in the stop list):
        "then", "them", "toward", "about", "other",
    ]
    dotted = ["example.com", "web.archive.org", "v1.2.3", "node.js"]
    unicode_toks = ["naïve", "résumé", "istanbul", "münchen", "東京", "café"]
    syll = ["ar", "ben", "cor", "dul", "eng", "for", "gal", "hin", "jor",
            "kel", "lum", "mor", "nex", "oth", "pra", "qui", "ros", "sta",
            "tur", "vel"]
    base = [a + b for a in syll for b in syll]  # 400
    more = [a + b + c for a in syll[:10] for b in syll[:10] for c in ("on", "ix", "um", "er")]  # 400
    vocab = hot + dotted + unicode_toks + base + more
    # pad to ~2000 with numbered rares
    vocab += [f"rare{i:04d}" for i in range(2000 - len(vocab))]
    return vocab


_VOCAB = make_vocab()
_ZIPF_S = 1.07


def _zipf_probs(n: int) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** _ZIPF_S
    return p / p.sum()


_PROBS = _zipf_probs(len(_VOCAB))

# vocab_mult > 1 appends deterministic rare-tail terms (Zipf re-normalized
# over the longer list) for realistic-vocabulary soaks; mult=1 is byte-
# identical to the original corpus, so invariance fixtures are unaffected.
_VOCABS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _vocab_probs(mult: int = 1) -> tuple[np.ndarray, np.ndarray]:
    if mult not in _VOCABS:
        v = list(_VOCAB)
        if mult > 1:
            v += [f"xr{i:06d}" for i in range(len(_VOCAB) * (mult - 1))]
        _VOCABS[mult] = (np.asarray(v, dtype=object), _zipf_probs(len(v)))
    return _VOCABS[mult]


def gen_pages_pdf(doc_ids: np.ndarray, seed: int, mean_len: int,
                  vocab_mult: int = 1) -> pd.DataFrame:
    """Generate one batch of pages for the given global doc ids."""
    out = {"doc_id": [], "url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    vocab, probs = _vocab_probs(vocab_mult)
    for did in doc_ids:
        rng = np.random.Generator(np.random.Philox(key=[seed, int(did)]))
        ln = max(1, int(rng.lognormal(mean=np.log(mean_len), sigma=0.6)))
        words = vocab[rng.choice(len(vocab), size=ln, p=probs)]
        text = " ".join(words.tolist())
        ts = np.datetime64("2024-01-01") + np.timedelta64(int(rng.integers(0, 365 * 86400)), "s")
        out["doc_id"].append(int(did))
        out["url"].append(f"https://host{int(did) % 97}.example/p/{int(did)}")
        out["warc_ts"].append(pd.Timestamp(ts))
        out["html"].append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        out["text"].append(text)
        out["lang"].append(_LANGS[int(did) % len(_LANGS)])
    return pd.DataFrame(out)


def pages_df(spark: SparkSession, n: int, seed: int = 42, mean_len: int = 120,
             partitions: int | None = None, vocab_mult: int = 1) -> DataFrame:
    """Distributed deterministic pages table of n rows."""
    base = spark.range(0, n, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield gen_pages_pdf(pdf["id"].to_numpy(), seed, mean_len,
                                vocab_mult)

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


EMBEDDINGS_SCHEMA = "vec_id long, cluster int, embedding array<float>"


def clustered_embeddings_df(spark: SparkSession, n: int, dim: int = 64,
                            n_clusters: int = 50, noise: float = 0.04,
                            seed: int = 42,
                            partitions: int | None = None) -> DataFrame:
    """Distributed deterministic mixture-of-Gaussians embeddings on the unit
    sphere — the REALISTIC ANN fixture (semantic embeddings cluster; the
    i.i.d.-random fixture in /root/testdata is the provable worst case for
    any locality-based index, since all pairwise cosines concentrate at 0).

    vec i belongs to cluster ``i % n_clusters`` (balanced); its vector is
    ``normalize(center_c + noise·g_i)`` with ``g_i`` a per-id seeded
    standard normal — deterministic per (seed, vec_id) regardless of
    partitioning, same discipline as :func:`pages_df`.  ``noise`` is the
    PER-COMPONENT σ: the noise vector's expected norm is noise·√dim, so
    intra-cluster cosine ≈ 1/(1 + noise²·dim) — the default 0.04 at dim 64
    gives ≈0.90 within a cluster vs ≈0 across, i.e. clearly separated but
    not degenerate neighborhoods."""
    base = spark.range(
        0, n, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        centers_rng = np.random.Generator(np.random.Philox(key=[seed, 1 << 32]))
        centers = centers_rng.standard_normal((n_clusters, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {"vec_id": [], "cluster": [], "embedding": []}
            for vid in ids:
                c = int(vid) % n_clusters
                rng = np.random.Generator(
                    np.random.Philox(key=[seed, int(vid)]))
                v = centers[c] + noise * rng.standard_normal(dim)
                v /= np.linalg.norm(v)
                rows["vec_id"].append(int(vid))
                rows["cluster"].append(c)
                rows["embedding"].append(v.astype(np.float32))
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=EMBEDDINGS_SCHEMA)
