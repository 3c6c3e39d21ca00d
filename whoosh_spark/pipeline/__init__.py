"""Training-data pipeline operators over the corpus tables.

Beyond the Whoosh-equivalent search surface, a 100 TB web-text engine needs
the data-curation operators every large-scale training pipeline runs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and opaque
multimodal column plumbing.  All are expressed as DataFrame dataflow with
the same scale posture as the index build (bounded group sizes, broadcast
small sides, no per-row Python in hot paths).
"""

from whoosh_spark.pipeline import dedup, multimodal, similarity, textstats  # noqa: F401
