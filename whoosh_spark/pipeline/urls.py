"""URL canonicalization for web-corpus dedup keys.

Common-Crawl-style pipelines dedup on a canonical URL before any content
hashing.  The normalization here is the usual safe subset (RFC 3986 §6):

1. lowercase the scheme and host
2. drop the fragment
3. drop default ports (``:80`` http, ``:443`` https)
4. sort query parameters (order-insensitive equality)
5. strip a trailing ``?`` left by an empty query

Everything is RE2-safe regexp/array expressions, so the identical constant
patterns drive the Spark op (whole-stage codegen, zero shuffle) and the
DuckDB oracle twin (``oracle/pipeline_sql.py::url_canonical_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe split of scheme://host[:port] vs the rest
SCHEME_HOST_PATTERN = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$"
FRAGMENT_PATTERN = r"#.*$"
DEFAULT_PORT_HTTP = r"^(http://[^/?#:]*):80($|[/?#].*)"
DEFAULT_PORT_HTTPS = r"^(https://[^/?#:]*):443($|[/?#].*)"


def canonical_url_expr(url_col) -> "F.Column":
    u = F.regexp_replace(url_col, FRAGMENT_PATTERN, "")
    head = F.lower(F.regexp_extract(u, SCHEME_HOST_PATTERN, 1))
    tail = F.regexp_extract(u, SCHEME_HOST_PATTERN, 2)
    # schemeless/malformed urls pass through UNCHANGED — regexp_extract
    # returns '' on no-match, and concat('','') would canonicalize every
    # such url to the same empty string, fusing unrelated pages into one
    # bogus duplicate group
    u = F.when(u.rlike(SCHEME_HOST_PATTERN), F.concat(head, tail)) \
         .otherwise(u)
    u = F.regexp_replace(u, DEFAULT_PORT_HTTP, r"$1$2")
    u = F.regexp_replace(u, DEFAULT_PORT_HTTPS, r"$1$2")
    # sort query params: path?a=1&b=2 — split once on the FIRST '?'
    qpos = F.instr(u, "?")
    base = F.when(qpos > 0, F.substring(u, F.lit(1), qpos - 1)).otherwise(u)
    query = F.when(qpos > 0, F.substr(u, qpos + 1)).otherwise(F.lit(""))
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")), "&")
    return F.when(sorted_q != "", F.concat(base, F.lit("?"), sorted_q)) \
            .otherwise(base)


def canonical_urls(pages: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, url_canon): scan-side projection, no shuffle."""
    return pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        canonical_url_expr(F.col(url_col)).alias("url_canon"))


def url_duplicates(pages: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical_id, group_size) for docs sharing a canonical URL —
    the fetch-level dedup pass that runs before content dedup.  One
    groupBy(url_canon) shuffle with map-side combine; hot hosts spread
    because the key is the full URL, not the host."""
    canon = canonical_urls(pages, url_col, id_col)
    groups = (canon.groupBy("url_canon")
              .agg(F.min("doc_id").alias("canonical_id"),
                   F.count("*").cast("long").alias("group_size"))
              .where(F.col("group_size") > 1))
    return (canon.join(groups, "url_canon")
            .select("doc_id", "canonical_id", "group_size"))


HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)"


def host_stats(pages: DataFrame, url_col: str = "url",
               text_col: str | None = "text") -> DataFrame:
    """(host, n_docs[, n_chars]): per-host corpus aggregation over the
    CANONICAL url — the crawl-health rollup (docs per domain, content
    volume).  One groupBy(host) with map-side combine; host count is
    bounded by the web itself, not the corpus, so the shuffle stays small."""
    cols = [canonical_url_expr(F.col(url_col)).alias("u")]
    if text_col is not None and text_col in pages.columns:
        cols.append(F.length(F.col(text_col)).alias("_nc"))
    base = pages.select(*cols).withColumn(
        "host", F.regexp_extract("u", HOST_PATTERN, 1))
    aggs = [F.count("*").cast("long").alias("n_docs")]
    if len(cols) > 1:
        aggs.append(F.sum("_nc").cast("long").alias("n_chars"))
    return base.groupBy("host").agg(*aggs)
