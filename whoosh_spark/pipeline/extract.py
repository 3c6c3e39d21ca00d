"""HTML → text extraction over the Common-Crawl-style pages table.

The north-rule input is ``(url, warc_ts, html binary, text, lang)`` with the
per-row invariant *byte-identical extracted text per url*.  This module is
the extraction step: a fixed, engine-portable normalization pipeline that
runs entirely as JVM column expressions (whole-stage codegen, no Python in
the hot path) and has an exact DuckDB twin built from the same constant
strings (``oracle/pipeline_sql.py::html_extract_sql``).

Pipeline (order is part of the contract — both engines apply it verbatim):

1. decode the ``html`` bytes as UTF-8
2. drop ``<script>`` / ``<style>`` blocks (case-insensitive, dotall, lazy)
3. drop HTML comments
4. replace every remaining tag with a single space (block-tag word break)
5. decode the basic character entities, ``&amp;`` LAST (no double-decode)
6. collapse whitespace runs to one space and trim

All regexes are RE2-safe (no backreferences, no lookaround) so the same
pattern string runs in Spark (Java regex) and DuckDB (RE2).  ``\\s`` differs
between the engines only on U+000B (vertical tab), which real HTML
whitespace handling does not hit; the corpus invariant test pins this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns (no backreferences) shared with the DuckDB oracle.
DROP_PATTERNS: tuple[str, ...] = (
    r"(?is)<script[^>]*>.*?</script\s*>",
    r"(?is)<style[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
)
TAG_PATTERN = r"<[^>]*>"
WS_PATTERN = r"\s+"

# (entity, replacement) in application order; ``&amp;`` is decoded last so
# already-escaped ampersands are not double-decoded.
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_expr(html_col) -> "F.Column":
    """The full extraction pipeline as one column expression over a
    ``binary`` html column (stays inside whole-stage codegen)."""
    # binary → string via CAST, not decode('UTF-8'): Spark 4's ANSI coding
    # check makes decode THROW on the first malformed byte sequence, and
    # Common-Crawl-style html routinely contains non-UTF-8 bytes — one bad
    # page must not kill a 100 TB extraction job.  The cast wraps the bytes
    # without validation (byte-identical for valid UTF-8 input).
    s = html_col.cast("string")
    for pat in DROP_PATTERNS:
        s = F.regexp_replace(s, pat, " ")
    s = F.regexp_replace(s, TAG_PATTERN, " ")
    for ent, ch in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, WS_PATTERN, " "))


def extract_text(pages: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id") -> DataFrame:
    """``(doc_id[, url], text)``: deterministic text extraction from raw
    page bytes.  Column pruning means a downstream index build over the
    result reads ONLY (id, html) from the source scan."""
    keep = [F.col(id_col).cast("long").alias("doc_id")]
    if "url" in pages.columns:
        keep.append(F.col("url"))
    return pages.select(*keep, extract_expr(F.col(html_col)).alias("text"))


# ---------------------------------------------------------------------------
# unicode normalization (training-data canonicalization)
# ---------------------------------------------------------------------------

# C0/C1 control chars except \t \n \r — RE2-safe, shared with the oracle
CONTROL_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(docs: DataFrame, text_col: str = "text",
                   strip_controls: bool = True) -> DataFrame:
    """(doc_id, text): NFC-normalize + optionally strip control characters.

    NFC runs as a vectorized pandas string kernel over Arrow batches (Spark
    has no built-in unicode normalizer); the control strip stays JVM-side.
    Oracle twin: DuckDB ``nfc_normalize`` + the same regexp
    (``oracle/pipeline_sql.py::normalize_text_sql``).
    """
    import pandas as pd
    from pyspark.sql import types as T

    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col(text_col).alias("text"))
    if strip_controls:
        src = src.withColumn(
            "text", F.regexp_replace("text", CONTROL_PATTERN, ""))

    def nfc(batches):
        for pdf in batches:
            pdf["text"] = pdf["text"].str.normalize("NFC")
            yield pdf

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    return src.mapInPandas(nfc, schema=schema)
