"""PII scrubbing for training-data pipelines: detect + redact emails,
phone numbers, IPv4 addresses and SSN-style ids (the C4/CCNet-style
pre-training hygiene pass).

All patterns are RE2-safe and engine-portable — the SAME strings run in
Spark (Java regex) and the DuckDB oracle — and every step is a codegen
``regexp_replace``/``regexp_extract_all`` column expression: no UDF, no
shuffle, scales linearly with the corpus scan.

Redaction is STAGED (email → ssn → phone → ipv4), and each class is
counted on the text as it existed when that class was scanned, so an email
whose host looks like an IP is counted once as an email — both engines
apply the identical stage order, making counts deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe, Java-regex-safe (no lookaround, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
# no leading \b: a boundary can't precede '(' or '+' (both non-word chars)
PHONE_RE = r"(\+[0-9]{1,3}[ .\-])?(\([0-9]{3}\)[ .\-]?|[0-9]{3}[ .\-])[0-9]{3}[ .\-][0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# (output count column, pattern, replacement token) in stage order
PII_STAGES: list[tuple[str, str, str]] = [
    ("n_email", EMAIL_RE, "<EMAIL>"),
    ("n_ssn", SSN_RE, "<SSN>"),
    ("n_phone", PHONE_RE, "<PHONE>"),
    ("n_ipv4", IPV4_RE, "<IP>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, clean, n_email, n_ssn, n_phone, n_ipv4).

    ``clean`` is the text with every PII span replaced by its class token;
    counts are per class at its stage."""
    out = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(text_col).alias("_t"))
    counts = []
    for col, pat, tok in PII_STAGES:
        out = out.withColumn(
            col, F.size(F.regexp_extract_all("_t", F.lit(pat), F.lit(0))))
        out = out.withColumn("_t", F.regexp_replace("_t", pat, tok))
        counts.append(col)
    return out.select("doc_id", F.col("_t").alias("clean"), *counts)


def pii_doc_stats(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII presence summary (filtering gate input): doc_id,
    total PII spans, has_pii flag."""
    r = redact_pii(docs, text_col, id_col)
    total = sum(F.col(c) for c, _, _ in PII_STAGES)
    return r.select("doc_id", total.alias("n_pii"),
                    (total > 0).alias("has_pii"))
