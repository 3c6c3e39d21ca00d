"""PII scrubbing (pipeline/scrub.py): staged redaction + counts, Spark vs
the DuckDB oracle built from the SAME pattern constants."""

from __future__ import annotations

import duckdb

from whoosh_spark.oracle.pipeline_sql import redact_pii_sql
from whoosh_spark.pipeline.scrub import pii_doc_stats, redact_pii

SAMPLES = [
    (0, "contact bob.smith+x@ex-ample.co.uk or 192.168.1.99 now"),
    (1, "call (555) 123-4567 or 555-123-4567 or +1 555 123 4567"),
    (2, "ssn 123-45-6789 ip 10.0.0.1 mail a@b.io"),
    (3, "no pii here 1234 5.5"),
    (4, "edge 999-99-9999 and 12.34.56.78.90"),
    (5, "a+1 212.555.0199 b (555)123-4567 tight"),
]


def test_redact_matches_duckdb_oracle(spark, tmp_path):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(p)

    got = {int(r["doc_id"]): (r["clean"], r["n_email"], r["n_ssn"],
                              r["n_phone"], r["n_ipv4"])
           for r in redact_pii(df).collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    cols = [d[0] for d in con.execute(redact_pii_sql()).description]
    for row in con.execute(redact_pii_sql()).fetchall():
        d = dict(zip(cols, row))
        assert got[d["doc_id"]] == (d["clean"], d["n_email"], d["n_ssn"],
                                    d["n_phone"], d["n_ipv4"])


def test_redact_tokens_and_counts(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    got = {int(r["doc_id"]): r for r in redact_pii(df).collect()}
    assert got[0]["clean"] == "contact <EMAIL> or <IP> now"
    assert got[1]["n_phone"] == 3 and "<PHONE>" in got[1]["clean"]
    assert got[2].asDict() | {} == got[2].asDict()  # smoke accessor
    assert (got[2]["n_email"], got[2]["n_ssn"], got[2]["n_ipv4"]) == (1, 1, 1)
    assert got[3]["clean"] == SAMPLES[3][1]  # untouched


def test_pii_doc_stats_gate(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    st = {int(r["doc_id"]): (r["n_pii"], r["has_pii"])
          for r in pii_doc_stats(df).collect()}
    assert st[3] == (0, False)
    assert st[0] == (2, True)
    assert st[1] == (3, True)
