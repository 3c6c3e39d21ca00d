"""Replicates the driver's correctness gate locally: every queries() entry is
run through Spark AND its oracle_sql() through DuckDB on the same parquet,
then compared on row count, column names, and (rounded) values — the same
order-insensitive comparison the driver's CORRECTNESS_r{N}.json performs."""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

import os

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[sorted(cols).index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


# round 2: every entry has a full value oracle (md5-prefix hashes are
# engine-portable; multimodal ops derive their binary column from documents;
# the ANN oracle re-derives the seeded hyperplanes as SQL literals)
ROWS_ONLY: set[str] = set()


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    qs = E.queries()
    oracles = E.oracle_sql()
    if name in ROWS_ONLY:
        assert name not in oracles
        df = qs[name](spark, SF_DIR)
        assert df.columns and len(df.collect()) >= 0  # stable schema + runs
        return
    assert name in oracles, f"{name} missing oracle_sql"
    sdf = qs[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(row[c] for c in sorted(scols)) for row in sdf.collect()]

    res = ddb.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    # reorder duck rows to sorted-column order
    perm = [dcols.index(c) for c in sorted(dcols)]
    drows = [tuple(r[i] for i in perm) for r in drows]
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    def norm(rows):
        out = []
        for r in rows:
            out.append(tuple(round(v, 6) + 0.0 if isinstance(v, float) else v for v in r))
        return sorted(out, key=lambda t: tuple(str(x) for x in t))

    ns, nd = norm(srows), norm(drows)
    for a, b in zip(ns, nd):
        assert a == b, f"{name}: row mismatch\n spark={a}\n duck ={b}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
