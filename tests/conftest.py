from __future__ import annotations

import pytest

from whoosh_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(master="local[4]", shuffle_partitions=4, app="whoosh_spark_tests")
    yield sp


@pytest.fixture(scope="session")
def sf0001_documents(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="session")
def docs_rows(sf0001_documents):
    rows = sf0001_documents.select("doc_id", "text").collect()
    return [(int(r["doc_id"]), r["text"]) for r in rows]
