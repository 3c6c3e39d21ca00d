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


@pytest.fixture(scope="session")
def ix(spark, sf0001_documents):
    """Session-shared sf0.001 index — modules needing a different corpus or
    build config override with their own module-scoped fixture."""
    from whoosh_spark.index import InvertedIndex

    return InvertedIndex.build(sf0001_documents)


@pytest.fixture(scope="session")
def searcher(ix):
    from whoosh_spark.search import Searcher

    return Searcher(ix)


@pytest.fixture(scope="session")
def py(spark, sf0001_documents, docs_rows):
    from whoosh_spark.oracle.engine import PyIndex

    stored = {int(r["doc_id"]): {"n_chars": int(r["n_chars"]),
                                 "lang": r["lang"], "source": r["source"]}
              for r in sf0001_documents.collect()}
    return PyIndex(docs_rows, stored=stored)
