"""Stateful streaming dedup: drop re-crawled duplicate content across
micro-batches.

The custom stateful operator the training-data pipeline needs on the
ingest path: content fingerprints arrive continuously (re-crawls, mirror
sites), and only the FIRST occurrence of each fingerprint may pass.  A
plain ``dropDuplicates`` on a stream buffers unbounded state invisibly;
this operator makes the state explicit with
``applyInPandasWithState`` (Arrow-batched, grouped by fingerprint):

* group key = the md5 content fingerprint (normalized token stream, same
  key the batch dedup ops use) — uniform, so state shards evenly
* state per key = the first doc_id (provenance + a seen flag in one)
* within a batch the smallest doc_id wins (deterministic)
* state TTL is the caller's choice: pass ``ttl_minutes`` to bound state on
  unbounded streams (processing-time timeout drops flags for fingerprints
  not seen within the window — the standard recall/state trade)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from whoosh_spark.config import TOKEN_PATTERN_RE2

_OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("fp", T.StringType()),
    T.StructField("text", T.StringType()),
])
_STATE_SCHEMA = T.StructType([T.StructField("first_doc", T.LongType())])


def fingerprint_col(text_col: str = "text"):
    """Same normalized-token md5 as ``pipeline.textstats.content_fingerprint``."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(TOKEN_PATTERN_RE2), F.lit(0))
    return F.md5(F.concat_ws(" ", words))


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 ttl_minutes: int | None = None) -> DataFrame:
    """Streaming DataFrame → first-occurrence-only streaming DataFrame
    (doc_id, fp, text).  Append output mode; state = one row per distinct
    fingerprint (bounded by ``ttl_minutes`` if given)."""
    src = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).withColumn("fp", fingerprint_col("text"))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)
    ttl_ms = (ttl_minutes or 0) * 60_000

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)  # refresh the window
            return
        first = batch.loc[batch["doc_id"].idxmin()]
        state.update((int(first["doc_id"]),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"doc_id": [int(first["doc_id"])],
                            "fp": [key[0]], "text": [first["text"]]})

    return src.groupBy("fp").applyInPandasWithState(
        fn, outputStructType=_OUT_SCHEMA, stateStructType=_STATE_SCHEMA,
        outputMode="append", timeoutConf=timeout)
