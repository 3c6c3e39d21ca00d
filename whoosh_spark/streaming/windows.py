"""Watermarked window aggregation over an event stream.

Whoosh has no streaming analog — this is the Structured-Streaming side of
the engine's pipeline surface: event-time tumbling windows with a
late-data watermark, the canonical pattern for continuous corpus/telemetry
rollups next to the micro-segment ingest (``streaming/ingest.py``).

Semantics (append mode): a window is emitted exactly once, when the
watermark (max observed event time − delay) passes the window end; events
later than the delay are dropped.  Over a BOUNDED input run with
``availableNow`` the result is therefore deterministic and equal to a
batch ``GROUP BY window`` restricted to windows whose end ≤ final
watermark — which is exactly the DuckDB oracle
(``oracle/pipeline_sql.py::windowed_events_sql``).

Scale posture: the aggregation state is keyed by (window, event_type) —
partial aggregation map-side, shuffle on the group key only; the
watermark bounds state size (evicted once emitted), so state is
O(open windows × types) regardless of stream length.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# decimal sum → order-independent across partitionings/engines (a double
# sum would hash-mismatch the oracle on reordering); exact at (18,2)
_VALUE_DEC = "decimal(18,2)"


def windowed_event_agg(events: DataFrame, window: str = "6 hours",
                       delay: str = "1 day",
                       ts_col: str = "ts") -> DataFrame:
    """The (stream-or-batch) transformation: tumbling ``window`` counts and
    value sums per event_type, watermarked by ``delay``.  Works on a batch
    DataFrame too (watermark is a no-op there) — the equivalence the tests
    assert."""
    # parquet timestamps may arrive as TIMESTAMP_NTZ, which watermarks
    # reject; reinterpret in the session zone (UTC here) for both modes so
    # stream and batch stay identical
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts_col, delay)
    w = F.window(F.col(ts_col), window)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast(_VALUE_DEC)).cast("double"), 2)
             .alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("w_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def session_event_agg(events: DataFrame, gap: str = "2 hours",
                      delay: str = "1 day",
                      ts_col: str = "ts") -> DataFrame:
    """Session-window counterpart of :func:`windowed_event_agg`: dynamic
    event-time sessions per event_type — a session spans events with < gap
    between consecutive timestamps and closes at ``last event + gap``
    (Spark merges overlapping [ts, ts+gap) intervals; an event at exactly
    the previous session's end starts a NEW session).  Batch-applicable for
    the stream≡finalized-batch equivalence tests.

    CAUTION — filtering the result on ``s_start``/``s_end`` in the same
    plan is unsafe in batch mode: Catalyst pushes such predicates through
    the aggregation onto the per-row pre-merge [ts, ts+gap) windows, which
    drops events BEFORE session merging and silently splits boundary
    sessions.  Materialize (collect/checkpoint) first, then filter."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts_col, delay)
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast(_VALUE_DEC)).cast("double"), 2)
             .alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("s_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("s_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def _read_stream(spark: SparkSession, events_path: str) -> DataFrame:
    schema = spark.read.parquet(events_path).schema
    # FileStreamSource requires a directory path; a single-file table
    # (testdata layout) streams via its parent + a glob on the file name
    if os.path.isdir(events_path):
        return spark.readStream.schema(schema).parquet(events_path)
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(events_path))
            .parquet(os.path.dirname(events_path.rstrip("/")) or "."))


def _run_available_now(agg: DataFrame, spark: SparkSession) -> DataFrame:
    """Drive a streaming plan to completion (availableNow, append mode,
    memory sink) and return the emitted rows detached from the sink —
    the uuid-named temp view is dropped so repeated calls on one session
    don't pin driver-resident tables (the sink is already driver-resident,
    so the collect adds nothing)."""
    name = f"windowed_events_{uuid.uuid4().hex[:12]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    sink = spark.table(name)
    rows, schema = sink.collect(), sink.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


def stream_windowed_counts(spark: SparkSession, events_path: str,
                           window: str = "6 hours", delay: str = "1 day",
                           ts_col: str = "ts") -> DataFrame:
    """Run the windowed aggregation as a REAL streaming query over the
    bounded parquet input (``availableNow`` trigger, append mode, memory
    sink) and return the emitted rows as a batch DataFrame.

    Append mode emits only watermark-finalized windows: windows whose end
    is within ``delay`` of the stream's max event time stay open and are
    NOT in the result (deterministic for a bounded input — the final
    no-data micro-batch flushes everything up to the final watermark).
    """
    src = _read_stream(spark, events_path)
    return _run_available_now(windowed_event_agg(src, window, delay, ts_col),
                              spark)


def stream_session_counts(spark: SparkSession, events_path: str,
                          gap: str = "2 hours", delay: str = "1 day",
                          ts_col: str = "ts") -> DataFrame:
    """:func:`stream_windowed_counts` for SESSION windows: the streaming
    stateful operator merges in-gap events into growing sessions and append
    mode emits a session exactly once, when the watermark (max event time −
    delay) passes its end.  State is bounded by the watermark regardless of
    stream length — the scale contract for continuous sessionization."""
    src = _read_stream(spark, events_path)
    return _run_available_now(session_event_agg(src, gap, delay, ts_col),
                              spark)
