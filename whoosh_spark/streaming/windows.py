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
    schema = spark.read.parquet(events_path).schema
    # FileStreamSource requires a directory path; a single-file table
    # (testdata layout) streams via its parent + a glob on the file name
    if os.path.isdir(events_path):
        src = spark.readStream.schema(schema).parquet(events_path)
    else:
        src = (spark.readStream.schema(schema)
               .option("pathGlobFilter", os.path.basename(events_path))
               .parquet(os.path.dirname(events_path.rstrip("/")) or "."))
    agg = windowed_event_agg(src, window, delay, ts_col)
    name = f"windowed_events_{uuid.uuid4().hex[:12]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    # detach the result from the memory sink so repeated calls in one
    # session don't pin a uuid-named temp view (and its rows) forever;
    # the sink is already driver-resident, so the collect adds nothing
    sink = spark.table(name)
    rows, schema = sink.collect(), sink.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)
