"""Watermarked window aggregation (streaming/windows.py): a real
availableNow streaming run must emit exactly the watermark-finalized
windows of the equivalent batch aggregation — nothing more (open windows
held back), nothing less, identical counts and decimal-exact sums."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from whoosh_spark.streaming.windows import (stream_windowed_counts,
                                            windowed_event_agg)

EVENTS = "/root/testdata/sf0.001/events.parquet"
WINDOW, DELAY = "6 hours", "1 day"


@pytest.fixture(scope="module")
def frames(spark):
    streamed = stream_windowed_counts(spark, EVENTS, WINDOW, DELAY).collect()
    ev = spark.read.parquet(EVENTS)
    batch = windowed_event_agg(ev, WINDOW, DELAY)
    # format the watermark INSIDE the UTC-pinned Spark session — a
    # collect()ed timestamp goes through system-local datetime.fromtimestamp
    # and would skew the string on a non-UTC host
    wm = ev.agg(F.date_format(
        F.max(F.col("ts").cast("timestamp")) - F.expr("INTERVAL 1 DAY"),
        "yyyy-MM-dd HH:mm:ss")).first()[0]
    return streamed, batch, wm


def _key(rows):
    return {(r["w_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in rows}


def test_stream_equals_finalized_batch(frames):
    streamed, batch, wm = frames
    finalized = batch.where(F.col("w_end") <= F.lit(wm)).collect()
    assert _key(streamed) == _key(finalized)
    assert len(streamed) == len(finalized) > 0


def test_open_windows_held_back(frames):
    streamed, batch, wm = frames
    open_rows = batch.where(F.col("w_end") > F.lit(wm)).collect()
    # the tail windows within the watermark delay exist in the batch view
    # but must NOT have been emitted by the append-mode stream
    assert open_rows, "test data should leave at least one window open"
    emitted = {(r["w_start"], r["event_type"]) for r in streamed}
    assert all((r["w_start"], r["event_type"]) not in emitted
               for r in open_rows)


def test_batch_mode_counts_everything(spark, frames):
    _, batch, _ = frames
    total = batch.agg(F.sum("n_events")).first()[0]
    n = spark.read.parquet(EVENTS).count()
    assert total == n
