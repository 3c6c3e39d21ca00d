"""Watermarked window aggregation (streaming/windows.py): a real
availableNow streaming run must emit exactly the watermark-finalized
windows of the equivalent batch aggregation — nothing more (open windows
held back), nothing less, identical counts and decimal-exact sums."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from whoosh_spark.streaming.windows import (session_event_agg,
                                            stream_session_counts,
                                            stream_windowed_counts,
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


@pytest.fixture(scope="module")
def session_frames(spark):
    streamed = stream_session_counts(spark, EVENTS, "2 hours", DELAY).collect()
    ev = spark.read.parquet(EVENTS)
    batch = session_event_agg(ev, "2 hours", DELAY)
    wm = ev.agg(F.date_format(
        F.max(F.col("ts").cast("timestamp")) - F.expr("INTERVAL 1 DAY"),
        "yyyy-MM-dd HH:mm:ss")).first()[0]
    return streamed, batch, wm


def _skey(rows):
    return {(r["s_start"], r["event_type"]): (r["s_end"], r["n_events"],
                                              r["sum_value"])
            for r in rows}


def test_session_stream_equals_finalized_batch(session_frames):
    streamed, batch, wm = session_frames
    # filter in PYTHON, post-collect: a DataFrame .where(s_end <= wm) gets
    # pushed by Catalyst through the session aggregation onto the per-row
    # pre-merge [ts, ts+gap) windows, dropping events whose provisional end
    # exceeds wm BEFORE merging — which splits boundary sessions and
    # manufactures finalized-looking fragments the stream (correctly)
    # holds open (observed: 528 vs the correct 526 on sf0.001)
    rows = batch.collect()
    finalized = [r for r in rows if r["s_end"] <= wm]
    assert _skey(streamed) == _skey(finalized)
    assert len(streamed) == len(finalized) > 0
    # and the held-back remainder is exactly the open tail
    open_rows = [r for r in rows if r["s_end"] > wm]
    emitted = {(r["s_start"], r["event_type"]) for r in streamed}
    assert open_rows and all(
        (r["s_start"], r["event_type"]) not in emitted for r in open_rows)


def test_session_gap_invariant(session_frames):
    # sessions of one event_type never overlap and are separated by >= gap:
    # each start must be >= the previous end (end already includes +gap)
    streamed, _, _ = session_frames
    by_type: dict[str, list] = {}
    for r in streamed:
        by_type.setdefault(r["event_type"], []).append(
            (r["s_start"], r["s_end"]))
    assert by_type
    for spans in by_type.values():
        spans.sort()
        assert all(spans[i][1] <= spans[i + 1][0]
                   for i in range(len(spans) - 1))


def test_session_batch_counts_everything(spark, session_frames):
    _, batch, _ = session_frames
    total = batch.agg(F.sum("n_events")).first()[0]
    assert total == spark.read.parquet(EVENTS).count()


def test_session_state_merges_across_micro_batches(spark, tmp_path):
    # split the events by time into two files and force one file per
    # trigger: sessions straddling the batch boundary must merge in state,
    # so the two-batch run emits EXACTLY what the single-batch run does
    ev = spark.read.parquet(EVENTS).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    mid = ev.selectExpr(
        "percentile_approx(cast(ts as double), 0.5) p").first()["p"]
    d = str(tmp_path / "split")
    # lexicographic file order must equal time order (file sources list
    # alphabetically): write early rows to a-, late rows to b-
    ev.where(F.unix_timestamp("ts") <= mid).coalesce(1) \
        .write.parquet(d + "/a_early.parquet")
    ev.where(F.unix_timestamp("ts") > mid).coalesce(1) \
        .write.parquet(d + "/b_late.parquet")
    schema = ev.schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "1")
           .option("latestFirst", "false")
           .parquet(d + "/*/"))
    from whoosh_spark.streaming.windows import (_run_available_now,
                                                session_event_agg)
    two_batch = _run_available_now(
        session_event_agg(src, "2 hours", DELAY), spark).collect()
    one_batch = stream_session_counts(spark, EVENTS, "2 hours", DELAY) \
        .collect()
    assert _skey(two_batch) == _skey(one_batch)
    assert len(two_batch) == len(one_batch) > 0
