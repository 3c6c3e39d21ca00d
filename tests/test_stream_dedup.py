import os
import time

import pytest


def test_stream_dedup_cross_batch(spark, tmp_path):
    from whoosh_spark.streaming.dedup import dedup_stream

    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(land / name))

    write_file("b1", [(0, "alpha beta"), (1, "gamma delta"),
                      (2, "Alpha  BETA")])       # in-batch dup of 0 (normalized)
    time.sleep(1.1)
    write_file("b2", [(3, "alpha beta"), (4, "epsilon zeta")])  # cross-batch dup

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(land) + "/*"))
    out = dedup_stream(stream)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .option("checkpointLocation", ckpt)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    ids = sorted(r["doc_id"] for r in rows)
    fps = {r["fp"] for r in rows}
    assert len(rows) == 3 and len(fps) == 3      # one row per fingerprint
    assert 2 not in ids                          # in-batch dup dropped (min id wins)
    assert 1 in ids and 4 in ids
    assert (0 in ids) != (3 in ids)              # exactly one of the dup pair
