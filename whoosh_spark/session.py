"""SparkSession factory with the engine's recommended configs.

Scale posture: AQE on (runtime re-plan, skew-join splitting), Arrow enabled
for the analysis/codec UDF hot paths, UTC session TZ (DuckDB-oracle parity),
shuffle partitions sized to cores for local runs (production: set to
~2-3× total executor cores via spark-submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, shuffle_partitions: int | None = None,
              app: str = "whoosh_spark") -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]"
    cores = master.split("[")[-1].rstrip("]") if "[" in master else "8"
    cores = cores.split(",")[0]  # 'local[2,3]' = cores,maxFailures
    try:
        ncores = int(cores.replace("*", str(os.cpu_count() or 8)))
    except ValueError:
        ncores = 8
    sp = shuffle_partitions if shuffle_partitions is not None else max(4, ncores)
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # split compact parquet inputs finely enough that map stages use the
        # whole cluster even when a table is only tens of MB (the analyzed
        # and blocks tables compress ~10x; the default 128m split would run
        # their scans on 1-2 cores).  Harmless at real scale.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # zstd: ~35% smaller index/analyzed files than snappy — trades CPU
        # (which scales with executors) for disk bandwidth (which doesn't)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def get_spark_submit(app: str = "whoosh_spark") -> SparkSession:
    """Session for spark-submit entrypoints: master/cores/shuffle come from
    the submit command, but the engine's semantic + layout configs (UTC
    session TZ for oracle parity, AQE + skew join, Arrow batching, fine
    parquet splits, zstd) still apply — a bare getOrCreate() silently runs
    with machine-local TZ and snappy."""
    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )
