from whoosh_spark.streaming.ingest import compact_index, stream_index  # noqa: F401
