#!/usr/bin/env python
"""spark-submit entry: build (or resume) a persisted inverted index.

Cluster usage (north_rule packaging):

    python jobs/package.py                       # -> dist/whoosh_spark.zip
    spark-submit --py-files dist/whoosh_spark.zip \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        jobs/build_index.py --input s3://corpus/pages --output s3://ix/v1

Local smoke:

    python jobs/build_index.py --generate 10000 --output /tmp/ix_demo

Resumability: re-running with the same --output skips analyze chunks already
committed in _build_log.jsonl (kill-safe; see whoosh_spark/store.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs: make the repo importable (on a cluster, --py-files ships the
# package zip and this is a no-op)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet corpus path (needs doc_id + text cols)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a deterministic Common-Crawl-style corpus of N pages instead of --input")
    ap.add_argument("--output", required=True, help="index store path")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--chunk-bits", type=int, default=16)
    ap.add_argument("--chunks-per-commit", type=int, default=8)
    ap.add_argument("--store-text", action="store_true")
    ap.add_argument("--analyzer", default="standard",
                    help="analysis chain (registry name; recorded in the "
                         "manifest and reused by upserts/streaming)")
    ap.add_argument("--store-offsets", action="store_true",
                    help="persist the Characters-format char_offsets segment")
    ap.add_argument("--store-boosts", action="store_true",
                    help="persist the PositionBoosts overlay "
                         "(requires --analyzer boosted)")
    args = ap.parse_args()

    # spark-submit provides master/conf; engine semantic configs (UTC,
    # AQE, zstd, fine splits) come from the shared factory
    from whoosh_spark.session import get_spark_submit

    spark = get_spark_submit("whoosh-spark-build")
    from whoosh_spark import store
    from whoosh_spark.corpus import pages_df

    if args.generate:
        docs = pages_df(spark, args.generate)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --generate")  # raises SystemExit

    manifest = store.write_index(
        docs,
        args.output,
        id_col=args.id_col,
        text_col=args.text_col,
        chunk_bits=args.chunk_bits,
        chunks_per_commit=args.chunks_per_commit,
        store_text=args.store_text,
        store_offsets=args.store_offsets,
        analyzer=args.analyzer,
        store_boosts=args.store_boosts,
    )
    json.dump(manifest, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
