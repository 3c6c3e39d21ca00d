#!/usr/bin/env python
"""spark-submit entry: query a persisted index.

    spark-submit --py-files dist/whoosh_spark.zip jobs/search_index.py \\
        --index s3://ix/v1 --query 'web "index merge"~2 lang:en' --limit 10
"""

from __future__ import annotations

import argparse
import os
import sys

# local runs: make the repo importable (on a cluster, --py-files ships the
# package zip and this is a no-op)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--no-wand", action="store_true",
                    help="disable block-max pruning (debug)")
    ap.add_argument("--weighting", default="bm25",
                    help="bm25 | tfidf | frequency | dfree | pl2 "
                         "(optionally reverse:-prefixed)")
    ap.add_argument("--datetime-fields", default="",
                    help="comma list of stored timestamp columns; enables "
                         "col:[2020-01-01 TO 2020-06-01] date syntax")
    ap.add_argument("--simple", action="store_true",
                    help="SimpleParser mode: bare optional, +required, -excluded")
    args = ap.parse_args()

    from whoosh_spark.session import get_spark_submit

    spark = get_spark_submit("whoosh-spark-search")
    from whoosh_spark import store
    from whoosh_spark.query import parse_query
    from whoosh_spark.query.parser import parse_simple
    from whoosh_spark.search import Searcher

    s = Searcher(store.load_index(spark, args.index), weighting=args.weighting)
    dtf = [c for c in args.datetime_fields.split(",") if c] or None
    if args.simple and dtf:
        print("warning: --simple ignores --datetime-fields "
              "(SimpleParser has no date syntax)", file=sys.stderr)
    q = parse_simple(args.query) if args.simple else \
        parse_query(args.query, datetime_fields=dtf)
    res = s.search(q, limit=args.limit, optimize=not args.no_wand)
    for row in res.collect():
        print(row["doc_id"], round(row["score"], 6))


if __name__ == "__main__":
    main()
