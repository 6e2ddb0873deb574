"""spark-submit entry: reverse search (percolation) — match a batch of
incoming docs against registered queries, e.g. saved-search alerting at
ingest time. The index is consulted only for its analyzer/field config;
matching runs from one tokenize pass over the batch (no index read, no
scores — filter context).

    spark-submit jobs/percolate.py --index /path/idx \
        --docs /path/batch.parquet --queries /path/queries.json \
        [--out /path/matches.parquet]

``queries.json`` maps query_id -> query text in the engine's query
language, restricted to the percolatable subset (single term, flat
OR / AND / AND-NOT, pure phrase)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs_search_engine_architecture_spark.engine import SearchEngine  # noqa: E402
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", required=True, help="parquet of incoming docs")
    ap.add_argument("--queries", required=True,
                    help="JSON file: {query_id: query text, ...}")
    ap.add_argument("--out", default=None,
                    help="write matches to this parquet instead of printing")
    ap.add_argument("--filters", default=None,
                    help="JSON file: {query_id: SQL predicate over the "
                         "batch columns} — per-query metadata conditions")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    with open(args.queries) as fh:
        queries = json.load(fh)
    filters = None
    if args.filters:
        with open(args.filters) as fh:
            filters = json.load(fh)
    spark = get_spark(
        app_name="spark-sea-percolate",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    spark.sparkContext.setLogLevel("WARN")
    eng = SearchEngine(spark, args.index, cache=False)
    matches = eng.percolate(
        queries, spark.read.parquet(args.docs), filters=filters
    )
    if args.out:
        matches.write.mode("overwrite").parquet(args.out)
        # count the just-written parquet — re-counting `matches` would
        # re-run the whole percolation (tokenize + every query join)
        n = spark.read.schema("query_id string, doc_id long").parquet(
            args.out
        ).count()
        print(json.dumps({"out": args.out, "matches": n}))
    else:
        matches.orderBy("query_id", "doc_id").show(100, False)
    spark.stop()


if __name__ == "__main__":
    main()
