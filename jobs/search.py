"""spark-submit entry: query a built index.

    spark-submit jobs/search.py --index /path/index \
        --query 'spark and (shuffle or "hash join")' --top-k 10 \
        [--corpus /path/corpus.parquet]"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs_search_engine_architecture_spark.engine import SearchEngine  # noqa: E402
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--corpus", default=None, help="materialize hits against this parquet")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-search",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    eng = SearchEngine(spark, args.index)
    t0 = time.time()
    top = eng.search(args.query, args.top_k)
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
        eng.materialize(top, corpus).show(args.top_k, truncate=80)
    else:
        top.show(args.top_k, truncate=False)
    print(f"retrieval took {(time.time() - t0) * 1000:.1f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
