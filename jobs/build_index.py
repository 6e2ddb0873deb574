"""spark-submit entry: build an inverted index.

    spark-submit --py-files dist/engine.zip jobs/build_index.py \
        --input /path/corpus.parquet --output /path/index \
        --fields text [--analyzer reference] [--cores 8]

Reads any parquet corpus with a ``doc_id`` column (mint one first with
``sources.corpus.assign_doc_ids`` if absent)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs_search_engine_architecture_spark.operators.indexer import build_index  # noqa: E402
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402
from cs_search_engine_architecture_spark.sources.corpus import assign_doc_ids  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--fields", default="text", help="comma-separated field columns")
    ap.add_argument("--analyzer", default="reference", choices=["reference", "simple"])
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--order-by", default="", help="mint doc ids by this comma-sep total order")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-build",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    corpus = spark.read.parquet(args.input)
    if args.order_by:
        corpus = assign_doc_ids(corpus, args.order_by.split(","))
    meta = build_index(
        spark,
        corpus,
        args.output,
        fields=args.fields.split(","),
        doc_id_col=args.doc_id_col,
        analyzer=args.analyzer,
        block_size=args.block_size,
        num_buckets=args.num_buckets,
        corpus_path=args.input,
    )
    print(json.dumps(meta, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
