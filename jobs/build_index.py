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

from cs_search_engine_architecture_spark.operators.indexer import (  # noqa: E402
    build_index,
    build_index_resumable,
)
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402
from cs_search_engine_architecture_spark.sources.corpus import assign_doc_ids  # noqa: E402
from cs_search_engine_architecture_spark.sources.table import read_corpus  # noqa: E402


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
    ap.add_argument(
        "--resume-slices", type=int, default=0,
        help="checkpoint-resumable build with N slices (0 = one-shot); "
        "re-running after an interruption skips completed slices",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-build",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    # parquet path OR catalog table name (Iceberg on a configured
    # cluster session — see sources/table.py for the submit conf)
    corpus = read_corpus(spark, args.input)
    if args.order_by:
        corpus = assign_doc_ids(corpus, args.order_by.split(","))
    kwargs = dict(
        fields=args.fields.split(","),
        doc_id_col=args.doc_id_col,
        analyzer=args.analyzer,
        block_size=args.block_size,
        num_buckets=args.num_buckets,
        corpus_path=args.input,
    )
    if args.resume_slices > 0:
        meta = build_index_resumable(
            spark, corpus, args.output, num_slices=args.resume_slices, **kwargs
        )
    else:
        meta = build_index(spark, corpus, args.output, **kwargs)
    print(json.dumps(meta, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
