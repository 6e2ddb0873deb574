"""Derived-label LTR evaluation job: train the ListNet re-ranker on a
text-overlap-labeled query set over the fixture corpus and report
NDCG@10 / MRR@10 vs the BM25-feature ordering (see
``operators/ltr_eval.py`` for the methodology; reference anchor:
NDCG@10 = 0.5818 / MRR@10 = 0.4444 on MS MARCO, reference README.md:62).

Usage:
    python jobs/ltr_eval.py [--sf-dir /root/testdata/sf0.1]
        [--queries 36] [--retrieve-k 30] [--cores 32]
        [--out BENCH/ltr_eval.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--corpus",
        choices=["code", "fixture"],
        default="code",
        help="'code' (default): the synthetic source-code corpus — its "
        "4k+ Zipfian vocabulary gives every query term a POSITIVE idf, "
        "so the BM25 baseline is a meaningful ranker and the "
        "BM25-vs-ListNet delta is comparable to the reference's "
        "MS MARCO anchor. 'fixture': the driver documents fixture "
        "(tiny vocabulary, all idfs negative — BM25 degenerates to ~0; "
        "kept for continuity with earlier rounds).",
    )
    ap.add_argument("--num-docs", type=int, default=32000)
    ap.add_argument("--queries", type=int, default=36)
    ap.add_argument("--retrieve-k", type=int, default=30)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default="BENCH/ltr_eval.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cs_search_engine_architecture_spark import gate
    from cs_search_engine_architecture_spark.operators import ltr_eval
    from cs_search_engine_architecture_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]", shuffle_partitions=args.cores
    )
    if args.corpus == "code":
        from cs_search_engine_architecture_spark.engine import SearchEngine
        from cs_search_engine_architecture_spark.operators.indexer import (
            build_index,
        )
        from cs_search_engine_architecture_spark.sources.corpus import (
            synth_source_files,
        )

        corpus_path = f"/tmp/spark_sea_ltr_code_{args.num_docs}.parquet"
        if not os.path.exists(corpus_path):
            synth_source_files(spark, args.num_docs).select(
                "doc_id", F.col("content").alias("text")
            ).write.parquet(corpus_path)
        docs = spark.read.parquet(corpus_path)
        idx_path = f"/tmp/spark_sea_ltr_code_idx_{args.num_docs}"
        if not os.path.exists(os.path.join(idx_path, "meta.json")):
            build_index(
                spark, docs, idx_path, fields=["text"], analyzer="simple",
                num_buckets=8, corpus_path=corpus_path,
            )
        eng = SearchEngine(spark, idx_path)
    else:
        eng = gate.gate_engine(spark, args.sf_dir)
        docs = spark.read.parquet(
            os.path.join(args.sf_dir, "documents.parquet")
        )

    t0 = time.time()
    res = ltr_eval.evaluate(
        eng, docs, num_queries=args.queries, retrieve_k=args.retrieve_k
    )
    res.pop("weights")
    res["corpus"] = args.corpus
    if args.corpus == "code":
        res["num_docs"] = args.num_docs
    res["sf_dir"] = args.sf_dir
    res["wall_sec"] = round(time.time() - t0, 1)
    res["reference_anchor"] = {
        "dataset": "MS MARCO (reference README.md:62)",
        "ndcg10": 0.5818,
        "mrr10": 0.4444,
    }
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
