"""spark-submit entry: training-data corpus hygiene over a text corpus.

    spark-submit --py-files dist/engine.zip jobs/pipeline.py \
        --input /path/documents.parquet --output /path/hygiene \
        [--text-col text] [--min-jaccard 0.8] [--cores 8]

Writes, under --output:
  stats/        per-doc language, quality signals, token counts, fingerprint
  dup_exact/    exact-duplicate groups (md5)
  dup_pairs/    MinHash-LSH candidate pairs verified by n-gram Jaccard
  keep/         doc_ids surviving dedup (fingerprint + jaccard pruning,
                lowest doc_id in each duplicate class kept)

Everything is column arithmetic + two bounded self-joins (LSH buckets);
no step materializes the corpus on the driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cs_search_engine_architecture_spark.operators import (  # noqa: E402
    dedup,
    text_analysis as ta,
)
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-jaccard", type=float, default=0.8)
    ap.add_argument("--transitive", action="store_true",
                    help="keep ONE doc per connected dup-cluster "
                    "(dedup.dup_clusters) instead of per-pair pruning")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-pipeline",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    docs = spark.read.parquet(args.input)
    tc = args.text_col

    # per-doc stats: one scan, all column arithmetic
    stats = (
        ta.quality_scores(docs, tc)
        .join(ta.language_id(docs, tc), "doc_id")
        .join(ta.token_counts(docs, tc), "doc_id")
        .join(ta.fingerprints(docs, tc), "doc_id")
    )
    stats = stats.withColumn("quality_score", ta.quality_score_col())
    stats.write.mode("overwrite").parquet(os.path.join(args.output, "stats"))

    dedup.exact_dup_groups(docs, tc).write.mode("overwrite").parquet(
        os.path.join(args.output, "dup_exact")
    )

    pairs = dedup.ngram_jaccard_pairs(docs, tc, min_jaccard=args.min_jaccard)
    pairs.write.mode("overwrite").parquet(
        os.path.join(args.output, "dup_pairs")
    )

    # keep-set: drop the higher doc_id of every near-dup pair and every
    # non-minimal member of a fingerprint class; --transitive instead
    # collapses whole connected dup-clusters to their min doc_id (a
    # chain a~b~c keeps only a, even when a~c was never paired)
    pairs_df = spark.read.parquet(os.path.join(args.output, "dup_pairs"))
    if args.transitive:
        clusters = dedup.dup_clusters(pairs_df)
        drop_near = clusters.where(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
    else:
        drop_near = pairs_df.select(F.col("doc_b").alias("doc_id")).distinct()
    fp = spark.read.parquet(os.path.join(args.output, "stats")).select(
        "doc_id", "fingerprint"
    )
    keep_fp = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    keep = (
        keep_fp.select("doc_id")
        .join(drop_near, "doc_id", "left_anti")
        .orderBy("doc_id")
    )
    keep.write.mode("overwrite").parquet(os.path.join(args.output, "keep"))

    n_docs = docs.count()
    n_keep = spark.read.parquet(os.path.join(args.output, "keep")).count()
    print(json.dumps({"num_docs": n_docs, "num_kept": n_keep}))
    spark.stop()


if __name__ == "__main__":
    main()
