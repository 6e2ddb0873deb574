"""spark-submit entry: one-command corpus audit — the "what is this
data" report a team runs before committing GPU-hours to it. Composes
the individually-gated hygiene operators into one JSON:

  volume        docs, whitespace/bpe token totals
  languages     per-language docs/tokens/share (declared column when
                present, else the marker-stopword language_id)
  quality       mean + p10/p50/p90 of the composite quality score,
                mean Gopher repetition fractions
  duplication   docs sitting in exact-dup groups; MinHash-LSH
                candidate-pair count; distinct-W-gram KMV estimate vs
                total grams (duplicated-substring mass proxy)
  pii           docs with at least one redactable span
  semantic_redundancy (with --embeddings) hyperplane-LSH bucket
                concentration + what a SemDeDup-style cap would keep
  contamination (with --benchmark) docs sharing n-grams with the
                eval suite

    spark-submit jobs/corpus_report.py --input docs.parquet \
        [--output report.json] [--benchmark bench.parquet] \
        [--span-w 8] [--text-col text] [--cores N]

Every section is one bounded aggregation over a scan (the operators'
documented 100 TB shapes); nothing per-doc reaches the driver. The
quality quantiles use percentile_approx — this is a report, not a
gate surface (the exact-rank machinery lives in
``engine.percentiles_agg``)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cs_search_engine_architecture_spark.operators import (  # noqa: E402
    dedup,
    sketches,
    spans,
    text_analysis as ta,
)
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None, help="write the JSON here")
    ap.add_argument("--benchmark", default=None)
    ap.add_argument("--decontaminate-n", type=int, default=8)
    ap.add_argument("--span-w", type=int, default=8,
                    help="W for the distinct-W-gram duplication proxy")
    ap.add_argument("--sketch-k", type=int, default=4096)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang",
                    help="declared language column; language_id is "
                         "used when the column is absent")
    ap.add_argument("--embeddings", default=None,
                    help="(vec_id, embedding) parquet: adds the "
                         "semantic-redundancy section")
    ap.add_argument("--diversity-planes", type=int, default=8)
    ap.add_argument("--diversity-dims", type=int, default=64)
    ap.add_argument("--diversity-cap", type=int, default=3)
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-corpus-report",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    spark.sparkContext.setLogLevel("WARN")
    tc = args.text_col
    t_start = time.time()
    docs = spark.read.parquet(args.input)
    report: dict = {"input": args.input}

    # volume + quality + repetition + pii: ONE aggregation over one scan
    qual = ta.quality_scores(docs, tc).withColumn(
        "quality_score", ta.quality_score_col()
    )
    rep = ta.repetition_scores(docs, tc)
    counts = ta.token_counts(docs, tc)
    pii = ta.redact_text(docs, tc).join(
        docs.select("doc_id", F.col(tc).alias("_orig")), "doc_id"
    ).select(
        "doc_id", (F.col("redacted") != F.col("_orig")).alias("has_pii")
    )
    wide = (
        counts.join(qual.select("doc_id", "quality_score"), "doc_id")
        .join(rep, "doc_id")
        .join(pii, "doc_id")
    )
    agg = wide.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("ws_tokens"),
        F.sum("bpe_pieces").alias("bpe_tokens"),
        F.avg("quality_score").alias("q_mean"),
        F.expr(
            "percentile_approx(quality_score, array(0.1, 0.5, 0.9), 10000)"
        ).alias("q_pcts"),
        F.avg("dup_line_frac").alias("rep_line"),
        F.avg("dup_word_frac").alias("rep_word"),
        F.avg("dup_trigram_frac").alias("rep_tri"),
        F.sum(F.col("has_pii").cast("long")).alias("pii_docs"),
    ).collect()[0]
    report["volume"] = {
        "n_docs": agg["n_docs"],
        "ws_tokens": int(agg["ws_tokens"] or 0),
        "bpe_tokens": int(agg["bpe_tokens"] or 0),
    }
    # percentile_approx over zero rows is NULL, not an array
    q_pcts = agg["q_pcts"] or [0.0, 0.0, 0.0]
    report["quality"] = {
        "mean": round(float(agg["q_mean"] or 0), 4),
        "p10": round(float(q_pcts[0]), 4),
        "p50": round(float(q_pcts[1]), 4),
        "p90": round(float(q_pcts[2]), 4),
        "mean_dup_line_frac": round(float(agg["rep_line"] or 0), 4),
        "mean_dup_word_frac": round(float(agg["rep_word"] or 0), 4),
        "mean_dup_trigram_frac": round(float(agg["rep_tri"] or 0), 4),
    }
    report["pii"] = {"docs_with_pii": int(agg["pii_docs"] or 0)}

    # languages: declared column when present, else the heuristic
    if args.lang_col in docs.columns:
        lang_src = docs.select(
            "doc_id", F.col(args.lang_col).alias("lang_pred")
        )
        report["language_source"] = f"column:{args.lang_col}"
    else:
        lang_src = ta.language_id(docs, tc)
        report["language_source"] = "language_id"
    by_lang = (
        counts.join(lang_src, "doc_id")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("bpe_pieces").alias("tokens"),
        )
        .collect()
    )
    total_docs = max(report["volume"]["n_docs"], 1)
    report["languages"] = {
        r["lang_pred"]: {
            "docs": r["docs"],
            "tokens": int(r["tokens"] or 0),
            "doc_share": round(r["docs"] / total_docs, 4),
        }
        for r in sorted(by_lang, key=lambda r: -r["docs"])
    }

    # duplication signals
    exact_dup_docs = (
        dedup.exact_dup_groups(docs, tc)
        .where(F.col("n_dups") > 1)
        .agg(F.sum("n_dups"))
        .collect()[0][0]
    )
    lsh_pairs = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(docs, tc)
    ).count()
    # pin the gram lineage: count() and the distinct sketch would each
    # re-run the full tokenize+explode scan — the report's heaviest
    # stage — without it
    grams = spans.gram_occurrences(docs, args.span_w, tc).select(
        "gram_hash"
    ).localCheckpoint()
    n_grams = grams.count()
    sk = sketches.approx_distinct(
        grams, "gram_hash", args.sketch_k
    ).collect()[0]
    distinct_est = float(sk["est_distinct"])
    report["duplication"] = {
        "docs_in_exact_dup_groups": int(exact_dup_docs or 0),
        "minhash_lsh_candidate_pairs": lsh_pairs,
        f"total_{args.span_w}grams": n_grams,
        f"distinct_{args.span_w}gram_est": round(distinct_est),
        "dup_gram_mass_est": round(
            1.0 - distinct_est / n_grams, 4
        ) if n_grams else 0.0,
    }

    # semantic redundancy (with --embeddings): hyperplane-LSH bucket
    # concentration — how much of the corpus sits in few semantic
    # neighborhoods, and what a SemDeDup-style cap would keep. One
    # groupBy over the bucket expression; top buckets only to driver.
    if args.embeddings:
        from cs_search_engine_architecture_spark.functions import (  # noqa: E402
            dialect as D,
        )

        emb = spark.read.parquet(args.embeddings)
        # ONE scan: the grouped result is <= 2^planes rows, so collect
        # it once and derive every stat driver-side (a second action
        # would re-pay the full hyperplane-dot bucketing scan)
        rows = emb.select(
            F.expr(
                D.lsh_bucket(
                    D.SPARK, "embedding", args.diversity_planes,
                    args.diversity_dims,
                )
            ).cast("int").alias("bucket")
        ).groupBy("bucket").count().collect()
        by_size = sorted(rows, key=lambda r: -r["count"])
        counts = [r["count"] for r in by_size]
        n_vecs = sum(counts)
        kept = sum(min(c, args.diversity_cap) for c in counts)
        report["semantic_redundancy"] = {
            "planes": args.diversity_planes,
            "occupied_buckets": len(counts),
            "vectors": n_vecs,
            "largest_bucket": counts[0] if counts else 0,
            "top_buckets": [
                {"bucket": r["bucket"], "docs": r["count"]}
                for r in by_size[:8]
            ],
            f"kept_at_cap_{args.diversity_cap}": kept,
            "redundant_share": round(1.0 - kept / n_vecs, 4)
            if n_vecs else 0.0,
        }

    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        contaminated = (
            dedup.decontaminate(
                docs, bench, n=args.decontaminate_n, text_col=tc
            )
            .where(F.col("contaminated"))
            .count()
        )
        report["contamination"] = {
            "n": args.decontaminate_n,
            "contaminated_docs": contaminated,
        }

    report["wall_sec"] = round(time.time() - t_start, 2)
    out = json.dumps(report, indent=1)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(out)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
