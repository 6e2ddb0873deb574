"""spark-submit entry: the full LLM training-data prep pipeline in one
job — the composition of the individually-gated hygiene operators:

  exact dedup -> near-dup collapse (MinHash-LSH candidates, n-gram
  Jaccard verify, transitive clusters; keep-one = min doc_id or
  --keep-best quality winner) -> duplicate-span cut (optional) ->
  quality / language filter -> benchmark decontamination ->
  semantic diversity capping (optional; --diversity-cap over
  --embeddings) -> domain-mixture rebalance (optional; --mixture-mode
  down or up) -> global token-budget cut (optional) -> leakage-safe
  train/val/test splits (optional; --split-seed, clusters at the
  looser --split-jaccard) -> chunking -> sequence packing
  (epoch-ordered under --shuffle-seed) -> training shards (optional)

    spark-submit jobs/train_prep.py --input docs.parquet --output /out \
        [--benchmark bench.parquet] [--min-quality 0.4] [--langs en,fr] \
        [--min-jaccard 0.8] [--keep-best] [--span-dedup-w 50] \
        [--mixture en:0.5,fr:0.3,zh:0.2] [--mixture-col lang] \
        [--mixture-mode down|up] [--token-budget N] \
        [--chunk-size 64] [--stride 48] [--seq-len 256] \
        [--shuffle-seed S --num-shards K] [--text-col text] [--cores N]

Writes under --output:
  corpus/   surviving documents (post-filter, pre-chunk)
  chunks/   (doc_id, chunk_no, chunk_text, n_tokens) sliding windows
  packed/   (chunk_id, n_tokens, start_offset, seq_first, seq_last) —
            offsets in epoch order when --shuffle-seed is given
  shards/   (with --shuffle-seed) chunk rows as shard=K/ parquet, each
            shard key-sorted: the trainer's deterministic read order
  metrics.json  per-stage wall seconds + in/out doc counts (lineage)

Every stage is DataFrame algebra over the operators' documented 100 TB
shapes (bucketed LSH self-join, broadcast benchmark set, row-local
chunk explode, two-phase distributed prefix sum); the per-stage counts
are the only driver materialization and are what a production pipeline
logs anyway."""

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
    packing,
    text_analysis as ta,
)
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402

# chunk_id = doc_id * CHUNK_BASE + chunk_no keeps packing order ==
# (doc_id, chunk_no) order; chunk_no is bounded by doc tokens / stride
CHUNK_BASE = 1_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--benchmark", default=None,
                    help="eval-suite parquet: drop contaminated docs")
    ap.add_argument("--decontaminate-n", type=int, default=8)
    ap.add_argument("--min-quality", type=float, default=None,
                    help="drop docs below this quality_score")
    ap.add_argument("--langs", default=None,
                    help="comma-separated language allowlist")
    ap.add_argument("--min-jaccard", type=float, default=0.8)
    ap.add_argument("--keep-best", action="store_true",
                    help="near-dup clusters keep the highest-quality "
                         "doc instead of the lowest doc_id")
    ap.add_argument("--span-dedup-w", type=int, default=None,
                    help="cut duplicate W-token spans (keep-first; "
                         "rewrites text as the normalized token stream)")
    ap.add_argument("--span-stage-dir", default=None,
                    help="parquet-stage the tokenized corpus + gram "
                         "occurrences once instead of recomputing the "
                         "tokenize lineage on every consumer (the "
                         "cluster-scale shape; identical output)")
    ap.add_argument("--mixture", default=None,
                    help="target domain shares over --mixture-col, e.g. "
                         "'en:0.5,fr:0.3,zh:0.2' — strata outside the "
                         "list are dropped")
    ap.add_argument("--mixture-col", default="lang")
    ap.add_argument("--mixture-mode", choices=["down", "up"],
                    default="down",
                    help="down = keep-fractions (binding stratum kept "
                         "whole); up = repeat-count resampling "
                         "(small domains replicated, copy_no-remapped "
                         "doc ids)")
    ap.add_argument("--diversity-cap", type=int, default=None,
                    help="keep at most N docs per hyperplane-LSH "
                         "embedding bucket (SemDeDup-style semantic "
                         "capping; requires --embeddings)")
    ap.add_argument("--embeddings", default=None,
                    help="(vec_id, embedding) parquet aligned to doc_id")
    ap.add_argument("--diversity-planes", type=int, default=8)
    ap.add_argument("--diversity-dims", type=int, default=64,
                    help="embedding dimensionality (the hyperplane "
                         "coefficients embed as literals of this width)")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="global bpe-token budget: keep the highest-"
                         "quality docs until the budget is spent")
    ap.add_argument("--split-seed", default=None,
                    help="assign leakage-safe train/val/test splits "
                         "(near-dup clusters at --split-jaccard hash "
                         "their cluster id); chunk/pack train only")
    ap.add_argument("--split-jaccard", type=float, default=0.5)
    ap.add_argument("--split-train", type=float, default=0.8)
    ap.add_argument("--split-val", type=float, default=0.1)
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--stride", type=int, default=48)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--shuffle-seed", type=int, default=None,
                    help="also write shards/: chunks in deterministic "
                         "epoch order, sharded for parallel readers")
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-train-prep",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    spark.sparkContext.setLogLevel("WARN")
    tc = args.text_col
    stages: list[dict] = []

    def stage(name: str, frame, n_before: int) -> tuple:
        t0 = time.time()
        pinned = frame.localCheckpoint()  # one execution feeds count + next stage
        n = pinned.count()
        stages.append({
            "stage": name,
            "in": n_before,
            "out": n,
            "dropped": n_before - n,
            "wall_sec": round(time.time() - t0, 3),
        })
        return pinned, n

    docs = spark.read.parquet(args.input)
    n = docs.count()
    stages.append({"stage": "read", "in": n, "out": n, "dropped": 0,
                   "wall_sec": 0.0})

    # 1. exact dedup: keep the lowest doc_id per identical text
    keep_exact = dedup.exact_dup_groups(docs, tc).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    docs, n = stage(
        "exact_dedup", docs.join(keep_exact, "doc_id", "left_semi"), n
    )

    # 2. near-dup collapse: LSH candidates -> Jaccard verify ->
    # transitive clusters -> keep each cluster's min doc_id
    pairs = dedup.ngram_jaccard_pairs(
        docs, tc, min_jaccard=args.min_jaccard
    )
    clusters = dedup.dup_clusters(pairs)
    if args.keep_best:
        qual = ta.quality_scores(docs, tc).withColumn(
            "quality_score", ta.quality_score_col()
        ).select("doc_id", "quality_score")
        winners = dedup.cluster_keep_best(clusters, qual)
        drop_near = clusters.join(winners, "cluster_id").where(
            F.col("doc_id") != F.col("keep_doc_id")
        ).select("doc_id")
    else:
        drop_near = clusters.where(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
    docs, n = stage(
        "near_dedup", docs.join(drop_near, "doc_id", "left_anti"), n
    )

    # 2b. span-level substring dedup: cut duplicate W-gram spans
    # (keep-first), drop docs whose text was entirely duplicated.
    # Runs AFTER document-level dedup so the heavy gram explode sees
    # only surviving docs; rewrites the text column with the cleaned
    # normalized token stream (the published setting — the dedup
    # operates on the tokenized corpus).
    if args.span_dedup_w:
        from cs_search_engine_architecture_spark.operators import (
            spans as sp,
        )

        cleaned = sp.remove_duplicate_spans(
            docs, args.span_dedup_w, tc, stage_dir=args.span_stage_dir
        )
        # drop only docs whose text was ENTIRELY duplicated (kept=0
        # with removals); a doc that had zero normalized tokens to
        # begin with (kept=0, removed=0) passes through
        docs, n = stage(
            "span_dedup",
            docs.drop(tc).join(
                cleaned.where(
                    (F.col("n_tokens_kept") > 0)
                    | (F.col("n_tokens_removed") == 0)
                ).select("doc_id", F.col("text").alias(tc)),
                "doc_id",
            ),
            n,
        )

    # 3. quality / language filter (row-local column arithmetic)
    if args.min_quality is not None or args.langs:
        scored = ta.quality_scores(docs, tc).withColumn(
            "quality_score", ta.quality_score_col()
        ).select("doc_id", "quality_score").join(
            ta.language_id(docs, tc), "doc_id"
        )
        cond = F.lit(True)
        if args.min_quality is not None:
            cond = cond & (F.col("quality_score") >= args.min_quality)
        if args.langs:
            cond = cond & F.col("lang_pred").isin(args.langs.split(","))
        docs, n = stage(
            "quality_filter",
            docs.join(scored.where(cond).select("doc_id"), "doc_id",
                      "left_semi"),
            n,
        )

    # 4. benchmark decontamination (broadcast benchmark n-gram set)
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        clean = dedup.decontaminate(
            docs, bench, n=args.decontaminate_n, text_col=tc
        ).where(~F.col("contaminated")).select("doc_id")
        docs, n = stage(
            "decontaminate", docs.join(clean, "doc_id", "left_semi"), n
        )

    # 4b. semantic diversity capping (SemDeDup-style): at most
    # --diversity-cap docs per hyperplane-LSH embedding bucket, best
    # quality first. Near-dup dedup removed copies; this removes
    # REDUNDANCY (distinct texts, one idea). WindowGroupLimit bounds
    # hot buckets map-side, so the stage is one join + one bounded
    # shuffle at any corpus size.
    if args.diversity_cap is not None:
        if not args.embeddings:
            raise SystemExit("--diversity-cap requires --embeddings")
        from cs_search_engine_architecture_spark.operators import (
            curation as cu,
        )

        emb = spark.read.parquet(args.embeddings)
        qual = ta.quality_scores(docs, tc).withColumn(
            "quality_score", ta.quality_score_col()
        ).select("doc_id", "quality_score")
        kept_div = cu.diversity_cap(
            qual, emb, args.diversity_cap,
            num_planes=args.diversity_planes,
            dims=args.diversity_dims,
        ).select("doc_id")
        # docs with no embedding row have no known neighborhood: they
        # pass through (the cap prunes only where it can see)
        no_emb = docs.join(
            emb.select(F.col("vec_id").alias("doc_id")),
            "doc_id", "left_anti",
        ).select("doc_id")
        docs, n = stage(
            "diversity_cap",
            docs.join(kept_div.unionByName(no_emb), "doc_id", "left_semi"),
            n,
        )

    # 5. rebalance to the target domain mixture (deterministic
    # hash-bucket resample; binding stratum kept whole) — last, so the
    # mixture is computed over what actually survived the filters
    if args.mixture:
        shares = {
            k: float(v)
            for k, v in (p.split(":") for p in args.mixture.split(","))
        }
        if args.mixture_mode == "up":
            # repeat-count resampling: replicated docs get fresh ids
            # (doc_id·1000 + copy_no — requires every stratum's copy
            # count to stay under 1000)
            plan = ta.mixture_copy_plan(docs, args.mixture_col, shares)
            worst = max(r for r, _ in plan.values())
            if worst >= 999:
                raise SystemExit(
                    f"--mixture-mode up: a stratum needs {worst} whole "
                    "copies — id remap cap is 999; rebalance the shares"
                )
            up = ta.upsample_to_mixture(docs, args.mixture_col, shares)
            mixed = up.withColumn(
                "doc_id", F.col("doc_id") * 1000 + F.col("copy_no")
            ).drop("copy_no")
            docs, n = stage("mixture_up", mixed, n)
        else:
            docs, n = stage(
                "mixture",
                ta.resample_to_mixture(docs, args.mixture_col, shares),
                n,
            )

    # 5b. global token-budget cut: keep the highest-quality docs until
    # the budget is spent (two-phase distributed prefix sum — the
    # quality-ordered analogue of sequence packing's offset sum)
    if args.token_budget is not None:
        from cs_search_engine_architecture_spark.operators import (
            curation as cu,
        )

        scored = ta.token_counts(docs, tc).select(
            "doc_id", F.col("bpe_pieces").alias("n_tokens")
        ).join(
            ta.quality_scores(docs, tc).withColumn(
                "quality_score", ta.quality_score_col()
            ).select("doc_id", "quality_score"),
            "doc_id",
        )
        kept = cu.select_token_budget(scored, args.token_budget).select(
            "doc_id"
        )
        docs, n = stage(
            "token_budget", docs.join(kept, "doc_id", "left_semi"), n
        )

    # 5c. leakage-safe train/val/test assignment: clusters computed at
    # a LOOSER threshold than dedup (--split-jaccard < --min-jaccard):
    # dedup removed COPIES, but a near-miss pair that survived it must
    # still never straddle train/test (the memorization leak). Members
    # of a split-cluster hash the CLUSTER id; everyone else their own
    # id — one extra candidate-join pass over the survivors. The split
    # column is written into corpus/; chunking/packing then consume the
    # train split only.
    if args.split_seed is not None:
        split_pairs = dedup.ngram_jaccard_pairs(
            docs, tc, min_jaccard=args.split_jaccard
        )
        split_clusters = dedup.dup_clusters(split_pairs)
        splits = ta.split_assign_leakage_safe(
            docs, split_clusters, seed=args.split_seed,
            train=args.split_train, val=args.split_val,
        )
        docs = docs.join(splits, "doc_id")

    docs.write.mode("overwrite").parquet(os.path.join(args.output, "corpus"))

    if args.split_seed is not None:
        docs, n = stage(
            "split_train_filter", docs.where(F.col("split") == "train"), n
        )

    # 6. chunking (row-local sliding-window explode)
    t0 = time.time()
    chunks = ta.chunk_documents(
        docs, chunk_size=args.chunk_size, stride=args.stride, text_col=tc
    )
    chunks.write.mode("overwrite").parquet(
        os.path.join(args.output, "chunks")
    )
    chunks = spark.read.parquet(os.path.join(args.output, "chunks"))
    n_chunks = chunks.count()
    stages.append({"stage": "chunk", "in": n, "out": n_chunks,
                   "dropped": 0, "wall_sec": round(time.time() - t0, 3)})

    # 7. sequence packing (two-phase distributed prefix sum). With a
    # shuffle seed, sequences pack in the EPOCH order — the same key
    # order the shards are written in, so offsets follow the trainer's
    # actual read order (shuffle-then-pack).
    t0 = time.time()
    chunk_src = chunks.select(
        (F.col("doc_id") * CHUNK_BASE + F.col("chunk_no")).alias(
            "chunk_id"
        ),
        "n_tokens",
    )
    order_col = None
    if args.shuffle_seed is not None:
        from cs_search_engine_architecture_spark.operators import (
            curation as cu,
        )

        chunk_src = cu.epoch_shuffle(
            chunk_src, args.shuffle_seed, args.num_shards,
            id_col="chunk_id",
        )
        order_col = "shuffle_key"
    packed = packing.pack_sequences(
        chunk_src,
        seq_len=args.seq_len,
        id_col="chunk_id",
        order_col=order_col,
    )
    packed.write.mode("overwrite").parquet(
        os.path.join(args.output, "packed")
    )
    pk = spark.read.parquet(os.path.join(args.output, "packed"))
    n_seqs = pk.agg(F.max("seq_last")).collect()[0][0]
    stages.append({
        "stage": "pack", "in": n_chunks, "out": n_chunks, "dropped": 0,
        "wall_sec": round(time.time() - t0, 3),
        "num_sequences": int(n_seqs) + 1 if n_seqs is not None else 0,
    })

    # 8. optional training-shard materialization: the chunk rows in
    # deterministic seed-reproducible epoch order, one key-sorted
    # parquet dir per shard (what a trainer's data loader reads)
    if args.shuffle_seed is not None:
        from cs_search_engine_architecture_spark.operators import (
            curation as cu,
        )

        t0 = time.time()
        cu.write_training_shards(
            chunks.withColumn(
                "chunk_id",
                F.col("doc_id") * CHUNK_BASE + F.col("chunk_no"),
            ),
            os.path.join(args.output, "shards"),
            seed=args.shuffle_seed,
            num_shards=args.num_shards,
            id_col="chunk_id",
        )
        stages.append({
            "stage": "shards", "in": n_chunks, "out": n_chunks,
            "dropped": 0, "wall_sec": round(time.time() - t0, 3),
            "num_shards": args.num_shards,
        })

    metrics = {"stages": stages, "seq_len": args.seq_len}
    with open(os.path.join(args.output, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
