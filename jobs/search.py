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
    ap.add_argument("--filter", default=None,
                    help="SQL predicate over --corpus columns (filter "
                    "context: selects docs, never rescores; composes "
                    "with --embeddings hybrid too)")
    ap.add_argument("--snippets", action="store_true",
                    help="with --corpus: ±100-char snippets around first match")
    ap.add_argument("--suggest", action="store_true",
                    help="print a 'did you mean' spelling correction")
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet -> hybrid exact+semantic search "
                    "(query vector = centroid of exact top-k hits)")
    ap.add_argument("--ltr-weights", default=None,
                    help=".npz ListNet weights -> rerank the results "
                    "(exact_search ltr_enabled / combined_search parity)")
    ap.add_argument("--pre-select-k", type=int, default=50)
    ap.add_argument("--explain", action="store_true",
                    help="print the routing strategy + formatted physical "
                    "plan instead of executing the query")
    ap.add_argument("--slop", type=int, default=None,
                    help="proximity search: treat --query as a phrase "
                    "whose terms must fall within this char window")
    ap.add_argument("--unordered", action="store_true",
                    help="with --slop: terms may appear in any order")
    ap.add_argument("--synonyms", default=None,
                    help="JSON map term -> [alternatives]; expands query "
                    "term leaves into OR groups (query-time synonyms)")
    ap.add_argument("--rescore", default=None,
                    help="proximity phrase: re-rank the top --rescore-window "
                    "docs by bm25 + proximity (ES rescore, score_mode total)")
    ap.add_argument("--rescore-window", type=int, default=100)
    ap.add_argument("--rescore-slop", type=int, default=10)
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()
    if args.filter and not args.corpus:
        ap.error("--filter needs --corpus (the predicate runs on it)")

    spark = get_spark(
        app_name="spark-sea-search",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    eng = SearchEngine(spark, args.index)
    t0 = time.time()
    if args.explain:
        info = eng.plan_info(args.query, args.top_k)
        print(f"strategy: {info['strategy']}  terms: {info['terms']}  "
              f"tombstones: {info['tombstones']}  "
              f"delta_segments: {info['delta_segments']}")
        print(info["physical_plan"])
        spark.stop()
        return
    if args.suggest:
        corrected, n = eng.suggest(args.query, exclude_threshold=10)
        if n:
            print(f"did you mean: {corrected!r} ({n} corrected)")
    if args.slop is not None:
        eng.proximity_search(
            args.query, args.slop, top_k=args.top_k,
            ordered=not args.unordered,
        ).show(args.top_k, truncate=False)
        print(f"retrieval took {(time.time() - t0) * 1000:.1f} ms")
        spark.stop()
        return
    if args.synonyms:
        import json

        eng.synonym_search(
            args.query, json.loads(args.synonyms), top_k=args.top_k
        ).show(args.top_k, truncate=False)
        print(f"retrieval took {(time.time() - t0) * 1000:.1f} ms")
        spark.stop()
        return
    if args.rescore:
        eng.rescore_search(
            args.query, args.rescore, top_k=args.top_k,
            window=args.rescore_window, slop=args.rescore_slop,
        ).show(args.top_k, truncate=False)
        print(f"retrieval took {(time.time() - t0) * 1000:.1f} ms")
        spark.stop()
        return
    if args.embeddings:
        import numpy as np

        emb = spark.read.parquet(args.embeddings)
        top_ids = [r["doc_id"] for r in eng.search(args.query, args.top_k).collect()]
        seed = emb.where(emb["vec_id"].isin(top_ids or [0])).collect()
        qvec = (
            np.mean([list(r["embedding"]) for r in seed], axis=0).tolist()
            if seed else [0.0] * 64
        )
        corpus = spark.read.parquet(args.corpus) if args.corpus else None
        eng.combined_search(
            args.query, emb, qvec, top_k=args.top_k,
            pre_select_k=args.pre_select_k, ltr_weights=args.ltr_weights,
            corpus=corpus, predicate=args.filter,
        ).show(args.top_k, truncate=False)
    elif args.corpus and args.snippets:
        corpus = spark.read.parquet(args.corpus)
        eng.search_with_snippets(
            args.query, corpus, args.top_k, predicate=args.filter
        ).select(
            "doc_id", "score", "snippet"
        ).show(args.top_k, truncate=80)
    elif args.corpus:
        corpus = spark.read.parquet(args.corpus)
        top = (
            eng.filtered_search(args.query, corpus, args.filter, args.top_k)
            if args.filter
            else eng.search(args.query, args.top_k)
        )
        out = eng.materialize(top, corpus)
        SearchEngine.assert_sha_ok(out)
        out.show(args.top_k, truncate=80)
    elif args.ltr_weights:
        eng.search(
            args.query, args.top_k, ltr_enabled=True,
            ltr_weights=args.ltr_weights, pre_select_k=args.pre_select_k,
        ).show(args.top_k, truncate=False)
    else:
        eng.search(args.query, args.top_k).show(args.top_k, truncate=False)
    print(f"retrieval took {(time.time() - t0) * 1000:.1f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
