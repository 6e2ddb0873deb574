"""spark-submit entry: index maintenance (add / delete / compact).

    spark-submit jobs/maintain.py add     --index /path/idx --docs new.parquet
    spark-submit jobs/maintain.py delete  --index /path/idx --doc-ids 3,17,42
    spark-submit jobs/maintain.py update  --index /path/idx --docs new.parquet
    spark-submit jobs/maintain.py merge   --index /path/idx
    spark-submit jobs/maintain.py compact --index /path/idx --out /path/idx2 \
        [--corpus /path/corpus.parquet]
    spark-submit jobs/maintain.py status  --index /path/idx

Adds are frozen-stats delta segments, deletes are query-time tombstone
masks, compact folds both into a fresh-stats rebuild (see
``operators/indexer.py``)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs_search_engine_architecture_spark.operators import indexer  # noqa: E402
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "action",
        choices=["add", "delete", "update", "merge", "compact", "status"],
    )
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", default=None, help="parquet of new docs (add)")
    ap.add_argument("--doc-ids", default=None, help="comma-separated ids (delete)")
    ap.add_argument("--out", default=None, help="output index path (compact)")
    ap.add_argument("--corpus", default=None,
                    help="override the manifest corpus_path (compact)")
    ap.add_argument("--no-check-ids", action="store_true",
                    help="skip the duplicate-doc_id check on add")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name=f"spark-sea-maintain-{args.action}",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.action == "add":
        if not args.docs:
            ap.error("add requires --docs")
        meta = indexer.add_docs(
            spark, args.index, spark.read.parquet(args.docs),
            check_ids=not args.no_check_ids,
        )
        print(json.dumps({"action": "add", **meta}))
    elif args.action == "update":
        if not args.docs:
            ap.error("update requires --docs")
        meta = indexer.update_docs(
            spark, args.index, spark.read.parquet(args.docs)
        )
        print(json.dumps({"action": "update", **meta}))
    elif args.action == "delete":
        if not args.doc_ids:
            ap.error("delete requires --doc-ids")
        ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
        n = indexer.delete_docs(spark, args.index, ids)
        print(json.dumps({"action": "delete", "tombstoned": n}))
    elif args.action == "merge":
        meta = indexer.merge_deltas(spark, args.index)
        print(json.dumps(
            {"action": "merge", "merged": meta is not None,
             **({k: meta[k] for k in ("num_documents", "num_postings")}
                if meta else {})}
        ))
    elif args.action == "compact":
        if not args.out:
            ap.error("compact requires --out")
        corpus = spark.read.parquet(args.corpus) if args.corpus else None
        meta = indexer.compact_index(spark, args.index, args.out, corpus=corpus)
        print(json.dumps({
            "action": "compact",
            "num_documents": meta["num_documents"],
            "num_postings": meta["num_postings"],
            "out": args.out,
        }))
    else:  # status
        meta = indexer.load_meta(args.index)
        tomb = indexer.load_tombstones(spark, args.index)
        upd = indexer.load_updated_ids(spark, args.index)
        deltas = indexer.load_delta_metas(args.index)
        print(json.dumps({
            "action": "status",
            "base_documents": meta["num_documents"],
            "base_postings": meta["num_postings"],
            "delta_segments": len(deltas),
            "delta_documents": sum(d["num_documents"] for d in deltas),
            "delta_postings": sum(d["num_postings"] for d in deltas),
            "tombstones": 0 if tomb is None else tomb.count(),
            "updated_docs": 0 if upd is None else upd.count(),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
