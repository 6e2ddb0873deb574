"""spark-submit entry: index maintenance (add / delete / compact).

    spark-submit jobs/maintain.py add     --index /path/idx --docs new.parquet \
        [--dedup-store /path/dstore [--dedup-threshold 0.9]]
    spark-submit jobs/maintain.py dedup-store --docs corpus.parquet \
        --dedup-store /path/dstore --index /path/idx
    spark-submit jobs/maintain.py delete  --index /path/idx --doc-ids 3,17,42 \
        [--dedup-store /path/dstore]   # tombstones the store rows too
    spark-submit jobs/maintain.py update  --index /path/idx --docs new.parquet
    spark-submit jobs/maintain.py merge   --index /path/idx
    spark-submit jobs/maintain.py compact --index /path/idx --out /path/idx2 \
        [--corpus /path/corpus.parquet]
    spark-submit jobs/maintain.py auto    --index /path/idx \
        [--max-delta-segments 4] [--max-masked-fraction 0.1]
    spark-submit jobs/maintain.py status  --index /path/idx
    spark-submit jobs/maintain.py fsck    --index /path/idx [--deep]

Adds are frozen-stats delta segments, deletes are query-time tombstone
masks, compact folds both into a fresh-stats rebuild (see
``operators/indexer.py``). ``auto`` is the POLICY tick for a live loop:
in-place compaction when the masked fraction (tombstones + updated ids)
crosses the threshold, a bit-identical merge when the delta tier
fragments past the segment cap, else a no-op — run it on a schedule (or
from the serve REPL) to keep update-serving overhead bounded."""

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
        choices=[
            "add", "delete", "update", "merge", "compact", "auto", "status",
            "dedup-store", "fsck",
        ],
    )
    ap.add_argument("--deep", action="store_true",
                    help="fsck: also decode every block's bytes")
    ap.add_argument("--max-delta-segments", type=int, default=4)
    ap.add_argument("--max-masked-fraction", type=float, default=0.10)
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", default=None, help="parquet of new docs (add)")
    ap.add_argument("--doc-ids", default=None, help="comma-separated ids (delete)")
    ap.add_argument("--out", default=None, help="output index path (compact)")
    ap.add_argument("--corpus", default=None,
                    help="override the manifest corpus_path (compact)")
    ap.add_argument("--no-check-ids", action="store_true",
                    help="skip the duplicate-doc_id check on add")
    ap.add_argument("--dedup-store", default=None,
                    help="near-dup signature store path: 'dedup-store' "
                         "builds it from --docs; 'add' filters incoming "
                         "docs against it and appends the survivors")
    ap.add_argument("--dedup-threshold", type=float, default=0.9,
                    help="MinHash-estimated Jaccard at/above which an "
                         "incoming doc is dropped as a near-dup (add)")
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
        new_docs = spark.read.parquet(args.docs)
        dropped = None
        if args.dedup_store:
            from cs_search_engine_architecture_spark.operators import (  # noqa: E402
                dedup,
            )

            n_in = new_docs.count()
            new_docs = dedup.dedup_filter_batch(
                spark, args.dedup_store, new_docs,
                threshold=args.dedup_threshold,
            ).localCheckpoint()
            dropped = n_in - new_docs.count()
            if not new_docs.take(1):
                print(json.dumps(
                    {"action": "add", "added": 0, "dedup_dropped": n_in}
                ))
                spark.stop()
                return
        meta = indexer.add_docs(
            spark, args.index, new_docs,
            check_ids=not args.no_check_ids,
        )
        if args.dedup_store:
            dedup.dedup_store_append(spark, args.dedup_store, new_docs)
            meta = {**meta, "dedup_dropped": int(dropped)}
        print(json.dumps({"action": "add", **meta}))
    elif args.action == "dedup-store":
        if not args.docs or not args.dedup_store:
            ap.error("dedup-store requires --docs and --dedup-store")
        from cs_search_engine_architecture_spark.operators import dedup  # noqa: E402

        dedup.build_dedup_store(
            spark.read.parquet(args.docs), args.dedup_store
        )
        print(json.dumps(
            {"action": "dedup-store", "store": args.dedup_store}
        ))
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
        if args.dedup_store:
            from cs_search_engine_architecture_spark.operators import (  # noqa: E402
                dedup,
            )

            # a deleted doc must stop blocking re-ingest of its text
            dedup.dedup_store_delete(spark, args.dedup_store, ids)
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
    elif args.action == "auto":
        out = indexer.auto_maintain(
            spark, args.index,
            max_delta_segments=args.max_delta_segments,
            max_masked_fraction=args.max_masked_fraction,
        )
        print(json.dumps({"action": "auto", **out}))
    elif args.action == "fsck":
        from cs_search_engine_architecture_spark.operators import (  # noqa: E402
            fsck,
        )

        report = fsck.fsck_index(spark, args.index, deep=args.deep)
        print(json.dumps({"action": "fsck", **report}))
        if not report["ok"]:
            spark.stop()
            sys.exit(1)
    else:  # status
        print(json.dumps({
            "action": "status",
            **indexer.maintenance_status(spark, args.index),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
