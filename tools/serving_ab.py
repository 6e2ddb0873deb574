"""Interleaved in-JVM serving-latency measurement (the VM-noise
discipline CLAUDE.md mandates): every serving query from bench.py runs
R alternating reps inside ONE Spark session, so cross-session tenant
noise (documented at +-50%) cannot masquerade as a per-query
regression. Reports min and median per query — min is the contention-
free capability number, median the steady-state serving number.

    python tools/serving_ab.py [--reps 7] [--sf-dir /root/testdata/sf0.1]

Prints one JSON line; paste the table into BENCH/BASELINE.md when
settling a driver-bench dispute (round-4 verdict item 2)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs_search_engine_architecture_spark.engine import SearchEngine  # noqa: E402
from cs_search_engine_architecture_spark.operators.indexer import (  # noqa: E402
    build_index,
    update_docs,
)
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402

QUERIES = [
    ("q_single", "spark"),
    ("q_and", "spark and data"),
    ("q_or", "spark or data"),
    ("q_and_not", "data and not slow"),
    ("q_bool_mix", 'spark and (data or "hash join") not slow'),
    ("q_phrase", '"window order"'),
    ("q_hot_and", "index and data"),
]

TERMS16 = [
    "spark", "data", "slow", "fast", "hash", "join", "index", "query",
    "merge", "sort", "key", "value", "table", "row", "column", "disk",
]
BATCH16 = {
    f"b{i}": (
        f"{TERMS16[i]} or {TERMS16[(i + 3) % 16]}"
        if i % 2 == 0
        else f"{TERMS16[i]} and {TERMS16[(i + 3) % 16]}"
    )
    for i in range(16)
}
PHRASES8 = {
    f"p{i}": q
    for i, q in enumerate([
        '"window order"', '"hash join"', '"table scan"', '"sort merge"',
        '"key value"', '"batch stream"', '"row column"', '"data flow"',
    ])
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    ap.add_argument("--cores", default=os.environ.get(
        "SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)
    ))
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-serving-ab", master=f"local[{args.cores}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/spark_sea_serving_ab"
    shutil.rmtree(work, ignore_errors=True)
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    idx = os.path.join(work, "docs_idx")
    build_index(
        spark, docs, idx, fields=["text"], analyzer="simple", num_buckets=8,
        corpus_path=os.path.join(args.sf_dir, "documents.parquet"),
    )
    eng = SearchEngine(spark, idx)
    upd_idx = os.path.join(work, "docs_idx_upd")
    shutil.copytree(idx, upd_idx)
    update_docs(
        spark, upd_idx,
        spark.createDataFrame(
            [(0, "updated spark data text for the serving benchmark")],
            "doc_id long, text string",
        ),
    )
    ueng = SearchEngine(spark, upd_idx)

    def tasks():
        out = []
        for name, q in QUERIES:
            out.append((name, lambda q=q: eng.search_collect(q, 10)))
        out.append((
            "q_msearch_batch",
            lambda: eng.msearch(
                {name: q for name, q in QUERIES}, top_k=10
            ).collect(),
        ))
        out.append((
            "q_msearch_batch16",
            lambda: eng.msearch(BATCH16, top_k=10).collect(),
        ))
        out.append((
            "q_msearch_phrase8",
            lambda: eng.msearch(PHRASES8, top_k=10).collect(),
        ))
        out.append((
            "q_proximity",
            lambda: eng.proximity_search(
                "window order", 30, top_k=10
            ).collect(),
        ))
        out.append((
            "q_boosted",
            lambda: eng.boosted_search(
                {"spark": 2.0, "data": 0.5}, top_k=10
            ).collect(),
        ))
        out.append((
            "q_single_updated", lambda: ueng.search_collect("spark", 10)
        ))
        out.append((
            "q_msearch_batch16_updated",
            lambda: ueng.msearch(BATCH16, top_k=10).collect(),
        ))
        return out

    suite = tasks()
    # warm every path once (JIT, codegen cache, block persist, arms)
    for _, fn in suite:
        fn()
    samples: dict[str, list[float]] = {n: [] for n, _ in suite}
    for _rep in range(args.reps):
        for name, fn in suite:  # interleaved: one rep of each per pass
            t0 = time.time()
            fn()
            samples[name].append(time.time() - t0)
    report = {
        name: {
            "min": round(min(v), 3),
            "median": round(statistics.median(v), 3),
            "reps": [round(x, 3) for x in v],
        }
        for name, v in samples.items()
    }
    print(json.dumps({
        "reps": args.reps, "cores": int(args.cores),
        "sf_dir": args.sf_dir, "queries": report,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
