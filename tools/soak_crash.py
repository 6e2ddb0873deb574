"""Crash-kill soak: SIGKILL real maintenance ops mid-flight, then
recover, replay, and verify — the north rule's "resumable from
checkpoint" exercised with actual process death instead of hand-built
on-disk states.

Each iteration the parent

1. picks a maintenance op (add_docs with an EXPLICIT segment — the
   at-least-once replay contract; update_docs of base ids; merge_deltas;
   compact_in_place), predicts the post-replay model,
2. spawns a CHILD python/Spark process (its own JVM, own session
   group) running exactly that op against the shared index,
3. sleeps a random delay and SIGKILLs the child's whole process group
   — the kill can land before the JVM is up, mid-shuffle, mid-parquet
   write, between the protocol's marker steps, or after commit,
4. REPLAYS the op in-process (every maintenance entry runs
   ``_recover_compact``/``_recover_merge`` first; add replays overwrite
   their own segment; update replays retire the stale delta version),
5. asserts: ``fsck_index`` has NO failed check (warns — crash residue,
   dead cross-tier rows — are expected and named), term membership and
   ``current_corpus`` equal the model exactly, and a fresh engine
   serves every vocab term identically to the compiled join path.

Crash-window coverage is randomized, so run with several seeds. Kills
that land after the child committed double as idempotent-replay tests.

Usage:
    python tools/soak_crash.py [--kills 10] [--seed 20260819]
        [--cores 6] [--min-delay 3] [--max-delay 30]

Exits 1 on the first violated invariant; prints a JSON summary line
with the op/killed-phase histogram.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = ["spark", "join", "merge", "plan", "block", "shard", "qqv", "qqw"]


def _child_main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--rows", default="[]")
    ap.add_argument("--segment", type=int, default=None)
    args = ap.parse_args(argv)

    from cs_search_engine_architecture_spark.operators import indexer
    from cs_search_engine_architecture_spark.session import get_spark

    spark = get_spark(
        app_name="soak-crash-child", master="local[2]",
        shuffle_partitions=4,
    )
    rows = [(int(d), t) for d, t in json.loads(args.rows)]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        if rows else None
    )
    if args.op == "add":
        indexer.add_docs(
            spark, args.index, df, check_ids=False, segment=args.segment
        )
    elif args.op == "update":
        indexer.update_docs(spark, args.index, df)
    elif args.op == "merge":
        indexer.merge_deltas(spark, args.index)
    elif args.op == "compact":
        indexer.compact_in_place(spark, args.index)
    else:
        raise SystemExit(f"unknown op {args.op}")
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return _child_main(sys.argv[2:])

    ap = argparse.ArgumentParser()
    ap.add_argument("--kills", type=int, default=10)
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument("--cores", type=int, default=6)
    ap.add_argument("--min-delay", type=float, default=3.0)
    ap.add_argument("--max-delay", type=float, default=30.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cs_search_engine_architecture_spark.engine import SearchEngine
    from cs_search_engine_architecture_spark.operators import indexer
    from cs_search_engine_architecture_spark.operators.fsck import (
        fsck_index,
    )
    from cs_search_engine_architecture_spark.session import get_spark

    rng = random.Random(args.seed)
    spark = get_spark(
        app_name="soak-crash", master=f"local[{args.cores}]",
        shuffle_partitions=8,
    )
    root = tempfile.mkdtemp(prefix="soak_crash_")
    out = os.path.join(root, "idx")

    def rand_text() -> str:
        return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 8)))

    base_rows = [(i, rand_text()) for i in range(12)]
    src = os.path.join(root, "corpus.parquet")
    df0 = spark.createDataFrame(base_rows, "doc_id long, text string")
    df0.write.parquet(src)
    indexer.build_index(
        spark, df0, out, fields=["text"], analyzer="simple",
        num_buckets=4, corpus_path=src,
    )
    current = dict(base_rows)
    base_ids = set(current)
    next_id, next_seg = 1000, 0
    histogram: dict[str, int] = {}
    t0 = time.time()

    def replay(op: str, rows, seg) -> None:
        rdf = (
            spark.createDataFrame(rows, "doc_id long, text string")
            if rows else None
        )
        if op == "add":
            indexer.add_docs(spark, out, rdf, check_ids=False, segment=seg)
        elif op == "update":
            indexer.update_docs(spark, out, rdf)
        elif op == "merge":
            indexer.merge_deltas(spark, out)
        elif op == "compact":
            indexer.compact_in_place(spark, out)

    for it in range(args.kills):
        r = rng.random()
        rows, seg = [], None
        if r < 0.35:
            op = "add"
            rows = [(next_id + j, rand_text())
                    for j in range(rng.randint(1, 2))]
            # explicit replayable segments live in the ingest namespace
            # — a raw small int would collide with update_docs' manual
            # slot counting (the CLAUDE.md namespace invariant)
            seg = indexer.LIVE_SEGMENT_BASE + next_seg
            next_id += len(rows); next_seg += 1
        elif r < 0.70:
            op = "update"
            ids = rng.sample(sorted(base_ids & set(current)),
                             rng.randint(1, 2))
            rows = [(d, rand_text()) for d in ids]
        elif r < 0.85:
            op = "merge"
        else:
            op = "compact"

        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--op", op, "--index", out,
               "--rows", json.dumps(rows)]
        if seg is not None:
            cmd += ["--segment", str(seg)]
        child = subprocess.Popen(
            cmd, start_new_session=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        delay = rng.uniform(args.min_delay, args.max_delay)
        deadline = time.time() + delay
        while time.time() < deadline and child.poll() is None:
            time.sleep(0.2)
        if child.poll() is None:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            child.wait()
            phase = f"{op}:killed@{delay:.0f}s"
        else:
            phase = f"{op}:completed"
        histogram[phase] = histogram.get(phase, 0) + 1

        # the at-least-once replay — recovery runs inside each entry
        replay(op, rows, seg)
        for d, t in rows:
            current[d] = t
        if op == "compact":
            base_ids = set(current)

        # invariants after recovery+replay
        rep = fsck_index(spark, out)
        bad = [c for c in rep["checks"] if c["status"] == "fail"]
        if bad:
            print(f"FSCK FAIL after {phase} (iter {it}): {bad}")
            return 1
        eng = SearchEngine(spark, out, cache=False)
        for term in VOCAB:
            got = sorted(
                r2["doc_id"] for r2 in eng.search_df(term).collect()
            )
            want = sorted(
                d for d, t in current.items() if term in t.split()
            )
            if got != want:
                print(f"MEMBERSHIP after {phase} term {term}: "
                      f"{got} != {want}")
                return 1
            fast = [(r2["doc_id"], round(r2["score"], 9))
                    for r2 in eng.search(term, 30).collect()]
            joined = [(r2["doc_id"], round(r2["score"], 9))
                      for r2 in eng._scored({"type": "token", "value": term})
                      .orderBy(F.desc("score"), F.asc("doc_id"))
                      .limit(30).collect()]
            if fast != joined:
                print(f"FASTPATH after {phase} term {term}")
                return 1
        cur = {r2["doc_id"]: r2["text"]
               for r2 in eng.current_corpus().collect()}
        if cur != current:
            print(f"CORPUS after {phase}: "
                  f"extra={set(cur) - set(current)} "
                  f"missing={set(current) - set(cur)}")
            return 1
        print(f"iter {it + 1}/{args.kills} [{phase}] green "
              f"({len(current)} docs)", file=sys.stderr)

    print(json.dumps({
        "metric": "soak_crash_kills_green",
        "value": args.kills,
        "phases": histogram,
        "wall_s": round(time.time() - t0, 1),
        "seed": args.seed,
    }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
