"""Randomized maintenance-sequence soak with fsck cross-validation.

The maintenance state machine (tombstones, delta tiers, updated_ids,
merge/compact crash protocols) is the repo's most intricate invariant
surface — the in-suite property test
(``tests/test_maintenance_updates.py::test_random_update_sequences_match_rebuild``)
runs ONE 6-step sequence. This tool soaks MANY longer sequences, each
mixing every maintenance primitive:

* ``add_docs`` (new delta segment)
* live-ingest micro-batches (``add_docs`` at the streaming
  ``LIVE_SEGMENT_BASE + batch_id`` namespace, HALF of them immediately
  REPLAYED into the same segment — Structured Streaming's
  at-least-once retry must overwrite, not double-serve)
* ``delete_docs`` (base- or delta-resident victims, sometimes an id
  with a pending update — the arm-retirement edge)
* ``update_docs`` (1-3 live ids; re-updates of already-updated ids;
  UPSERTS of deleted base ids — the ADVICE double-serve repro chain
  update → delete → upsert is generated explicitly)
* ``merge_deltas`` and ``auto_maintain`` policy ticks
* ``compact_in_place`` (resets the model's tier expectations)

and checks, at every sequence end (plus after each fold):

1. ``fsck_index`` clean — randomized op sequences must NEVER leave an
   index the integrity checker rejects (cross-validates fsck's
   invariants against states no hand-written test constructs),
2. term membership == the driver-side model of the final corpus,
3. single-term fast path == compiled join path (scores, order),
4. ``msearch`` (batched arms incl. the mixed-tree map arm) == per-query
   ``search``,
5. ``current_corpus`` == the model (ids AND text),
6. ``compact_index`` to a sibling == a from-scratch build over the
   model corpus on a query sample, and deep-fsck of the compacted copy.

Usage:
    python tools/soak_maintenance.py [--seqs 6] [--steps 12]
        [--seed 20260819] [--cores 8]

Exits 1 on the first violated invariant; prints a JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cs_search_engine_architecture_spark.engine import SearchEngine  # noqa: E402
from cs_search_engine_architecture_spark.operators import indexer  # noqa: E402
from cs_search_engine_architecture_spark.operators.fsck import (  # noqa: E402
    fsck_index,
)
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402

VOCAB = ["spark", "join", "merge", "plan", "block", "shard", "qqv", "qqw"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fsck_ok(spark, path, deep=False, where="") -> bool:
    rep = fsck_index(spark, path, deep=deep)
    if not rep["ok"]:
        bad = [c for c in rep["checks"] if c["status"] == "fail"]
        print(f"FSCK FAIL {where}: {bad}")
        return False
    return True


def run_sequence(spark, seq: int, steps: int, rng: random.Random,
                 root: str) -> bool:
    def rand_text() -> str:
        return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 8)))

    out = os.path.join(root, f"seq{seq}")
    base_rows = [(i, rand_text()) for i in range(10)]
    src = os.path.join(root, f"seq{seq}_corpus.parquet")
    _df(spark, base_rows).write.parquet(src)
    indexer.build_index(
        spark, _df(spark, base_rows), out, fields=["text"],
        analyzer="simple", num_buckets=4, corpus_path=src,
    )

    current = dict(base_rows)
    # ids deleted while base-resident: upsert-eligible until a fold
    deleted_base: set[int] = set(); base_ids = {i for i, _ in base_rows}
    next_id = 1000
    live_batch = 0
    ops: list[str] = []

    for step in range(steps):
        r = rng.random()
        if r < 0.18:
            rows = [(next_id + j, rand_text()) for j in range(rng.randint(1, 2))]
            indexer.add_docs(spark, out, _df(spark, rows))
            current.update(dict(rows)); next_id += len(rows)
            ops.append("add")
        elif r < 0.33 and len(current) > 4:
            victim = rng.choice(sorted(current))
            indexer.delete_docs(spark, out, [victim])
            del current[victim]
            if victim in base_ids:
                deleted_base.add(victim)
            ops.append("delete")
        elif r < 0.43 and deleted_base:
            # upsert of a deleted base id (resurrection arm)
            vid = rng.choice(sorted(deleted_base))
            text = rand_text()
            indexer.update_docs(spark, out, _df(spark, [(vid, text)]))
            current[vid] = text; deleted_base.discard(vid)
            ops.append("upsert")
        elif r < 0.53 and len(current) > 4:
            # the ADVICE repro chain on one base id: update -> delete
            # -> upsert, all in one step
            cands = sorted(set(current) & base_ids)
            if not cands:
                continue
            vid = rng.choice(cands)
            indexer.update_docs(spark, out, _df(spark, [(vid, rand_text())]))
            indexer.delete_docs(spark, out, [vid])
            text = rand_text()
            indexer.update_docs(spark, out, _df(spark, [(vid, text)]))
            current[vid] = text
            ops.append("udu")
        elif r < 0.63:
            indexer.merge_deltas(spark, out)
            ops.append("merge")
        elif r < 0.70:
            res = indexer.auto_maintain(spark, out)
            if "compact" in res["actions"]:
                deleted_base = set(); base_ids = set(current)
            ops.append(f"auto:{'+'.join(res['actions']) or 'noop'}")
        elif r < 0.76:
            indexer.compact_in_place(spark, out)
            deleted_base = set(); base_ids = set(current)
            ops.append("compact")
        elif r < 0.84:
            # live-ingest micro-batch at the streaming namespace;
            # half are replayed at-least-once into the SAME segment
            rows = [(next_id + j, rand_text())
                    for j in range(rng.randint(1, 2))]
            seg = indexer.LIVE_SEGMENT_BASE + live_batch
            indexer.add_docs(spark, out, _df(spark, rows),
                             check_ids=False, segment=seg)
            replay = rng.random() < 0.5
            if replay:
                indexer.add_docs(spark, out, _df(spark, rows),
                                 check_ids=False, segment=seg)
            current.update(dict(rows))
            next_id += len(rows); live_batch += 1
            ops.append("ingest+replay" if replay else "ingest")
        else:
            cands = sorted(current)
            batch = rng.sample(cands, min(len(cands), rng.randint(1, 3)))
            rows = [(d, rand_text()) for d in batch]
            indexer.update_docs(spark, out, _df(spark, rows))
            current.update(dict(rows))
            ops.append("update")

    label = f"seq{seq}[{','.join(ops)}]"
    if not _fsck_ok(spark, out, where=label):
        return False

    eng = SearchEngine(spark, out, cache=False)
    for term in VOCAB:
        got = sorted(r["doc_id"] for r in eng.search_df(term).collect())
        want = sorted(d for d, t in current.items() if term in t.split())
        if got != want:
            print(f"MEMBERSHIP {label} term {term}: {got} != {want}")
            return False
        fast = [(r["doc_id"], round(r["score"], 9))
                for r in eng.search(term, 30).collect()]
        joined = [(r["doc_id"], round(r["score"], 9))
                  for r in eng._scored({"type": "token", "value": term})
                  .orderBy(F.desc("score"), F.asc("doc_id"))
                  .limit(30).collect()]
        if fast != joined:
            print(f"FASTPATH {label} term {term}: {fast} != {joined}")
            return False

    queries = {f"q{i}": t for i, t in enumerate(VOCAB[:3])}
    queries["mx1"] = f"{VOCAB[0]} and ({VOCAB[1]} or {VOCAB[2]})"
    queries["mx2"] = f"{VOCAB[0]} or not {VOCAB[3]}"
    queries["mx3"] = f"not {VOCAB[1]} and not {VOCAB[2]}"
    queries["ph"] = f'"{VOCAB[0]} {VOCAB[1]}"'
    batched = {(r["query_id"], r["doc_id"], round(r["score"], 9))
               for r in eng.msearch(queries, top_k=30).collect()}
    single = {(qid, r["doc_id"], round(r["score"], 9))
              for qid, q in queries.items()
              for r in eng.search(q, 30).collect()}
    if batched != single:
        print(f"MSEARCH {label}: {sorted(batched ^ single)[:6]}")
        return False

    cur = {r["doc_id"]: r["text"] for r in eng.current_corpus().collect()}
    if cur != current:
        only_e = {k: cur[k] for k in set(cur) - set(current)}
        only_m = {k: current[k] for k in set(current) - set(cur)}
        diff = {k: (cur[k], current[k]) for k in set(cur) & set(current)
                if cur[k] != current[k]}
        print(f"CORPUS {label}: extra={only_e} missing={only_m} diff={diff}")
        return False

    # fold == fresh build over the model corpus (query-sample equality)
    final_rows = sorted(current.items())
    fresh_src = os.path.join(root, f"seq{seq}_fresh.parquet")
    _df(spark, final_rows).write.parquet(fresh_src)
    fresh = os.path.join(root, f"seq{seq}_fresh_idx")
    indexer.build_index(
        spark, _df(spark, final_rows), fresh, fields=["text"],
        analyzer="simple", num_buckets=4, corpus_path=fresh_src,
    )
    compacted = os.path.join(root, f"seq{seq}_compacted")
    indexer.compact_index(spark, out, compacted)
    if not _fsck_ok(spark, compacted, deep=True, where=f"{label}:compacted"):
        return False
    ef = SearchEngine(spark, fresh, cache=False)
    ec = SearchEngine(spark, compacted, cache=False)
    for q in ["spark or join", "merge and plan", "qqv", "block or qqw",
              f'"{VOCAB[0]} {VOCAB[1]}"']:
        a = [(r["doc_id"], r["score"]) for r in ef.search(q, 30).collect()]
        b = [(r["doc_id"], r["score"]) for r in ec.search(q, 30).collect()]
        if a != b:
            print(f"COMPACT {label} query {q!r}: fresh {a} != {b}")
            return False

    for p in (out, fresh, compacted, src, fresh_src):
        shutil.rmtree(p, ignore_errors=True)
    print(f"{label}: green ({len(current)} docs)", file=sys.stderr)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=6)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(
        app_name="soak-maintenance",
        master=f"local[{args.cores}]",
        shuffle_partitions=8,
    )
    rng = random.Random(args.seed)
    root = tempfile.mkdtemp(prefix="soak_maint_")
    t0 = time.time()
    for seq in range(args.seqs):
        if not run_sequence(spark, seq, args.steps, rng, root):
            return 1
    print(json.dumps({
        "metric": "soak_maintenance_sequences_green",
        "value": args.seqs,
        "steps_per_seq": args.steps,
        "wall_s": round(time.time() - t0, 1),
        "seed": args.seed,
    }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
