"""Index integrity checker (`operators/fsck.py`): a clean index (base
and with maintenance state) passes every check, and seeded corruption
of each guarded invariant is detected and named."""

import glob
import json
import os
import shutil

from cs_search_engine_architecture_spark.operators import fsck, indexer

DOCS = [
    (0, "spark shuffle makes wide plans fast"),
    (1, "hash join beats merge join on small tables"),
    (2, "sorted merge join shines for big runs"),
    (3, "the planner picks hash join or merge join"),
    (4, "spark planner prefers broadcast hash join"),
    (5, "a shuffle heavy query with skewed keys"),
    (6, "spark spark spark repeated for frequency"),
    (7, "delta gap varint blocks compress postings"),
]


def _build(spark, tmp_path, name="idx"):
    out = str(tmp_path / name)
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    src = str(tmp_path / f"{name}_corpus.parquet")
    corpus.write.parquet(src)
    indexer.build_index(
        spark, corpus, out, fields=["text"], analyzer="simple",
        num_buckets=4, corpus_path=src,
    )
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _status(report, check, tier="base"):
    hits = [
        c for c in report["checks"]
        if c["check"] == check and c["tier"] == tier
    ]
    assert hits, f"no check named {check} on tier {tier}"
    return hits[0]["status"]


def test_fsck_clean_index_passes(spark, tmp_path):
    out = _build(spark, tmp_path)
    report = fsck.fsck_index(spark, out, deep=True)
    assert report["ok"], [c for c in report["checks"]
                          if c["status"] != "ok"]
    names = {c["check"] for c in report["checks"]}
    assert {"meta_json", "manifest_shards", "meta_num_postings",
            "block_term_disjoint", "deep_bad_monotonic",
            "doc_lens_unique"} <= names


def test_fsck_clean_under_maintenance_state(spark, tmp_path):
    """adds + deletes + updates leave a protocol-consistent index —
    every tier (base and deltas) must still pass, and the updated-id
    invariants are checked and green."""
    out = _build(spark, tmp_path)
    indexer.add_docs(spark, out, _df(spark, [(100, "a fresh added doc")]))
    indexer.delete_docs(spark, out, [5])
    indexer.update_docs(spark, out, _df(spark, [(0, "updated text zero")]))
    report = fsck.fsck_index(spark, out, deep=True)
    assert report["ok"], [c for c in report["checks"]
                          if c["status"] != "ok"]
    assert _status(report, "updated_have_tombstones") == "ok"
    assert _status(report, "updated_staged_in_delta") == "ok"
    tiers = {c["tier"] for c in report["checks"]}
    assert any(t.startswith("delta_") for t in tiers)


def test_fsck_detects_cross_tier_residency(spark, tmp_path):
    """A doc_id resident in two tiers outside the update protocol is
    a double-serve; one id staged in two delta segments is a
    stale-version leak. add_docs validates against both at the API, so
    the states only arise from on-disk corruption — seeded here by
    rewriting/cloning tier files directly, which is exactly what fsck
    exists to diagnose."""
    from pyspark.sql import functions as F

    out = _build(spark, tmp_path)
    indexer.add_docs(spark, out, _df(spark, [(100, "a fresh added doc")]))
    delta = indexer._delta_dirs(out)[0]

    # corruption 1: the delta doc_lens claims base-resident id 3
    dl_dir = os.path.join(delta, "doc_lens")
    dl = spark.read.parquet(dl_dir).collect()
    fixed = spark.createDataFrame(
        [tuple(3 if f == "doc_id" else r[f] for f in r.asDict())
         for r in dl],
        spark.read.parquet(dl_dir).schema,
    )
    shutil.rmtree(dl_dir)
    fixed.write.parquet(dl_dir)
    report = fsck.fsck_index(spark, out)
    assert not report["ok"]
    assert _status(report, "cross_tier_residency") == "fail"
    assert _status(report, "delta_dup_residency") == "ok"

    # corruption 2: a delta segment cloned into a second slot (the
    # same ids staged twice)
    out2 = _build(spark, tmp_path, name="idx2")
    indexer.add_docs(spark, out2, _df(spark, [(200, "first add")]))
    d0 = indexer._delta_dirs(out2)[0]
    shutil.copytree(d0, os.path.join(out2, "delta_90009"))
    report2 = fsck.fsck_index(spark, out2)
    assert not report2["ok"]
    assert _status(report2, "delta_dup_residency") == "fail"
    assert _status(report2, "cross_tier_residency") == "ok"

    # the LEGAL overlap (update_docs) stays green end to end
    out3 = _build(spark, tmp_path, name="idx3")
    indexer.update_docs(spark, out3, _df(spark, [(3, "proper update")]))
    report3 = fsck.fsck_index(spark, out3)
    assert report3["ok"], [c for c in report3["checks"]
                           if c["status"] != "ok"]
    assert _status(report3, "cross_tier_residency") == "ok"
    assert _status(report3, "delta_dup_residency") == "ok"


def test_fsck_detects_meta_postings_drift(spark, tmp_path):
    out = _build(spark, tmp_path)
    mp = os.path.join(out, "meta.json")
    meta = json.load(open(mp))
    meta["num_postings"] += 7
    json.dump(meta, open(mp, "w"))
    report = fsck.fsck_index(spark, out)
    assert not report["ok"]
    assert _status(report, "meta_num_postings") == "fail"


def test_fsck_detects_missing_shard(spark, tmp_path):
    """Deleting one term_bucket directory (a lost shard) fails the
    manifest comparison AND the postings total."""
    out = _build(spark, tmp_path)
    shard = sorted(glob.glob(os.path.join(out, "blocks", "term_bucket=*")))[0]
    shutil.rmtree(shard)
    report = fsck.fsck_index(spark, out)
    assert not report["ok"]
    assert _status(report, "manifest_shards") == "fail"
    assert _status(report, "meta_num_postings") == "fail"


def test_fsck_detects_orphan_updated_id(spark, tmp_path):
    """An updated_ids row without its tombstone (fail-closed broken) and
    without staged delta rows (lost update) fails both invariants."""
    out = _build(spark, tmp_path)
    spark.createDataFrame([(3,)], "doc_id long").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "updated_ids"))
    report = fsck.fsck_index(spark, out)
    assert not report["ok"]
    assert _status(report, "updated_have_tombstones") == "fail"
    assert _status(report, "updated_staged_in_delta") == "fail"


def test_fsck_deep_detects_byte_corruption(spark, tmp_path):
    """Flipping the varint doc_ids payload of one block (keeping the
    metadata) is invisible to the surface pass and caught by --deep."""
    import pandas as pd

    out = _build(spark, tmp_path)
    shard_files = sorted(
        glob.glob(os.path.join(out, "blocks", "term_bucket=*", "*.parquet"))
    )
    target = next(
        f for f in shard_files
        if len(pd.read_parquet(f))  # first non-empty shard file
    )
    pdf = pd.read_parquet(target)
    buf = bytearray(pdf.loc[0, "doc_ids_bin"])
    buf[0] ^= 0x7F  # corrupt the first varint delta
    pdf.loc[0, "doc_ids_bin"] = bytes(buf)
    pdf.to_parquet(target, index=False)
    crc = os.path.join(
        os.path.dirname(target), "." + os.path.basename(target) + ".crc"
    )
    if os.path.exists(crc):  # stale Hadoop checksum sidecar
        os.remove(crc)
    surface = fsck.fsck_index(spark, out)
    deep = fsck.fsck_index(spark, out, deep=True)
    surface_names = {
        c["check"] for c in surface["checks"] if c["status"] == "fail"
    }
    assert not surface_names.intersection({"deep_bad_endpoints"})
    assert not deep["ok"]
    assert any(
        c["check"].startswith("deep_") and c["status"] == "fail"
        for c in deep["checks"]
    )


def test_fsck_holds_under_random_maintenance(spark, tmp_path):
    """Property: after ANY random sequence of add/delete/update/merge
    the protocol invariants fsck guards must all hold (surface pass per
    sequence, deep pass at the end)."""
    import random

    rng = random.Random(13)
    vocab = ["spark", "join", "merge", "plan", "block", "qqv", "qqw"]
    out = _build(spark, tmp_path)
    live = {d for d, _ in DOCS}
    next_id = 100

    def rand_rows(ids):
        return _df(spark, [
            (d, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(3, 7))))
            for d in ids
        ])

    for step in range(8):
        op = rng.random()
        if op < 0.3:
            indexer.add_docs(spark, out, rand_rows([next_id]))
            live.add(next_id)
            next_id += 1
        elif op < 0.45 and len(live) > 4:
            victim = rng.choice(sorted(live))
            indexer.delete_docs(spark, out, [victim])
            live.discard(victim)
        elif op < 0.6:
            indexer.merge_deltas(spark, out)
        else:
            ids = rng.sample(sorted(live), min(2, len(live)))
            indexer.update_docs(spark, out, rand_rows(ids))
        report = fsck.fsck_index(spark, out)
        bad = [c for c in report["checks"] if c["status"] == "fail"]
        assert not bad, (step, bad)
    deep = fsck.fsck_index(spark, out, deep=True)
    assert deep["ok"], [c for c in deep["checks"]
                        if c["status"] != "ok"]


def test_fsck_reports_torn_tiers_instead_of_crashing(spark, tmp_path):
    """A torn/corrupt tier must become a FAILED CHECK, never an
    exception: (a) garbage bytes in a base blocks parquet file fail
    tier_readable; (b) a delta segment whose corpus dir was lost in a
    partial copy fails segment_dirs + delta_corpus_readable while the
    updated-ids invariants still evaluate over the readable segments."""
    out = _build(spark, tmp_path)
    indexer.update_docs(spark, out, _df(spark, [(0, "updated text zero")]))

    # (b) lose one delta segment's corpus dir (keep blocks/doc_lens)
    delta = sorted(glob.glob(os.path.join(out, "delta_*")))[0]
    shutil.rmtree(os.path.join(delta, "corpus"))
    report = fsck.fsck_index(spark, out)
    assert not report["ok"]
    tier = os.path.basename(delta)
    assert _status(report, "segment_dirs", tier) == "fail"
    assert _status(report, "delta_corpus_readable") == "fail"
    # the staged-update gate still ran (no readable segment stages doc 0)
    assert _status(report, "updated_staged_in_delta") == "fail"

    # (a) torn base parquet: overwrite one blocks file with garbage
    out2 = _build(spark, tmp_path, name="idx2")
    victim = sorted(glob.glob(
        os.path.join(out2, "blocks", "**", "*.parquet"), recursive=True
    ))[0]
    with open(victim, "wb") as fh:
        fh.write(b"not a parquet file")
    report2 = fsck.fsck_index(spark, out2, deep=True)
    assert not report2["ok"]
    assert _status(report2, "tier_readable") == "fail"


def test_fsck_update_then_delete_residue_warns_not_fails(spark, tmp_path):
    """update_docs(X) then delete_docs(X) retires X from updated_ids
    but legitimately leaves its dead delta rows staged (tombstone masks
    every version; compaction clears the rows). fsck must report the
    residue as a WARN, never a failed check — found by the round-5
    maintenance soak (seed 999 flagged a correctly-serving index). A
    LIVE base∩delta id (no tombstone) stays a hard FAIL."""
    out = _build(spark, tmp_path)
    indexer.update_docs(spark, out, _df(spark, [(3, "fresh planner text")]))
    indexer.delete_docs(spark, out, [3])
    report = fsck.fsck_index(spark, out)
    assert report["ok"], [c for c in report["checks"]
                          if c["status"] == "fail"]
    assert _status(report, "cross_tier_residency") == "ok"
    assert _status(report, "cross_tier_dead_residue") == "warn"

    # compaction clears the residue and the warn disappears
    indexer.compact_in_place(spark, out)
    report2 = fsck.fsck_index(spark, out)
    assert report2["ok"]
    assert not [c for c in report2["checks"]
                if c["check"] == "cross_tier_dead_residue"]


def test_torn_delta_segment_invisible_and_self_healing(spark, tmp_path):
    """A delta dir WITHOUT meta.json (add_docs writes it LAST — it is
    the segment commit marker) is a torn mid-stage crash: serving and
    load paths must ignore it, fsck names it as a warn, and the next
    add reuses the slot (mode-overwrite writes heal the residue) — the
    at-least-once replay contract, now for MANUAL adds too."""
    out = _build(spark, tmp_path)
    indexer.add_docs(spark, out, _df(spark, [(100, "first qqadd here")]))
    committed = indexer._delta_dirs(out)
    assert [os.path.basename(d) for d in committed] == ["delta_00000"]

    # simulate the torn crash: clone the committed segment into the
    # next slot and strip its commit marker
    torn = os.path.join(out, "delta_00001")
    shutil.copytree(committed[0], torn)
    os.remove(os.path.join(torn, "meta.json"))

    # invisible to serving, slot counting, and the metadata loads
    assert indexer._delta_dirs(out) == committed
    assert len(indexer.load_delta_metas(out)) == 1
    from cs_search_engine_architecture_spark.engine import SearchEngine
    eng = SearchEngine(spark, out, cache=False)
    assert [r["doc_id"] for r in eng.search_df("qqadd").collect()] == [100]
    assert len(eng.current_corpus().collect()) == len(DOCS) + 1

    # fsck: named warn, no failed check
    report = fsck.fsck_index(spark, out)
    assert report["ok"], [c for c in report["checks"]
                          if c["status"] == "fail"]
    assert _status(report, "segment_uncommitted", "delta_00001") == "warn"

    # the next manual add reuses slot 1 and commits it
    indexer.add_docs(spark, out, _df(spark, [(200, "second qqheal add")]))
    assert os.path.exists(os.path.join(torn, "meta.json"))
    eng2 = SearchEngine(spark, out, cache=False)
    assert [r["doc_id"] for r in eng2.search_df("qqheal").collect()] == [200]
    report2 = fsck.fsck_index(spark, out)
    assert report2["ok"]
    assert not [c for c in report2["checks"]
                if c["check"] == "segment_uncommitted"]
