"""Index integrity checker — the Lucene-CheckIndex analogue for the
tiered parquet index layout (an offline diagnostic job, run from
``jobs/maintain.py fsck``).

The update/crash protocol (tombstones, updated_ids, delta segments,
merge-commit markers — see `indexer.py`) keeps several cross-file
invariants that only hold if every writer followed the discipline;
after an operator error, a partial copy, or a crash outside the
protocol's reach, this job answers "is this index internally
consistent, and if not, where". Checks by layer:

Surface (metadata-only — one pruned scan of the block METADATA columns
per tier, never the posting bytes):
  * files: meta.json / manifest.json parse; every delta segment has its
    blocks/doc_lens/corpus dirs.
  * per-block sanity: first_doc <= last_doc, 0 < count <= block_size,
    min_score <= max_score, term_bucket == pmod(xxhash64(term),
    num_buckets) (the pushdown contract — a wrong bucket makes the
    term's postings INVISIBLE to every pruned scan).
  * WAND shard alignment: a block never crosses a `wand_shard_span`
    doc boundary (the exchange-free sharded kernels rely on it).
  * per-term block disjointness within a tier: blocks of one term have
    non-overlapping [first_doc, last_doc] ranges (the WAND kernels'
    doc-disjointness bound; the ONE row_number-free exception to the
    repo's window rules does not apply here — fsck is offline and the
    per-term block count is postings/block_size, bounded).
  * base totals: sum(count) == meta.num_postings; per-bucket
    blocks/postings/terms == manifest shards; doc_lens has no
    duplicate doc_id and at most meta.num_documents rows (zero-posting
    docs legitimately have no row).
  * term coverage: every term appearing in a tier's blocks has a row
    in that tier's term_stats (missing => unservable postings).

Maintenance state:
  * updated_ids ⊆ tombstones (update writes the tombstone FIRST; a
    violation means fail-closed is broken and the doc double-serves).
  * every updated id has rows physically staged in some delta corpus
    (the resurrection arm otherwise serves nothing — a lost update).
  * crash residue: uncommitted work/merge_tmp_segment, a pending
    merge_commit marker, or .compact_tmp/.compact_trash siblings are
    reported as WARN (recovery handles them; fsck names them); a delta
    dir without its meta.json commit marker (torn mid-stage add/ingest,
    invisible to serving, healed by replaying the batch) is a named
    ``segment_uncommitted`` WARN.
  * cross-tier doc residency: a postings-bearing doc_id LIVE (not
    tombstoned) in base AND a delta tier must be in updated_ids (else
    it double-serves — FAIL). A TOMBSTONED base∩delta id outside
    updated_ids is a WARN, not corruption: it is the normal residue of
    update→delete (delete retires the id from updated_ids but the dead
    delta rows stay staged until compaction), indistinguishable
    on-disk from a fail-closed update crash or a lost re-add staged
    with check_ids off — all three serve the id as deleted, and
    compaction clears the rows. No doc_id may be staged in TWO delta
    segments (re-update retires the stale version first).

Deep (``--deep`` — decodes every block's bytes, the expensive pass):
  * varint/delta doc_ids decode to exactly `count` strictly-increasing
    ids with decoded[0] == first_doc and decoded[-1] == last_doc;
    scores_bin decodes to `count` float32s whose max/min equal the
    block's max_score/min_score bit-for-bit.

Returns {"ok": bool, "checks": [{check, tier, status, detail}...]}
where status is ok|warn|fail; "ok" is False iff any check failed.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import indexer as IX
from .compression import decode_scores, delta_decode, varint_decode

_BLOCKS_SCHEMA = IX.BLOCKS_SCHEMA + ", term_bucket int"


def _tier_blocks(spark: SparkSession, tier_dir: str) -> DataFrame:
    return spark.read.schema(_BLOCKS_SCHEMA).parquet(
        os.path.join(tier_dir, "blocks")
    )


def _deep_verify(it):
    """mapInPandas kernel: per-block byte-level verification."""
    for pdf in it:
        bad_n = bad_mono = bad_ends = bad_scores = 0
        for _, row in pdf.iterrows():
            c = int(row["count"])
            try:
                ids = delta_decode(varint_decode(row["doc_ids_bin"]))
                if len(ids) != c or len(ids) == 0:
                    bad_n += 1
                    continue
            except Exception:  # torn/truncated bytes ARE the finding
                bad_n += 1
                continue
            # elementwise compare, NOT np.diff: uint64 diff of a
            # DECREASING pair wraps to a huge positive and passes >0
            if len(ids) > 1 and not (ids[1:] > ids[:-1]).all():
                bad_mono += 1
            if ids[0] != row["first_doc"] or ids[-1] != row["last_doc"]:
                bad_ends += 1
            try:
                sc = decode_scores(row["scores_bin"])
                if len(sc) != c or (
                    len(sc)
                    and (
                        np.float32(sc.max()) != np.float32(row["max_score"])
                        or np.float32(sc.min())
                        != np.float32(row["min_score"])
                    )
                ):
                    bad_scores += 1
            except Exception:  # e.g. length not a multiple of 4
                bad_scores += 1
        yield pd.DataFrame(
            {
                "blocks": [len(pdf)],
                "bad_count": [bad_n],
                "bad_monotonic": [bad_mono],
                "bad_endpoints": [bad_ends],
                "bad_scores": [bad_scores],
            }
        )


def fsck_index(
    spark: SparkSession, index_path: str, deep: bool = False
) -> dict:
    checks: list[dict] = []

    def add(check: str, tier: str, status: str, detail: str = "") -> None:
        checks.append(
            {"check": check, "tier": tier, "status": status,
             "detail": detail}
        )

    def gate(check: str, tier: str, ok: bool, detail: str = "") -> None:
        add(check, tier, "ok" if ok else "fail", detail)

    # ---- files ----
    try:
        meta = IX.load_meta(index_path)
        add("meta_json", "base", "ok")
    except Exception as exc:  # unreadable index: nothing else to check
        add("meta_json", "base", "fail", repr(exc))
        return {"ok": False, "checks": checks}
    manifest = None
    mpath = os.path.join(index_path, "manifest.json")
    if os.path.exists(mpath):
        try:
            with open(mpath) as fh:
                manifest = json.load(fh)
            add("manifest_json", "base", "ok")
        except Exception as exc:
            add("manifest_json", "base", "fail", repr(exc))
    else:
        add("manifest_json", "base", "warn", "missing")

    deltas = IX._delta_dirs(index_path)
    # torn mid-stage segments (no meta.json commit marker): invisible
    # to serving and slot counting — replaying the interrupted
    # add_docs/ingest batch overwrites them in place. Name them here;
    # their contents are not scannable state.
    torn = [
        d for d in IX._delta_dirs(index_path, include_uncommitted=True)
        if d not in deltas
    ]
    for d in torn:
        add(
            "segment_uncommitted", os.path.basename(d), "warn",
            "no meta.json commit marker (torn mid-stage crash; "
            "invisible to serving — replay the add/ingest batch to "
            "heal, or remove the dir)",
        )
    tiers = [("base", index_path)] + [
        (os.path.basename(d), d) for d in deltas
    ]
    for name, d in tiers[1:]:
        missing = [
            sub for sub in ("blocks", "doc_lens", "corpus")
            if not os.path.isdir(os.path.join(d, sub))
        ]
        gate("segment_dirs", name, not missing, ",".join(missing))

    block_size = int(meta.get("block_size", 0) or 0)
    num_buckets = int(meta.get("num_buckets", 1) or 1)
    span = meta.get("wand_shard_span")

    def _scan_tier(name: str, d: str) -> None:
        """One tier's block-metadata (and optional deep) scan;
        raises on torn/corrupt parquet — the caller turns that
        into a failed ``tier_readable`` check."""
        blocks = _tier_blocks(spark, d)
        flags = blocks.select(
            "term",
            "term_bucket",
            "first_doc",
            "last_doc",
            F.col("count").alias("cnt"),
            (F.col("first_doc") > F.col("last_doc")).alias("bad_order"),
            (
                (F.col("count") <= 0)
                | (F.lit(block_size > 0) & (F.col("count") > block_size))
            ).alias("bad_count"),
            (F.col("min_score") > F.col("max_score")).alias("bad_scores"),
            (
                F.col("term_bucket")
                != F.pmod(F.xxhash64(F.col("term")), F.lit(num_buckets))
                .cast("int")
            ).alias("bad_bucket"),
            (
                F.lit(span is not None)
                & (
                    F.floor(F.col("first_doc") / F.lit(span or 1))
                    != F.floor(F.col("last_doc") / F.lit(span or 1))
                )
            ).alias("bad_span"),
        )
        agg = flags.agg(
            F.count("*").alias("n_blocks"),
            F.sum("cnt").alias("n_postings"),
            *[
                F.sum(F.col(c).cast("int")).alias(c)
                for c in ("bad_order", "bad_count", "bad_scores",
                          "bad_bucket", "bad_span")
            ],
        ).collect()[0]
        for c in ("bad_order", "bad_count", "bad_scores", "bad_bucket",
                  "bad_span"):
            gate(f"block_{c[4:]}", name, not agg[c],
                 f"{agg[c]} of {agg['n_blocks']} blocks")

        # per-term block disjointness (offline window; see docstring)
        from pyspark.sql import Window

        w = Window.partitionBy("term").orderBy("first_doc")
        overlaps = (
            flags.select(
                "term", "first_doc", "last_doc",
                F.lag("last_doc").over(w).alias("prev_last"),
            )
            .where(F.col("prev_last") >= F.col("first_doc"))
            .count()
        )
        gate("block_term_disjoint", name, overlaps == 0,
             f"{overlaps} overlapping block pairs")

        # term coverage vs the tier's term_stats
        ts_dir = os.path.join(d, "term_stats")
        if os.path.isdir(ts_dir):
            ts_terms = spark.read.parquet(ts_dir).select("term").distinct()
            uncovered = (
                blocks.select("term").distinct()
                .join(ts_terms, "term", "left_anti").count()
            )
            gate("term_stats_coverage", name, uncovered == 0,
                 f"{uncovered} block terms missing from term_stats")
        else:
            add("term_stats_coverage", name, "fail", "term_stats dir missing")

        if name == "base":
            gate(
                "meta_num_postings", name,
                int(agg["n_postings"] or 0) == int(meta["num_postings"]),
                f"blocks={agg['n_postings']} meta={meta['num_postings']}",
            )
            if manifest is not None and "shards" in manifest:
                actual = {
                    int(r["term_bucket"]): r
                    for r in blocks.groupBy("term_bucket").agg(
                        F.count("*").alias("num_blocks"),
                        F.sum("count").alias("num_postings"),
                        F.countDistinct("term").alias("num_terms"),
                    ).collect()
                }
                bad = []
                for sh in manifest["shards"]:
                    got = actual.pop(int(sh["term_bucket"]), None)
                    if got is None or any(
                        int(got[k]) != int(sh[k])
                        for k in ("num_blocks", "num_postings", "num_terms")
                    ):
                        bad.append(sh["term_bucket"])
                bad.extend(actual)  # buckets on disk absent from manifest
                gate("manifest_shards", name, not bad,
                     f"mismatched buckets: {sorted(bad)[:8]}")

        if deep:
            res = blocks.select(
                "count", "first_doc", "last_doc", "max_score", "min_score",
                "doc_ids_bin", "scores_bin",
            ).mapInPandas(
                _deep_verify,
                "blocks long, bad_count long, bad_monotonic long, "
                "bad_endpoints long, bad_scores long",
            ).groupBy().sum().collect()[0]
            total = res["sum(blocks)"] or 0
            for c in ("bad_count", "bad_monotonic", "bad_endpoints",
                      "bad_scores"):
                gate(f"deep_{c}", name, not res[f"sum({c})"],
                     f"{res[f'sum({c})']} of {total} blocks")

    # ---- per-tier block metadata scan ----
    for name, d in tiers:
        if not os.path.isdir(os.path.join(d, "blocks")):
            # a delta tier already failed segment_dirs above; a BASE
            # tier with no blocks dir is total postings loss
            if name == "base":
                add("segment_dirs", "base", "fail", "blocks dir missing")
            continue
        try:
            _scan_tier(name, d)
        except Exception as exc:
            # a torn parquet file / unreadable shard is exactly the
            # broken state fsck exists to DIAGNOSE — report it as a
            # failed check and keep scanning the other tiers
            add("tier_readable", name, "fail",
                f"{type(exc).__name__}: "
                f"{str(exc).splitlines()[0][:160]}")

    # ---- doc_lens (base) ----
    try:
        dl = spark.read.parquet(os.path.join(index_path, "doc_lens"))
        n_dl, n_dl_distinct = dl.agg(
            F.count("*"), F.countDistinct("doc_id")
        ).collect()[0]
        gate("doc_lens_unique", "base", n_dl == n_dl_distinct,
             f"{n_dl} rows, {n_dl_distinct} distinct ids")
        gate("doc_lens_bounded", "base",
             n_dl <= int(meta["num_documents"]),
             f"{n_dl} rows > meta num_documents {meta['num_documents']}")
    except Exception as exc:
        add("doc_lens_unique", "base", "fail",
            f"unreadable: {type(exc).__name__}")

    # ---- maintenance state ----
    tomb = IX.load_tombstones(spark, index_path)
    upd = IX.load_updated_ids(spark, index_path)
    if upd is not None:
        if tomb is None:
            gate("updated_have_tombstones", "base", False,
                 "updated_ids present but no tombstones at all")
        else:
            n_orphan = upd.join(tomb, "doc_id", "left_anti").count()
            gate("updated_have_tombstones", "base", n_orphan == 0,
                 f"{n_orphan} updated ids without a tombstone "
                 "(fail-closed broken: doc double-serves)")
        staged = None
        unreadable = []
        for d in deltas:
            try:
                part = spark.read.parquet(
                    os.path.join(d, "corpus")
                ).select(
                    F.col(meta.get("doc_id_col", "doc_id")).alias("doc_id")
                )
            except Exception as exc:
                # a missing/torn delta corpus is a reportable broken
                # state, not a crash; segment_dirs above already failed
                # for a missing dir — record and scan the rest
                unreadable.append(
                    f"{os.path.basename(d)}: {type(exc).__name__}"
                )
                continue
            staged = part if staged is None else staged.unionByName(part)
        if unreadable:
            add("delta_corpus_readable", "base", "fail",
                "; ".join(unreadable)[:200])
        if staged is None:
            gate("updated_staged_in_delta", "base", False,
                 "updated_ids present but no readable delta segments")
        else:
            n_staged = upd.join(staged, "doc_id", "left_semi").count()
            n_upd = upd.count()
            gate("updated_staged_in_delta", "base", n_staged == n_upd,
                 f"{n_upd - n_staged} updated ids have no staged delta "
                 "rows (lost update)")

    # ---- cross-tier doc residency ----
    # A postings-bearing doc_id may live in at most ONE tier, except a
    # pending in-place update (base + exactly one delta version, id in
    # updated_ids). Anything else either double-serves (plain add_docs
    # of an id that already exists — the misuse class that also fails
    # the batched term->score map arms loudly) or, if tombstoned, is a
    # silently lost re-add (the standing tombstone masks the new delta
    # rows too; resurrect via update_docs instead). Residency is read
    # from each tier's doc_lens (zero-posting docs have no row and no
    # double-serve risk).
    if deltas:
        try:
            seg_ids = None
            for d in deltas:
                part = (
                    spark.read.parquet(os.path.join(d, "doc_lens"))
                    .select("doc_id")
                    .withColumn("seg", F.lit(os.path.basename(d)))
                )
                seg_ids = (
                    part if seg_ids is None else seg_ids.unionByName(part)
                )
            n_multi = (
                seg_ids.groupBy("doc_id")
                .agg(F.countDistinct("seg").alias("n"))
                .where("n > 1")
                .count()
            )
            gate(
                "delta_dup_residency", "base", n_multi == 0,
                f"{n_multi} doc ids staged in more than one delta "
                "segment (stale version not retired; if merge residue "
                "is present, run maintenance recovery first)",
            )
            try:
                base_ids = spark.read.parquet(
                    os.path.join(index_path, "doc_lens")
                ).select("doc_id")
                both = base_ids.join(
                    seg_ids.select("doc_id").distinct(),
                    "doc_id", "left_semi",
                )
                if upd is not None:
                    both = both.join(upd, "doc_id", "left_anti")
                # tombstoned residue is LEGAL (update→delete, or a
                # fail-closed update crash): every version is masked
                # and compaction clears the rows — warn, don't fail.
                # Only a LIVE base∩delta id double-serves.
                n_dead = 0
                if tomb is not None:
                    n_dead = both.join(tomb, "doc_id", "left_semi").count()
                    both = both.join(tomb, "doc_id", "left_anti")
                n_both = both.count()
                gate(
                    "cross_tier_residency", "base", n_both == 0,
                    f"{n_both} LIVE doc ids resident in base AND a "
                    "delta tier outside updated_ids (double-serve)",
                )
                if n_dead:
                    add(
                        "cross_tier_dead_residue", "base", "warn",
                        f"{n_dead} tombstoned ids with residual delta "
                        "rows (update→delete residue, a fail-closed "
                        "update crash, or a re-add staged with "
                        "check_ids off) — compaction clears them",
                    )
            except Exception as exc:
                add("cross_tier_residency", "base", "fail",
                    f"unreadable base doc_lens: {type(exc).__name__}")
        except Exception as exc:
            add("delta_dup_residency", "base", "fail",
                f"unreadable delta doc_lens: {type(exc).__name__}")

    work = os.path.join(index_path, "work")
    if os.path.isdir(os.path.join(work, "merge_tmp_segment")):
        committed = os.path.exists(os.path.join(work, "merge_commit"))
        add("merge_residue", "base", "warn",
            "merge_tmp_segment present ("
            + ("committed: recovery will finish the swap"
               if committed else "uncommitted: recovery will discard")
            + ")")
    for suffix in (".compact_tmp", ".compact_trash", ".compact_commit"):
        if os.path.exists(index_path.rstrip("/") + suffix):
            add("compact_residue", "base", "warn", suffix)

    ok = all(c["status"] != "fail" for c in checks)
    return {"ok": ok, "checks": checks}
