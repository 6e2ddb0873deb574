"""Checkpoint-resumable index build (north rule): crash-resume skips
completed slices, and the resumed index is identical to a one-shot
build."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators.indexer import (
    build_index,
    build_index_resumable,
)

SF_DIR = "/root/testdata/sf0.001"
BASE = "/tmp/spark_sea_test_resume"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_resume_after_simulated_crash(spark, docs):
    shutil.rmtree(BASE, ignore_errors=True)
    one_shot = os.path.join(BASE, "one_shot")
    resumed = os.path.join(BASE, "resumed")

    meta_a = build_index(
        spark, docs, one_shot, fields=["text"], analyzer="simple",
        num_buckets=8, corpus_path="docs",
    )

    # phase A interrupted after 2 of 4 slices
    r = build_index_resumable(
        spark, docs, resumed, fields=["text"], num_slices=4, max_slices=2,
        analyzer="simple", num_buckets=8, corpus_path="docs",
    )
    assert r is None
    ckpt_dir = os.path.join(resumed, "work", "checkpoints")
    assert len(os.listdir(ckpt_dir)) == 2
    assert not os.path.exists(os.path.join(resumed, "meta.json"))

    # restart: completed slices must be skipped (checkpoint mtimes stay)
    mtimes_before = {
        f: os.path.getmtime(os.path.join(ckpt_dir, f))
        for f in os.listdir(ckpt_dir)
    }
    meta_b = build_index_resumable(
        spark, docs, resumed, fields=["text"], num_slices=4,
        analyzer="simple", num_buckets=8, corpus_path="docs",
    )
    for f, mt in mtimes_before.items():
        assert os.path.getmtime(os.path.join(ckpt_dir, f)) == mt

    # identical corpus-level stats
    assert meta_b["num_documents"] == meta_a["num_documents"]
    assert meta_b["num_postings"] == meta_a["num_postings"]
    assert meta_b["avg_field_lengths"] == meta_a["avg_field_lengths"]

    # identical query results (scores AND ranks)
    ea = SearchEngine(spark, one_shot, cache=False)
    eb = SearchEngine(spark, resumed, cache=False)
    for q in ["spark", "spark and data", 'data or "hash join"', "data and not slow"]:
        assert ea.search_collect(q, 20) == eb.search_collect(q, 20), q


def test_checkpoint_lineage_contents(spark, docs):
    resumed = os.path.join(BASE, "resumed")  # built by previous test
    meta = json.load(open(os.path.join(resumed, "meta.json")))
    assert meta["resumable"] is True and meta["num_slices"] == 4
    cks = meta["slice_checkpoints"]
    assert [c["slice"] for c in cks] == [0, 1, 2, 3]
    assert sum(c["num_docs"] for c in cks) == meta["num_documents"]
    assert sum(c["num_postings"] for c in cks) == meta["num_postings"]
    for c in cks:
        assert c["postings_per_sec"] > 0
        assert c["predicate"].startswith("pmod(doc_id, 4) = ")
        assert c["analyzer"] == "simple" and c["fields"] == ["text"]


def test_idempotent_rerun(spark, docs):
    resumed = os.path.join(BASE, "resumed")
    meta1 = json.load(open(os.path.join(resumed, "meta.json")))
    meta2 = build_index_resumable(
        spark, docs, resumed, fields=["text"], num_slices=4,
        analyzer="simple", num_buckets=8, corpus_path="docs",
    )
    assert meta2["num_postings"] == meta1["num_postings"]
    eng = SearchEngine(spark, resumed, cache=False)
    assert len(eng.search_collect("spark", 5)) == 5
