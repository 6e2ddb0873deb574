"""Structured-Streaming incremental ingest: files arriving over time are
tokenized per micro-batch, resume comes from the streaming checkpoint,
and compaction yields an index identical to a one-shot batch build."""

from __future__ import annotations

import os
import shutil

import pytest

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators.indexer import build_index
from cs_search_engine_architecture_spark.streaming.ingest import (
    StreamingIndexer,
    stream_corpus,
)

BASE = "/tmp/spark_sea_test_streaming"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_incremental_ingest_matches_batch_build(spark, docs):
    shutil.rmtree(BASE, ignore_errors=True)
    src = os.path.join(BASE, "incoming")
    os.makedirs(src)

    # wave 1: first half of the corpus "arrives"
    docs.where("doc_id < 250").coalesce(2).write.mode("overwrite").parquet(
        os.path.join(src, "wave1")
    )
    # file-source streams need a flat dir of files; move the parts up
    for part in os.listdir(os.path.join(src, "wave1")):
        if part.endswith(".parquet"):
            os.rename(
                os.path.join(src, "wave1", part), os.path.join(src, f"w1_{part}")
            )
    shutil.rmtree(os.path.join(src, "wave1"))

    idx = os.path.join(BASE, "idx")
    ing = StreamingIndexer(
        spark, idx, fields=["text"], analyzer="simple", num_buckets=8
    )
    ing.ingest_available(stream_corpus(spark, src, SCHEMA))
    n1 = len(ing.batches())
    assert n1 >= 1
    assert sum(b["num_docs"] for b in ing.batches()) == 250

    # wave 2 arrives later; the checkpoint must skip wave-1 files
    docs.where("doc_id >= 250").coalesce(2).write.mode("overwrite").parquet(
        os.path.join(src, "wave2")
    )
    for part in os.listdir(os.path.join(src, "wave2")):
        if part.endswith(".parquet"):
            os.rename(
                os.path.join(src, "wave2", part), os.path.join(src, f"w2_{part}")
            )
    shutil.rmtree(os.path.join(src, "wave2"))

    ing.ingest_available(stream_corpus(spark, src, SCHEMA))
    batches = ing.batches()
    assert sum(b["num_docs"] for b in batches) == 500  # no reprocessing
    for b in batches:
        assert b["num_postings"] > 0 and b["postings_per_sec"] > 0

    meta = ing.compact()
    assert meta["streaming"] is True
    assert meta["num_documents"] == 500

    # rank-identical to the one-shot batch build on the same corpus
    ref_idx = os.path.join(BASE, "ref_idx")
    ref_meta = build_index(
        spark, docs, ref_idx, fields=["text"], analyzer="simple", num_buckets=8
    )
    assert meta["num_postings"] == ref_meta["num_postings"]
    ea = SearchEngine(spark, ref_idx, cache=False)
    eb = SearchEngine(spark, idx, cache=False)
    for q in ["spark", "spark and data", "data or window", "data and not slow"]:
        assert ea.search_collect(q, 20) == eb.search_collect(q, 20), q


def test_compact_is_rerunnable(spark):
    idx = os.path.join(BASE, "idx")
    ing = StreamingIndexer(
        spark, idx, fields=["text"], analyzer="simple", num_buckets=8
    )
    meta = ing.compact()
    assert meta["num_documents"] == 500
    eng = SearchEngine(spark, idx, cache=False)
    assert len(eng.search_collect("spark", 5)) == 5
