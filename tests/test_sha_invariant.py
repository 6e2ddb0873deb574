"""North-rule row invariant: materialized results re-verify
sha256(content) against the indexed content_sha256."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators.indexer import build_index
from cs_search_engine_architecture_spark.sources.corpus import synth_source_files

IDX = "/tmp/spark_sea_test_sha_idx"


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_source_files(spark, 1000, parallelism=4).persist()


@pytest.fixture(scope="module")
def engine(spark, corpus):
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(
        spark, corpus, IDX, fields=["path", "content"],
        analyzer="reference", num_buckets=8, corpus_path="synth:1000",
    )
    return SearchEngine(spark, IDX)


def test_sha_ok_on_clean_corpus(engine, corpus):
    top = engine.search("spark and index", 10)
    out = engine.materialize(top, corpus)
    rows = out.collect()
    assert rows and all(r["sha_ok"] for r in rows)
    SearchEngine.assert_sha_ok(out)  # must not raise


def test_sha_violation_detected(engine, corpus):
    # serve from a TAMPERED corpus: content changed after indexing
    tampered = corpus.withColumn(
        "content",
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.col("content"), F.lit("!")))
        .otherwise(F.col("content")),
    )
    top = engine.search("spark and index", 10)
    out = engine.materialize(top, tampered)
    flags = {r["doc_id"]: r["sha_ok"] for r in out.collect()}
    assert any(not ok for ok in flags.values())
    for doc_id, ok in flags.items():
        assert ok == (doc_id % 2 == 1)
    with pytest.raises(ValueError, match="content_sha256 mismatch"):
        SearchEngine.assert_sha_ok(out)


def test_no_sha_column_is_passthrough(engine, corpus):
    plain = corpus.drop("content_sha256")
    out = engine.materialize(engine.search("spark", 5), plain)
    assert "sha_ok" not in out.columns
    SearchEngine.assert_sha_ok(out)  # no-op
