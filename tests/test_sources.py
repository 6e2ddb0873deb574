"""Synthetic corpus determinism + scalable doc_id assignment."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.sources.corpus import (
    assign_doc_ids,
    synth_source_files,
)


def test_synth_deterministic_across_parallelism(spark):
    a = synth_source_files(spark, 200, seed=42, parallelism=2).collect()
    b = synth_source_files(spark, 200, seed=42, parallelism=7).collect()
    a = sorted(a, key=lambda r: r["doc_id"])
    b = sorted(b, key=lambda r: r["doc_id"])
    assert a == b
    assert len(a) == 200
    # input_hint schema + invariant column present
    assert set(a[0].asDict()) == {
        "doc_id", "repo", "path", "commit", "lang", "content", "content_sha256",
    }


def test_synth_sha_invariant(spark):
    import hashlib

    rows = synth_source_files(spark, 50, seed=42).collect()
    for r in rows:
        assert (
            hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha256"]
        )


def test_synth_hot_terms(spark):
    from cs_search_engine_architecture_spark.functions.tokenizer import tokenize

    rows = synth_source_files(spark, 300, seed=42).collect()
    hits = sum(1 for r in rows if "spark" in tokenize(r["content"])[0])
    assert hits >= 0.3 * len(rows)  # FIXTURES.md §1: hot terms >=30% of docs


def test_assign_doc_ids_matches_row_number(spark):
    df = synth_source_files(spark, 150, seed=7).drop("doc_id")
    got = assign_doc_ids(df, ["repo", "path", "commit"], num_partitions=5)
    w = Window.orderBy("repo", "path", "commit")
    want = df.withColumn("doc_id", F.row_number().over(w) - 1)
    g = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in got.collect()}
    wnt = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in want.collect()}
    assert g == wnt


def test_assign_doc_ids_dense(spark):
    df = synth_source_files(spark, 97, seed=3).drop("doc_id")
    ids = sorted(
        r["doc_id"]
        for r in assign_doc_ids(df, ["repo", "path", "commit"], 4).collect()
    )
    assert ids == list(range(97))


def test_read_corpus_path_and_table(spark, tmp_path):
    """Table-reference resolver: parquet paths and catalog-resolved
    table names both yield the same frame (the Iceberg entry point at
    cluster scale — a configured catalog table resolves through the
    identical spark.read.table call exercised here via a temp view)."""
    from cs_search_engine_architecture_spark.sources.table import (
        is_path_ref,
        read_corpus,
    )

    df = spark.createDataFrame(
        [(1, "r", "p", "c", "py", "print(1)")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )
    p = str(tmp_path / "corpus.parquet")
    df.write.parquet(p)
    assert is_path_ref(p) and is_path_ref("/x/y") and is_path_ref("s3://b/k")
    assert not is_path_ref("lake.db.code_files")
    got_path = read_corpus(spark, p).collect()
    df.createOrReplaceTempView("corpus_view")
    got_table = read_corpus(spark, "corpus_view").collect()
    assert got_path == got_table == df.collect()
