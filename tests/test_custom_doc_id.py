"""Surfaces on an index whose source id column is NOT named doc_id
(``build_index(..., doc_id_col=...)``): tokenize_postings always emits
the id as a literal ``doc_id`` column, but several serving surfaces
join back to the SOURCE corpus (which keeps its own column name) —
percolate and export_matches crashed on such indexes until round 5."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators.indexer import build_index

IDX = "/tmp/spark_sea_test_custom_id_idx"
CORPUS = "/tmp/spark_sea_test_custom_id_corpus.parquet"


@pytest.fixture(scope="module")
def custom_engine(spark):
    rows = [
        (100, "spark joins data fast", "en"),
        (101, "slow data scan", "en"),
        (102, "nothing relevant here", "de"),
        (103, "spark shuffles data", "de"),
        (104, "window order by clause", "en"),
    ]
    docs = spark.createDataFrame(rows, "id long, text string, lang string")
    shutil.rmtree(CORPUS, ignore_errors=True)
    docs.write.mode("overwrite").parquet(CORPUS)
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(
        spark,
        spark.read.parquet(CORPUS),
        IDX,
        fields=["text"],
        doc_id_col="id",
        analyzer="simple",
        num_buckets=4,
        corpus_path=CORPUS,
    )
    return SearchEngine(spark, IDX, cache=False)


def test_search_on_custom_id_index(custom_engine):
    got = [r["doc_id"] for r in custom_engine.search("spark", 10).collect()]
    assert sorted(got) == [100, 103]


def test_percolate_custom_id(spark, custom_engine):
    """Every percolate arm keys on tokenize_postings' literal doc_id
    output column, whatever the index's source id column is called —
    term plans, the phrase window, and the mixed-tree lazy-algebra
    arm (including a NOT that survives to the top level)."""
    batch = spark.createDataFrame(
        [
            (7, "spark joins data"),
            (8, "slow scan"),
            (9, "window order by"),
        ],
        "id long, text string",
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in custom_engine.percolate(
            {
                "t1": "spark",
                "t2": "data and not slow",
                "ph": '"window order"',
                "mix": "spark or not scan",  # OR(+,-): scan \ spark
            },
            batch,
        ).collect()
    }
    assert got == {
        ("t1", 7),
        ("t2", 7),
        ("ph", 9),
        ("mix", 8),  # scan without spark (lazy algebra, flag discarded)
    }


def test_export_matches_custom_id(spark, custom_engine, tmp_path):
    """export_matches joins current_corpus() (source column name) to
    the scored frame (literal doc_id) — both the predicate semi-join
    and the with_text join must align the names."""
    out = str(tmp_path / "export")
    n = custom_engine.export_matches(
        "data", out, with_text=True, predicate=F.col("lang") == "en"
    )
    rows = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    assert n == len(rows) == 2
    assert rows == {
        100: "spark joins data fast",
        101: "slow data scan",
    }
    # text joined from the corpus, scores from the index, no crash on
    # the unfiltered path either
    n_all = custom_engine.export_matches("data", out, with_text=False)
    assert n_all == 3


def test_assert_sha_ok_reports_custom_id_column(spark):
    """assert_sha_ok on a materialized frame whose id column is NOT
    doc_id (custom --doc-id-col indexes keep the corpus name): the
    violation must surface as the intended ValueError naming the ids,
    not a KeyError on a missing doc_id field."""
    bad = spark.createDataFrame(
        [(7, "text", False)], "id long, text string, sha_ok boolean"
    )
    with pytest.raises(ValueError, match="content_sha256"):
        SearchEngine.assert_sha_ok(bad)


def test_dedup_store_delete_any_id_column(spark, tmp_path):
    """dedup_store_delete accepts any single-column id frame (the
    ivf_delete contract), not only one literally named doc_id."""
    from cs_search_engine_architecture_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"some shared prefix text variant {i}") for i in range(6)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "store")
    dedup.build_dedup_store(docs, store)
    ids = spark.createDataFrame([(3,)], "custom_name long")
    dedup.dedup_store_delete(spark, store, ids)
    tomb = spark.read.parquet(os.path.join(store, "tombstones"))
    assert [r["doc_id"] for r in tomb.collect()] == [3]
