"""Block-max single-term top-k must be exactly rank-identical to the
naive full-decode path (scores AND tie-broken order), for rare, mid,
and hot (salted) terms, and for k beyond the posting-list length."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators.indexer import build_index
from cs_search_engine_architecture_spark.sources.corpus import synth_source_files

IDX = "/tmp/spark_sea_test_blockmax_idx"


@pytest.fixture(scope="module")
def engine(spark):
    shutil.rmtree(IDX, ignore_errors=True)
    corpus = synth_source_files(spark, 4000, parallelism=8)
    build_index(
        spark, corpus, IDX, fields=["path", "content"],
        analyzer="reference", num_buckets=8, block_size=32,
        hot_df=256, group_span=256,  # force salting + many blocks
        corpus_path="synth:4000",
    )
    return SearchEngine(spark, IDX)


def _naive_topk(engine, term, k):
    return [
        (r["doc_id"], r["score"])
        for r in engine.search_df(term)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    ]


def _blockmax_topk(engine, term, k):
    # engine.search parses (analyzer stemming included) then routes a
    # 1-token AST through the block-max path
    return [
        (r["doc_id"], r["score"]) for r in engine.search(term, k).collect()
    ]


@pytest.mark.parametrize("term", ["index", "spark", "data", "merge", "2024"])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_blockmax_equals_naive(engine, term, k):
    assert _blockmax_topk(engine, term, k) == _naive_topk(engine, term, k)


def test_blockmax_k_exceeds_postings(engine):
    # a rare term: k far beyond df returns every posting, same order
    stats = {
        r["term"]: r["df"] for r in engine.term_stats().orderBy("df").limit(5).collect()
    }
    term = min(stats, key=stats.get)
    naive = [
        (r["doc_id"], r["score"])
        for r in engine._topk_single_term(term, 10_000).collect()
    ]
    full = [
        (r["doc_id"], r["score"])
        for r in engine.compiler._leaf(term)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]
    assert naive == full
    assert len(full) == stats[term]


def test_blockmax_missing_term(engine):
    assert _blockmax_topk(engine, "zzzzunseen", 10) == []


def test_search_routes_single_token_through_blockmax(engine):
    # engine.search on a 1-token query must produce the identical result
    got = engine.search_collect("spark", 15)
    want = [
        (r["doc_id"], float(__import__("numpy").float32(r["score"])))
        for r in engine.search_df("spark")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(15)
        .collect()
    ]
    assert got == want


def test_blockmax_prunes_blocks(spark, engine):
    """The skip must actually skip: for a mid-frequency term the final
    phase must decode fewer blocks than exist for the term."""
    # pick a mid-frequency INDEX term (index terms are stemmed)
    mid = (
        engine.term_stats()
        .where((F.col("df") > 200) & (F.col("df") < 2000))
        .orderBy("term")
        .limit(1)
        .collect()
    )
    term = mid[0]["term"]
    tb = engine.blocks.where(F.col("term") == term)
    total = tb.count()
    meta = sorted(
        tb.select("count", "max_score").collect(),
        key=lambda r: -r["max_score"],
    )
    cum, cut = 0, meta[-1]["max_score"]
    for r in meta:
        cum += r["count"]
        if cum >= 10:
            cut = r["max_score"]
            break
    cand_blocks = tb.where(F.col("max_score") >= cut).count()
    assert cand_blocks < total  # candidate phase reads a strict subset


def test_bounded_meta_collect_identical(spark):
    """With META_COLLECT_CAP forced below the hot term's block count,
    the driver holds at most cap metadata rows and the top-k is still
    exact (phase 2 filters the FULL block set distributively)."""
    ref = SearchEngine(spark, IDX)
    want = _blockmax_topk(ref, "index", 10)

    capped = SearchEngine(spark, IDX)
    capped.META_COLLECT_CAP = 4
    got = _blockmax_topk(capped, "index", 10)
    assert got == want
    rows, was_capped = capped._block_meta_cache[
        list(capped._block_meta_cache)[0]
    ]
    assert was_capped and len(rows) <= 4
    # uncapped engine has far more blocks for the same term
    n_blocks = ref.blocks.where(F.col("term") == list(
        capped._block_meta_cache
    )[0]).count()
    assert n_blocks > 4
