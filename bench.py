"""Benchmark harness (driver-run per round; also usable standalone).

Builds two indexes and times the headline operations:

1. synthetic source-code corpus (input_hint shape, Zipfian + hot terms,
   scaled by the sf of $SPARK_GRAFT_SF_DIR) -> reference-analyzer index
   build -> postings/sec;
2. the driver ``documents`` fixture -> gate (simple-analyzer) index ->
   boolean/phrase/top-k query latencies through the full compile path.

Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}``
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cs_search_engine_architecture_spark.engine import SearchEngine  # noqa: E402
from cs_search_engine_architecture_spark.operators.indexer import build_index  # noqa: E402
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402
from cs_search_engine_architecture_spark.sources.corpus import (  # noqa: E402
    synth_source_files,
)

QUERIES = [
    ("q_single", "spark"),
    ("q_and", "spark and data"),
    ("q_or", "spark or data"),
    ("q_and_not", "data and not slow"),
    ("q_bool_mix", 'spark and (data or "hash join") not slow'),
    ("q_phrase", '"window order"'),
    ("q_hot_and", "index and data"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="spark-sea-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict = {"cpus": int(cpus)}
    work = "/tmp/spark_sea_bench"
    shutil.rmtree(work, ignore_errors=True)

    # -- 1. synthetic source-code corpus build (the headline metric)
    num_docs = max(20_000, int(1_200_000 * sf))
    corpus = synth_source_files(spark, num_docs).persist()
    corpus.count()  # materialize generation outside the timed region
    # warmup build: JIT, codegen caches, and Python-worker stemmer tables
    # warm up outside the timed region (steady-state throughput is the
    # comparable number — the reference's 695 docs/s is steady-state too)
    build_index(
        spark,
        corpus.limit(2000),
        os.path.join(work, "warm_idx"),
        fields=["path", "content"],
        analyzer="reference",
    )
    t0 = time.time()
    meta = build_index(
        spark,
        corpus,
        os.path.join(work, "code_idx"),
        fields=["path", "content"],
        analyzer="reference",
        corpus_path=f"synthetic:{num_docs}",
    )
    t_build = time.time() - t0
    timings["index_build_code"] = round(t_build, 3)
    extras["num_docs"] = num_docs
    extras["num_postings"] = meta["num_postings"]
    extras["postings_per_sec"] = round(meta["num_postings"] / t_build)
    extras["docs_per_sec"] = round(num_docs / t_build)
    corpus.unpersist()

    # query latency on the code index (reference analyzer)
    code_eng = SearchEngine(spark, os.path.join(work, "code_idx"))
    code_eng.search_collect("spark", 10)  # warm block cache
    t0 = time.time()
    code_eng.search_collect("index and data and spark", 10)
    timings["q_code_hot_and"] = round(time.time() - t0, 3)
    t0 = time.time()
    code_eng.search_collect('posting and not (merge or "delta block")', 10)
    timings["q_code_bool_phrase"] = round(time.time() - t0, 3)
    t0 = time.time()
    code_eng.search_collect("index or spark or data", 10)  # WAND path
    timings["q_code_wand_or"] = round(time.time() - t0, 3)
    extras["wand_strategy"] = code_eng.last_strategy

    # WAND survives a pending in-place update (round-5): the kernel runs
    # over base blocks, the delta arm unions in — strategy stays wand_*
    from cs_search_engine_architecture_spark.operators.indexer import (
        update_docs as _update_docs,
    )

    upd_code = os.path.join(work, "code_idx_upd")
    shutil.copytree(os.path.join(work, "code_idx"), upd_code)
    _update_docs(
        spark,
        upd_code,
        spark.createDataFrame(
            [(0, "bench/updated.py", "updated spark index data content")],
            "doc_id long, path string, content string",
        ),
    )
    uceng = SearchEngine(spark, upd_code)
    uceng.search_collect("spark", 5)  # warm
    t0 = time.time()
    uceng.search_collect("index or spark or data", 10)
    timings["q_code_wand_or_updated"] = round(time.time() - t0, 3)
    extras["wand_updated_strategy"] = uceng.last_strategy

    # -- 2. documents fixture: gate index + query set
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.time()
    build_index(
        spark,
        docs,
        os.path.join(work, "docs_idx"),
        fields=["text"],
        analyzer="simple",
        num_buckets=8,
        corpus_path=os.path.join(sf_dir, "documents.parquet"),
    )
    timings["index_build_docs"] = round(time.time() - t0, 3)

    eng = SearchEngine(spark, os.path.join(work, "docs_idx"))
    eng.search_collect("spark", 5)  # warm
    for name, q in QUERIES:
        t0 = time.time()
        eng.search_collect(q, 10)
        timings[name] = round(time.time() - t0, 3)

    # positional proximity (ordered slop) and boosted disjunction —
    # the round-5 serving extensions, on the same warm index
    t0 = time.time()
    eng.proximity_search("window order", 30, top_k=10).collect()
    timings["q_proximity"] = round(time.time() - t0, 3)
    t0 = time.time()
    eng.boosted_search({"spark": 2.0, "data": 0.5}, top_k=10).collect()
    timings["q_boosted"] = round(time.time() - t0, 3)

    # batched multi-query: the whole QUERIES list in ONE job (shared
    # postings scan + one shuffle) — compare against the sum of the
    # individual latencies above
    t0 = time.time()
    eng.msearch({name: q for name, q in QUERIES}, top_k=10).collect()
    timings["q_msearch_batch"] = round(time.time() - t0, 3)

    # pure join-batchable batch of 16: the amortization headline (one
    # shared scan; measured 3.3x over sequential at sf0.1, widening
    # with batch size)
    terms16 = [
        "spark", "data", "slow", "fast", "hash", "join", "index", "query",
        "merge", "sort", "key", "value", "table", "row", "column", "disk",
    ]
    batch16 = {
        f"b{i}": (
            f"{terms16[i]} or {terms16[(i + 3) % 16]}"
            if i % 2 == 0
            else f"{terms16[i]} and {terms16[(i + 3) % 16]}"
        )
        for i in range(16)
    }
    t0 = time.time()
    eng.msearch(batch16, top_k=10).collect()
    timings["q_msearch_batch16"] = round(time.time() - t0, 3)

    # batched pure-phrase serving: 8 phrase queries from ONE shared
    # positional scan (was: per-query compiled fallback plans)
    phrases8 = {
        f"p{i}": q
        for i, q in enumerate([
            '"window order"', '"hash join"', '"table scan"', '"sort merge"',
            '"key value"', '"batch stream"', '"row column"', '"data flow"',
        ])
    }
    t0 = time.time()
    eng.msearch(phrases8, top_k=10).collect()
    timings["q_msearch_phrase8"] = round(time.time() - t0, 3)

    # batched mixed-precedence serving: 16 term-only boolean trees from
    # ONE shared term->score map aggregation with the lazy-NOT algebra
    # evaluated column-side (was: 16 per-query compiled join plans;
    # interleaved A/B measured 7.7x — BENCH/BASELINE.md session-9)
    mwords = ["data", "slow", "fast", "hash", "join", "index", "query",
              "merge", "sort", "key", "value", "table", "row", "column"]
    mixed16 = {}
    for i in range(16):
        a, b, c, d = (mwords[(i + j) % 14] for j in (0, 3, 7, 11))
        mixed16[f"x{i}"] = [
            f"{a} and ({b} or {c})",
            f"{a} or not {b}",
            f"{a} and ({b} or {c}) not {d}",
            f"({a} or {b}) and ({c} or not {d})",
        ][i % 4]
    t0 = time.time()
    eng.msearch(mixed16, top_k=10).collect()
    timings["q_msearch_mixed16"] = round(time.time() - t0, 3)

    # serving under PENDING in-place updates: fast paths + batching stay
    # on (masked over-fetch ∪ delta resurrection arm) — compare
    # q_single_updated / q_msearch_batch16_updated against their
    # clean-index twins above
    from cs_search_engine_architecture_spark.operators.indexer import (
        update_docs,
    )

    upd_idx = os.path.join(work, "docs_idx_upd")
    if os.path.exists(upd_idx):
        shutil.rmtree(upd_idx)
    shutil.copytree(os.path.join(work, "docs_idx"), upd_idx)
    update_docs(
        spark,
        upd_idx,
        spark.createDataFrame(
            [(0, "updated spark data text for the serving benchmark")],
            "doc_id long, text string",
        ),
    )
    ueng = SearchEngine(spark, upd_idx)
    ueng.search_collect("spark", 5)  # warm
    t0 = time.time()
    ueng.search_collect("spark", 10)
    timings["q_single_updated"] = round(time.time() - t0, 3)
    t0 = time.time()
    ueng.msearch(batch16, top_k=10).collect()
    timings["q_msearch_batch16_updated"] = round(time.time() - t0, 3)

    # -- 3. training-pipeline ops over the documents + embeddings fixtures
    from cs_search_engine_architecture_spark.operators import (  # noqa: E402
        dedup,
        similarity,
        text_analysis,
    )

    t0 = time.time()
    dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs)).count()
    timings["dedup_minhash_lsh"] = round(time.time() - t0, 3)
    t0 = time.time()
    dedup.simhash(docs).count()
    timings["dedup_simhash"] = round(time.time() - t0, 3)
    t0 = time.time()
    text_analysis.fingerprints(docs).count()
    timings["fingerprint"] = round(time.time() - t0, 3)
    # feature-hash embedding production (the former 64-wide conditional
    # pivot broke whole-stage codegen and ran interpreted; the
    # narrow-then-assemble shape stays compiled)
    t0 = time.time()
    text_analysis.hash_embeddings(docs).count()
    timings["hash_embeddings"] = round(time.time() - t0, 3)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    t0 = time.time()
    similarity.brute_force_topk(emb, qvec, 10).collect()
    timings["ann_brute_force"] = round(time.time() - t0, 3)
    t0 = time.time()
    similarity.lsh_topk(emb, qvec, 10).collect()
    timings["ann_lsh"] = round(time.time() - t0, 3)
    q8, q8n = similarity.quantize_query(qvec)
    qemb = similarity.quantize_embeddings(emb)
    t0 = time.time()
    similarity.quantized_cosine_topk(qemb, q8, q8n, 10).collect()
    timings["ann_quantized"] = round(time.time() - t0, 3)

    # persisted-IVF probe (build outside the timed region — it is a
    # write-time cost like the index build)
    ivf_path = os.path.join(work, "ivf_idx")
    cents = similarity.fixed_vec_centroids(emb, 16)
    similarity.build_ivf_index(emb, ivf_path, cents)
    t0 = time.time()
    similarity.ivf_search(spark, ivf_path, qvec, k=10, n_probe=4).collect()
    timings["ann_ivf_probe"] = round(time.time() - t0, 3)

    # embedding near-dup via banded-LSH candidates + cosine verify
    t0 = time.time()
    dedup.embedding_dup_pairs_bucketed(emb, min_cosine=0.4).count()
    timings["dedup_embedding_lsh"] = round(time.time() - t0, 3)

    # incremental ingest-time dedup: store built once (write-time cost,
    # untimed like the index build); the timed probe is ONE streamed
    # pass of a ~1% batch's broadcast bands over the persisted store
    dstore = os.path.join(work, "dedup_store")
    dedup.build_dedup_store(docs, dstore)
    dbatch = docs.where("doc_id % 101 = 0")
    t0 = time.time()
    dedup.incremental_dup_pairs(spark, dstore, dbatch).count()
    timings["dedup_incr_probe"] = round(time.time() - t0, 3)

    # reverse search: 200 registered standing queries (mixed OR/AND +
    # 4 phrases) percolated against the whole fixture in one pass —
    # cost scales with the batch tokenize + ONE broadcast-join agg,
    # not with the query count
    from cs_search_engine_architecture_spark.operators import (  # noqa: E402
        percolate as _pc,
    )

    terms_pc = [
        "spark", "data", "slow", "fast", "hash", "join", "index", "query",
        "merge", "sort", "key", "value", "table", "row", "column", "disk",
    ]
    perc_qs = {
        f"s{i}": (
            f"{terms_pc[i % 16]} or {terms_pc[(i + 5) % 16]}"
            if i % 2 == 0
            else f"{terms_pc[i % 16]} and {terms_pc[(i + 5) % 16]}"
        )
        for i in range(196)
    }
    perc_qs.update({
        "ph1": '"window order"', "ph2": '"hash join"',
        "ph3": '"table scan"', "ph4": '"sort merge"',
    })
    t0 = time.time()
    _pc.percolate(spark, perc_qs, docs, analyzer="simple").count()
    timings["percolate_200q"] = round(time.time() - t0, 3)

    # 40 mixed-precedence boolean trees (the lazy-NOT presence arm) —
    # ALL evaluated from ONE shared matched-term-set aggregation: cost
    # is the tokenize pass + one shuffle, not 40 aggregations
    mixed_qs = {}
    for i in range(40):
        a, b, c, d = (terms_pc[(i + j) % 16] for j in (0, 3, 7, 11))
        mixed_qs[f"x{i}"] = [
            f"{a} and ({b} or {c})",
            f"{a} or not {b}",
            f"{a} and ({b} or {c}) not {d}",
            f"({a} or {b}) and ({c} or not {d})",
        ][i % 4]
    t0 = time.time()
    _pc.percolate(spark, mixed_qs, docs, analyzer="simple").count()
    timings["percolate_mixed40"] = round(time.time() - t0, 3)

    # span-level substring dedup (Lee et al. duplicate W-gram spans):
    # detection + keep-first removal over the whole fixture, one number
    # (the two stages share the ranked-occurrence frame's lineage)
    from cs_search_engine_architecture_spark.operators import (  # noqa: E402
        sketches as _sk,
        spans as _sp,
    )

    t0 = time.time()
    # sum over text + counts: a bare count() lets Catalyst eliminate
    # the unique-key left join and skip the whole removal branch
    _sp.remove_duplicate_spans(docs, 8).selectExpr(
        "sum(length(text))", "sum(n_tokens_removed)"
    ).collect()
    timings["dedup_spans"] = round(time.time() - t0, 3)
    t0 = time.time()
    _sk.approx_distinct(
        _sp.gram_occurrences(docs, 8), "gram_hash", 256
    ).collect()
    timings["cardinality_sketch"] = round(time.time() - t0, 3)

    # training-set tail: global token-budget cut (quality-ordered
    # two-phase prefix sum) + deterministic epoch-shard materialization
    from pyspark.sql import functions as F  # noqa: E402

    from cs_search_engine_architecture_spark.operators import (  # noqa: E402
        curation as _cu,
    )

    scored = text_analysis.token_counts(docs).select(
        "doc_id", F.col("bpe_pieces").alias("n_tokens")
    ).join(
        text_analysis.quality_scores(docs).withColumn(
            "quality_score", text_analysis.quality_score_col()
        ).select("doc_id", "quality_score"),
        "doc_id",
    )
    half_budget = 27 * docs.count()  # ~half the corpus's bpe tokens
    t0 = time.time()
    _cu.select_token_budget(scored, half_budget).count()
    timings["token_budget_select"] = round(time.time() - t0, 3)
    t0 = time.time()
    _cu.write_training_shards(
        docs, os.path.join(work, "shards"), seed=7, num_shards=32
    )
    timings["epoch_shard_write"] = round(time.time() - t0, 3)
    # semantic diversity capping: per-LSH-bucket top-k over embeddings
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        emb = spark.read.parquet(emb_path)
        t0 = time.time()
        _cu.diversity_cap(
            scored.select("doc_id", "quality_score"), emb, 3, num_planes=8
        ).count()
        timings["diversity_cap"] = round(time.time() - t0, 3)

    # decontamination + perplexity-filter scoring over the fixture docs
    from cs_search_engine_architecture_spark.operators import lm  # noqa: E402

    t0 = time.time()
    dedup.decontaminate(docs, docs.where("doc_id % 100 = 3"), n=5).count()
    timings["decontaminate"] = round(time.time() - t0, 3)
    t0 = time.time()
    lm.xent_scores(docs).count()
    timings["lm_xent"] = round(time.time() - t0, 3)

    # BPE training: serial one-merge-per-round vs batched
    # non-overlapping merges (same merge list, fewer driver rounds)
    from cs_search_engine_architecture_spark.operators import bpe  # noqa: E402

    t0 = time.time()
    serial_merges = bpe.train_bpe(docs, 10)
    timings["bpe_train_serial10"] = round(time.time() - t0, 3)
    t0 = time.time()
    batched_merges, bpe_rounds = bpe.train_bpe_batched(docs, 10, batch_k=8)
    timings["bpe_train_batched10"] = round(time.time() - t0, 3)
    assert batched_merges == serial_merges
    extras["bpe_batched_rounds"] = bpe_rounds

    # reference-parity hybrid with ListNet rerank (end to end)
    import numpy as np

    from cs_search_engine_architecture_spark import gate as _gate

    wpath = os.path.join(work, "mlp.npz")
    np.savez(
        wpath,
        **{
            k_: np.array(v, dtype=np.float64)
            for k_, v in _gate.GATE_MLP_WEIGHTS.items()
        },
    )
    t0 = time.time()
    eng.combined_search(
        "spark or data", emb, qvec, top_k=15, pre_select_k=10,
        ltr_weights=wpath,
    ).collect()
    timings["q_hybrid_ltr"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
