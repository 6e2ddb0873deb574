"""Round-5 vector-serving extensions: MMR diversified top-k and
predicate-filtered vector search (pre-filter semantics over the
embedding table and over persisted ANN/IVF indexes with baked-in
meta columns)."""

import random
import shutil

import pytest

from cs_search_engine_architecture_spark.operators import similarity as SIM


def _emb(spark, n=200, seed=7, dims=64, langs=("en", "de")):
    rng = random.Random(seed)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dims)], langs[i % len(langs)])
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, lang string"
    )


# ------------------------------------------------------------- MMR

def test_mmr_lambda_one_is_cosine_topk(spark):
    rows, emb = _emb(spark, n=120)
    qvec = rows[3][1]
    exact = [
        (r["id"], r["cos"])
        for r in SIM.brute_force_topk(emb, qvec, k=8).collect()
    ]
    mmr = SIM.mmr_rerank(emb, qvec, k=8, candidate_k=30, lam=1.0).collect()
    assert [(r["id"], r["cos"]) for r in mmr] == exact
    assert [r["rank"] for r in mmr] == list(range(1, 9))
    # lam=1.0: mmr score for later picks is 1.0*rel - 0*redundancy = rel
    assert all(abs(r["mmr"] - r["cos"]) < 1e-12 for r in mmr)


def test_mmr_demotes_near_duplicate(spark):
    # a and b are near-identical and most relevant; c is moderately
    # relevant but diverse. Pure cosine ranks (a, b, c); MMR at
    # lam=0.5 must pick a, then prefer c over the redundant b.
    rows = [
        (1, [0.9, 0.1, 0.0, 0.0]),           # a: cos(q,a)~0.994
        (2, [0.9, 0.11, 0.0, 0.0]),          # b: near-dup of a (~0.993)
        (3, [0.8, -0.6, 0.0, 0.0]),          # c: diverse, cos(q,c)=0.8
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qvec = [1.0, 0.0, 0.0, 0.0]
    plain = [r["id"] for r in SIM.brute_force_topk(emb, qvec, k=3).collect()]
    assert plain == [1, 2, 3]
    mmr = [
        r["id"]
        for r in SIM.mmr_rerank(emb, qvec, k=3, lam=0.5).collect()
    ]
    assert mmr == [1, 3, 2]


def test_mmr_tie_breaks_to_lower_id(spark):
    rows = [
        (7, [1.0, 0.0]),
        (4, [1.0, 0.0]),  # identical vector, lower id
        (9, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        r["id"]
        for r in SIM.mmr_rerank(emb, [1.0, 0.0], k=3, lam=0.4).collect()
    ]
    # first pick: cos tie between 4 and 7 -> lower id 4; second: the
    # orthogonal 9 (7 is fully redundant with 4: 0.4*1-0.6*1 < 0);
    # last: 7
    assert got == [4, 9, 7]
    # at lam=0.5 the two remaining MMR scores tie at exactly 0 — the
    # deterministic id tie-break must pick 7
    tie = [
        r["id"]
        for r in SIM.mmr_rerank(emb, [1.0, 0.0], k=3, lam=0.5).collect()
    ]
    assert tie == [4, 7, 9]


def test_mmr_empty_and_fewer_than_k(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert SIM.mmr_rerank(emb, [1.0, 0.0], k=5).collect() == []
    emb2 = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = SIM.mmr_rerank(emb2, [1.0, 0.0], k=5, lam=0.5).collect()
    assert [r["id"] for r in got] == [1, 2]
    assert [r["rank"] for r in got] == [1, 2]


def test_engine_semantic_mmr_matches_semantic_search(spark, tmp_path):
    from cs_search_engine_architecture_spark.engine import SearchEngine
    from cs_search_engine_architecture_spark.operators.indexer import (
        build_index,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i} spark data") for i in range(30)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, fields=["text"], analyzer="simple",
                num_buckets=4)
    eng = SearchEngine(spark, idx)
    rows, emb = _emb(spark, n=30, seed=3)
    qvec = rows[0][1]
    plain = [
        (r["doc_id"], r["similarity"])
        for r in eng.semantic_search(emb, qvec, top_k=6).collect()
    ]
    mmr = eng.semantic_search_mmr(
        emb, qvec, top_k=6, candidate_k=12, lam=1.0
    ).collect()
    assert [(r["doc_id"], r["similarity"]) for r in mmr] == plain
    assert mmr[0].asDict().keys() == {
        "doc_id", "similarity", "mmr", "rank"
    }


# ------------------------------------------- predicate-filtered search

def test_brute_force_predicate_is_prefilter(spark):
    rows, emb = _emb(spark, n=150, seed=11)
    qvec = rows[2][1]
    got = SIM.brute_force_topk(emb, qvec, k=5, predicate="lang = 'en'")
    want = SIM.brute_force_topk(emb.where("lang = 'en'"), qvec, k=5)
    assert [(r["id"], r["cos"]) for r in got.collect()] == [
        (r["id"], r["cos"]) for r in want.collect()
    ]
    # exactly k admitted hits — pre-filter can't starve the page
    assert got.count() == 5


def test_ann_index_meta_cols_filtered_probe(spark):
    rows, emb = _emb(spark, n=250, seed=13)
    path = "/tmp/spark_sea_test_ann_meta"
    shutil.rmtree(path, ignore_errors=True)
    SIM.build_ann_index(emb, path, meta_cols=["lang"])
    qvec = rows[8][1]
    got = [
        (r["id"], r["cos"])
        for r in SIM.ann_search(
            spark, path, qvec, k=5, predicate="lang = 'de'"
        ).collect()
    ]
    want = [
        (r["id"], r["cos"])
        for r in SIM.lsh_topk(
            emb, qvec, k=5, predicate="lang = 'de'"
        ).collect()
    ]
    assert got == want
    assert all(i % 2 == 1 for i, _ in got)  # de = odd vec_ids
    # unfiltered probe on the meta-bearing index: unchanged semantics
    base = [
        (r["id"], r["cos"])
        for r in SIM.ann_search(spark, path, qvec, k=5).collect()
    ]
    adhoc = [
        (r["id"], r["cos"]) for r in SIM.lsh_topk(emb, qvec, k=5).collect()
    ]
    assert base == adhoc


def test_ivf_meta_cols_filtered_probe_and_add(spark, tmp_path):
    rows, emb = _emb(spark, n=200, seed=17)
    cents = SIM.kmeans_centroids(emb, num_centroids=6, sample=200)
    path = str(tmp_path / "ivf_meta")
    SIM.build_ivf_index(emb, path, cents, meta_cols=["lang"])
    qvec = rows[4][1]
    # full probe + predicate == exact filtered brute force
    got = [
        (r["id"], r["cos"])
        for r in SIM.ivf_search(
            spark, path, qvec, k=5, n_probe=len(cents),
            predicate="lang = 'en'",
        ).collect()
    ]
    want = [
        (r["id"], r["cos"])
        for r in SIM.brute_force_topk(
            emb, qvec, k=5, predicate="lang = 'en'"
        ).collect()
    ]
    assert got == want

    # append carries the meta columns automatically
    new_rows, new_emb = _emb(spark, n=10, seed=23)
    new_emb = new_emb.selectExpr(
        "vec_id + 1000 as vec_id", "embedding", "'fr' as lang"
    )
    SIM.ivf_add(spark, path, new_emb)
    fr = SIM.ivf_search(
        spark, path, qvec, k=20, n_probe=len(cents), predicate="lang = 'fr'"
    ).collect()
    assert len(fr) == 10
    assert all(r["id"] >= 1000 for r in fr)

    # an append missing the baked meta column fails loudly
    bare = new_emb.select("vec_id", "embedding")
    with pytest.raises(ValueError, match="meta"):
        SIM.ivf_add(spark, path, bare)


def test_quantized_ivf_meta_cols_filtered_probe(spark, tmp_path):
    rows, emb = _emb(spark, n=150, seed=29)
    cents = SIM.kmeans_centroids(emb, num_centroids=4, sample=150)
    path = str(tmp_path / "ivf_qmeta")
    SIM.build_ivf_index_quantized(emb, path, cents, meta_cols=["lang"])
    qvec = rows[6][1]
    got = SIM.ivf_search_quantized(
        spark, path, qvec, k=5, n_probe=4, predicate="lang = 'de'"
    ).collect()
    # the filtered probe returns only admitted ids, in the full
    # probe's relative order restricted to them
    full = SIM.ivf_search_quantized(
        spark, path, qvec, k=150, n_probe=4
    ).collect()
    want = [(r["id"], r["cos"]) for r in full if r["id"] % 2 == 1][:5]
    assert [(r["id"], r["cos"]) for r in got] == want


def test_engine_semantic_search_predicate(spark, tmp_path):
    from cs_search_engine_architecture_spark.engine import SearchEngine
    from cs_search_engine_architecture_spark.operators.indexer import (
        build_index,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i} spark data") for i in range(40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx2")
    build_index(spark, docs, idx, fields=["text"], analyzer="simple",
                num_buckets=4)
    eng = SearchEngine(spark, idx)
    rows, emb = _emb(spark, n=40, seed=31)
    qvec = rows[1][1]
    got = [
        (r["doc_id"], r["similarity"])
        for r in eng.semantic_search(
            emb, qvec, top_k=5, predicate="lang = 'en'"
        ).collect()
    ]
    want = [
        (r["id"], r["cos"])
        for r in SIM.brute_force_topk(
            emb.where("lang = 'en'"), qvec, k=5
        ).collect()
    ]
    assert got == want


# ----------------------------------------------- filtered hybrid search

def _hybrid_fixture(spark, tmp_path, n=40):
    from cs_search_engine_architecture_spark.engine import SearchEngine
    from cs_search_engine_architecture_spark.operators.indexer import (
        build_index,
    )

    docs = spark.createDataFrame(
        [
            (i, f"spark data doc {i}" + (" extra spark" if i % 3 == 0 else ""),
             ["en", "de"][i % 2])
            for i in range(n)
        ],
        "doc_id long, text string, lang string",
    )
    idx = str(tmp_path / "hidx")
    build_index(spark, docs, idx, fields=["text"], analyzer="simple",
                num_buckets=4)
    rows, emb = _emb(spark, n=n, seed=41)
    return SearchEngine(spark, idx), docs, rows, emb


def test_filtered_hybrid_is_restriction_of_unfiltered(spark, tmp_path):
    """Filter-context contract: with arms wide enough to avoid
    truncation, the filtered hybrid page == the unfiltered hybrid
    ranking restricted to the admitted docs (scores NEVER change under
    a filter)."""
    eng, docs, rows, emb = _hybrid_fixture(spark, tmp_path)
    qvec = rows[2][1]
    big = 100  # > corpus size: no truncation on either arm
    unfiltered = eng.combined_search(
        "spark or data", emb, qvec, top_k=big, pre_select_k=big,
    ).collect()
    want = [
        (r["doc_id"], r["bm25"], r["similarity"], r["score"])
        for r in unfiltered if r["doc_id"] % 2 == 0  # en docs
    ][:5]
    got = eng.combined_search(
        "spark or data", emb, qvec, top_k=5, pre_select_k=big,
        corpus=docs, predicate="lang = 'en'",
    ).collect()
    assert [
        (r["doc_id"], r["bm25"], r["similarity"], r["score"]) for r in got
    ] == want
    # predicate without corpus fails loudly
    with pytest.raises(ValueError, match="corpus"):
        eng.combined_search(
            "spark", emb, qvec, predicate="lang = 'en'"
        ).collect()


def test_filtered_hybrid_rrf_dense_ranks(spark, tmp_path):
    """Filtered RRF assigns DENSE per-arm ranks over the admitted
    candidates (standard filtered-RRF semantics) — reproduced here
    independently from the two filtered arms."""
    eng, docs, rows, emb = _hybrid_fixture(spark, tmp_path)
    qvec = rows[4][1]
    big = 100
    got = eng.combined_search_rrf(
        "spark or data", emb, qvec, top_k=6, pre_select_k=big,
        corpus=docs, predicate="lang = 'de'",
    ).collect()
    assert all(r["doc_id"] % 2 == 1 for r in got)
    # independent expectation: collect both arms, rank them densely
    # over admitted docs, fuse with 1/(60+rank)
    exact = sorted(
        (
            (r["doc_id"], r["score"])
            for r in eng.search_df("spark or data").collect()
            if r["doc_id"] % 2 == 1
        ),
        key=lambda t: (-t[1], t[0]),
    )
    from cs_search_engine_architecture_spark.operators import (
        similarity as SIM_,
    )

    sem = [
        (r["id"], r["cos"])
        for r in SIM_.brute_force_topk(
            emb.where("lang = 'de'"), qvec, k=big
        ).collect()
    ]
    r_exact = {d: i + 1 for i, (d, _) in enumerate(exact)}
    r_sem = {d: i + 1 for i, (d, _) in enumerate(sem)}
    fused = {}
    for d in set(r_exact) | set(r_sem):
        s = 0.0
        if d in r_exact:
            s = 1.0 / (60.0 + r_exact[d])
        if d in r_sem:
            s = s + 1.0 / (60.0 + r_sem[d])
        fused[d] = s
    want = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:6]
    assert [(r["doc_id"], r["score"]) for r in got] == want


def test_filtered_hybrid_ann_matches_exact_filtered(spark, tmp_path):
    """ANN-served filtered hybrid (meta-cols index + ann_predicate)
    with a full probe == the exact filtered hybrid."""
    from cs_search_engine_architecture_spark.operators import (
        similarity as SIM_,
    )

    eng, docs, rows, emb = _hybrid_fixture(spark, tmp_path)
    qvec = rows[1][1]
    emb_doc = emb.selectExpr("vec_id", "embedding", "lang")
    cents = SIM_.kmeans_centroids(emb_doc, num_centroids=4, sample=40)
    path = str(tmp_path / "hivf")
    SIM_.build_ivf_index(emb_doc, path, cents, meta_cols=["lang"])
    got = eng.combined_search_ann(
        "spark or data", path, qvec, top_k=5, pre_select_k=100,
        ann_kind="ivf", n_probe=len(cents),
        corpus=docs, predicate="lang = 'en'", ann_predicate="lang = 'en'",
    ).collect()
    want = eng.combined_search(
        "spark or data", emb, qvec, top_k=5, pre_select_k=100,
        corpus=docs, predicate="lang = 'en'",
    ).collect()
    assert [(r["doc_id"], r["bm25"], r["similarity"]) for r in got] == [
        (r["doc_id"], r["bm25"], r["similarity"]) for r in want
    ]
