"""R2/R4 reference parity: ListNet-reranked exact search and hybrid
combined search (Spark engine vs the pure-Python oracle), plus the
ranking-quality metrics (NDCG@k / MRR@k, reference
``sea/learning_to_rank/train.py:29-72``) and a trained-beats-baseline
demonstration."""

import numpy as np
import pytest

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators import indexer, ltr
from cs_search_engine_architecture_spark.operators.similarity import (
    cosine_scores,
)
from cs_search_engine_architecture_spark.oracle.reference import OracleIndex

DOCS = [
    (0, ["spark shuffle", "spark makes the shuffle fast and wide."]),
    (1, ["hash join", "the hash join beats merge join on small tables."]),
    (2, ["merge join", "sorted merge join shines for big sorted runs."]),
    (3, ["query planner", "the planner picks hash join or merge join."]),
    (4, ["spark planner", "spark planner prefers broadcast hash join."]),
    (5, ["", "a shuffle heavy query with skewed keys and salt."]),
    (6, ["tokenizer", "running tests on the tokenizer with utf8str 2024."]),
    (7, ["phrase docs", "delta gap varint blocks compress posting lists."]),
    (8, ["delta", "delta encoding then gap then varint in order."]),
    (9, ["spark spark", "spark spark spark repeated for term frequency."]),
]

DIMS = 8


def _embedding(doc_id: int) -> list[float]:
    """Deterministic per-doc vector (no external data)."""
    rng = np.random.default_rng(100 + doc_id)
    return [float(x) for x in rng.normal(0, 1, DIMS)]


QVEC = [float(x) for x in np.random.default_rng(42).normal(0, 1, DIMS)]


@pytest.fixture(scope="module")
def weights_path(tmp_path_factory):
    """Deterministic 8->4->4->1 MLP (2-field index => 8 features)."""
    d, h = 8, 4
    w = {
        "w0": np.array(
            [[(((i * 7 + j * 3) % 11) - 5) / 8.0 for j in range(h)] for i in range(d)]
        ),
        "b0": np.array([(j - 1.5) / 4.0 for j in range(h)]),
        "w1": np.array(
            [[(((i * 5 + j * 7) % 9) - 4) / 8.0 for j in range(h)] for i in range(h)]
        ),
        "b1": np.array([(j - 2) / 8.0 for j in range(h)]),
        "w2": np.array([[((j * 3) % 5 - 2) / 4.0] for j in range(h)]),
        "b2": np.array([0.125]),
        "means": np.array([1.0, 1.0, 4.0, 8.0, 0.5, 0.5, 16.0, 0.25]),
        "stds": np.array([2.0, 2.0, 4.0, 8.0, 0.5, 0.5, 32.0, 0.5]),
    }
    path = str(tmp_path_factory.mktemp("ltrw") / "mlp.npz")
    np.savez(path, **w)
    return path


@pytest.fixture(scope="module")
def eng_oracle(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ltr_index"))
    corpus = spark.createDataFrame(
        [(d, f[0], f[1]) for d, f in DOCS], "doc_id long, title string, body string"
    )
    indexer.build_index(
        spark, corpus, out, fields=["title", "body"], block_size=3, num_buckets=4
    )
    return SearchEngine(spark, out), OracleIndex(DOCS)


@pytest.fixture(scope="module")
def emb_and_sims(spark):
    emb = spark.createDataFrame(
        [(d, _embedding(d)) for d, _ in DOCS], "vec_id long, embedding array<float>"
    )
    # the oracle consumes the SAME float32-cast cosines the engine ranks
    # by, so both sides pick identical semantic top-ks
    sims = {
        r["id"]: r["cos"] for r in cosine_scores(emb, QVEC).collect()
    }
    return emb, sims


@pytest.mark.parametrize("query", ["spark or join", "join", "spark and shuffle"])
def test_exact_ltr_parity(eng_oracle, weights_path, query):
    engine, oracle = eng_oracle
    scorer = ltr.ListNetScorer(weights_path)
    got = [
        (r["doc_id"], r["ltr_score"])
        for r in engine.search(
            query, top_k=5, ltr_enabled=True, ltr_weights=weights_path,
            pre_select_k=8,
        ).collect()
    ]
    want = oracle.exact_search_ltr(query, scorer.score, pre_select_k=8, top_k=5)
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), gd


@pytest.mark.parametrize("query", ["spark or join", "shuffle or delta"])
def test_combined_ltr_parity(eng_oracle, emb_and_sims, weights_path, query):
    engine, oracle = eng_oracle
    emb, sims = emb_and_sims
    scorer = ltr.ListNetScorer(weights_path)
    out = engine.combined_search(
        query, emb, QVEC, top_k=6, pre_select_k=4, sem_k=4,
        ltr_weights=weights_path,
    ).collect()
    got = [(r["doc_id"], r["ltr_score"], r["provenance"]) for r in out]
    want = oracle.combined_search(
        query, sims, scorer.score, exact_k=4, sem_k=4, top_k=6
    )
    assert [(d, p) for d, _, p in got] == [(d, p) for d, _, p in want], (
        got,
        want,
    )
    for (gd, gs, _), (_, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6), gd
    # the union must contain semantic-only docs (on-the-fly features)
    assert any(p == "semantic" for _, _, p in got)


def test_combined_union_double_count(eng_oracle, emb_and_sims, weights_path):
    """Docs found by BOTH paths get weight-2 features (the reference's
    merge_postings concatenation quirk)."""
    engine, _ = eng_oracle
    emb, _ = emb_and_sims
    union = engine._hybrid_union("spark or join", emb, QVEC, 10, 10, "vec_id")
    feats = engine.hybrid_features("spark or join", union).collect()
    by_doc = {r["doc_id"]: r for r in feats}
    prov = {r["doc_id"]: r["provenance"] for r in union.collect()}
    solo = engine.ltr_features("spark or join").collect()
    solo_by_doc = {r["doc_id"]: r for r in solo}
    checked = 0
    for d, p in prov.items():
        if p == "both" and d in solo_by_doc:
            assert by_doc[d]["bm25_f0"] == pytest.approx(
                2.0 * solo_by_doc[d]["bm25_f0"]
            )
            assert by_doc[d]["coverage_f0"] == pytest.approx(
                2.0 * solo_by_doc[d]["coverage_f0"]
            )
            checked += 1
    assert checked > 0, "fixture produced no 'both' docs"


def test_combined_search_ann(eng_oracle, emb_and_sims, weights_path, tmp_path):
    """ANN-served hybrid: the semantic arm comes from a persisted
    partition-pruned index; union/rerank semantics match the exact-scan
    hybrid restricted to the ANN candidate set."""
    from cs_search_engine_architecture_spark.operators import similarity

    engine, _ = eng_oracle
    emb, _ = emb_and_sims
    cents = similarity.kmeans_centroids(emb, num_centroids=4, sample=100)
    ivf_path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, ivf_path, cents)

    out = engine.combined_search_ann(
        "spark or join", ivf_path, QVEC, top_k=6, pre_select_k=4, sem_k=4,
        ltr_weights=weights_path, ann_kind="ivf", n_probe=len(cents),
    ).collect()
    assert {r["provenance"] for r in out} <= {"both", "exact", "semantic"}
    # full probe == exact semantic arm -> identical to combined_search
    want = engine.combined_search(
        "spark or join", emb, QVEC, top_k=6, pre_select_k=4, sem_k=4,
        ltr_weights=weights_path,
    ).collect()
    assert [(r["doc_id"], r["ltr_score"], r["provenance"]) for r in out] == [
        (r["doc_id"], r["ltr_score"], r["provenance"]) for r in want
    ]


# ------------------------------------------------------- metrics


def test_ndcg_hand_computed():
    # rel in predicted order: [3, 2, 0] -> DCG = 7/1 + 3/log2(3) + 0
    pred = np.array([0.9, 0.5, 0.1])
    rel = np.array([3.0, 2.0, 0.0])
    dcg = 7.0 + 3.0 / np.log2(3.0)
    assert ltr.dcg_at_k(pred, rel, 3) == pytest.approx(dcg)
    assert ltr.ndcg_at_k(pred, rel, 3) == pytest.approx(1.0, abs=1e-6)
    # swap the top two predictions
    pred2 = np.array([0.5, 0.9, 0.1])
    dcg2 = 3.0 + 7.0 / np.log2(3.0)
    assert ltr.dcg_at_k(pred2, rel, 3) == pytest.approx(dcg2)
    assert ltr.ndcg_at_k(pred2, rel, 3) == pytest.approx(dcg2 / (dcg + 1e-8))
    # k truncation
    assert ltr.dcg_at_k(pred2, rel, 1) == pytest.approx(3.0)


def test_mrr_hand_computed():
    rel = np.array([0.0, 1.0, 2.0, 1.0])
    # best doc (rel 2) predicted at rank 3 -> RR = 1/3
    pred = np.array([0.9, 0.8, 0.7, 0.1])
    assert ltr.mrr_at_k(pred, rel, 4) == pytest.approx(1.0 / 3.0)
    # best doc outside top-2 -> 0
    assert ltr.mrr_at_k(pred, rel, 2) == 0.0
    # best doc first -> 1
    pred2 = np.array([0.1, 0.2, 0.9, 0.3])
    assert ltr.mrr_at_k(pred2, rel, 4) == pytest.approx(1.0)


def test_trained_listnet_beats_bm25_baseline():
    """Synthetic signal where relevance follows similarity (feature 7)
    while BM25 (feature 0) is noise: training must lift NDCG@10 over the
    BM25-order baseline."""
    rng = np.random.default_rng(3)
    groups_x, groups_y = [], []
    for _ in range(12):
        n = 10
        sim = rng.random(n)
        bm25 = rng.random(n)
        x = np.zeros((n, 8))
        x[:, 0] = bm25
        x[:, 7] = sim
        y = (sim * 3).round()  # graded relevance from similarity
        groups_x.append(x)
        groups_y.append(y)
    res = ltr.train_listnet(groups_x, groups_y, hidden=16, epochs=80, lr=0.05)
    w = res["weights"]

    def score(x):
        z = (x - w["means"]) / np.where(w["stds"] == 0, 1, w["stds"])
        h = np.maximum(z @ w["w0"] + w["b0"], 0)
        h = np.maximum(h @ w["w1"] + w["b1"], 0)
        return (h @ w["w2"] + w["b2"]).reshape(-1)

    trained = ltr.mean_metric(
        ltr.ndcg_at_k, [score(x) for x in groups_x], groups_y, 10
    )
    baseline = ltr.mean_metric(
        ltr.ndcg_at_k, [x[:, 0] for x in groups_x], groups_y, 10
    )
    assert res["losses"][-1] < res["losses"][0]
    assert trained > baseline + 0.05, (trained, baseline)
    assert trained > 0.9


def test_derived_label_eval_trained_beats_bm25(spark):
    """Non-synthetic signal: queries sampled from the fixture corpus,
    candidates from the engine's own two-arm retrieval, labels from
    bigram containment (order-sensitive text overlap, not a BM25
    function). The trained ListNet must beat the BM25-feature ordering
    on NDCG@10 — on this tiny-vocabulary corpus every idf is negative,
    so BM25 order is a provably weak ranker and the re-ranker's lift
    is large (the full sf0.1 numbers live in BENCH/ltr_eval.json)."""
    from cs_search_engine_architecture_spark import gate
    from cs_search_engine_architecture_spark.operators import ltr_eval

    sf = "/root/testdata/sf0.001"
    eng = gate.gate_engine(spark, sf)
    docs = spark.read.parquet(sf + "/documents.parquet")
    res = ltr_eval.evaluate(
        eng, docs, num_queries=6, retrieve_k=15, epochs=40, hidden=16
    )
    assert res["num_queries"] >= 4
    assert res["final_loss"] < res["first_loss"]  # it learned
    tr = res["train"]
    assert tr["ndcg10_ltr"] > tr["ndcg10_bm25"] + 0.2, tr
    assert tr["ndcg10_ltr"] > 0.5, tr


def test_ltr_features_batch_matches_sequential(spark):
    """One shared-scan job for N queries == the per-query feature frames
    exactly (same arithmetic, same rows; only the execution batches)."""
    from cs_search_engine_architecture_spark import gate

    eng = gate.gate_engine(spark, "/root/testdata/sf0.001")
    queries = {"a": "spark or data", "b": "table and row", "c": "spark"}
    cols = ltr.feature_order(eng.meta["num_fields"])
    batch = {}
    for r in eng.ltr_features_batch(queries).collect():
        batch.setdefault(r["query_id"], {})[r["doc_id"]] = tuple(
            r[c] for c in cols
        )
    for qid, q in queries.items():
        seq = {
            r["doc_id"]: tuple(r[c] for c in cols)
            for r in eng.ltr_features(q).collect()
        }
        assert batch.get(qid, {}) == seq, qid


def test_search_ltr_candidates_frame(eng_oracle, weights_path):
    """search_ltr(candidates=...) — the filter-context composition arm
    the serve REPL uses — re-ranks a caller-supplied (doc_id, score)
    frame identically to the default BM25 retrieval when given the
    same candidate set."""
    engine, _ = eng_oracle
    query = "spark or join"
    default = [
        (r["doc_id"], r["ltr_score"])
        for r in engine.search_ltr(
            query, top_k=5, pre_select_k=8, ltr_weights=weights_path
        ).collect()
    ]
    cand = engine.search(query, 8)
    via_cand = [
        (r["doc_id"], r["ltr_score"])
        for r in engine.search_ltr(
            query, top_k=5, ltr_weights=weights_path, candidates=cand
        ).collect()
    ]
    assert via_cand == default
