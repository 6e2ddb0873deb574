"""Learning-to-rank feature extraction + re-ranking (reference R1/R2:
``sea/learning_to_rank/feature_mapping.pyx:10-54``, ``model.py:6-45``,
applied at ``sea/engine.pyx:500-517``).

Feature columns per (query, doc), mirroring the reference's 8-feature
layout (generalized to ``nf`` fields; nf=2 reproduces it exactly):

* ``bm25_f{i}``   — **query-time** BM25 per field: denominator
  ``tf + k * (1 - b + b * len/avg)`` — the *standard* formula, which
  deliberately differs from the index-time B6 normalizer
  (``1 + b + (1-b) * len/avg``); both quirks are reference parity.
* ``len_f{i}``    — post-filter field length.
* ``coverage_f{i}`` — reference quirk: ``matched_terms / num_query_terms``
  added once per matched term per field REGARDLESS of that field's tf
  (``feature_mapping.pyx:39,44``) — so every field's coverage is the
  same number. Reproduced faithfully.
* ``first_pos``   — min first char position over matched terms; -1 when
  no positions (``feature_mapping.pyx:47,52-53``).
* ``similarity``  — semantic cosine (0 for exact-only results).

Spark shape: features are column arithmetic over the matched-postings
frame joined with broadcast term stats — one narrow join per query, no
UDF. The re-ranker is a small numpy MLP applied via ``mapInPandas``
over the top-k rows only (executor-side batch inference; the
``ProcessPoolExecutor`` in the reference's dataset builder is exactly
what Spark replaces — SURVEY.md R6).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def querytime_bm25_col(
    f_idx: int, avg_len: float, k: float, b: float
) -> "F.Column":
    """Standard BM25 for one field (query-time variant, R1)."""
    tf = F.element_at("field_freqs", f_idx + 1).cast("double")
    fl = F.element_at("field_lens", f_idx + 1).cast("double")
    denom = tf + F.lit(k) * (
        F.lit(1.0 - b) + F.lit(b) * fl / F.lit(float(avg_len))
    )
    return F.when(
        denom > 0, F.col("idf") * tf * F.lit(k + 1.0) / denom
    ).otherwise(F.lit(0.0))


def feature_frame(
    matched: DataFrame,
    num_query_terms: int,
    num_fields: int,
    avg_field_lengths: list[float],
    k: float = 1.5,
    bs: list[float] | None = None,
    similarity: DataFrame | None = None,
    universe: DataFrame | None = None,
    doc_lens: DataFrame | None = None,
    weight_col: str | None = None,
    group_cols: tuple[str, ...] = ("doc_id",),
    nq_col: str | None = None,
) -> DataFrame:
    """``matched``: one row per (doc_id, term) with ``field_freqs``,
    ``field_lens``, ``positions``, ``idf``. Returns one row per doc_id
    with the R1 feature columns.

    ``weight_col`` (optional int/double column on ``matched``) multiplies
    each row's bm25 and coverage contribution — the reference's hybrid
    ``merge_postings`` concatenates the exact and the semantic posting's
    token lists for docs found by BOTH paths (``sea/posting_list.pyx:
    7-21``), so ``get_features`` counts every matched term twice for
    those docs; weight=2 reproduces that exactly (2·x == x+x in IEEE).

    ``universe`` (doc_id frame) extends the output to docs that match no
    query term at all (semantic-only hits): their bm25/coverage are 0,
    first_pos is -1, and field lengths come from ``doc_lens`` (the
    ``indexer`` side table) — mirroring ``simulate_search_result``'s
    zero-token feature rows (``sea/engine.pyx:225-277``,
    ``feature_mapping.pyx:28-53``).

    ``group_cols``/``nq_col`` generalize to the BATCHED multi-query
    path (``engine.ltr_features_batch``): group by (query_id, doc_id)
    with a per-row query-token-count column instead of the scalar.
    ``universe``/``similarity`` extension is single-query-only."""
    if group_cols != ("doc_id",) and (
        universe is not None or similarity is not None
    ):
        raise ValueError(
            "universe/similarity extension is single-query-only"
        )
    bs = bs or [0.75] * num_fields
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    per_term = matched.select(
        *group_cols,
        *([nq_col] if nq_col else []),
        *[
            (querytime_bm25_col(i, avg_field_lengths[i], k, bs[i]) * w).alias(
                f"_bm25_{i}"
            )
            for i in range(num_fields)
        ],
        *[
            F.element_at("field_lens", i + 1).alias(f"_len_{i}")
            for i in range(num_fields)
        ],
        F.when(
            F.size("positions") > 0, F.element_at("positions", 1)
        ).alias("_first_pos"),
        w.alias("_w"),
    )
    nq = float(max(num_query_terms, 1))
    nq_expr = (
        F.first(F.col(nq_col).cast("double")) if nq_col else F.lit(nq)
    )
    agg = per_term.groupBy(*group_cols).agg(
        *[F.sum(f"_bm25_{i}").alias(f"bm25_f{i}") for i in range(num_fields)],
        *[F.first(f"_len_{i}").alias(f"len_f{i}") for i in range(num_fields)],
        (F.sum("_w") / nq_expr).alias("_coverage"),
        F.min("_first_pos").alias("_first_pos_min"),
    )
    out = agg.select(
        *group_cols,
        *[F.col(f"bm25_f{i}") for i in range(num_fields)],
        *[F.col(f"len_f{i}").cast("double").alias(f"len_f{i}") for i in range(num_fields)],
        *[
            F.col("_coverage").alias(f"coverage_f{i}")
            for i in range(num_fields)
        ],
        F.coalesce(F.col("_first_pos_min"), F.lit(-1))
        .cast("double")
        .alias("first_pos"),
    )
    if universe is not None:
        out = universe.select("doc_id").join(out, "doc_id", "left")
        if doc_lens is not None:
            out = out.join(F.broadcast(doc_lens), "doc_id", "left")
        fills = []
        for i in range(num_fields):
            fallback = (
                F.col(f"fl_{i}").cast("double")
                if doc_lens is not None
                else F.lit(None).cast("double")
            )
            fills.append(
                F.coalesce(F.col(f"len_f{i}"), fallback, F.lit(0.0)).alias(
                    f"len_f{i}"
                )
            )
        out = out.select(
            "doc_id",
            *[
                F.coalesce(F.col(f"bm25_f{i}"), F.lit(0.0)).alias(f"bm25_f{i}")
                for i in range(num_fields)
            ],
            *fills,
            *[
                F.coalesce(F.col(f"coverage_f{i}"), F.lit(0.0)).alias(
                    f"coverage_f{i}"
                )
                for i in range(num_fields)
            ],
            F.coalesce(F.col("first_pos"), F.lit(-1.0)).alias("first_pos"),
        )
    if similarity is not None:
        out = out.join(F.broadcast(similarity), "doc_id", "left").withColumn(
            "similarity", F.coalesce(F.col("similarity"), F.lit(0.0))
        )
    else:
        out = out.withColumn("similarity", F.lit(0.0))
    return out


FEATURE_ORDER_2F = [
    "bm25_f0", "bm25_f1", "len_f0", "len_f1",
    "coverage_f0", "coverage_f1", "first_pos", "similarity",
]


def feature_order(num_fields: int) -> list[str]:
    """Reference 8-feature layout generalized to ``nf`` fields
    (``feature_mapping.pyx:17-26``; nf=2 reproduces it exactly)."""
    return (
        [f"bm25_f{i}" for i in range(num_fields)]
        + [f"len_f{i}" for i in range(num_fields)]
        + [f"coverage_f{i}" for i in range(num_fields)]
        + ["first_pos", "similarity"]
    )


class ListNetScorer:
    """Numpy mirror of the reference's 3x512 ListNet MLP
    (``sea/learning_to_rank/model.py:6-45``): z-normalize features with
    stored means/stds, then Linear->ReLU x2 -> Linear(1). Weights load
    from an ``.npz`` (keys w0,b0,w1,b1,w2,b2,means,stds); training is
    out of scope in this container (no torch) — the architecture,
    normalization, and inference path are exercised with synthetic
    weights in tests."""

    def __init__(self, weights_path: str):
        if not os.path.exists(weights_path):
            raise FileNotFoundError(weights_path)
        z = np.load(weights_path)
        self.w = [z["w0"], z["w1"], z["w2"]]
        self.b = [z["b0"], z["b1"], z["b2"]]
        self.means = z["means"]
        self.stds = z["stds"]

    def score(self, feats: np.ndarray) -> np.ndarray:
        """Inference with STRICT LEFT-FOLD dot products (per output unit:
        ``(((x0·w0 + x1·w1) + x2·w2) … + b)``), not matmul: BLAS reorders
        the summation, which diverges from the SQL mirror generated by
        ``mlp_score_sql`` in the last ulp. Left folds make the float64
        result bit-identical to the DuckDB/Spark-SQL expression tree —
        the gate's dual-dialect policy (CLAUDE.md invariants). Layers are
        tiny (≤64 units over ≤top-k rows), so the loop cost is nil."""
        x = (feats - self.means) / np.where(self.stds == 0, 1.0, self.stds)
        x = _affine_leftfold(x, self.w[0], self.b[0], relu=True)
        x = _affine_leftfold(x, self.w[1], self.b[1], relu=True)
        return _affine_leftfold(x, self.w[2], self.b[2], relu=False).reshape(-1)


def _affine_leftfold(
    x: np.ndarray, w: np.ndarray, b: np.ndarray, relu: bool
) -> np.ndarray:
    """Per-unit strict left fold, vectorized over rows (each element's
    additions happen in the same IEEE order as the generated SQL)."""
    cols = []
    for j in range(w.shape[1]):
        acc = x[:, 0] * w[0, j]
        for i in range(1, w.shape[0]):
            acc = acc + x[:, i] * w[i, j]
        acc = acc + b[j]
        cols.append(np.maximum(acc, 0.0) if relu else acc)
    return np.stack(cols, axis=1)


def _lit(v: float) -> str:
    """Exact double literal for SQL: repr() round-trips the float64 and
    the CAST keeps DuckDB from parsing it as DECIMAL."""
    return f"CAST({float(v)!r} AS DOUBLE)"


def mlp_score_sql(weights: dict, feature_exprs: list[str]) -> str:
    """One SQL expression computing ``ListNetScorer.score`` over per-row
    feature expressions — valid in BOTH Spark SQL and DuckDB (only
    arithmetic + ``greatest``), bit-identical to the numpy left-fold
    scorer by construction. ``weights``: w0,b0,w1,b1,w2,b2,means,stds
    (arrays / nested lists)."""
    import numpy as np  # noqa: F811 — local for nested-list inputs

    w = {k_: np.asarray(v, dtype=np.float64) for k_, v in weights.items()}
    stds = np.where(w["stds"] == 0, 1.0, w["stds"])
    z = [
        f"((({e}) - {_lit(m)}) / {_lit(s)})"
        for e, m, s in zip(feature_exprs, w["means"], stds)
    ]

    def layer(inputs: list[str], wm, bv, relu: bool) -> list[str]:
        outs = []
        for j in range(wm.shape[1]):
            acc = f"(({inputs[0]}) * {_lit(wm[0, j])})"
            for i in range(1, wm.shape[0]):
                acc = f"({acc} + (({inputs[i]}) * {_lit(wm[i, j])}))"
            acc = f"({acc} + {_lit(bv[j])})"
            outs.append(
                f"greatest(CAST(0.0 AS DOUBLE), {acc})" if relu else acc
            )
        return outs

    h = layer(z, w["w0"], w["b0"], relu=True)
    h = layer(h, w["w1"], w["b1"], relu=True)
    return layer(h, w["w2"], w["b2"], relu=False)[0]


def train_listnet(
    feature_groups: list["np.ndarray"],
    label_groups: list["np.ndarray"],
    hidden: int = 64,
    epochs: int = 60,
    lr: float = 0.01,
    seed: int = 5,
    weights_path: str | None = None,
) -> dict:
    """Numpy ListNet training (reference:
    ``sea/learning_to_rank/train.py`` + ``model.py`` — torch is not in
    this container, so the same architecture/loss run on numpy; the
    reference itself trains single-node, so there is nothing to
    distribute here — R6's *feature extraction* is the Spark part).

    ListNet top-1 loss per query group: CE(softmax(labels), softmax(f(x))).
    Features are z-normalized with stats from the training set (stored
    with the weights, as the reference stores means/stds). Returns
    {"losses": [...], "weights": dict}; optionally saves an ``.npz``
    loadable by ``ListNetScorer``."""
    import numpy as np

    x_all = np.concatenate(feature_groups)
    means = x_all.mean(axis=0)
    stds = x_all.std(axis=0)
    stds = np.where(stds == 0, 1.0, stds)
    d = x_all.shape[1]

    rng = np.random.default_rng(seed)
    w0 = rng.normal(0, np.sqrt(2.0 / d), size=(d, hidden))
    b0 = np.zeros(hidden)
    w1 = rng.normal(0, np.sqrt(2.0 / hidden), size=(hidden, hidden))
    b1 = np.zeros(hidden)
    w2 = rng.normal(0, np.sqrt(2.0 / hidden), size=(hidden, 1))
    b2 = np.zeros(1)

    def softmax(v: "np.ndarray") -> "np.ndarray":
        e = np.exp(v - v.max())
        return e / e.sum()

    losses = []
    for _ in range(epochs):
        total = 0.0
        for feats, labels in zip(feature_groups, label_groups):
            x = (feats - means) / stds
            h0 = x @ w0 + b0
            a0 = np.maximum(h0, 0.0)
            h1 = a0 @ w1 + b1
            a1 = np.maximum(h1, 0.0)
            s = (a1 @ w2 + b2).reshape(-1)
            p = softmax(s)
            y = softmax(labels.astype(np.float64))
            total += float(-(y * np.log(p + 1e-12)).sum())
            # backprop of CE(softmax) -> ds = p - y
            ds = (p - y).reshape(-1, 1)
            gw2 = a1.T @ ds
            gb2 = ds.sum(axis=0)
            da1 = ds @ w2.T
            dh1 = da1 * (h1 > 0)
            gw1 = a0.T @ dh1
            gb1 = dh1.sum(axis=0)
            da0 = dh1 @ w1.T
            dh0 = da0 * (h0 > 0)
            gw0 = x.T @ dh0
            gb0 = dh0.sum(axis=0)
            w2 -= lr * gw2
            b2 -= lr * gb2
            w1 -= lr * gw1
            b1 -= lr * gb1
            w0 -= lr * gw0
            b0 -= lr * gb0
        losses.append(total / max(len(feature_groups), 1))

    weights = {
        "w0": w0, "b0": b0, "w1": w1, "b1": b1, "w2": w2, "b2": b2,
        "means": means, "stds": stds,
    }
    if weights_path:
        np.savez(weights_path, **weights)
    return {"losses": losses, "weights": weights}


# ------------------------------------------------ ranking-quality metrics
#
# numpy ports of the reference's evaluation metrics
# (``sea/learning_to_rank/train.py:29-72`` — dcgs_at_k / ndcg_at_k /
# mrr_at_k): exponential gains 2^rel - 1, log2(rank+1) discounts,
# idcg + 1e-8 guard, and MRR's "first hit of the max relevance" rule.


def dcg_at_k(pred: "np.ndarray", rel: "np.ndarray", k: int) -> float:
    """DCG@k of one query group: docs ordered by ``pred`` descending
    (stable — ties keep input order, the deterministic analog of the
    reference's torch.sort)."""
    k = min(k, len(pred))
    order = np.argsort(-np.asarray(pred, dtype=np.float64), kind="stable")[:k]
    gains = 2.0 ** np.asarray(rel, dtype=np.float64)[order] - 1.0
    discounts = np.log2(np.arange(1, k + 1, dtype=np.float64) + 1.0)
    return float((gains / discounts).sum())


def ndcg_at_k(pred: "np.ndarray", rel: "np.ndarray", k: int) -> float:
    """NDCG@k of one query group (reference ``train.py:46-53``)."""
    rel = np.asarray(rel, dtype=np.float64)
    return dcg_at_k(pred, rel, k) / (dcg_at_k(rel, rel, k) + 1e-8)


def mrr_at_k(pred: "np.ndarray", rel: "np.ndarray", k: int) -> float:
    """MRR@k of one query group: reciprocal rank of the first top-k
    position holding the group's MAX relevance, 0 if none
    (reference ``train.py:56-72``)."""
    rel = np.asarray(rel, dtype=np.float64)
    k = min(k, len(pred))
    order = np.argsort(-np.asarray(pred, dtype=np.float64), kind="stable")[:k]
    hits = rel[order] == rel.max()
    idx = np.flatnonzero(hits)
    return float(1.0 / (idx[0] + 1.0)) if idx.size else 0.0


def mean_metric(metric, pred_groups, rel_groups, k: int) -> float:
    """Mean of a per-group metric over query groups (the reference
    averages over the batch dimension)."""
    vals = [metric(p, r, k) for p, r in zip(pred_groups, rel_groups)]
    return float(np.mean(vals)) if vals else 0.0


def rerank(
    features: DataFrame,
    weights_path: str,
    feature_order: list[str],
) -> DataFrame:
    """(doc_id, ltr_score) via Arrow-batched executor-side inference."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = ListNetScorer(weights_path)  # once per task
        for pdf in it:
            feats = pdf[feature_order].to_numpy(dtype=np.float64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "ltr_score": scorer.score(feats),
                }
            )

    return features.mapInPandas(batches, "doc_id long, ltr_score double")
