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
) -> DataFrame:
    """``matched``: one row per (doc_id, term) with ``field_freqs``,
    ``field_lens``, ``positions``, ``idf``. Returns one row per doc_id
    with the R1 feature columns."""
    bs = bs or [0.75] * num_fields
    per_term = matched.select(
        "doc_id",
        *[
            querytime_bm25_col(i, avg_field_lengths[i], k, bs[i]).alias(
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
    )
    nq = float(max(num_query_terms, 1))
    agg = per_term.groupBy("doc_id").agg(
        *[F.sum(f"_bm25_{i}").alias(f"bm25_f{i}") for i in range(num_fields)],
        *[F.first(f"_len_{i}").alias(f"len_f{i}") for i in range(num_fields)],
        (F.count(F.lit(1)) / F.lit(nq)).alias("_coverage"),
        F.min("_first_pos").alias("_first_pos_min"),
    )
    out = agg.select(
        "doc_id",
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
    if similarity is not None:
        out = out.join(similarity, "doc_id", "left").withColumn(
            "similarity", F.coalesce(F.col("similarity"), F.lit(0.0))
        )
    else:
        out = out.withColumn("similarity", F.lit(0.0))
    return out


FEATURE_ORDER_2F = [
    "bm25_f0", "bm25_f1", "len_f0", "len_f1",
    "coverage_f0", "coverage_f1", "first_pos", "similarity",
]


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
        x = (feats - self.means) / np.where(self.stds == 0, 1.0, self.stds)
        x = np.maximum(x @ self.w[0] + self.b[0], 0.0)
        x = np.maximum(x @ self.w[1] + self.b[1], 0.0)
        return (x @ self.w[2] + self.b[2]).reshape(-1)


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
