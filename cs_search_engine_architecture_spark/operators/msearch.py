"""Batched multi-query top-k: N queries answered by ONE shared postings scan.

The reference serves one query per call (``sea/engine.pyx:584-607`` —
``exact_search`` walks each query's posting lists independently). At
cluster scale the dominant serving pattern is the opposite: thousands of
queries per batch (LTR training-data generation, offline eval sweeps,
nightly relevance dashboards), and running one Spark job per query pays
the full scan + scheduling cost N times.

This operator classifies each parsed query as *join-batchable* (a single
token, a flat OR, or a flat AND — the overwhelming majority of real
queries) and answers every batchable query from a SINGLE pass:

    blocks scan, filtered to the UNION of all query terms   (one scan,
      partition-pruned to the term_bucket dirs + term row groups)
    -> decode (term, doc_id, score)                          (mapInPandas)
    -> broadcast-join the tiny (query_id, term, weight) map  (no shuffle)
    -> groupBy(query_id, doc_id) partial-aggregated sum      (one shuffle)
    -> per-query top-k via window row_number                 (same shuffle
         key prefix — AQE coalesces; ~top_k rows per query survive)

Scoring is exactly the compiler's join algebra (``plans/compiler.py``):
OR = coalesced sum over matched terms, AND = inner-join sum gated on
*all* distinct terms matching, repeated terms double-count via the
``weight`` column. Queries the join form can't express (phrases, NOT,
mixed precedence) fall back to their individual compiled plans, tagged
with the query_id and unioned in — still one Spark job.

At 100 TB the win is structural: the postings scan is shared across the
whole batch (a hot term referenced by 500 queries is read and decoded
once, not 500 times), the query map is broadcast (bytes, not a shuffle),
and the only wide exchange is the (query_id, doc_id) aggregation, which
is partial-aggregated map-side before it ships.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import reduce
from operator import or_

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.operators.compression import (
    decode_scores,
    varint_decode,
)

_DECODE_SCHEMA = "term string, doc_id long, score double"


def _decode_keep_term(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        terms: list[np.ndarray] = []
        docs: list[np.ndarray] = []
        scores: list[np.ndarray] = []
        for row in pdf.itertuples(index=False):
            d = np.cumsum(varint_decode(row.doc_ids_bin), dtype=np.uint64)
            docs.append(d.astype(np.int64))
            scores.append(decode_scores(row.scores_bin))
            terms.append(np.repeat(row.term, len(d)))
        yield pd.DataFrame(
            {
                "term": np.concatenate(terms) if terms else np.empty(0, object),
                "doc_id": np.concatenate(docs) if docs else np.empty(0, np.int64),
                "score": (
                    np.concatenate(scores).astype(np.float64)
                    if scores
                    else np.empty(0, np.float64)
                ),
            }
        )


def multi_term_postings(
    blocks: DataFrame, terms: list[str], num_buckets: int
) -> DataFrame:
    """Decoded ``(term, doc_id, score)`` postings for ALL ``terms`` in one
    scan. The per-term ``(term_bucket == hash(term)) AND (term == t)``
    conjunctions constant-fold, so the scan prunes to the union of the
    terms' bucket directories and then to row groups via parquet min/max
    stats on ``term`` — same pushdown as the single-term path
    (``decode.term_postings``), amortized over the whole batch."""
    if not terms:
        raise ValueError("multi_term_postings needs at least one term")
    if len(terms) <= 32:
        cond = reduce(
            or_,
            [
                (
                    F.col("term_bucket")
                    == F.pmod(
                        F.xxhash64(F.lit(t)), F.lit(num_buckets)
                    ).cast("int")
                )
                & (F.col("term") == t)
                for t in terms
            ],
        )
    else:
        # large batches: an OR-chain of per-term conjunctions grows the
        # expression tree linearly and Catalyst's optimization passes
        # super-linearly; two IN-sets prune the same partitions/row
        # groups (term alone already determines the rows — the bucket
        # set only exists for directory pruning, and a false
        # (bucket, term) combination matches nothing)
        buckets = (
            blocks.sparkSession.createDataFrame(
                [(t,) for t in terms], "term string"
            )
            .select(
                F.pmod(F.xxhash64("term"), F.lit(num_buckets))
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()
        )
        cond = F.col("term_bucket").isin([r["b"] for r in buckets]) & F.col(
            "term"
        ).isin(list(terms))
    filtered = blocks.where(cond).select("term", "doc_ids_bin", "scores_bin")
    return filtered.mapInPandas(_decode_keep_term, _DECODE_SCHEMA)


def _flat_terms(ast, op: str) -> list[str] | None:
    """Leaf terms if ``ast`` is a pure tree of ``op`` over tokens
    (mirrors ``SearchEngine._flat_op_terms``); None otherwise."""
    out: list[str] = []

    def walk(node) -> bool:
        if node is None:
            return False
        if node["type"] == "token":
            out.append(node["value"])
            return True
        if node["type"] == "operator" and node.get("operator") == op:
            return walk(node.get("left")) and walk(node.get("right"))
        return False

    return out if walk(ast) else None


def classify_query(ast) -> tuple[str, list[str]] | None:
    """(mode, terms) when the query is join-batchable, else None."""
    if ast is None:
        return None
    if ast["type"] == "token":
        return ("or", [ast["value"]])
    for mode in ("or", "and"):
        terms = _flat_terms(ast, mode)
        if terms:
            return (mode, terms)
    return None


def batched_topk(
    spark: SparkSession,
    blocks: DataFrame,
    num_buckets: int,
    plans: list[tuple[str, str, list[str]]],
    top_k: int,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Answer every ``(query_id, mode, terms)`` plan from one shared scan.

    Returns ``(query_id, doc_id, score)`` with at most ``top_k`` rows per
    query, ordered within each query by (score desc, doc_id asc).
    ``exclude`` (a 1-column doc_id frame, e.g. the index's tombstones) is
    anti-joined before per-query ranking.
    """
    rows = []
    for query_id, mode, terms in plans:
        distinct: dict[str, int] = {}
        for t in terms:
            distinct[t] = distinct.get(t, 0) + 1
        required = len(distinct) if mode == "and" else 0
        for t, w in distinct.items():
            rows.append((query_id, t, float(w), required))
    qterms = spark.createDataFrame(
        rows, "query_id string, term string, weight double, required int"
    )
    all_terms = sorted({t for _, t, _, _ in rows})
    postings = multi_term_postings(blocks, all_terms, num_buckets)
    joined = postings.join(F.broadcast(qterms), "term")
    agg = joined.groupBy("query_id", "doc_id").agg(
        F.sum(F.col("score") * F.col("weight")).alias("score"),
        F.count(F.lit(1)).alias("matched"),
        F.max("required").alias("required"),
    )
    hits = agg.where(
        (F.col("required") == 0) | (F.col("matched") == F.col("required"))
    )
    if exclude is not None:
        hits = hits.join(F.broadcast(exclude), "doc_id", "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "score")
    )
