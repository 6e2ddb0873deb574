"""Partition-parallel block-max WAND top-k (north star: "query-time
BM25 top-k answered by a partition-parallel block-max WAND traversal —
posting-list intersect, skip pointers, bounded heap").

Generalizes the engine's single-term block-max path (engine.py
``_topk_single_term``) to multi-term OR-sum scoring (the reference's
flat scored search: per-doc total = Σ per-term BM25, ``merge_postings``
``sea/posting_list.pyx:15``).

Shape:

1. one bucket+term-pruned scan collects the query terms' BLOCK rows
   (metadata + compressed payloads; one row per 128 postings — postings
   stay encoded);
2. blocks are assigned to doc-range shards (``doc_id // span``; a block
   overlaps ≤ 2 shards since blocks are doc-contiguous) — every doc's
   postings land in exactly ONE shard, so shard-local top-ks are
   globally mergeable;
3. ``applyInPandas`` per shard runs the numpy WAND kernel below;
4. ``orderBy(score desc, doc_id asc).limit(k)`` merges shard-local
   top-ks (TakeOrderedAndProject — only ≤ k rows per shard move).

NEGATIVE SCORES: the reference's idf has no floor (``ln((N-df+.5)/
(df+.5))`` goes negative for df > N/2, ``sea/indexer.pyx:344``), so an
undecoded block can LOWER a doc's total — classic WAND's "skipping can
only forfeit gains" assumption fails. Blocks therefore carry BOTH
``max_score`` and ``min_score``, and the kernel uses two-sided bounds:

* per-term shard gains  G_t = max(max over block maxes, 0)
* per-term shard losses L_t = min(min over block mins, 0)
* θ (threshold) = k-th best LOWER bound over seen docs, where
  ``lower(doc) = partial + Σ_t L_t·[t has an undecoded block covering
  doc]`` — every final total dominates its lower bound, so the k-th
  final ≥ θ;
* an unseen doc inside undecoded block b of term t is bounded by
  ``max_b + Σ_{t'≠t} G_{t'}``; phase 1 decodes blocks in descending
  order of that bound and stops when it falls below θ;
* candidates = seen docs with ``upper(doc) = partial + Σ_t G_t·
  covered_t(doc) ≥ θ``; a completion pass decodes every undecoded
  block overlapping a candidate (doc-contiguity → range test), making
  candidate totals EXACT; non-candidates and unseen docs are below θ ≤
  the k-th final total, so the exact top-k over candidates is the
  global exact top-k with the (score desc, doc_id asc) contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.operators.compression import (
    decode_scores,
    varint_decode,
)

DEFAULT_SHARD_SPAN = 1 << 14
RESULT_SCHEMA = "doc_id long, score double"


def shard_wand_topk(
    pdf: pd.DataFrame, k: int, lo: int, hi: int, chunk: int = 4096
) -> pd.DataFrame:
    """Exact top-k of Σ-score over one doc shard [lo, hi)."""
    n_blocks = len(pdf)
    counts = pdf["count"].to_numpy()
    firsts_all = pdf["first_doc"].to_numpy()
    lasts_all = pdf["last_doc"].to_numpy()
    maxs = pdf["max_score"].to_numpy().astype(np.float64)
    mins = pdf["min_score"].to_numpy().astype(np.float64)
    docs_bin = pdf["doc_ids_bin"].to_numpy()
    scores_bin = pdf["scores_bin"].to_numpy()

    uniq_terms, tinv = np.unique(pdf["term"].to_numpy(), return_inverse=True)
    nt = len(uniq_terms)
    m_t = np.full(nt, -np.inf)
    np.maximum.at(m_t, tinv, maxs)
    l_t = np.full(nt, np.inf)
    np.minimum.at(l_t, tinv, mins)
    G_t = np.maximum(m_t, 0.0)  # possible gain per term
    L_t = np.minimum(l_t, 0.0)  # possible loss per term
    G = float(G_t.sum())
    # optimistic bound for an unseen doc first found in block b of term t
    bounds = maxs + (G - G_t[tinv])
    order = np.argsort(-bounds, kind="stable")

    decoded = np.zeros(n_blocks, dtype=bool)
    ids_acc: list[np.ndarray] = []
    sc_acc: list[np.ndarray] = []

    def decode_into(i: int) -> None:
        ids = np.cumsum(varint_decode(docs_bin[i]), dtype=np.uint64).astype(
            np.int64
        )
        sc = decode_scores(scores_bin[i]).astype(np.float64)
        mask = (ids >= lo) & (ids < hi)
        if mask.any():
            ids_acc.append(ids[mask])
            sc_acc.append(sc[mask])
        decoded[i] = True

    def totals() -> tuple[np.ndarray, np.ndarray]:
        if not ids_acc:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(ids_acc)
        sc = np.concatenate(sc_acc)
        u, inv = np.unique(ids, return_inverse=True)
        return u, np.bincount(inv, weights=sc)

    def coverage(u: np.ndarray, weights: np.ndarray) -> np.ndarray:
        """Σ_t weights[t]·[t has an undecoded block covering each doc]."""
        out = np.zeros(len(u), dtype=np.float64)
        for ti in range(nt):
            if weights[ti] == 0.0:
                continue
            und = np.flatnonzero((tinv == ti) & ~decoded)
            if und.size == 0:
                continue
            firsts = firsts_all[und]
            lasts = lasts_all[und]
            o = np.argsort(firsts)
            firsts, lasts = firsts[o], lasts[o]
            # blocks of one term are doc-disjoint: the only block that can
            # cover doc d is the one with the greatest first_doc <= d
            idx = np.searchsorted(firsts, u, side="right") - 1
            covered = (idx >= 0) & (u <= lasts[np.clip(idx, 0, None)])
            out[covered] += weights[ti]
        return out

    def theta() -> float:
        u, t = totals()
        if len(t) < k:
            return -np.inf
        low = t + coverage(u, L_t)
        return float(np.partition(low, -k)[-k])

    # phase 1: bound-ordered decode with rising threshold
    th = -np.inf
    new_postings = 0
    pos = 0
    while pos < n_blocks:
        i = order[pos]
        if bounds[i] < th:
            break  # all later blocks have lower bounds — skip the tail
        decode_into(i)
        new_postings += int(counts[i])
        pos += 1
        if new_postings >= max(4 * k, chunk):
            th = theta()
            new_postings = 0
    th = theta()

    # phase 2: candidate selection by upper bound
    u, t = totals()
    if len(u) == 0:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
    if np.isfinite(th):
        upper = t + coverage(u, G_t)
        cands = u[upper >= th]
    else:
        cands = u  # fewer than k docs seen -> everyone is a candidate

    # phase 3: completion — exact totals for candidates
    if cands.size:
        for i in np.flatnonzero(~decoded):
            a = np.searchsorted(cands, firsts_all[i], side="left")
            b = np.searchsorted(cands, lasts_all[i], side="right")
            if a < b:
                decode_into(i)

    u, t = totals()
    keep = np.isin(u, cands)
    u, t = u[keep], t[keep]
    kk = min(k, len(u))
    # bounded heap semantics: (score desc, doc_id asc)
    sel = np.lexsort((u, -t))[:kk]
    return pd.DataFrame({"doc_id": u[sel], "score": t[sel]})


def shard_and_topk(
    pdf: pd.DataFrame, terms: list[str], k: int, lo: int, hi: int
) -> pd.DataFrame:
    """Exact top-k of the AND (intersection) of ``terms`` in one shard.

    Skip pointers, literally: a block of term t whose doc range overlaps
    NO block of some other term t' cannot contain an intersection doc
    (blocks are doc-contiguous), so it is dropped from the decode set on
    metadata alone — sparse co-occurrence skips most of both lists."""
    empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
        {"doc_id": "int64", "score": "float64"}
    )
    tcol = pdf["term"].to_numpy()
    present = set(tcol.tolist())
    if present != set(terms):
        return empty  # a term with no postings here -> empty intersection

    firsts = pdf["first_doc"].to_numpy()
    lasts = pdf["last_doc"].to_numpy()
    docs_bin = pdf["doc_ids_bin"].to_numpy()
    scores_bin = pdf["scores_bin"].to_numpy()

    idx_by_term = {t: np.flatnonzero(tcol == t) for t in terms}
    ranges = {}
    for t, idxs in idx_by_term.items():
        f = firsts[idxs]
        l = lasts[idxs]
        o = np.argsort(f)
        ranges[t] = (f[o], l[o])

    def overlaps_some(t_other: str, f: np.ndarray, l: np.ndarray) -> np.ndarray:
        """For query blocks [f,l], does ANY block of t_other overlap?"""
        of, ol = ranges[t_other]
        # block ranges of one term are disjoint and sorted; overlap exists
        # iff the first other-block with end >= f starts <= l
        ends_sorted = ol  # ol is sorted because ranges are disjoint+sorted
        j = np.searchsorted(ends_sorted, f, side="left")
        ok = j < len(of)
        res = np.zeros(len(f), dtype=bool)
        res[ok] = of[np.clip(j[ok], 0, len(of) - 1)] <= l[ok]
        return res

    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in terms:
        idxs = idx_by_term[t]
        f = firsts[idxs]
        l = lasts[idxs]
        alive = np.ones(len(idxs), dtype=bool)
        for t2 in terms:
            if t2 == t:
                continue
            alive &= overlaps_some(t2, f, l)
        ids_parts, sc_parts = [], []
        for i in idxs[alive]:
            ids = np.cumsum(
                varint_decode(docs_bin[i]), dtype=np.uint64
            ).astype(np.int64)
            sc = decode_scores(scores_bin[i]).astype(np.float64)
            m = (ids >= lo) & (ids < hi)
            if m.any():
                ids_parts.append(ids[m])
                sc_parts.append(sc[m])
        if not ids_parts:
            return empty
        ids = np.concatenate(ids_parts)
        sc = np.concatenate(sc_parts)
        o = np.argsort(ids, kind="stable")
        per_term[t] = (ids[o], sc[o])

    inter = per_term[terms[0]][0]
    for t in terms[1:]:
        inter = np.intersect1d(inter, per_term[t][0], assume_unique=True)
        if inter.size == 0:
            return empty
    total = np.zeros(len(inter), dtype=np.float64)
    for t in terms:
        ids_s, sc_s = per_term[t]
        total += sc_s[np.searchsorted(ids_s, inter)]
    kk = min(k, len(inter))
    sel = np.lexsort((inter, -total))[:kk]
    return pd.DataFrame({"doc_id": inter[sel], "score": total[sel]})


_MAX_FALLBACK_SHARDS = 4096


def _fallback_span(sel: DataFrame, shard_span: int) -> int:
    """Effective shard span for the explode-based variants (indexes
    built WITHOUT the shard-aligned layout, where a block's doc range
    is unbounded): a sparse term's block can overlap arbitrarily many
    fixed-span shards, so ``sequence(first/span, last/span)`` would fan
    one block row out to (range/span + 1) copies — a shuffle blowup at
    web scale and a 'Too long sequence' failure on wide id spaces. Grow
    the span until the observed doc-id range fits ~_MAX_FALLBACK_SHARDS
    shards (one cheap metadata-column agg; the aligned ``*_sharded``
    serving paths never take it)."""
    b = sel.agg(
        F.min("first_doc").alias("lo"), F.max("last_doc").alias("hi")
    ).collect()[0]
    if b["hi"] is None:
        return int(shard_span)
    need = (
        int(b["hi"]) - int(b["lo"]) + _MAX_FALLBACK_SHARDS
    ) // _MAX_FALLBACK_SHARDS
    return max(int(shard_span), need)


def wand_and_topk(
    spark: SparkSession,
    blocks: DataFrame,
    num_buckets: int,
    terms: list[str],
    k: int,
    shard_span: int = DEFAULT_SHARD_SPAN,
) -> DataFrame:
    """Exact top-k of the AND-intersection score over ``terms``."""
    buckets = term_buckets(spark, terms, num_buckets)
    sel = blocks.where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(list(terms))
    ).select(
        "term", "first_doc", "last_doc", "doc_ids_bin", "scores_bin"
    )
    shard_span = _fallback_span(sel, shard_span)
    sharded = sel.withColumn(
        "shard",
        F.explode(
            F.sequence(
                F.expr(f"first_doc div {shard_span}"),
                F.expr(f"last_doc div {shard_span}"),
            )
        ),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        return shard_and_topk(
            pdf, list(terms), k, lo=shard * shard_span,
            hi=(shard + 1) * shard_span,
        )

    local = sharded.groupBy("shard").applyInPandas(kernel, RESULT_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def term_buckets(spark: SparkSession, terms: list[str], num_buckets: int) -> list[int]:
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(
            F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int").alias("b")
        )
        .collect()
    )
    return sorted({r["b"] for r in rows})


# ---------------------------------------------------- pre-sharded layout
#
# When the index was built with a ``wand_shard_span`` (blocks never
# cross a doc-shard boundary), the engine keeps ONE cached copy of the
# blocks repartitioned by ``shard`` (one build-time exchange). Every
# WAND query then runs filter -> sort -> kernel over the cached
# partitioning — NO per-query ShuffleExchange, so a hot term's
# compressed payload never re-ships per query (the round-1 scale flag).
# At cluster scale this cached frame is the serving layout; the
# explode-based variants below remain for indexes without the layout.


def preshard_blocks(
    blocks: DataFrame, shard_span: int, num_partitions: int
) -> DataFrame:
    """(blocks + shard column) hash-partitioned by shard; caller
    persists. Valid ONLY for shard-aligned indexes (every block's doc
    range lies in one shard, so ``shard = first_doc // span`` covers
    all its postings)."""
    return blocks.withColumn(
        "shard", (F.col("first_doc") / shard_span).cast("long")
    ).repartition(num_partitions, "shard")


def wand_or_topk_sharded(
    sharded: DataFrame, terms: list[str], k: int, shard_span: int
) -> DataFrame:
    """Exact OR-sum top-k over a pre-sharded cached blocks frame —
    exchange-free: the persisted HashPartitioning(shard) satisfies the
    kernel's ClusteredDistribution, so the plan is
    InMemoryTableScan -> Filter -> Sort -> FlatMapGroupsInPandas."""
    sel = sharded.where(F.col("term").isin(list(terms))).select(
        "term", "first_doc", "last_doc", "count", "max_score", "min_score",
        "doc_ids_bin", "scores_bin", "shard",
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        return shard_wand_topk(
            pdf, k, lo=shard * shard_span, hi=(shard + 1) * shard_span
        )

    local = sel.groupBy("shard").applyInPandas(kernel, RESULT_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_and_topk_sharded(
    sharded: DataFrame, terms: list[str], k: int, shard_span: int
) -> DataFrame:
    """Exact AND-intersection top-k over a pre-sharded cached frame
    (see ``wand_or_topk_sharded``)."""
    sel = sharded.where(F.col("term").isin(list(terms))).select(
        "term", "first_doc", "last_doc", "doc_ids_bin", "scores_bin",
        "shard",
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        return shard_and_topk(
            pdf, list(terms), k, lo=shard * shard_span,
            hi=(shard + 1) * shard_span,
        )

    local = sel.groupBy("shard").applyInPandas(kernel, RESULT_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_or_topk(
    spark: SparkSession,
    blocks: DataFrame,
    num_buckets: int,
    terms: list[str],
    k: int,
    shard_span: int = DEFAULT_SHARD_SPAN,
) -> DataFrame:
    """Exact top-k of the OR-sum score over ``terms``."""
    buckets = term_buckets(spark, terms, num_buckets)
    sel = blocks.where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(list(terms))
    ).select(
        "term", "first_doc", "last_doc", "count", "max_score", "min_score",
        "doc_ids_bin", "scores_bin",
    )
    shard_span = _fallback_span(sel, shard_span)
    sharded = sel.withColumn(
        "shard",
        F.explode(
            F.sequence(
                F.expr(f"first_doc div {shard_span}"),
                F.expr(f"last_doc div {shard_span}"),
            )
        ),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        return shard_wand_topk(
            pdf, k, lo=shard * shard_span, hi=(shard + 1) * shard_span
        )

    local = sharded.groupBy("shard").applyInPandas(kernel, RESULT_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
