"""Training-set curation tail: global token-budget selection and
deterministic epoch shuffling / shard materialization.

These are the two steps between "hygienic corpus" and "bytes a trainer
reads": pick the best documents until a global token budget is spent,
then materialize the survivors in a deterministic pseudo-random order
sharded for parallel readers.

``select_token_budget`` — keep the highest-scoring documents whose
INCLUSIVE cumulative token count (ordered score desc, doc_id asc) stays
within the budget. The cut needs a global prefix sum over a
quality-ordered corpus; a bare window (``sum().over(orderBy(...))``
with no partitionBy) collapses to ONE task, so this reuses the packing
module's two-phase shape (`packing.pack_sequences`): range-partition on
the order keys, per-partition local cumsum in one ``mapInPandas`` pass,
driver-side exclusive prefix over the per-partition totals (one tiny
row each), broadcast the bases back. Token counts are integers, so the
cut is exact and fold-order-free; only the ORDER depends on the
(double) score, which the gate mirrors bit-identically in SQL.

``epoch_shuffle`` / ``write_training_shards`` — a training run wants a
deterministic, seed-reproducible permutation of the corpus without a
global sort-and-rank (a global rank is the same single-task window
trap). The contract instead: ``shuffle_key = md5-prefix60(seed ':' id)``
(the repo's uniform order-preserving 60-bit hash, shared with the
DuckDB oracle), ``shard = shuffle_key % num_shards``. A reader that
streams shards in index order, each shard internally key-sorted, sees a
deterministic pseudo-random epoch order; shards are uniform by
construction (hash balance), so parallel readers stay balanced. At
100 TB the shard count is set to the reader parallelism (thousands) —
each shard is one hash partition, written key-sorted in one pass with
no global exchange beyond the single hash shuffle.

Reference has no training-set tail; this extends the pipeline the same
way `packing`/`text_analysis` do (survey §2 extensions).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dialect as D
from .partitioning import widen_input

_BUDGET_SCHEMA = (
    "doc_id long, n long, score double, local_incl long, pid int"
)


def _local_inclusive_cumsum(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    total = 0
    for pdf in it:
        n = pdf["n"].astype("int64")
        incl = total + n.cumsum()
        total += int(n.sum())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n": n,
                "score": pdf["score"],
                "local_incl": incl,
                "pid": pid,
            }
        )


_PRUNE_BUCKETS = 4096


def _histogram_prune_predicate(
    base: DataFrame, budget: int, stratum: bool = False
):
    """Prune predicate dropping docs that can never be admitted.

    Buckets each score range into ``_PRUNE_BUCKETS`` equal slices and
    sums tokens per bucket (one map-side-combined agg, bounded rows to
    the driver). Walking buckets best-first, the bucket where the
    running token total first goes STRICTLY over the budget is the
    crossing bucket; every doc in a lower bucket has exclusive
    cum > budget and is provably never kept. Returns a Column
    predicate selecting the survivors (rows of strata with no
    crossing, or degenerate score ranges, always pass), or ``None``
    when no pruning is possible. ``budget`` is an int, or a
    ``{stratum: int}`` dict when ``stratum=True``."""
    keys = ["stratum"] if stratum else []
    rng = base.groupBy(*keys).agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).collect()
    spans = {
        (r["stratum"] if stratum else None): (r["lo"], r["hi"])
        for r in rng
        if r["lo"] is not None and r["hi"] > r["lo"]
    }
    if not spans:
        return None

    # bucket index per row: 0 = worst score, _PRUNE_BUCKETS-1 = best;
    # clamp handles score == hi landing one past the end. The PRUNE
    # FILTER reuses this exact expression (never a reconstructed
    # `score >= floor` — FP rounding at bucket edges could disagree
    # with the histogram's own assignment; same-expression >= bi* is
    # airtight because floor((s-lo)/w) is monotone in s under IEEE).
    def bucket_expr(lo: float, hi: float):
        w = (hi - lo) / _PRUNE_BUCKETS
        return F.least(
            F.lit(_PRUNE_BUCKETS - 1),
            F.floor((F.col("score") - F.lit(lo)) / F.lit(w)).cast("int"),
        )

    if stratum:
        b = None
        for s, (lo, hi) in spans.items():
            cond = F.col("stratum") == s
            e = bucket_expr(lo, hi)
            b = F.when(cond, e) if b is None else b.when(cond, e)
        bucket_col = b  # non-span strata fall through to NULL
        bucketed = base.withColumn("_b", bucket_col)
    else:
        lo, hi = spans[None]
        bucket_col = bucket_expr(lo, hi)
        bucketed = base.withColumn("_b", bucket_col)
    hist = bucketed.where(F.col("_b").isNotNull()).groupBy(
        *keys, "_b"
    ).agg(F.sum("n").alias("t")).collect()
    per: dict = {}
    for r in hist:
        per.setdefault(r["stratum"] if stratum else None, {})[r["_b"]] = (
            int(r["t"] or 0)
        )
    cuts: dict = {}
    for s, bux in per.items():
        acc = 0
        for bi in sorted(bux, reverse=True):
            acc += bux[bi]
            if acc > (budget[s] if isinstance(budget, dict) else budget):
                cuts[s] = bi  # crossing bucket: keep _b >= bi
                break
    if not cuts:
        return None
    if not stratum:
        return bucket_col >= F.lit(cuts[None])
    pred = None
    for s, bi in cuts.items():
        cond = (F.col("stratum") == s) & (bucket_col < F.lit(bi))
        pred = cond if pred is None else pred | cond
    return ~pred  # drop only provably-unkeepable rows; others pass


def select_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str = "quality_score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Keep the best docs until ``budget`` tokens are spent.

    Rule: order by (score desc, doc_id asc); keep a doc iff its
    INCLUSIVE cumulative token count ≤ budget (the budget is never
    exceeded; cumsum is monotone, so the kept set is a prefix of the
    order). Returns ``(doc_id, n_tokens, <score_col>, cum_tokens)``
    for kept docs only.

    100 TB shape — histogram prune before the sort: the kept set is a
    PREFIX of the score order, so docs that can never be admitted
    (their exclusive prefix already exceeds the budget) need not enter
    the range shuffle at all. One tiny fixed-width score histogram
    (bucket → Σ tokens, ≤ ``_PRUNE_BUCKETS`` rows to the driver) finds
    the bucket where the running total first EXCEEDS the budget; only
    docs at-or-above that bucket's score floor are sorted and
    prefix-summed. Sound because any doc scored strictly below the
    crossing bucket has exclusive cum > budget (strict — so even a
    zero-token doc sitting exactly at the budget is unaffected). At a
    real curation ratio (keep 1% of 100 TB) this cuts ~99% of the
    sort-shuffle; the kept set and every ``cum_tokens`` are
    bit-identical to the unpruned plan (gate-verified).
    """
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n"),
        F.col(score_col).cast("double").alias("score"),
    ).localCheckpoint()
    # PINNED (r6): the histogram pass and the range shuffle otherwise
    # both re-execute the CALLER's scoring lineage (typically a
    # tokenize+join pipeline costing far more than this whole
    # operator). The pinned projection is three scalar columns —
    # O(num_docs) rows, ~24 bytes each — not O(corpus bytes), so the
    # guide-§5 "reused AND expensive to recompute" bar is met at any
    # scale.
    prune = _histogram_prune_predicate(base, int(budget))
    if prune is not None:
        base = base.where(prune)
    ranged = base.repartitionByRange(
        n_parts, F.col("score").desc(), F.col("doc_id").asc()
    ).sortWithinPartitions(F.col("score").desc(), F.col("doc_id").asc())
    # PINNED: `local` feeds two actions (partition totals, final join)
    # and repartitionByRange SAMPLES boundaries — unpinned, the two
    # executions can partition differently and desync the broadcast
    # bases (the packing.pack_sequences lesson; CLAUDE.md invariant).
    local = ranged.mapInPandas(
        _local_inclusive_cumsum, _BUDGET_SCHEMA
    ).localCheckpoint()
    totals = sorted(
        (r["pid"], r["t"])
        for r in local.groupBy("pid").agg(F.sum("n").alias("t")).collect()
    )
    offs, acc = [], 0
    for pid, t in totals:
        offs.append((pid, acc))
        acc += int(t or 0)
    off_df = spark.createDataFrame(offs or [(0, 0)], "pid int, base long")
    cum = F.col("base") + F.col("local_incl")
    return (
        local.join(F.broadcast(off_df), "pid")
        .where(cum <= F.lit(int(budget)))
        .select(
            "doc_id",
            F.col("n").alias(tokens_col),
            F.col("score").alias(score_col),
            cum.alias("cum_tokens"),
        )
    )


_STRAT_SCHEMA = (
    "doc_id long, n long, score double, stratum string, "
    "local_incl long, pid int"
)


def _local_stratified_cumsum(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-stratum inclusive cumsum within one partition. Rows arrive
    sorted by (stratum, score desc, doc_id); each stratum's running
    total carries across the partition's Arrow batches."""
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    carry: dict[str, int] = {}
    for pdf in it:
        n = pdf["n"].astype("int64")
        incl = n.groupby(pdf["stratum"], sort=False).cumsum()
        incl = incl + pdf["stratum"].map(
            lambda s: carry.get(s, 0)
        ).astype("int64")
        for s, tot in n.groupby(pdf["stratum"], sort=False).sum().items():
            carry[s] = carry.get(s, 0) + int(tot)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n": n,
                "score": pdf["score"],
                "stratum": pdf["stratum"],
                "local_incl": incl,
                "pid": pid,
            }
        )


def select_token_budget_stratified(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "lang",
    score_col: str = "quality_score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-stratum token budgets — the data-mixture composition of
    ``select_token_budget``: within each stratum (domain/language),
    keep the highest-scoring docs whose inclusive per-stratum cumsum
    stays ≤ that stratum's budget. Strata absent from ``budgets`` are
    dropped (the `resample_to_mixture` convention). Returns
    ``(doc_id, stratum_col, n_tokens, <score_col>, cum_tokens)``.

    Same two-phase shape as the global cut, keyed by (stratum, score
    desc, doc_id): the range partitioner keeps each stratum's order
    contiguous across partitions, the local pass cumsums per stratum,
    and the driver folds one tiny (pid, stratum) total per pair into
    broadcast exclusive bases — never more than partitions × strata
    rows driver-side."""
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = df.where(
        F.col(stratum_col).isin(list(budgets.keys()))
    ).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n"),
        F.col(score_col).cast("double").alias("score"),
        F.col(stratum_col).cast("string").alias("stratum"),
    ).localCheckpoint()  # pinned: see select_token_budget (r6)
    # the stratum column is cast to STRING above, so every lookup keyed
    # by a collected stratum value must use string keys — a budgets
    # dict keyed by ints (a numeric domain-id column) would otherwise
    # KeyError after the isin filter happily accepted it
    budgets = {str(s): int(b) for s, b in budgets.items()}
    # per-stratum histogram prune (see select_token_budget): only docs
    # that might be admitted enter the sort-shuffle
    prune = _histogram_prune_predicate(base, budgets, stratum=True)
    if prune is not None:
        base = base.where(prune)
    ranged = base.repartitionByRange(
        n_parts,
        F.col("stratum").asc(),
        F.col("score").desc(),
        F.col("doc_id").asc(),
    ).sortWithinPartitions(
        F.col("stratum").asc(), F.col("score").desc(), F.col("doc_id").asc()
    )
    # pinned for the same boundary-sampling reason as the global cut
    local = ranged.mapInPandas(
        _local_stratified_cumsum, _STRAT_SCHEMA
    ).localCheckpoint()
    totals = local.groupBy("pid", "stratum").agg(
        F.sum("n").alias("t")
    ).collect()
    acc: dict[str, int] = {}
    offs = []
    for r in sorted((r["pid"], r["stratum"], r["t"]) for r in totals):
        pid, stratum, t = r
        offs.append((pid, stratum, acc.get(stratum, 0),
                     int(budgets[stratum])))
        acc[stratum] = acc.get(stratum, 0) + int(t or 0)
    off_df = spark.createDataFrame(
        offs or [(0, "", 0, 0)],
        "pid int, stratum string, base long, budget long",
    )
    cum = F.col("base") + F.col("local_incl")
    return (
        local.join(F.broadcast(off_df), ["pid", "stratum"])
        .where(cum <= F.col("budget"))
        .select(
            "doc_id",
            F.col("stratum").alias(stratum_col),
            F.col("n").alias(tokens_col),
            F.col("score").alias(score_col),
            cum.alias("cum_tokens"),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    num_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add ``shuffle_key`` (exact bigint in [0, 2^60)) and ``shard``
    (int in [0, num_shards)) — the deterministic epoch permutation.

    The md5 is materialized into a column BEFORE the 15-term positional
    arithmetic (`D.hex_prefix60`): neither engine CSEs repeated
    ``substr(md5(x), j, 1)`` terms (measured 2× slower inlined)."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    with_h = df.withColumn(
        "_shuffle_md5",
        F.md5(F.concat(F.lit(f"{int(seed)}:"), F.col(id_col).cast("string"))),
    )
    keyed = with_h.withColumn(
        "shuffle_key", F.expr(D.hex_prefix60(D.SPARK, "_shuffle_md5"))
    ).drop("_shuffle_md5")
    return keyed.withColumn(
        "shard", (F.col("shuffle_key") % F.lit(int(num_shards))).cast("int")
    )


def diversity_cap(
    quality: DataFrame,
    emb: DataFrame,
    cap: int,
    num_planes: int = 8,
    dims: int = 64,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "quality_score",
    buckets: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, bucket, rank) — semantic diversity capping: keep at most
    ``cap`` documents per SEMANTIC bucket, best-quality first. The
    bucket is the random-hyperplane LSH signature of the document's
    embedding (``dialect.lsh_bucket`` — ``num_planes`` sign bits of
    deterministic md5-seeded hyperplane dot products), a deterministic,
    oracle-mirrorable stand-in for a cluster id: near-angular documents
    share sign patterns, so capping a bucket caps a semantic
    neighborhood. This is the SemDeDup-style step (public: Abbas et
    al. 2023, "SemDeDup") between near-dup removal and budget
    selection — near-dup dedup kills copies, this kills REDUNDANCY
    (the 10⁶ boilerplate product pages that are all distinct text but
    one idea), keeping the ``cap`` best exemplars per neighborhood.

    Pass ``buckets`` (any ``(doc_id, bucket)`` frame) to substitute a
    different neighborhood definition for the LSH signature — e.g.
    k-means/IVF cells from ``similarity.ivf_assign`` (the published
    SemDeDup setting) or connected-component cluster ids; ``emb`` and
    the plane parameters are then ignored.

    Keep rule: per bucket, rank = row_number over (quality desc,
    doc_id asc), keep rank ≤ cap. Unlike keep-FIRST (cap=1, where the
    skew-safe max(struct) aggregate applies — `dedup.cluster_keep_best`),
    top-k per group uses the rank window DELIBERATELY: Spark ≥3.5
    rewrites ``row_number() <= k`` filters into WindowGroupLimit with a
    map-side PARTIAL limit, so every map task forwards at most ``cap``
    rows per bucket and a hot bucket reaches the reduce side as
    ``cap × num_map_tasks`` rows, not its full population — bounded at
    any corpus size (the same shape msearch's per-query windows rely
    on; asserted in tests). Quality doubles ride only in the ORDER;
    the output is integer columns, so the gate hash is exact."""
    q = quality.select(
        F.col(id_col).alias("doc_id"), F.col(score_col).alias("_q")
    )
    if buckets is not None:
        e = buckets.select(
            F.col(id_col).alias("doc_id"),
            F.col("bucket").cast("int").alias("bucket"),
        )
    else:
        # widen: the 2^planes interpreted hyperplane dots per row run
        # on the scan, which a single-row-group file caps at 1-2 tasks
        e = widen_input(emb).select(
            F.col(emb_id_col).alias("doc_id"),
            F.expr(D.lsh_bucket(D.SPARK, vec_col, num_planes, dims))
            .cast("int")
            .alias("bucket"),
        )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("_q"), F.asc("doc_id"))
    )
    return (
        q.join(e, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(cap))
        .select("doc_id", "bucket", "rank")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    seed: int,
    num_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Materialize ``df`` as ``path/shard=K/`` parquet, each shard
    internally sorted by ``shuffle_key`` (ties: id) — the deterministic
    epoch order a trainer consumes shard-by-shard.

    One hash shuffle on ``shard`` puts each shard in exactly one task
    (same-valued keys hash together), so ``sortWithinPartitions`` gives
    each shard file a total key order with no global exchange. Size
    ``num_shards`` to the reader parallelism at scale — a shard is the
    unit of both write and read parallelism."""
    sh = epoch_shuffle(df, seed, num_shards, id_col)
    (
        sh.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
