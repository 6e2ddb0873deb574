"""Cardinality sketch: bottom-k (KMV) approximate distinct count.

``engine.stats_agg`` computes cardinality with an exact
``count_distinct`` and documents "at 100 TB swap in a sketch — same
plan, sketch merge instead of the distinct shuffle". This module IS
that swap-in, built deterministic so it gates against a bit-identical
DuckDB oracle (Spark's own ``approx_count_distinct`` is HLL++ with an
engine-private register layout — correct but unverifiable across
engines; a bottom-k sketch over a shared hash is verifiable to the
last bit).

Estimator (Bar-Yossef et al. 2002; the k-minimum-values /
theta-sketch family): hash every value uniformly into [0, 2^60) with
``dialect.md5_prefix60`` (exact integer positional arithmetic over the
md5 hex prefix — no float, identical in both engines), keep the k
smallest DISTINCT hashes, and estimate

    distinct ≈ (k - 1) * 2^60 / h_(k)

where ``h_(k)`` is the k-th smallest hash. When fewer than k distinct
hashes exist the sketch is exhaustive and the count is exact. The only
floating-point operation is ONE division of two exactly-representable
doubles ((k-1)*2^60 is exact for any practical k; the bigint→double
cast of ``h_(k)`` is a single IEEE round-to-nearest both engines share),
so the estimate is bit-identical by construction — no fold-order
discipline needed anywhere.

Scale shape: ``groupBy(hash)`` partial-aggregates map-side, and the
``orderBy(h).limit(k)`` compiles to ``TakeOrderedAndProject`` — each
partition keeps its own bottom-k and only k rows per partition reach
the merge, which is exactly the distributed sketch-merge a 1000-executor
cardinality aggregation wants. Nothing driver-side grows with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions import dialect as D

SKETCH_K = 64  # default sketch size; relative error ~ 1/sqrt(k-1) ≈ 13%

TWO_60 = 1 << 60


def approx_distinct(
    df: DataFrame, col: str = "v", k: int = SKETCH_K
) -> DataFrame:
    """One-row bottom-k cardinality sketch of ``col`` (nulls ignored):
    (n_sketch, kth_hash, est_distinct). ``n_sketch`` < k ⇒ the
    estimate is the exact distinct count; ``kth_hash`` is null only on
    an empty input. The value is hashed through its STRING rendering
    (md5 takes strings): integer renderings match DuckDB exactly;
    hash float columns only after an explicit round/cast (float
    rendering differs across engines)."""
    h = (
        df.where(F.col(col).isNotNull())
        .select(F.md5(F.col(col).cast("string")).alias("_m"))
        .select(F.expr(D.hex_prefix60(D.SPARK, "_m")).alias("h"))
        .groupBy("h")
        .agg(F.lit(1))
        .orderBy("h")
        .limit(k)
    )
    agg = h.agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        "n_sketch",
        "kth_hash",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.lit(float((k - 1) * TWO_60))
            / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )
