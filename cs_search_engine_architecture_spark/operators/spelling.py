"""Spelling correction (reference P9: ``sea/spelling_corrector.pyx``).

Semantics mirrored exactly:

* k-gram index: bigrams of ``$term$`` (``_get_bigram_hashes``,
  ``sea/spelling_corrector.pyx:45-58``) over vocabulary terms with
  ``df >= exclude_threshold`` (default 100, ``sea/engine.pyx:30,135``);
* candidates = terms sharing ≥1 bigram with the query token
  (``get_candidates_tokens`` :60-71), the token itself excluded;
* score = **multiset** Jaccard over bigram bags:
  ``inter / (|A| + |B| - inter)`` with per-bigram ``min(count_a,
  count_b)`` intersection (``_jaccard_similarity`` :73-101);
* accept the best candidate with similarity ≥ ``min_similarity``
  (0.75, ``sea/engine.pyx:527``). The reference's best-candidate tie
  order is unordered-map nondeterministic; we impose the documented
  deterministic tie-break (similarity desc, term asc).

Spark shape: the k-gram table ``(bigram, term, term_len)`` is built
once from ``term_stats`` (one explode — distributed, tiny output:
~11·|vocab| rows) and can be persisted next to the index. A suggestion
probes it with a ≤ ~50-row broadcast of the token's bigram counts, so
query cost is independent of corpus size — only of vocabulary size.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MIN_SIMILARITY = 0.75  # sea/engine.pyx:527
DEFAULT_EXCLUDE_THRESHOLD = 100  # sea/engine.pyx:30


def bigrams(token: str) -> list[str]:
    padded = f"${token}$"
    return [padded[i : i + 2] for i in range(len(padded) - 1)]


def build_kgram_index(
    term_stats: DataFrame, exclude_threshold: int = DEFAULT_EXCLUDE_THRESHOLD
) -> DataFrame:
    """(bigram, term, term_len) for vocabulary terms with df ≥ threshold.
    ``term_len`` caches ``|B| = len(term) + 1`` for the Jaccard union."""
    padded = F.concat(F.lit("$"), F.col("term"), F.lit("$"))
    grams = F.expr(
        "transform(sequence(1, length(term) + 1), "
        "i -> substring(concat('$', term, '$'), i, 2))"
    )
    return (
        term_stats.where(F.col("df") >= exclude_threshold)
        .select(
            "term",
            F.length(padded).alias("_plen"),
            F.explode(grams).alias("bigram"),
        )
        .select("bigram", "term", (F.col("_plen") - 1).alias("term_len"))
    )


def suggest_df(
    spark: SparkSession,
    kgram: DataFrame,
    tokens: list[str],
    min_similarity: float = DEFAULT_MIN_SIMILARITY,
) -> DataFrame:
    """(token, suggestion, similarity) — best correction per input token
    (tokens with no acceptable candidate are ABSENT, mirroring the
    reference's keep-original behavior at the caller).

    Plan: broadcast the tiny (token, bigram, q_count) frame against the
    k-gram table; multiset intersection = Σ min(q_count, cand_count);
    one groupBy(token, term) + a top-1-per-token window."""
    rows = []
    for tok in set(tokens):
        for bg, c in Counter(bigrams(tok)).items():
            rows.append((tok, bg, c, len(tok) + 1))
    if not rows:
        return spark.createDataFrame(
            [], "token string, suggestion string, similarity double"
        )
    q = spark.createDataFrame(
        rows, "token string, bigram string, q_count int, q_size int"
    )

    cand_counts = kgram.groupBy("term", "term_len", "bigram").agg(
        F.count(F.lit(1)).alias("c_count")
    )
    inter = (
        F.broadcast(q)
        .join(cand_counts, "bigram")
        .where(F.col("term") != F.col("token"))
        .groupBy("token", "q_size", "term", "term_len")
        .agg(F.sum(F.least("q_count", "c_count")).alias("inter"))
    )
    sim = inter.withColumn(
        "similarity",
        F.col("inter").cast("double")
        / (F.col("q_size") + F.col("term_len") - F.col("inter")),
    ).where(F.col("similarity") >= min_similarity)
    from pyspark.sql import Window

    w = Window.partitionBy("token").orderBy(
        F.desc("similarity"), F.asc("term")
    )
    return (
        sim.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("token", F.col("term").alias("suggestion"), "similarity")
    )


def correct_query_tokens(
    spark: SparkSession,
    kgram: DataFrame,
    tokens: list[str],
    min_similarity: float = DEFAULT_MIN_SIMILARITY,
) -> tuple[list[str], int]:
    """Reference ``get_top_correction``: every token replaced by its best
    acceptable candidate (or kept); returns (corrected, num_corrected)."""
    best = {
        r["token"]: r["suggestion"]
        for r in suggest_df(spark, kgram, tokens, min_similarity).collect()
    }
    corrected = [best.get(t, t) for t in tokens]
    return corrected, sum(1 for t in tokens if t in best)


def fuzzy_candidates(
    spark: SparkSession,
    kgram: DataFrame,
    token: str,
    min_similarity: float = 0.3,
    max_expansion: int = 8,
) -> list[tuple[str, float]]:
    """Top ``max_expansion`` vocabulary terms by k-gram multiset Jaccard
    against ``token`` (the token itself qualifies with similarity 1.0 —
    the formula yields it naturally). The fuzzy-search expansion stage:
    unlike ``suggest_df`` this keeps N candidates with their scores
    instead of the single best correction. Probe cost is bounded by
    vocabulary size, never corpus size; ties break (sim desc, term)."""
    from pyspark.sql import Window

    rows = [
        (token, bg, c, len(token) + 1)
        for bg, c in Counter(bigrams(token)).items()
    ]
    q = spark.createDataFrame(
        rows, "token string, bigram string, q_count int, q_size int"
    )
    cand_counts = kgram.groupBy("term", "term_len", "bigram").agg(
        F.count(F.lit(1)).alias("c_count")
    )
    inter = (
        F.broadcast(q)
        .join(cand_counts, "bigram")
        .groupBy("token", "q_size", "term", "term_len")
        .agg(F.sum(F.least("q_count", "c_count")).alias("inter"))
    )
    sim = inter.withColumn(
        "similarity",
        F.col("inter").cast("double")
        / (F.col("q_size") + F.col("term_len") - F.col("inter")),
    ).where(F.col("similarity") >= min_similarity)
    w = Window.partitionBy("token").orderBy(F.desc("similarity"), F.asc("term"))
    top = (
        sim.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_expansion)
        .select("term", "similarity")
        .collect()
    )
    return [(r["term"], float(r["similarity"])) for r in top]
