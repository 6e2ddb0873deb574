"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Training-data-pipeline extensions over SURVEY.md §2 (the reference has
no dedup). Shapes chosen for 100 TB operation:

* **exact** — ``groupBy(hash)``: one shuffle on an already-tiny key;
  map-side partial aggregation absorbs the fan-in.
* **MinHash + LSH** — per-row signature (row-local column math, no
  shuffle) → explode to (band, bucket) → self-join per band. The join
  key is the banded bucket hash, so candidate generation touches only
  colliding rows instead of the O(n²) cross product; band buckets are
  near-uniform (md5), so the shuffle is skew-free by construction.
* **SimHash** — 32-bit sign-of-weighted-sum fingerprint; near-dup pairs
  join on the exact fingerprint (or banded substrings for Hamming>0).
* **n-gram Jaccard** — verification stage over LSH candidates only
  (never all pairs): candidates × shingle-set intersection/union.
* **embedding cosine** — thresholded pair detection; the scale path
  pre-buckets by random-hyperplane LSH (see ``similarity.py``) and only
  scores within buckets.

Everything is built from ``functions.dialect`` fragments so the DuckDB
oracles in ``gate.py`` are bit-identical; Spark expressions are
whole-stage-codegen'd built-ins (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions import dialect as D

NUM_MINHASHES = 8
BAND_SIZE = 1  # 8 bands of 1 signature -> recall-heavy candidates
SIMHASH_BITS = 32


def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: (text_md5, n_dups, keep_doc_id)."""
    return df.groupBy(F.md5(text_col).alias("text_md5")).agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """(doc_id, sig_0..sig_{k-1}) MinHash over word-3-gram shingles.
    Row-local: the signature computation introduces no shuffle."""
    toks = df.withColumn("toks", F.expr(D.tokens(D.SPARK, text_col)))
    sh = toks.withColumn("shingles", F.expr(D.shingles(D.SPARK)))
    return sh.select(
        "doc_id",
        *[
            F.expr(D.minhash_sig(D.SPARK, "shingles", i)).alias(f"sig_{i}")
            for i in range(num_hashes)
        ],
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    num_hashes: int = NUM_MINHASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing ≥1 LSH band bucket.

    ``explode`` to (band, bucket) then self-join on (band, bucket):
    the shuffle key is the banded md5, uniform even under Zipfian text
    duplication, and AQE's skew-join split covers pathological buckets
    (e.g. the empty-document bucket)."""
    num_bands = num_hashes // band_size
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"sig_{b * band_size + j}")
                                    for j in range(band_size)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — per-bit majority vote over token occurrences
    (bit b of a token = parity of hex char b of md5(token); weight =
    term frequency via occurrence explode). One groupBy(doc_id) with
    map-side partial sums; 32 sum-aggregates, all codegen'd."""
    occ = df.select(
        "doc_id",
        F.explode(F.expr(D.tokens(D.SPARK, text_col))).alias("term"),
    )
    sums = occ.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(D.simhash_bit_contrib(D.SPARK, "term", j))).alias(
                f"s_{j}"
            )
            for j in range(bits)
        ]
    )
    packed = sum(
        F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(bits)
    )
    return sums.select("doc_id", packed.cast("long").alias("simhash"))


def simhash_dup_pairs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b) pairs with identical SimHash (Hamming distance 0;
    banded-substring join generalizes to distance>0)."""
    sh = simhash(df, text_col)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, "simhash")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("simhash"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    min_jaccard: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) over distinct word-3-gram shingle sets.

    Verification stage: scores only ``candidates`` (default: MinHash-LSH
    pairs), never the cross product — at 100 TB the candidate set is
    ~O(dups), not O(n²). Set semantics (distinct shingles)."""
    if candidates is None:
        candidates = lsh_candidate_pairs(minhash_signatures(df, text_col))
    sh = (
        df.withColumn("toks", F.expr(D.tokens(D.SPARK, text_col)))
        .select(
            "doc_id",
            F.array_distinct(F.expr(D.shingles(D.SPARK))).alias("sh"),
        )
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def embedding_dup_pairs(
    emb: DataFrame,
    min_cosine: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold.

    This is the exact verifier. At scale, feed it candidate pairs from
    ``similarity.lsh_buckets`` (same-bucket join) instead of the cross
    join used here for small inputs; cosine is computed with the same
    double-precision fold either way, then cast through float32 (the
    gate's float policy)."""
    withn = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(D.l2_norm(D.SPARK, vec_col)).alias("nrm"),
    )
    a = withn.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = withn.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = (
        F.expr(D.dot_product(D.SPARK, "va", "vb"))
        / (F.col("na") * F.col("nb"))
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cos.cast("float").cast("double").alias("cos"),
        )
        .where(F.col("cos") >= min_cosine)
    )
