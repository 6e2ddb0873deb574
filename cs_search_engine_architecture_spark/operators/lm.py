"""Corpus-trained bigram language model + per-document cross-entropy —
the distributed shape of perplexity-based quality filtering (the
CCNet/Gopher/LLaMA pretraining step that scores every document against
a reference LM and drops the high-perplexity tail).

No pretrained LM ships in this container, so the model itself is
trained FROM a reference corpus with plain DataFrame aggregation —
which is exactly how count-based n-gram LMs (KenLM-style) are built at
scale anyway:

* ``bigram_counts`` — one ``groupBy(gram)`` shuffle over the exploded
  shingle stream (map-side combined; the only corpus-sized training
  job). Uses the shared ``dialect.shingles(n=2)`` fragment, so a DuckDB
  oracle replays training verbatim.
* ``head_counts`` — context totals, derived from the bigram table
  (vocabulary-sized input, not the corpus).
* ``xent_scores`` — per-doc cross-entropy under add-one smoothing:
  ``logp(w2|w1) = ln((c(w1 w2) + 1) / (c(w1 ·) + V))``, averaged over
  the doc's bigram positions. Scoring joins the doc-bigram stream to
  the (possibly web-scale) LM tables on near-uniform gram keys — shuffle
  hash joins, never a broadcast of the LM — then reduces per doc.

Float discipline (gate parity): a doc's log-prob sum runs over MANY
doubles, so both engines fold in the SAME deterministic order — terms
sorted by gram string, strict left fold (``dialect.reduce_double``),
weighted by the doc-local gram count. ``list_sum``/arbitrary-order SUM
would drift in the last ulp (CLAUDE.md invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions import dialect as D
from cs_search_engine_architecture_spark.operators.partitioning import (
    widen_input,
)


def _doc_grams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, g, tf) — the doc's bigram shingles with doc-local
    counts (the <2-token whole-doc fallback follows the shared shingle
    fragment)."""
    return (
        widen_input(docs)
        .select(
            "doc_id", F.expr(D.tokens(D.SPARK, text_col)).alias("__toks")
        )
        .select(
            "doc_id",
            F.explode(F.expr(D.shingles(D.SPARK, "__toks", 2))).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(g, c2) corpus bigram counts — LM training, one shuffle."""
    return (
        _doc_grams(docs, text_col)
        .groupBy("g")
        .agg(F.sum("tf").alias("c2"))
    )


def head_counts(bigrams: DataFrame) -> DataFrame:
    """(h, c1) context (head-word) totals from the bigram table."""
    return (
        bigrams.select(
            F.substring_index("g", " ", 1).alias("h"), "c2"
        )
        .groupBy("h")
        .agg(F.sum("c2").alias("c1"))
    )


def vocab_size(docs: DataFrame, text_col: str = "text") -> int:
    """|V| — distinct tokens over the corpus (the smoothing constant)."""
    return (
        docs.select(
            F.explode(F.expr(D.tokens(D.SPARK, text_col))).alias("t")
        )
        .agg(F.countDistinct("t").alias("v"))
        .collect()[0]["v"]
    )


def xent_scores(
    docs: DataFrame,
    bigrams: DataFrame | None = None,
    heads: DataFrame | None = None,
    v: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, xent) — mean negative log-prob per bigram
    position under the add-one-smoothed bigram LM (perplexity =
    e^xent; the filter threshold applies to either). LM tables default
    to self-training on ``docs`` (the gate setup); production passes
    tables trained on a reference corpus."""
    if bigrams is None:
        bigrams = bigram_counts(docs, text_col)
    if heads is None:
        heads = head_counts(bigrams)
    if v is None:
        v = vocab_size(docs, text_col)

    dg = _doc_grams(docs, text_col).withColumn(
        "h", F.substring_index("g", " ", 1)
    )
    joined = (
        dg.hint("shuffle_hash")
        .join(bigrams.hint("shuffle_hash"), "g", "left")
        .join(heads.hint("shuffle_hash"), "h", "left")
        .select(
            "doc_id",
            "g",
            "tf",
            (
                -F.log(
                    (F.coalesce("c2", F.lit(0)) + F.lit(1.0))
                    / (F.coalesce("c1", F.lit(0)) + F.lit(float(int(v))))
                )
                * F.col("tf").cast("double")
            ).alias("nlp"),
        )
    )
    per_doc = joined.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        F.array_sort(
            F.collect_list(F.struct(F.col("g"), F.col("nlp")))
        ).alias("__arr"),
    )
    fold = (
        "aggregate(transform(__arr, x -> x.nlp), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            (F.expr(fold) / F.col("n_bigrams").cast("double")).alias("xent"),
        )
    )
