"""Span-level exact-substring deduplication (duplicate W-gram spans).

Training-data-pipeline extension (the reference has no dedup at all):
the substring-level dedup of Lee et al., *"Deduplicating Training Data
Makes Language Models Better"* (ACL 2022) — find every run of ``w``
consecutive tokens that occurs more than once anywhere in the corpus,
report the merged duplicated spans per document, and optionally cut
all-but-the-first occurrence out of the training text. Document-level
dedup (``dedup.py``) misses these: boilerplate headers, license
blocks, and quoted passages duplicate heavily inside otherwise-unique
documents.

The published algorithm builds a monolithic suffix array; that is a
single-machine shape. The Spark-first equivalent used here is W-gram
fingerprinting, the standard distributed reformulation:

1. **gram_occurrences** — one row per token position: explode the
   per-doc W-gram md5 list (row-local column math; rows out = total
   token count, the same cardinality the tokenizer already shuffles).
2. **duplicated occurrences** — per-hash count + ``min(struct(doc_id,
   pos))`` mark a hash duplicated (count > 1) and name its canonical
   kept occurrence. Deliberately an AGGREGATE + join rather than a
   ``row_number`` window: the aggregate partial-combines map-side, so
   a hot boilerplate gram (one hash in 10⁸ docs) never lands as one
   giant window partition, and the join back is AQE-skew-splittable
   (contrast: suffix sorting has pathological skew on repeated text).
3. **duplicate_spans** — per-document gaps-and-islands merge of the
   duplicated gram positions into maximal ``[span_start, span_end]``
   token ranges (overlapping or adjacent grams merge; pure integer
   window arithmetic, oracle-mirrorable bit-for-bit).
4. **remove_duplicate_spans** — islands over the *removable* (rank>1)
   occurrences, exploded to token positions (bounded by the removed
   token count), anti-joined against the token stream, re-assembled in
   position order. Every join is an equi-join; nothing broadcasts the
   corpus and nothing collects to the driver.

Removal operates on the normalized token stream (lowercased
``[a-z0-9]+`` runs — ``dialect.tokens``, the same analyzer every other
dedup operator uses): the output ``text`` is the cleaned training
token sequence, not a byte-faithful edit of the original markup.
That matches the published setting (they dedup the tokenized corpus).

Self-overlapping duplicates (periodic text like ``x x x x ...``) are
removed greedily: the merged cut range of the rank>1 occurrences can
overlap the canonical occurrence's tail, collapsing the run to its
first token. This matches the published greedy overlapping-span
removal, is deterministic (the gate oracle computes the identical
result), and is pinned by
``test_periodic_text_collapses_deterministically`` — the keep-first
guarantee of one FULLY-surviving occurrence per duplicated gram holds
whenever occurrences don't overlap each other (the non-pathological
case, asserted corpus-wide on the fixture).

Like ``dedup.py``, every expression comes from ``functions.dialect``
fragments so the DuckDB gate oracle is bit-identical, and everything
is whole-stage-codegen'd built-ins — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions import dialect as D
from cs_search_engine_architecture_spark.operators.partitioning import (
    widen_input,
)

SPAN_W = 8  # default gram width (tokens); Lee et al. use 50 at web scale


def gram_occurrences(
    df: DataFrame, w: int = SPAN_W, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, gram_hash): one row per W-gram start position
    (1-based token index). Docs with fewer than ``w`` tokens emit
    nothing. Row-local until the explode; rows out ≈ token count."""
    toks = widen_input(df).select(
        "doc_id", F.expr(D.tokens(D.SPARK, text_col)).alias("toks")
    )
    return toks.select(
        "doc_id",
        F.posexplode(F.expr(D.gram_hashes(D.SPARK, "toks", w))).alias(
            "pos0", "gram_hash"
        ),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "gram_hash"
    )


def _occurrence_stats(df: DataFrame, w: int, text_col: str) -> DataFrame:
    """Occurrences + per-hash ``n_occ`` and the canonical ``first``
    occurrence (the (doc_id, pos) minimum). Deliberately NOT a
    ``row_number`` window over ``partitionBy(gram_hash)``: a hot
    boilerplate gram (a license header shared by 10⁸ docs) would put
    all its occurrences in ONE window partition, and AQE cannot split
    a skewed window. ``min(struct)``/count partial-aggregate map-side
    (the skew collapses before the shuffle), and the join back is an
    equi-join AQE's skew handling CAN split. Keep-first semantics are
    identical: rank 1 ⇔ equal to the per-hash minimum."""
    return _occ_with_stats(gram_occurrences(df, w, text_col))


def _occ_with_stats(occ: DataFrame) -> DataFrame:
    stats = occ.groupBy("gram_hash").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    return occ.join(stats, "gram_hash")


def _islands(occ: DataFrame, w: int) -> DataFrame:
    """Gaps-and-islands merge of gram start positions into maximal
    token spans: a gram at ``pos`` extends the current span when it
    starts at or before ``prev_end + 1`` (overlap or adjacency).
    Output: (doc_id, span_start, span_end, n_grams)."""
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = occ.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos")
            > F.coalesce(
                F.max(F.col("pos") + (w - 1)).over(prev), F.lit(-1)
            )
            + 1,
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    cum = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.select(
        "doc_id", "pos", F.sum("new_island").over(cum).alias("island")
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (w - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    ).select("doc_id", "span_start", "span_end", "n_grams")


def duplicate_spans(
    df: DataFrame,
    w: int = SPAN_W,
    text_col: str = "text",
    stage_dir: str | None = None,
) -> DataFrame:
    """Maximal duplicated token spans per document: every token range
    covered by W-grams that occur more than once in the corpus
    (including the canonical first occurrence — this is the detection
    view; ``remove_duplicate_spans`` is the keep-first edit view).
    Output: (doc_id, span_start, span_end, n_grams), token positions
    1-based inclusive. ``stage_dir`` parquet-stages the occurrence
    frame once instead of recomputing the tokenize+hash+explode on
    both sides of the stats join (see ``remove_duplicate_spans``)."""
    if stage_dir is None:
        occ_stats = _occurrence_stats(df, w, text_col)
    else:
        _, occ = _stage_occurrences(df, w, text_col, stage_dir)
        occ_stats = _occ_with_stats(occ)
    dup = occ_stats.where(F.col("n_occ") > 1)
    return _islands(dup.select("doc_id", "pos"), w)


def removable_spans(
    df: DataFrame, w: int = SPAN_W, text_col: str = "text"
) -> DataFrame:
    """Token spans to CUT under the keep-first policy: the islands of
    every occurrence that is not its gram's global first (the
    ``(doc_id, pos)`` minimum). Deterministic: re-running on the same
    corpus always selects the same survivors."""
    rem = _occurrence_stats(df, w, text_col).where(
        (F.col("n_occ") > 1)
        & ~(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
    )
    return _islands(rem.select("doc_id", "pos"), w)


def _rebuild_excluding(
    df: DataFrame, cut_spans: DataFrame, text_col: str
) -> DataFrame:
    """Cleaned corpus: (doc_id, text, n_tokens_kept, n_tokens_removed)
    with every token range in ``cut_spans`` (doc_id, span_start,
    span_end) removed from the normalized token stream. A document
    reduced to nothing stays in the output with empty text.

    Shape: cut islands explode to their token positions (rows bounded
    by the number of REMOVED tokens, not corpus size) and anti-join
    the (doc_id, pos) token stream — equi-joins only."""
    toks = widen_input(df).select(
        "doc_id", F.expr(D.tokens(D.SPARK, text_col)).alias("toks")
    )
    return _rebuild_from_tokens(toks, cut_spans)


def _rebuild_from_tokens(toks: DataFrame, cut_spans: DataFrame) -> DataFrame:
    """``_rebuild_excluding`` over a pre-tokenized ``(doc_id, toks)``
    frame — the staged path reads this from parquet so the corpus is
    tokenized exactly once.

    r6 shape: the cut islands AGGREGATE to one small range-list row per
    affected doc, left-join onto the token frame, and the rebuild is a
    row-local HOF filter over the in-order ``toks`` array (a token
    survives iff its 1-based position is inside no cut range). The old
    shape posexploded EVERY corpus token to rows, anti-joined the cut
    positions, and re-assembled docs via a corpus-wide
    ``collect_list`` group — three shuffles of O(corpus tokens)
    replaced by one shuffle of O(cut islands). Islands are disjoint and
    the array is already in position order, so the space-joined text is
    byte-identical (the ``dup_spans`` gate hashes md5(text))."""
    ranges = cut_spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("cuts")
    )
    kept_arr = (
        "filter(transform(toks, (t, i) -> struct(i + 1 AS pos, t AS tok)), "
        "s -> cuts IS NULL OR "
        "NOT exists(cuts, c -> s.pos >= c.s AND s.pos <= c.e))"
    )
    return (
        toks.join(ranges, "doc_id", "left")
        .select("doc_id", F.size("toks").alias("n_tokens"),
                F.expr(kept_arr).alias("kept"))
        .select(
            "doc_id",
            F.expr("array_join(transform(kept, s -> s.tok), ' ')").alias(
                "text"
            ),
            F.size("kept").alias("n_tokens_kept"),
            (F.col("n_tokens") - F.size("kept")).alias("n_tokens_removed"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    w: int = SPAN_W,
    text_col: str = "text",
    stage_dir: str | None = None,
) -> DataFrame:
    """Cleaned corpus with every removable span cut (see
    ``_rebuild_excluding`` for the output contract and shape). The
    first occurrence of each duplicated gram survives.

    ``stage_dir`` (optional) materializes the tokenized corpus and the
    gram-occurrence frame to parquet once (the SPIMI discipline the
    index build uses) instead of recomputing the tokenize+hash+explode
    lineage on every consumer — the default plan tokenizes the corpus
    three times (both sides of the stats join plus the rebuild's token
    stream). Results are identical (pinned by
    ``test_staged_removal_matches_default``); at cluster scale the
    staged path turns three corpus-wide regex/md5 passes into one
    write + cheap columnar re-reads."""
    if stage_dir is None:
        return _rebuild_excluding(
            df, removable_spans(df, w, text_col), text_col
        )
    toks, occ = _stage_occurrences(df, w, text_col, stage_dir)
    rem = _occ_with_stats(occ).where(
        (F.col("n_occ") > 1)
        & ~(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
    )
    return _rebuild_from_tokens(
        toks, _islands(rem.select("doc_id", "pos"), w)
    )


def _stage_occurrences(
    df: DataFrame, w: int, text_col: str, stage_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Write ``(doc_id, toks)`` and ``(doc_id, pos, gram_hash)`` to
    parquet under ``stage_dir`` and return readers over the staged
    files. The expensive regex tokenize runs once (toks write) and the
    md5 gram hashing once (occ write, reading staged toks); every
    downstream consumer scans compressed scalar columns."""
    import os

    spark = df.sparkSession
    toks_path = os.path.join(stage_dir, "toks")
    occ_path = os.path.join(stage_dir, "occ")
    widen_input(df).select(
        "doc_id", F.expr(D.tokens(D.SPARK, text_col)).alias("toks")
    ).write.mode("overwrite").parquet(toks_path)
    toks = spark.read.parquet(toks_path)
    toks.select(
        "doc_id",
        F.posexplode(F.expr(D.gram_hashes(D.SPARK, "toks", w))).alias(
            "pos0", "gram_hash"
        ),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "gram_hash"
    ).write.mode("overwrite").parquet(occ_path)
    return toks, spark.read.parquet(occ_path)


# ----------------------------------------------------------------------
# Incremental span store: ingest-time duplicate-span probing.
#
# Same segment protocol as dedup.build_dedup_store (CLAUDE.md): the
# corpus is gram-hashed exactly ONCE into a skinny per-hash stats
# table; every ingest batch probes/append under its OWN segment with
# overwrite semantics, so at-least-once replay rewrites instead of
# double-appending, and a probe from inside a batch passes
# exclude_segment=<own> to stay replay-deterministic. There is no
# tombstone tier: gram stats are corpus-level counts, so the
# compaction analog is a rebuild over current_corpus.


def build_span_store(
    df: DataFrame, out_path: str, w: int = SPAN_W, text_col: str = "text"
) -> None:
    """Persist the corpus's per-gram stats (gram_hash, n_occ,
    first_doc, first_pos) under ``grams/seg=base`` + ``meta.json``
    pinning ``w``. At 100 TB the probe then streams a table a fraction
    of the corpus size instead of re-hashing the corpus per batch."""
    import json
    import os

    _gram_stats(df, w, text_col).write.mode("overwrite").parquet(
        os.path.join(out_path, "grams", "seg=base")
    )
    with open(os.path.join(out_path, "meta.json"), "w") as fh:
        json.dump({"w": w, "text_col": text_col}, fh)


def _gram_stats(df: DataFrame, w: int, text_col: str) -> DataFrame:
    occ = gram_occurrences(df, w, text_col)
    return occ.groupBy("gram_hash").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min("doc_id").alias("first_doc"),
        F.min(F.struct("doc_id", "pos")).getField("pos").alias("first_pos"),
    )


def _span_store_meta(store_path: str) -> dict:
    import json
    import os

    with open(os.path.join(store_path, "meta.json")) as fh:
        return json.load(fh)


def span_store_append(
    spark, store_path: str, new_df: DataFrame, segment=None
) -> None:
    """FROZEN-W append: the batch's gram stats land under
    ``grams/seg=<segment>`` with OVERWRITE semantics (stable segment id
    ⇒ idempotent replay). When omitted, a fresh ``m<N>`` manual slot is
    allocated (disjoint from integer streaming batch ids)."""
    import os

    from cs_search_engine_architecture_spark.operators.dedup import (
        _next_manual_segment,
    )

    meta = _span_store_meta(store_path)
    if segment is None:
        segment = _next_manual_segment(store_path, subdir="grams")
    _gram_stats(new_df, meta["w"], meta["text_col"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(store_path, "grams", f"seg={segment}"))


def probe_duplicate_spans(
    spark,
    store_path: str,
    batch: DataFrame,
    exclude_segment=None,
) -> DataFrame:
    """Duplicated token spans IN THE BATCH against (store ∪ batch): a
    batch gram occurrence is duplicated iff its hash already exists in
    the store (the store copy is canonical) or it repeats within the
    batch. Returns merged (doc_id, span_start, span_end, n_grams) over
    BATCH docs only — one streamed pass of the skinny store table, the
    corpus is never re-hashed. ``exclude_segment`` drops the probing
    batch's own appended segment (partition-pruned), keeping replays
    deterministic."""
    dup = _probe_removable(spark, store_path, batch, exclude_segment,
                           keep_batch_first=True)
    return _islands(dup, _span_store_meta(store_path)["w"])


def probe_remove_duplicate_spans(
    spark,
    store_path: str,
    batch: DataFrame,
    exclude_segment=None,
) -> DataFrame:
    """Ingest-time span cut: the batch with every span already present
    in the store removed (store is canonical), plus intra-batch
    keep-first dedup — the streaming counterpart of
    ``remove_duplicate_spans`` (same output contract)."""
    meta = _span_store_meta(store_path)
    rem = _probe_removable(spark, store_path, batch, exclude_segment,
                           keep_batch_first=False)
    return _rebuild_excluding(
        batch, _islands(rem, meta["w"]), meta["text_col"]
    )


def _probe_removable(
    spark, store_path: str, batch: DataFrame, exclude_segment,
    keep_batch_first: bool,
) -> DataFrame:
    """(doc_id, pos) of batch gram occurrences that are duplicated
    (detection view, keep_batch_first=True: include the batch-first
    occurrence) or removable (removal view: a store hit removes every
    batch occurrence; an intra-batch dup keeps its (doc_id, pos)
    minimum)."""
    import os

    meta = _span_store_meta(store_path)
    occ = gram_occurrences(batch, meta["w"], meta["text_col"])
    store = spark.read.parquet(os.path.join(store_path, "grams"))
    if exclude_segment is not None:
        store = store.where(F.col("seg") != str(exclude_segment))
    store_hit = occ.join(
        store.select("gram_hash"), "gram_hash", "left_semi"
    ).select("doc_id", "pos")
    # the corpus keep-first stats shape verbatim (skew-safe aggregate,
    # never a row_number window) — one definition for both paths
    intra = _occ_with_stats(occ).where(F.col("n_occ") > 1)
    if not keep_batch_first:
        intra = intra.where(
            ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
    return (
        store_hit.unionByName(intra.select("doc_id", "pos")).distinct()
    )
