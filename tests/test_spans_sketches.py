"""Span-level substring dedup (operators/spans.py) and the bottom-k
cardinality sketch (operators/sketches.py).

The dual-dialect gate (``dup_spans``, ``agg_sketches``) proves
bit-parity with DuckDB at sf0.01; these tests pin the SEMANTICS on
hand corpora plus the invariants the gate can't see (keep-first
exactness, removal bookkeeping, estimator error bounds, engine
surface wiring).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.operators import (
    sketches as SK,
    spans as SP,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


W = 3


def test_duplicate_spans_hand_example(spark):
    # docs 0 and 1 share the 4-token run "a b c d" (two 3-grams, one
    # merged span); doc 2 is clean.
    docs = _corpus(
        spark,
        [
            "a b c d x y z",
            "q q a b c d q",
            "u v w u v w0",  # repeated bigram only — below W, no span
        ],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in SP.duplicate_spans(docs, W).collect()
    }
    assert spans == {(0, 1, 4, 2), (1, 3, 6, 2)}


def test_remove_keeps_first_occurrence_exactly(spark):
    docs = _corpus(
        spark,
        [
            "a b c d x y z",
            "q q a b c d q",
        ],
    )
    out = {
        r.doc_id: r for r in SP.remove_duplicate_spans(docs, W).collect()
    }
    # doc 0 is the canonical (lowest doc_id, pos) — untouched
    assert out[0].text == "a b c d x y z"
    assert out[0].n_tokens_removed == 0
    # doc 1 loses exactly the duplicated run
    assert out[1].text == "q q q"
    assert out[1].n_tokens_kept == 3
    assert out[1].n_tokens_removed == 4


def test_intra_doc_duplicates_keep_first(spark):
    docs = _corpus(spark, ["a b c z z a b c"])
    out = SP.remove_duplicate_spans(docs, W).collect()[0]
    assert out.text == "a b c z z"
    assert out.n_tokens_removed == 3


def test_doc_reduced_to_nothing_survives_with_empty_text(spark):
    docs = _corpus(spark, ["a b c", "a b c"])
    out = {
        r.doc_id: r for r in SP.remove_duplicate_spans(docs, W).collect()
    }
    assert out[0].text == "a b c"
    assert out[1].text == ""
    assert out[1].n_tokens_kept == 0
    assert out[1].n_tokens_removed == 3


def test_short_docs_emit_no_grams_and_pass_through(spark):
    docs = _corpus(spark, ["a b", "a b", ""])
    assert SP.gram_occurrences(docs, W).count() == 0
    assert SP.duplicate_spans(docs, W).count() == 0
    out = {
        r.doc_id: r.text
        for r in SP.remove_duplicate_spans(docs, W).collect()
    }
    assert out == {0: "a b", 1: "a b", 2: ""}


def test_staged_removal_matches_default(spark, tmp_path):
    """``stage_dir`` (tokenize/hash once to parquet, SPIMI discipline)
    must be plan-only: identical rows to the default recompute path on
    a corpus exercising inter-doc, intra-doc, and total-wipe dups."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    default = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
        for r in SP.remove_duplicate_spans(docs, W).collect()
    }
    staged = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
        for r in SP.remove_duplicate_spans(
            docs, W, stage_dir=str(tmp_path / "span_stage")
        ).collect()
    }
    assert staged == default
    det_default = {
        tuple(r) for r in SP.duplicate_spans(docs, W).collect()
    }
    det_staged = {
        tuple(r)
        for r in SP.duplicate_spans(
            docs, W, stage_dir=str(tmp_path / "det_stage")
        ).collect()
    }
    assert det_staged == det_default


def test_keep_first_invariant_on_fixture(spark, tmp_path):
    """Every duplicated gram hash retains EXACTLY ONE occurrence whose
    token range survives removal — the global (doc_id, pos) minimum."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = 8
    occ = SP.gram_occurrences(docs, w)
    cut = SP.removable_spans(docs, w).select(
        "doc_id",
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("pos"),
    )
    # an occurrence survives iff NONE of its w positions were cut
    occ_pos = occ.select(
        "doc_id", "pos", "gram_hash",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (w - 1))
        ).alias("tpos"),
    )
    hit = occ_pos.join(
        cut.withColumnRenamed("pos", "tpos"), ["doc_id", "tpos"], "left_semi"
    ).select("doc_id", "pos", "gram_hash").distinct()
    surviving = occ.join(hit, ["doc_id", "pos", "gram_hash"], "left_anti")
    dup_hashes = (
        occ.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("n"), F.min(F.struct("doc_id", "pos")).alias("first"))
        .where("n > 1")
    )
    check = (
        surviving.join(dup_hashes, "gram_hash")
        .groupBy("gram_hash", "first")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min(F.struct("doc_id", "pos")).alias("kept_min"),
        )
        .collect()
    )
    assert len(check) > 0
    for r in check:
        assert r.n_kept == 1, r
        assert (r.kept_min.doc_id, r.kept_min.pos) == (
            r.first.doc_id,
            r.first.pos,
        ), r


def test_sketch_exact_below_k(spark):
    df = spark.range(40).select(F.concat(F.lit("v"), "id").alias("v"))
    row = SK.approx_distinct(df, "v", 64).collect()[0]
    assert row.n_sketch == 40
    assert row.est_distinct == 40.0


def test_sketch_ignores_nulls_and_counts_distinct(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "v string"
    )
    row = SK.approx_distinct(df, "v", 8).collect()[0]
    assert row.n_sketch == 2 and row.est_distinct == 2.0


@pytest.mark.parametrize("n,k", [(5000, 64), (20000, 256)])
def test_sketch_estimate_error_bound(spark, n, k):
    """Relative error of the KMV estimator is ~1/sqrt(k-1); assert a
    generous 4-sigma band (deterministic: md5 hashing, fixed input)."""
    df = spark.range(n).select(F.concat(F.lit("item-"), "id").alias("v"))
    row = SK.approx_distinct(df, "v", k).collect()[0]
    assert row.n_sketch == k
    rel = abs(row.est_distinct - n) / n
    assert rel < 4.0 / (k - 1) ** 0.5, (row.est_distinct, n, rel)


def test_engine_cardinality_sketch_matches_operator(spark, tmp_path):
    """The serving surface = approx_distinct over the brute-force
    match set (filter-context: any admitting predicate leaves the
    sketch unchanged)."""
    from cs_search_engine_architecture_spark.operators.indexer import (
        build_index,
    )
    from cs_search_engine_architecture_spark.engine import SearchEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, fields=["text"], analyzer="simple")
    eng = SearchEngine(spark, idx, cache=False)
    term = (
        docs.select(F.explode(F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
        )).alias("t"))
        .groupBy("t").count().orderBy(F.desc("count")).limit(1)
        .collect()[0].t
    )
    got = eng.cardinality_sketch(term, docs, "n_chars", k=16).collect()[0]
    matched = eng.search_df(term).select("doc_id")
    vals = docs.join(matched, "doc_id", "left_semi").select(
        F.col("n_chars").alias("v")
    )
    want = SK.approx_distinct(vals, "v", 16).collect()[0]
    assert (got.n_sketch, got.kth_hash, got.est_distinct) == (
        want.n_sketch,
        want.kth_hash,
        want.est_distinct,
    )
    filtered = eng.cardinality_sketch(
        term, docs, "n_chars", k=16, predicate=F.col("n_chars") >= 0
    ).collect()[0]
    assert filtered == got


def test_periodic_text_collapses_deterministically(spark):
    """Self-overlapping duplicates (periodic text): every gram after
    the first is rank>1, and the merged cut range overlaps the
    canonical occurrence's tail — the doc deterministically collapses
    to its first token. This mirrors the published greedy
    overlapping-span removal; the gate's DuckDB oracle computes the
    identical result, so the behavior is pinned, not accidental."""
    docs = _corpus(spark, ["x x x x x x x x x x x x"])
    out = SP.remove_duplicate_spans(docs, 3).collect()[0]
    assert out.text == "x"
    assert out.n_tokens_kept == 1 and out.n_tokens_removed == 11
    # detection view: one maximal span covering the whole doc
    det = SP.duplicate_spans(docs, 3).collect()
    assert [(r.span_start, r.span_end, r.n_grams) for r in det] == [(1, 12, 10)]


# ---------------------------------------------- incremental span store

def test_span_store_probe_detection_and_removal(spark, tmp_path):
    """Probe semantics: a batch gram is duplicated iff it exists in
    the persisted store (store copy canonical) or repeats within the
    batch; removal cuts store hits entirely and keeps the intra-batch
    first."""
    store = str(tmp_path / "span_store")
    corpus = _corpus(spark, ["a b c d e f", "m n o p q r"])
    SP.build_span_store(corpus, store, w=W)
    batch = spark.createDataFrame(
        [
            (10, "x y a b c d y z"),   # contains corpus run "a b c d"
            (11, "u v w k k k"),       # clean vs store
            (12, "u v w j j j"),       # shares "u v w" with 11 (intra)
        ],
        "doc_id long, text string",
    )
    det = {
        (r.doc_id, r.span_start, r.span_end)
        for r in SP.probe_duplicate_spans(spark, store, batch).collect()
    }
    # doc 10: grams at pos 3,4 -> span [3,6]; docs 11+12: gram "u v w"
    # at pos 1 -> span [1,3] in BOTH (detection view keeps the first)
    assert det == {(10, 3, 6), (11, 1, 3), (12, 1, 3)}
    out = {
        r.doc_id: r
        for r in SP.probe_remove_duplicate_spans(
            spark, store, batch
        ).collect()
    }
    assert out[10].text == "x y y z"      # store hit cut entirely
    assert out[11].text == "u v w k k k"  # intra-batch first kept
    assert out[12].text == "j j j"        # intra-batch dup cut
    # corpus docs themselves are NOT probed (store is canonical)
    assert set(out) == {10, 11, 12}


def test_span_store_append_and_replay_exclusion(spark, tmp_path):
    """Append under a stable segment is overwrite-idempotent, and a
    probe excluding the batch's own segment matches the pre-append
    probe exactly (the replay-determinism contract)."""
    store = str(tmp_path / "span_store")
    corpus = _corpus(spark, ["a b c d e f"])
    SP.build_span_store(corpus, store, w=W)
    batch = spark.createDataFrame(
        [(20, "p q r s t")], "doc_id long, text string"
    )
    before = SP.probe_duplicate_spans(spark, store, batch).collect()
    assert before == []
    SP.span_store_append(spark, store, batch, segment="7")
    # replay: re-append the same segment, then probe excluding it
    SP.span_store_append(spark, store, batch, segment="7")
    after_excl = SP.probe_duplicate_spans(
        spark, store, batch, exclude_segment="7"
    ).collect()
    assert after_excl == []  # identical to the first run
    # WITHOUT exclusion the batch collides with its own stored grams
    after = SP.probe_duplicate_spans(spark, store, batch).collect()
    assert len(after) == 1
    # a LATER batch sees the appended segment
    batch2 = spark.createDataFrame(
        [(30, "z p q r s t z")], "doc_id long, text string"
    )
    hit = SP.probe_duplicate_spans(spark, store, batch2).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in hit] == [(30, 2, 6)]
