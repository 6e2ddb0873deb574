"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

These are the corpus-hygiene stages a 100 TB pretraining pipeline runs
before/alongside indexing (the reference engine has no equivalent — they
extend SURVEY.md §2 per the build brief). All of them are pure
row-local column arithmetic built from ``functions.dialect`` fragments:

* executed JVM-side under whole-stage codegen (``F.expr`` over built-in
  functions — zero Python in the executor path);
* no shuffle — cost scales linearly with the scan, and filters on their
  outputs (e.g. ``quality_score > t``) sit directly above the parquet
  scan so Catalyst can prune columns/row groups;
* every op has a bit-identical DuckDB oracle generated from the same
  fragment source (see ``gate.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions import dialect as D
from cs_search_engine_architecture_spark.operators.partitioning import (
    widen_input,
)

# language-marker stopword sets for the n-gram/stopword-hit heuristic
# (tiny, deterministic; argmax with fixed tie-break order)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "pour"),
}
LANG_ORDER = ("en", "es", "de", "fr")  # deterministic tie-break

# BPE-ish pre-tokenizer pieces: letter runs, single digits, single
# non-alnum-non-space marks (a cheap stand-in for a GPT-2-style regex)
BPE_PIECE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"

EN_STOPWORDS = LANG_MARKERS["en"]


def _in_list(var: str, words: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"{var} in ({quoted})"


def marker_hits_sql(dialect: str, lang: str, toks: str = "toks") -> str:
    """Count of tokens (with multiplicity) in ``lang``'s marker set."""
    fn = "len" if dialect == D.DUCKDB else "size"
    flt = "list_filter" if dialect == D.DUCKDB else "filter"
    return f"{fn}({flt}({toks}, t -> {_in_list('t', LANG_MARKERS[lang])}))"


def lang_id_sql(dialect: str, toks: str = "toks") -> str:
    """Argmax language over marker-hit counts; 'und' when all zero.
    Ties resolved in LANG_ORDER (first wins)."""
    hits = {lang: marker_hits_sql(dialect, lang, toks) for lang in LANG_ORDER}
    greatest = "greatest(" + ", ".join(hits.values()) + ")"
    whens = " ".join(
        f"when {hits[lang]} = _mx then '{lang}'" for lang in LANG_ORDER
    )
    # inline _mx: both engines lack a let-binding in expressions, so we
    # repeat the greatest() — constant-folded per row, still codegen'd
    return (
        f"(case when {greatest} = 0 then 'und' "
        + " ".join(
            f"when {hits[lang]} = {greatest} then '{lang}'"
            for lang in LANG_ORDER
        )
        + " end)"
    )


def quality_sql(dialect: str, text: str = "text", toks: str = "toks") -> dict[str, str]:
    """Quality-signal expressions keyed by output column name."""
    nchars = f"CAST(length({text}) AS BIGINT)"
    ntok = f"CAST({D.array_size(dialect, toks)} AS BIGINT)"
    alpha = (
        f"CAST(length(regexp_replace(lower({text}), '[^a-z]', "
        + ("''" if dialect == D.DUCKDB else "''")
        + ")) AS DOUBLE)"
    )
    if dialect == D.DUCKDB:
        alpha = f"CAST(length(regexp_replace(lower({text}), '[^a-z]', '', 'g')) AS DOUBLE)"
    digit = (
        f"CAST(length(regexp_replace({text}, '[^0-9]', '', 'g')) AS DOUBLE)"
        if dialect == D.DUCKDB
        else f"CAST(length(regexp_replace({text}, '[^0-9]', '')) AS DOUBLE)"
    )
    stop_hits = marker_hits_sql(dialect, "en", toks)
    mean_tok = (
        f"(case when {ntok} = 0 then 0.0 else "
        f"CAST({D.reduce_bigint(dialect, D.transform(dialect, toks, 't -> CAST(length(t) AS BIGINT)'), '(acc, x) -> acc + x')} AS DOUBLE) / {ntok} end)"
    )
    return {
        "n_chars": nchars,
        "n_tokens": ntok,
        "alpha_ratio": f"(case when {nchars} = 0 then 0.0 else {alpha} / {nchars} end)",
        "digit_ratio": f"(case when {nchars} = 0 then 0.0 else {digit} / {nchars} end)",
        "stopword_ratio": (
            f"(case when {ntok} = 0 then 0.0 else "
            f"CAST({stop_hits} AS DOUBLE) / {ntok} end)"
        ),
        "mean_token_len": mean_tok,
    }


def token_counts_sql(dialect: str, text: str = "text", toks: str = "toks") -> dict[str, str]:
    """Whitespace-word count and BPE-ish piece count."""
    if dialect == D.DUCKDB:
        ws = (
            f"len(list_filter(str_split({text}, ' '), w -> length(w) > 0))"
        )
        bpe = f"len(regexp_extract_all(lower({text}), '{BPE_PIECE_RE}'))"
    else:
        ws = (
            f"size(filter(split({text}, ' '), w -> length(w) > 0))"
        )
        bpe = f"size(regexp_extract_all(lower({text}), '{BPE_PIECE_RE}', 0))"
    return {
        "ws_tokens": f"CAST({ws} AS BIGINT)",
        "bpe_pieces": f"CAST({bpe} AS BIGINT)",
        "distinct_terms": (
            f"CAST(len(list_distinct({toks})) AS BIGINT)"
            if dialect == D.DUCKDB
            else f"CAST(size(array_distinct({toks})) AS BIGINT)"
        ),
    }


def repetition_sql(dialect: str, text: str = "text", toks: str = "toks") -> dict[str, str]:
    """Gopher-style repetition signals (Rae et al. 2021 'Scaling
    Language Models', §A1.1 repetition filters — public): duplicate
    fraction over lines, words, and word n-grams. High values flag the
    boilerplate/templated/spammy docs a pretraining pipeline drops.

    ``dup_X_frac = 1 - |distinct X| / |X|`` — pure row-local array
    arithmetic; no per-doc O(n²) (the top-fraction variant needs a mode
    computation, which neither engine's fold supports without struct
    accumulators — the duplicate-fraction family is the row-local-safe
    subset)."""
    if dialect == D.DUCKDB:
        lines = f"string_split({text}, chr(10))"

        def dupfrac(arr: str) -> str:
            return (
                f"(case when len({arr}) = 0 then 0.0 else "
                f"1.0 - CAST(len(list_distinct({arr})) AS DOUBLE) "
                f"/ len({arr}) end)"
            )
    else:
        lines = f"split({text}, '\\n')"

        def dupfrac(arr: str) -> str:
            return (
                f"(case when size({arr}) = 0 then 0.0 else "
                f"1.0 - CAST(size(array_distinct({arr})) AS DOUBLE) "
                f"/ size({arr}) end)"
            )

    return {
        "dup_line_frac": dupfrac(lines),
        "dup_word_frac": dupfrac(toks),
        "dup_bigram_frac": dupfrac(D.shingles(dialect, toks, n=2)),
        "dup_trigram_frac": dupfrac(D.shingles(dialect, toks, n=3)),
    }


# ------------------------------------------------------------ operators

def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return widen_input(df).withColumn(
        "toks", F.expr(D.tokens(D.SPARK, text_col))
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — marker-stopword-hit argmax heuristic."""
    return with_tokens(df, text_col).select(
        "doc_id", F.expr(lang_id_sql(D.SPARK)).alias("lang_pred")
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, alpha_ratio, digit_ratio,
    stopword_ratio, mean_token_len) — all double-precision ratios."""
    exprs = quality_sql(D.SPARK, text_col)
    return with_tokens(df, text_col).select(
        "doc_id", *[F.expr(e).alias(name) for name, e in exprs.items()]
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_pieces, distinct_terms)."""
    exprs = token_counts_sql(D.SPARK, text_col)
    return with_tokens(df, text_col).select(
        "doc_id", *[F.expr(e).alias(name) for name, e in exprs.items()]
    )


def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dup_line_frac, dup_word_frac, dup_bigram_frac,
    dup_trigram_frac) — Gopher repetition filters, row-local."""
    exprs = repetition_sql(D.SPARK, text_col)
    return with_tokens(df, text_col).select(
        "doc_id", *[F.expr(e).alias(name) for name, e in exprs.items()]
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — order-sensitive Karp-Rabin rolling hash
    of the token sequence; exact-dup detection that survives whitespace
    and punctuation reformatting (unlike md5 of the raw text)."""
    return with_tokens(df, text_col).select(
        "doc_id",
        F.expr(D.rolling_fingerprint(D.SPARK)).alias("fingerprint"),
    )


def quality_score_col(exprs: dict[str, Column] | None = None) -> Column:
    """Composite quality score in [0,1]: rewards alpha-heavy, stopword-
    bearing, mid-length docs. Deterministic; weights are arbitrary but
    fixed."""
    return (
        F.least(F.lit(1.0), F.col("n_tokens") / F.lit(200.0)) * F.lit(0.4)
        + F.col("alpha_ratio") * F.lit(0.3)
        + F.least(F.lit(1.0), F.col("stopword_ratio") * F.lit(5.0)) * F.lit(0.3)
    ).alias("quality_score")


def redact_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted) — PII-shaped spans (emails, IPv4s, phone-like
    numbers) replaced with typed placeholder tokens. Pure row-local
    ``regexp_replace`` chain (whole-stage codegen; the 100 TB cost is
    the scan itself)."""
    return df.select(
        "doc_id", F.expr(D.redact(D.SPARK, text_col)).alias("redacted")
    )


def _split_label(key_expr: str, seed: str, train: float, val: float):
    """The shared bucket-hash -> train/val/test mapping (one source of
    truth: `split_assign` and `split_assign_leakage_safe` pin mutual
    agreement outside clusters, so their threshold arithmetic and
    label chain must never diverge)."""
    bucket = F.expr(D.split_bucket(D.SPARK, key_expr, seed))
    t_hi = int(train * D.SPLIT_BUCKETS)
    v_hi = t_hi + int(val * D.SPLIT_BUCKETS)
    return (
        F.when(bucket < t_hi, F.lit("train"))
        .when(bucket < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split")
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s1",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """(doc_id, split) — deterministic, content-independent train/val/
    test assignment from a seeded hash of the row id. Properties that
    matter at 100 TB: reproducible across runs and engines (md5-based,
    no RNG state), stable under repartitioning (keyed on the id, not
    the row position — ``randomSplit`` is neither), and re-seedable for
    fresh folds. Row-local; no shuffle."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        _split_label(id_col, seed, train, val),
    )


def split_assign_leakage_safe(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s1",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """(doc_id, split) — like ``split_assign`` but near-dup-cluster
    aware: every member of a dup cluster hashes its CLUSTER id (the
    cluster's min doc_id from ``dedup.dup_clusters``), so a document
    and its near-duplicates can never straddle the train/test
    boundary — the leakage mode plain per-doc hashing leaves open
    (a test doc whose near-copy sits in train is memorized, not
    generalized). Unclustered docs hash their own id, so their
    assignment is IDENTICAL to ``split_assign`` under the same seed
    (the two operators agree everywhere except inside clusters).

    ``clusters`` is any (doc_id, cluster_id) frame — typically
    ``dup_clusters(<pair generator>)``. Shape at 100 TB: one
    equi-join corpus ⋈ cluster table on doc_id (the cluster table
    holds only docs with at least one near-dup — a small fraction of
    the corpus), then the same row-local bucket hash as
    ``split_assign``. No window, no extra shuffle beyond the join."""
    cl = clusters.select(
        F.col("doc_id").alias("_cl_doc"), F.col("cluster_id").alias("_cl_id")
    )
    keyed = df.select(F.col(id_col).alias("doc_id")).join(
        cl, F.col("doc_id") == F.col("_cl_doc"), "left"
    )
    return keyed.select(
        "doc_id",
        _split_label("coalesce(_cl_id, doc_id)", seed, train, val),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    id_col: str = "doc_id",
    seed: str = "s1",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its seeded
    hash bucket falls under its stratum's fraction — the standard
    "rebalance the language/source mix" step in pretraining pipelines.
    Same properties as ``split_assign`` (reproducible, repartition-
    stable, re-seedable) and row-local: the 100 TB cost is the scan, and
    the filter sits directly on it. Spark's ``sampleBy`` is neither
    deterministic across runs nor expressible in the oracle."""
    bucket = F.expr(D.split_bucket(D.SPARK, id_col, seed))
    thr = None
    for key, frac in sorted(fractions.items()):
        lim = F.lit(int(frac * D.SPLIT_BUCKETS))
        cond = F.col(stratum_col) == key
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    default_lim = F.lit(int(default * D.SPLIT_BUCKETS))
    thr = default_lim if thr is None else thr.otherwise(default_lim)
    return df.where(bucket < thr)


def mixture_fractions(
    df: DataFrame, stratum_col: str, target_shares: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep-fractions that rebalance ``df`` to the target
    mixture while keeping as much data as possible: the binding
    stratum (smallest count/share ratio) is kept whole and every other
    stratum is downsampled to match — the DoReMi/"domain weights" data
    mixing step. One bounded aggregation (#strata rows to the driver);
    arithmetic is plain IEEE double ops in a fixed order
    (c/share per stratum → min → share·scale/c), so the DuckDB oracle
    reproduces the exact fractions. Strata absent from
    ``target_shares`` get no entry (``stratified_sample``'s
    default=0.0 drops them)."""
    bad = [s for s, v in target_shares.items() if not v > 0]
    if bad:
        raise ValueError(f"target shares must be > 0: {bad}")
    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
        if r["s"] in target_shares
    }
    if not counts:
        raise ValueError(
            f"no target stratum present in column {stratum_col!r}: "
            f"wanted {sorted(target_shares)}"
        )
    scale = min(counts[s] / target_shares[s] for s in counts)
    # the binding stratum's share*scale/c would be 1.0 in exact
    # arithmetic but can round DOWN a ulp in IEEE (dropping its bucket
    # 999) — clamp every stratum AT the min ratio to exactly 1.0; the
    # oracle mirrors with CASE WHEN c/share = scale THEN 1000
    return {
        s: (
            1.0
            if counts[s] / target_shares[s] == scale
            else target_shares[s] * scale / counts[s]
        )
        for s in counts
    }


def resample_to_mixture(
    df: DataFrame,
    stratum_col: str,
    target_shares: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "s1",
) -> DataFrame:
    """Deterministic resample of ``df`` to the target per-stratum
    mixture: ``stratified_sample`` driven by ``mixture_fractions`` —
    same hash-bucket filter sitting directly on the scan (row-local;
    the only extra cost over a plain scan is one tiny counts
    aggregation up front). Reproducible across runs and partitionings;
    re-seedable."""
    fracs = mixture_fractions(df, stratum_col, target_shares)
    return stratified_sample(
        df, stratum_col, fracs, default=0.0, id_col=id_col, seed=seed
    )


def mixture_copy_plan(
    df: DataFrame,
    stratum_col: str,
    target_shares: dict[str, float],
    total: int | None = None,
) -> dict[str, tuple[int, int]]:
    """Per-stratum ``(repeats, extra_thr60)`` copy plan that resamples
    ``df`` to the target mixture WITH REPETITION — the "epochs per
    domain" recipe (LLaMA-style data mixes repeat small high-value
    domains rather than dropping everything to the smallest): stratum
    ``k`` with count ``c_k`` owes ``out_k = floor(share_k/Σshares ·
    T)`` output rows (``T`` = ``total`` or the present-strata input
    size), delivered as ``out_k // c_k`` whole copies of every doc
    plus one extra copy of the ~``out_k % c_k`` docs whose seeded
    60-bit hash falls under ``extra_thr60 = (out_k % c_k)·2^60 //
    c_k``. All arithmetic after the single ``share·T`` double multiply
    is integer-exact, and the plan is derived from one tiny counts
    aggregation — the oracle recomputes it from the same normalized-
    share literals."""
    bad = [s for s, v in target_shares.items() if not v > 0]
    if bad:
        raise ValueError(f"target shares must be > 0: {bad}")
    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
        if r["s"] in target_shares
    }
    if not counts:
        raise ValueError(
            f"no target stratum present in column {stratum_col!r}: "
            f"wanted {sorted(target_shares)}"
        )
    return _copy_plan(counts, target_shares, total)


def _copy_plan(
    counts: dict, target_shares: dict, total: int | None
) -> dict:
    """The pure arithmetic of ``mixture_copy_plan`` over an
    already-collected ``{stratum: count}`` dict."""
    # fold shares in target_shares' OWN insertion order (filtered to
    # present strata), never counts order: counts comes from collect()
    # whose row order Spark does not guarantee, and a different double
    # fold order can shift denom by an ulp and flip floor(share·T) by
    # a whole doc — the gate oracle embeds literals computed with this
    # exact fold, so both sides must use it
    denom = sum(v for s, v in target_shares.items() if s in counts)
    t_out = total if total is not None else sum(counts.values())
    plan = {}
    for s, c in counts.items():
        out = int(target_shares[s] / denom * t_out)
        plan[s] = (out // c, ((out % c) << 60) // c)
    return plan


def upsample_to_mixture(
    df: DataFrame,
    stratum_col: str,
    target_shares: dict[str, float],
    total: int | None = None,
    id_col: str = "doc_id",
    seed: str = "u1",
) -> DataFrame:
    """Deterministic repeat-count resampling to the target mixture:
    every row of a target stratum appears ``repeats`` or ``repeats+1``
    times (per ``mixture_copy_plan``), tagged with a 1-based
    ``copy_no``; strata absent from ``target_shares`` are dropped.
    Unifies up- and downsampling (a stratum above target gets
    ``repeats = 0`` plus a fractional hash-threshold keep). Row-local
    after the one tiny counts agg: CASE literals + a bounded
    ``explode(sequence(...))`` sitting directly on the scan."""
    plan = mixture_copy_plan(df, stratum_col, target_shares, total)
    with_h = df.where(
        F.col(stratum_col).isin(list(plan.keys()))
    ).withColumn(
        "_u_md5",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
    )
    key = F.expr(D.hex_prefix60(D.SPARK, "_u_md5"))
    rep = thr = None
    for s, (r, t) in sorted(plan.items()):
        cond = F.col(stratum_col) == s
        rep = F.when(cond, F.lit(r)) if rep is None else rep.when(cond, F.lit(r))
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
    copies = rep + F.when(key < thr, F.lit(1)).otherwise(F.lit(0))
    return (
        with_h.withColumn("_copies", copies.cast("long"))
        .where(F.col("_copies") > 0)
        .withColumn(
            "copy_no",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_copies"))),
        )
        .drop("_u_md5", "_copies")
    )


def line_dedup(
    df: DataFrame,
    min_doc_count: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """C4-style global line deduplication: drop every line that occurs
    in ≥ ``min_doc_count`` DISTINCT documents (boilerplate — headers,
    nav text, license banners) and reassemble the survivors in order.
    Returns (doc_id, cleaned).

    Distributed shape: posexplode lines → count distinct docs per line
    hash (one map-side-combined shuffle on the near-uniform md5 key) →
    anti-join the boilerplate hashes back (AQE broadcasts when the hot
    set is small — the common case — and falls back to a shuffle join
    on the uniform md5 key when web-scale boilerplate grows past the
    broadcast threshold; never forced) → re-aggregate per doc with an
    order-restoring sort_array. Empty docs and docs whose every line is
    boilerplate still emit a row (empty string), so the op is
    row-preserving."""
    lines = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    hot = (
        lines.groupBy(F.md5("line").alias("h"))
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") >= min_doc_count)
        .select("h")
    )
    kept = lines.join(
        hot, F.md5(F.col("line")) == F.col("h"), "left_anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("cleaned")
    )
    return (
        df.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", F.coalesce("cleaned", F.lit("")).alias("cleaned"))
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_no, chunk_text, n_tokens) — sliding token windows
    of ``chunk_size`` every ``stride`` tokens (overlap = size - stride),
    the long-document splitting step for context-bounded training /
    embedding. Row-local explode (no shuffle; output rows ≈ corpus
    tokens / stride); empty docs emit one empty chunk, so the op is
    doc-preserving."""
    starts = F.explode(
        F.sequence(
            F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(stride)
        )
    ).alias("start")
    chunk = F.slice(F.col("toks"), F.col("start"), chunk_size)
    return (
        with_tokens(df, text_col)
        .select("doc_id", "toks", starts)
        .select(
            "doc_id",
            ((F.col("start") - 1) / stride).cast("int").alias("chunk_no"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("n_tokens"),
        )
    )


HASH_EMBED_DIMS = 64


def hash_embeddings(
    df: DataFrame, dims: int = HASH_EMBED_DIMS, text_col: str = "text"
) -> DataFrame:
    """(doc_id, embedding array<float>) — deterministic feature-hashing
    text embedding: every token occurrence adds ±1 (sign and dimension
    both md5-derived) to one of ``dims`` buckets; the count vector is
    L2-normalized. An HONEST stand-in for a learned embedding model
    (none ships in this environment — documented gap): deterministic,
    cross-engine reproducible, and good enough for the vector machinery
    (ANN, dedup, hybrid) to run end-to-end on text alone. Cosine under
    this embedding ≈ token-multiset similarity.

    Shape: explode -> groupBy(doc_id, dim) integer sums (map-side
    combined, <= ``dims`` rows per doc survive the shuffle) -> one tiny
    groupBy(doc_id) assembling the dense vector via map_from_entries +
    a sequence/transform HOF. The former single-groupBy pivot carried
    ``dims`` conditional aggregates in one operator — its generated
    aggregate method blew the JVM 64KB codegen limit and silently fell
    back to interpreted row-mode (same failure class as the LSH
    inline-md5 lesson); the narrow-then-assemble shape stays inside
    whole-stage codegen (pinned by test_hash_embeddings_codegen_clean).
    Exact — no float accumulation until the final normalize (integer
    bucket sums both shapes, bit-identical output). Empty docs get the
    zero vector."""
    h = D.token_hash(D.SPARK, "t")
    occ = widen_input(df).select(
        "doc_id", F.explode(F.expr(D.tokens(D.SPARK, text_col))).alias("t")
    ).select(
        "doc_id",
        F.expr(f"{h} % {dims}").alias("dim"),
        F.expr(f"1 - 2 * (({h} DIV {dims}) % 2)").alias("sign"),
    )
    sums = occ.groupBy("doc_id", "dim").agg(
        F.sum("sign").alias("v")
    )
    entries = sums.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("dim"), F.col("v")))
        ).alias("m")
    )
    embedded = (
        entries.select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {dims - 1}), "
                "d -> coalesce(m[d], CAST(0 AS BIGINT)))"
            ).alias("raw"),
        )
        .select(
            "doc_id",
            "raw",
            F.expr(
                "sqrt(CAST(aggregate(raw, CAST(0 AS BIGINT), "
                "(a, x) -> a + x * x) AS DOUBLE))"
            ).alias("norm"),
        )
        .select(
            "doc_id",
            F.expr(
                "transform(raw, x -> IF(norm > 0, "
                "CAST(x / norm AS FLOAT), CAST(0.0 AS FLOAT)))"
            ).alias("embedding"),
        )
    )
    zero = F.array(*[F.lit(0.0).cast("float") for _ in range(dims)])
    return (
        df.select("doc_id")
        .join(embedded, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("embedding", zero).alias("embedding")
        )
    )


def hash_embed_text(text: str, dims: int = HASH_EMBED_DIMS) -> list[float]:
    """Driver-side mirror of ``hash_embeddings`` for a query string:
    same simple-analyzer tokens, same md5-derived dim/sign, same
    normalization — a query embeds exactly like a corpus doc."""
    import hashlib
    import math
    import re

    pows = [31**j for j in range(8)]
    v = [0] * dims
    for t in re.findall(r"[a-z0-9]+", text.lower()):
        hx = hashlib.md5(t.encode()).hexdigest()
        h = sum(ord(hx[j]) * pows[j] for j in range(8))
        v[h % dims] += 1 - 2 * ((h // dims) % 2)
    norm = math.sqrt(sum(x * x for x in v))
    if norm == 0:
        return [0.0] * dims
    import numpy as np

    return [float(np.float32(x / norm)) for x in v]
