"""Distributed BPE vocabulary training + segmentation.

Building the tokenizer vocabulary is part of the LLM data pipeline the
same way dedup and packing are — and classic BPE training is an
ITERATIVE distributed algorithm: each merge step needs the global count
of every adjacent symbol pair. The standard trick makes it tractable at
corpus scale: train over the WORD-FREQUENCY table (one row per distinct
word, weighted by its corpus count), not the corpus itself — the working
set is vocabulary-sized, but at web scale that is still hundreds of
millions of rows, so it stays a DataFrame:

    word counts: one tokenize + groupBy over the corpus (map-side
      combined; the only corpus-sized job)
    per merge:   explode adjacent pairs weighted by word freq
                 -> groupBy(a, b) sum        (one shuffle on pair keys)
                 -> top-1 pair to the driver (count desc, then (a, b)
                    lexicographic — deterministic tie-break)
                 -> apply the merge to every word's piece list
                    (vocabulary-sized mapInPandas, no shuffle)
    state is localCheckpoint-pinned each round: iteration N's plan must
    not replay rounds 1..N-1 (same lineage discipline as dup_clusters).

``segment_corpus`` then applies the trained merge list to documents with
the standard rank-greedy BPE encoder inside mapInPandas (merges
broadcast as a plain closure list).

Scale honesty: one Spark job per merge is fine for hundreds of merges
(tokenizer prototyping, ablations) but a production 32k-merge vocabulary
wants the batched variant — ``train_bpe_batched`` accepts the top-K
MUTUALLY NON-OVERLAPPING pairs per round (no shared symbol between
accepted pairs, so their applications commute) and applies them in one
vocabulary pass, cutting driver round-trips ~K× while provably
producing the SAME merge list as the serial trainer (see its docstring
for the argument).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions import dialect as D
from cs_search_engine_architecture_spark.operators.partitioning import (
    widen_input,
)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the simple-analyzer token stream."""
    return (
        widen_input(df)
        .select(
            F.explode(F.expr(D.tokens(D.SPARK, text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _apply_merge(a: str, b: str):
    merged = a + b

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for pieces in pdf["pieces"]:
                ps = list(pieces)
                i, res = 0, []
                while i < len(ps):
                    if i + 1 < len(ps) and ps[i] == a and ps[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(ps[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"freq": pdf["freq"], "pieces": out})

    return fn


_STATE_SCHEMA = "freq long, pieces array<string>"

_PAIRS_EXPR = (
    "transform(sequence(1, size(pieces) - 1), "
    "i -> struct(pieces[i - 1] AS a, pieces[i] AS b))"
)


BPE_DRIVER_VOCAB_CAP = 2_000_000  # distinct words; ~100 MB driver-side


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus; returns
    the ordered merge list. Stops early when no pair reaches
    ``min_pair_count`` occurrences.

    r6: Spark does the one corpus-sized pass (``word_counts``); the
    merge loop then runs DRIVER-SIDE over the collected (word, freq)
    vocabulary whenever it fits ``BPE_DRIVER_VOCAB_CAP`` (the standard
    BPE-trainer shape — GPT-2's reference trainer is exactly this; the
    vocabulary is metadata-scale next to the corpus). Each distributed
    round previously cost a full job (shuffle + orderBy + collect +
    mapInPandas + checkpoint) of pure scheduling latency on a
    vocab-sized frame. Merge choice is integer frequency with the
    (count desc, a asc, b asc) tie-break; Python string comparison is
    code-point order == Spark's UTF8 binary order, so the merge list
    is bit-identical to the distributed loop's
    (``test_bpe_train_matches_serial_reference`` +
    ``bench.py``'s serial==batched assert pin it). Corpora past the
    cap fall back to the distributed loop unchanged."""
    wc = word_counts(df, text_col)
    head = wc.limit(BPE_DRIVER_VOCAB_CAP + 1).collect()
    if len(head) <= BPE_DRIVER_VOCAB_CAP:
        vocab = [(int(r["freq"]), list(r["word"])) for r in head]
        merges: list[tuple[str, str]] = []
        for _ in range(num_merges):
            counts: dict[tuple[str, str], int] = {}
            for freq, ps in vocab:
                for i in range(len(ps) - 1):
                    pair = (ps[i], ps[i + 1])
                    counts[pair] = counts.get(pair, 0) + freq
            if not counts:
                break
            (a, b), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
            if c < min_pair_count:
                break
            merges.append((a, b))
            merged = a + b
            for row in vocab:
                ps = row[1]
                if len(ps) < 2:
                    continue
                i, res = 0, []
                while i < len(ps):
                    if (
                        i + 1 < len(ps)
                        and ps[i] == a
                        and ps[i + 1] == b
                    ):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(ps[i])
                        i += 1
                row[1][:] = res
        return merges
    state = (
        wc
        .select(
            "freq",
            F.split(F.col("word"), "").alias("pieces"),
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            state.where(F.size("pieces") > 1)
            .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
        )
        best = pairs.orderBy(
            F.desc("c"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        state = state.mapInPandas(
            _apply_merge(a, b), _STATE_SCHEMA
        ).localCheckpoint()
    return merges


def _apply_merge_set(accepted: list[tuple[str, str]]):
    """One-pass application of a SYMBOL-DISJOINT merge set: a single
    left-to-right scan merging any adjacent pair in the set. Because no
    two accepted pairs share a symbol (inputs or outputs), the one-pass
    result is identical to applying them sequentially in rank order."""
    table = {(a, b): a + b for a, b in accepted}

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for pieces in pdf["pieces"]:
                ps = list(pieces)
                i, res = 0, []
                while i < len(ps):
                    m = (
                        table.get((ps[i], ps[i + 1]))
                        if i + 1 < len(ps)
                        else None
                    )
                    if m is not None:
                        res.append(m)
                        i += 2
                    else:
                        res.append(ps[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"freq": pdf["freq"], "pieces": out})

    return fn


def train_bpe_batched(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    batch_k: int = 8,
    candidate_pool: int | None = None,
) -> tuple[list[tuple[str, str]], int]:
    """Batched BPE training: identical merge list to ``train_bpe``, in
    ~K× fewer Spark rounds. Returns ``(merges, rounds)``.

    Per round, collect the top candidate pairs once and greedily accept
    a PREFIX of the (count desc, a, b) order, stopping at the first
    candidate that (a) shares a symbol — component or merged output —
    with an already-accepted pair, or (b) does not STRICTLY out-count
    every pair the accepted merges could create or touch. Why that
    reproduces the serial trainer exactly:

    * counts of pairs disjoint from an applied merge are invariant
      (merging (a,b) only consumes a/b adjacencies and only creates
      pairs involving the new symbol ab — it never creates a new
      adjacency between two pre-existing symbols);
    * every created pair's count is bounded by the pre-batch count of
      an existing pair overlapping the accepted set
      (count(x,ab) ≤ count(x,a); count(ab,y) ≤ count(b,y));
    * accepted pairs are a sorted PREFIX, so every non-accepted pair
      ranks below the next accepted one pre-batch and can only lose
      count — and the strictness guard (b) removes the one remaining
      edge where a created pair TIES the next accepted count and wins
      the lexicographic tie-break.

    So at each serial step the argmax is the next accepted pair. When
    the guards trip early the round degenerates toward serial (still
    exact); on Zipfian corpora the top counts are distinct and rounds
    shrink ~batch_k×."""
    state = (
        word_counts(df, text_col)
        .select("freq", F.split(F.col("word"), "").alias("pieces"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    rounds = 0
    pool = candidate_pool or max(4 * batch_k, 32)
    while len(merges) < num_merges:
        pairs = (
            state.where(F.size("pieces") > 1)
            .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
        )
        top = (
            pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(pool + 1)
            .collect()
        )
        rounds += 1
        if not top or top[0]["c"] < min_pair_count:
            break
        # counts below the collected pool are bounded by the pool tail
        tail_bound = top[-1]["c"] if len(top) > pool else 0
        accepted: list[tuple[str, str]] = []
        used: set[str] = set()
        for idx, r in enumerate(top[:pool]):
            a, b, c = r["a"], r["b"], r["c"]
            if c < min_pair_count or len(merges) + len(accepted) >= num_merges:
                break
            if accepted:
                if a in used or b in used or (a + b) in used:
                    break  # prefix rule: stop at the first overlap
                # strictness guard: c must STRICTLY beat anything a prior
                # accepted merge could have created — bounded by the
                # pre-batch count of ANY pair overlapping the accepted
                # set (in the pool, or the pool tail for pairs below it)
                bound = max(
                    [tail_bound]
                    + [
                        r2["c"]
                        for r2 in top[:pool]
                        if (r2["a"], r2["b"]) not in set(accepted)
                        and (
                            r2["a"] in used
                            or r2["b"] in used
                            or (r2["a"] + r2["b"]) in used
                        )
                    ]
                )
                if c <= bound:
                    break
            accepted.append((a, b))
            used.update((a, b, a + b))
        if not accepted:
            break
        merges.extend(accepted)
        state = state.mapInPandas(
            _apply_merge_set(accepted), _STATE_SCHEMA
        ).localCheckpoint()
    return merges, rounds


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE encoding of one word (lowest-rank merge first —
    the standard inference rule, which reproduces training exactly on
    the training corpus)."""
    ps = list(word)
    while len(ps) > 1:
        best_i, best_r = -1, None
        for i in range(len(ps) - 1):
            r = ranks.get((ps[i], ps[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        ps[best_i : best_i + 2] = [ps[best_i] + ps[best_i + 1]]
    return ps


def segment_corpus(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pieces array<string>) — the corpus segmented with the
    trained merges (rank-greedy, per-word memoized inside each batch)."""
    ranks = {m: i for i, m in enumerate(merges)}

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        memo: dict[str, list[str]] = {}
        tok = re.compile(r"[a-z0-9]+")
        for pdf in it:
            out = []
            for text in pdf[text_col]:
                pieces: list[str] = []
                for w in tok.findall((text or "").lower()):
                    enc = memo.get(w)
                    if enc is None:
                        memo[w] = enc = encode_word(w, ranks)
                    pieces.extend(enc)
                out.append(pieces)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "pieces": out}
            )

    return df.select("doc_id", text_col).mapInPandas(
        fn, "doc_id long, pieces array<string>"
    )
