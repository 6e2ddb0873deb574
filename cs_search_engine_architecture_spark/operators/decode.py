"""Posting-block decode: index scan -> per-term posting DataFrames.

Query-time analog of ``Engine._get_postings`` + ``deserialize_search_result_
postings`` (``sea/engine.pyx:326-364``, ``sea/document.pyx:164-215``). Term
and bucket predicates fold to literals, so Catalyst prunes to one
``term_bucket=`` directory and then to few row groups via parquet min/max
stats on ``term``; ``with_positions=False`` skips selecting (and therefore
reading and decoding) the position columns — the reference's "lazy
positions" as plain column pruning."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.operators.compression import (
    decode_scores,
    grouped_delta_decode,
    varint_decode,
)


def _decode_batches(with_positions: bool):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            docs_out: list[np.ndarray] = []
            scores_out: list[np.ndarray] = []
            pos_out: list[list] = []
            for row in pdf.itertuples(index=False):
                d = np.cumsum(varint_decode(row.doc_ids_bin), dtype=np.uint64)
                docs_out.append(d.astype(np.int64))
                scores_out.append(decode_scores(row.scores_bin))
                if with_positions:
                    counts = varint_decode(row.pos_counts_bin).astype(np.int64)
                    flat = grouped_delta_decode(
                        varint_decode(row.positions_bin), counts
                    ).astype(np.int32)
                    pos_out.extend(
                        arr.tolist()
                        for arr in np.split(flat, np.cumsum(counts)[:-1])
                    )
            if docs_out:
                doc_ids = np.concatenate(docs_out)
                scores = np.concatenate(scores_out).astype(np.float64)
            else:
                doc_ids = np.empty(0, dtype=np.int64)
                scores = np.empty(0, dtype=np.float64)
            out = {"doc_id": doc_ids, "score": scores}
            if with_positions:
                out["positions"] = pd.Series(pos_out, dtype="object")
            yield pd.DataFrame(out)

    return fn


def _decode_full_batches(num_fields: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_score, out_ff, out_fl, out_pos = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                d = np.cumsum(varint_decode(row.doc_ids_bin), dtype=np.uint64)
                s = decode_scores(row.scores_bin)
                ff = varint_decode(row.freqs_bin).astype(np.int64).reshape(
                    -1, num_fields
                )
                fl = varint_decode(row.lens_bin).astype(np.int64).reshape(
                    -1, num_fields
                )
                counts = varint_decode(row.pos_counts_bin).astype(np.int64)
                flat = grouped_delta_decode(
                    varint_decode(row.positions_bin), counts
                ).astype(np.int32)
                pos_lists = np.split(flat, np.cumsum(counts)[:-1])
                out_doc.append(d.astype(np.int64))
                out_score.append(s.astype(np.float64))
                out_ff.extend(r.tolist() for r in ff)
                out_fl.extend(r.tolist() for r in fl)
                out_pos.extend(p.tolist() for p in pos_lists)
            doc_ids = (
                np.concatenate(out_doc) if out_doc else np.empty(0, np.int64)
            )
            scores = (
                np.concatenate(out_score)
                if out_score
                else np.empty(0, np.float64)
            )
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "score": scores,
                    "field_freqs": pd.Series(out_ff, dtype="object"),
                    "field_lens": pd.Series(out_fl, dtype="object"),
                    "positions": pd.Series(out_pos, dtype="object"),
                }
            )

    return fn


def term_postings_full(
    blocks: DataFrame, term: str, num_buckets: int, num_fields: int
) -> DataFrame:
    """Fully decoded postings of one term — per-field frequencies and
    lengths included (the LTR feature path needs them; the scored
    boolean path uses the narrower ``term_postings``)."""
    from pyspark.sql import functions as F  # local to avoid shadowing

    filtered = blocks.where(
        (
            F.col("term_bucket")
            == F.pmod(F.xxhash64(F.lit(term)), F.lit(num_buckets)).cast("int")
        )
        & (F.col("term") == term)
    ).select(
        "doc_ids_bin",
        "scores_bin",
        "freqs_bin",
        "lens_bin",
        "pos_counts_bin",
        "positions_bin",
    )
    schema = (
        "doc_id long, score double, field_freqs array<int>, "
        "field_lens array<int>, positions array<int>"
    )
    return filtered.mapInPandas(_decode_full_batches(num_fields), schema)


def _decode_full_keep_term(num_fields: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        inner = _decode_full_batches(num_fields)
        for pdf in it:
            terms = []
            for row in pdf.itertuples(index=False):
                n = len(varint_decode(row.doc_ids_bin))
                terms.append(np.repeat(row.term, n))
            for out in inner(iter([pdf])):
                out.insert(
                    0,
                    "term",
                    np.concatenate(terms)
                    if terms
                    else np.empty(0, dtype=object),
                )
                yield out

    return fn


def multi_term_postings_full(
    blocks: DataFrame, terms: list[str], num_buckets: int, num_fields: int
) -> DataFrame:
    """Fully decoded ``(term, doc_id, score, field_freqs, field_lens,
    positions)`` for ALL ``terms`` in ONE pruned scan — the batched LTR
    feature path (offline training sweeps extract features for many
    queries per job; a per-term scan each would re-pay the scan cost
    len(terms) times). Same bucket+term pushdown as the single-term
    path, amortized."""
    if not terms:
        raise ValueError("multi_term_postings_full needs at least one term")
    from functools import reduce as _reduce
    from operator import or_ as _or

    cond = _reduce(
        _or,
        [
            (
                F.col("term_bucket")
                == F.pmod(
                    F.xxhash64(F.lit(t)), F.lit(num_buckets)
                ).cast("int")
            )
            & (F.col("term") == t)
            for t in terms
        ],
    ) if len(terms) <= 32 else (
        F.col("term").isin(list(terms))
    )
    filtered = blocks.where(cond).select(
        "term",
        "doc_ids_bin",
        "scores_bin",
        "freqs_bin",
        "lens_bin",
        "pos_counts_bin",
        "positions_bin",
    )
    schema = (
        "term string, doc_id long, score double, field_freqs array<int>, "
        "field_lens array<int>, positions array<int>"
    )
    return filtered.mapInPandas(_decode_full_keep_term(num_fields), schema)


def term_postings(
    blocks: DataFrame,
    term: str,
    num_buckets: int,
    with_positions: bool = False,
) -> DataFrame:
    """Decoded postings of one term: ``(doc_id, score[, positions])``,
    doc_id-sorted within each term by block construction."""
    cols = ["doc_ids_bin", "scores_bin"]
    if with_positions:
        cols += ["pos_counts_bin", "positions_bin"]
    schema = "doc_id long, score double" + (
        ", positions array<int>" if with_positions else ""
    )
    filtered = blocks.where(
        (
            F.col("term_bucket")
            == F.pmod(F.xxhash64(F.lit(term)), F.lit(num_buckets)).cast("int")
        )
        & (F.col("term") == term)
    ).select(*cols)
    return filtered.mapInPandas(_decode_batches(with_positions), schema)
