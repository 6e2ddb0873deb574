"""Property tests for the new kernels: ragged varint encoding, the
OR/AND WAND shard kernels (against numpy brute force, with negative
scores), and empty-corpus builds."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cs_search_engine_architecture_spark.operators import wand
from cs_search_engine_architecture_spark.operators.compression import (
    delta_encode,
    encode_scores,
    varint_encode,
    varint_encode_ragged,
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), max_size=20),
        max_size=20,
    )
)
def test_varint_encode_ragged_matches_per_group(groups):
    flat = np.array([v for g in groups for v in g], dtype=np.uint64)
    counts = np.array([len(g) for g in groups], dtype=np.int64)
    got = varint_encode_ragged(flat, counts)
    want = [varint_encode(np.array(g, dtype=np.uint64)) for g in groups]
    assert got == want
    assert b"".join(got) == varint_encode(flat)


def _make_block_frame(rng, num_terms, num_docs, block_size, density=0.3):
    """Random posting lists (scores may be NEGATIVE) packed into the
    block-metadata frame the WAND kernels consume; returns (pdf, truth)
    where truth maps term -> {doc: score}."""
    rows = []
    truth: dict[str, dict[int, float]] = {}
    for t in range(num_terms):
        term = f"t{t}"
        docs = np.sort(
            rng.choice(
                num_docs, size=max(1, int(num_docs * density)), replace=False
            )
        ).astype(np.int64)
        scores = rng.normal(0, 2, size=len(docs))  # negatives included
        truth[term] = dict(zip(docs.tolist(), scores.tolist()))
        for start in range(0, len(docs), block_size):
            end = min(start + block_size, len(docs))
            d = docs[start:end].astype(np.uint64)
            s = scores[start:end].astype(np.float32)
            rows.append(
                {
                    "term": term,
                    "first_doc": int(d[0]),
                    "last_doc": int(d[-1]),
                    "count": end - start,
                    "max_score": float(s.max()),
                    "min_score": float(s.min()),
                    "doc_ids_bin": varint_encode(delta_encode(d)),
                    "scores_bin": encode_scores(s),
                }
            )
    # float32 round-trip the truth the same way the blocks store scores
    for term in truth:
        truth[term] = {
            d: float(np.float32(s)) for d, s in truth[term].items()
        }
    return pd.DataFrame(rows), truth


def _brute_or(truth, k, lo, hi):
    total: dict[int, float] = {}
    for scores in truth.values():
        for d, s in scores.items():
            if lo <= d < hi:
                total[d] = total.get(d, 0.0) + s
    order = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, round(s, 9)) for d, s in order]


def _brute_and(truth, k, lo, hi):
    terms = list(truth)
    docs = set(truth[terms[0]])
    for t in terms[1:]:
        docs &= set(truth[t])
    total = {
        d: sum(truth[t][d] for t in terms)
        for d in docs
        if lo <= d < hi
    }
    order = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, round(s, 9)) for d, s in order]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 5, 50])
def test_shard_wand_or_kernel_matches_brute_force(seed, k):
    rng = np.random.default_rng(seed)
    pdf, truth = _make_block_frame(
        rng, num_terms=rng.integers(1, 5), num_docs=500,
        block_size=int(rng.integers(4, 32)),
    )
    out = wand.shard_wand_topk(pdf, k, lo=0, hi=10**9)
    got = [
        (int(r.doc_id), round(float(r.score), 9)) for r in out.itertuples()
    ]
    assert got == _brute_or(truth, k, 0, 10**9)


@pytest.mark.parametrize("seed", range(8))
def test_shard_wand_or_kernel_window(seed):
    rng = np.random.default_rng(100 + seed)
    pdf, truth = _make_block_frame(
        rng, num_terms=3, num_docs=500, block_size=16
    )
    lo, hi = 120, 380
    out = wand.shard_wand_topk(pdf, 10, lo=lo, hi=hi)
    got = [
        (int(r.doc_id), round(float(r.score), 9)) for r in out.itertuples()
    ]
    assert got == _brute_or(truth, 10, lo, hi)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 10])
def test_shard_and_kernel_matches_brute_force(seed, k):
    rng = np.random.default_rng(200 + seed)
    nt = int(rng.integers(2, 4))
    pdf, truth = _make_block_frame(
        rng, num_terms=nt, num_docs=400, block_size=8, density=0.5
    )
    terms = [f"t{i}" for i in range(nt)]
    out = wand.shard_and_topk(pdf, terms, k, lo=0, hi=10**9)
    got = [
        (int(r.doc_id), round(float(r.score), 9)) for r in out.itertuples()
    ]
    assert got == _brute_and(truth, k, 0, 10**9)


# ------------------------------------------------------ empty corpus

def test_empty_corpus_build_and_query(spark):
    from cs_search_engine_architecture_spark.engine import SearchEngine
    from cs_search_engine_architecture_spark.operators.indexer import (
        build_index,
    )

    path = "/tmp/spark_sea_test_empty_idx"
    shutil.rmtree(path, ignore_errors=True)
    empty = spark.createDataFrame([], "doc_id long, text string")
    meta = build_index(
        spark, empty, path, fields=["text"], analyzer="simple", num_buckets=4
    )
    assert meta["num_documents"] == 0 and meta["num_postings"] == 0
    eng = SearchEngine(spark, path, cache=False)
    assert eng.search_collect("spark or data", 5) == []
    assert eng.search_collect("spark", 5) == []
    assert eng.search_collect('"a b" and not c', 5) == []


# ------------------------------------- vectorized scan == scalar tokenize

_TEXT_ALPHABET = st.sampled_from(
    list("abcXYZ019 .,()_=\t\n\x00") + ["é", "ß", "中", "🙂"]
)
_DOC = st.text(alphabet=_TEXT_ALPHABET, max_size=60)


@given(
    texts=st.lists(
        st.one_of(st.none(), _DOC), min_size=1, max_size=12
    ),
    analyzer=st.sampled_from(["reference", "simple"]),
)
@settings(max_examples=150, deadline=None)
def test_vectorized_scan_matches_scalar(texts, analyzer):
    """The batch-vectorized field scan (NUL-joined buffer + UTF-32
    codepoint-mask positions + vocab-level filters) must produce
    occurrence-identical (doc, term, position) streams to the scalar
    ``tokenize()`` loop, for arbitrary text including non-ASCII,
    embedded NULs, long runs, and None fields."""
    from cs_search_engine_architecture_spark.functions.tokenizer import (
        tokenize,
    )
    from cs_search_engine_architecture_spark.operators.indexer import (
        _vectorized_field_scan,
    )

    want = []
    for i, t in enumerate(texts):
        toks, poss = tokenize(
            t if isinstance(t, str) else "", is_query=False, analyzer=analyzer
        )
        want.extend((i, tok, pos) for tok, pos in zip(toks, poss))

    di, co, terms, po = _vectorized_field_scan(
        np.array(texts, dtype=object), analyzer
    )
    got = [
        (int(d), terms[int(c)], int(p)) for d, c, p in zip(di, co, po)
    ]
    # the vectorized path emits in buffer order == (doc, position) order;
    # the scalar path per doc is position-ordered too
    assert got == want


@given(
    texts=st.lists(st.text(alphabet="ab1 -", max_size=25), min_size=1, max_size=8)
)
@settings(max_examples=60, deadline=None)
def test_vectorized_scan_long_run_and_eot(texts):
    """Adversarial quirk inputs: 51+ char alpha runs, 5-digit runs, and
    end-of-text bypass (append forms that end each doc with a filtered
    class to exercise the bypass)."""
    from cs_search_engine_architecture_spark.functions.tokenizer import (
        tokenize,
    )
    from cs_search_engine_architecture_spark.operators.indexer import (
        _vectorized_field_scan,
    )

    docs = []
    for i, t in enumerate(texts):
        suffix = ["a" * 51, "12345", "mix3d", ""][i % 4]
        docs.append((t + " " + suffix) if suffix else t)
    want = []
    for i, t in enumerate(docs):
        toks, poss = tokenize(t, is_query=False, analyzer="reference")
        want.extend((i, tok, pos) for tok, pos in zip(toks, poss))
    di, co, terms, po = _vectorized_field_scan(
        np.array(docs, dtype=object), "reference"
    )
    got = [(int(d), terms[int(c)], int(p)) for d, c, p in zip(di, co, po)]
    assert got == want
