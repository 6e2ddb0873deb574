"""Round-trip property tests for the varint/delta block kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cs_search_engine_architecture_spark.operators.compression import (
    decode_scores,
    delta_decode,
    delta_encode,
    encode_scores,
    grouped_delta_decode,
    grouped_delta_encode,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = varint_decode(varint_encode(arr))
    assert np.array_equal(got, arr)


def test_varint_sizes():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert len(varint_encode(np.array([2**64 - 1], dtype=np.uint64))) == 10
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300)
)
@settings(max_examples=150, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**31), min_size=0, max_size=20),
        max_size=40,
    )
)
@settings(max_examples=150, deadline=None)
def test_grouped_delta_roundtrip(groups):
    groups = [sorted(g) for g in groups]
    flat = np.array([x for g in groups for x in g], dtype=np.uint64)
    counts = np.array([len(g) for g in groups], dtype=np.int64)
    enc = grouped_delta_encode(flat, counts)
    got = grouped_delta_decode(enc, counts)
    assert np.array_equal(got, flat)


def test_scores_roundtrip():
    s = np.array([1.5, -2.25, 0.0, 3.14], dtype=np.float32)
    assert np.array_equal(decode_scores(encode_scores(s)), s)


def test_full_block_pipeline():
    doc_ids = np.array([3, 17, 17 + 500, 10**9, 10**12], dtype=np.uint64)
    enc = varint_encode(delta_encode(doc_ids))
    assert np.array_equal(delta_decode(varint_decode(enc)), doc_ids)
    # compression actually compresses: 5 uint64 = 40 raw bytes
    assert len(enc) < 40
