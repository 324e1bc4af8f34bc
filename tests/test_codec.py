"""Varbyte codec round-trip + property tests (pure numpy, no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_nlp_classifier_spark.index.codec import (
    delta_decode,
    delta_encode,
    segmented_delta_decode,
    vb_decode,
    vb_encode,
)


def test_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_known_values():
    assert vb_encode(np.array([0], np.uint64)) == b"\x00"
    assert vb_encode(np.array([127], np.uint64)) == b"\x7f"
    assert vb_encode(np.array([128], np.uint64)) == b"\x80\x01"
    got = vb_decode(b"\x80\x01\x7f\x00")
    assert got.tolist() == [128, 127, 0]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), max_size=300
    )
)
def test_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(a)).tolist() == vals


def test_concatenation_self_delimiting():
    a = np.array([5, 300, 2**40], np.uint64)
    b = np.array([0, 1], np.uint64)
    assert vb_decode(vb_encode(a) + vb_encode(b)).tolist() == \
        a.tolist() + b.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=2**40),
        min_size=1, max_size=200, unique=True,
    )
)
def test_delta_roundtrip(ids):
    a = np.sort(np.array(ids, dtype=np.int64))
    assert delta_decode(delta_encode(a)).tolist() == a.tolist()


def test_segmented_delta_decode():
    seg1 = np.array([10, 20, 30], np.int64)
    seg2 = np.array([5, 6], np.int64)
    gaps = np.concatenate([delta_encode(seg1), delta_encode(seg2)])
    got = segmented_delta_decode(gaps, np.array([3, 2]))
    assert got.tolist() == [10, 20, 30, 5, 6]


def test_compression_ratio_dense_ids():
    ids = np.arange(1, 100_001, dtype=np.int64)
    enc = vb_encode(delta_encode(ids).astype(np.uint64))
    # dense gaps ≈ 1 byte/posting (first absolute value takes 3)
    assert len(enc) <= 100_000 + 4
