"""Property-based tests (hypothesis) for driver-side numerics that
back the newer operators — these run WITHOUT Spark (pure numpy), so
hypothesis can afford hundreds of examples per property."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_nlp_classifier_spark.operators.bloom import (
    _positions,
)
from elasticsearch_nlp_classifier_spark.operators.pq import (
    _l2_normalize,
    _train_books_on,
)

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(i64, min_size=1, max_size=64),
       st.sampled_from([64, 1 << 10, 1 << 16]),
       st.integers(min_value=1, max_value=11))
def test_bloom_positions_in_range_and_deterministic(hs, n_bits, k):
    h = np.array(hs, dtype=np.int64)
    p1 = _positions(h, n_bits, k)
    p2 = _positions(h, n_bits, k)
    assert p1.shape == (len(hs), k)
    assert (p1 == p2).all()
    assert (p1 < n_bits).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(i64, min_size=2, max_size=32).filter(
    lambda xs: len(set(xs)) > 1))
def test_bloom_insert_then_query_never_false_negative(hs):
    """Bitmap built from a hash set must report every member present —
    the bit math (shift/mask packing) replicated from
    build_content_bloom/bloom_seen_udf."""
    n_bits, k = 1 << 12, 5
    h = np.array(hs, dtype=np.int64)
    pos = _positions(h, n_bits, k).ravel()
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                     np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    qpos = _positions(h, n_bits, k)
    bits = (bitmap[(qpos >> np.uint64(3)).astype(np.int64)]
            >> (qpos & np.uint64(7)).astype(np.uint8)) & 1
    assert bits.all(axis=1).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=2, max_value=6),   # log2 n_codes
       st.integers(min_value=1, max_value=4),   # m
       st.integers(min_value=1, max_value=3),   # sub dim
       st.integers(min_value=0, max_value=10_000))
def test_pq_kmeans_is_deterministic_and_shaped(log_codes, m, sub, seed):
    n_codes = 1 << log_codes
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(max(n_codes * 3, 16), m * sub))
    b1 = _train_books_on(X, m, n_codes, iters=3, seed=42)
    b2 = _train_books_on(X, m, n_codes, iters=3, seed=42)
    assert b1.shape == (m, n_codes, sub)
    assert np.array_equal(b1, b2)
    assert np.isfinite(b1).all()


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=8),
       st.integers(min_value=0, max_value=10_000))
def test_pq_quantization_never_increases_distance_vs_mean(n, seed):
    """Each codebook centroid assignment must beat (or tie) assigning
    everything to the global subspace mean — k-means' monotonicity."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(32, n * 2))
    books = _train_books_on(X, m=n, n_codes=4, iters=5, seed=1)
    err_q = 0.0
    err_mean = 0.0
    for j in range(n):
        Xj = X[:, j * 2: (j + 1) * 2]
        d = ((Xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        err_q += d.min(axis=1).sum()
        err_mean += ((Xj - Xj.mean(axis=0)) ** 2).sum()
    assert err_q <= err_mean + 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=16))
def test_l2_normalize_unit_or_degenerate(vals):
    m = np.array([vals], dtype=np.float64)
    out = _l2_normalize(m)
    n = np.linalg.norm(out)
    assert np.isfinite(out).all()
    # subnormal inputs can underflow the squared norm to 0 — the
    # operator deliberately passes such degenerate vectors through
    # unscaled instead of dividing by 0
    assert abs(n - 1.0) < 1e-6 or np.linalg.norm(m) < 1e-150
