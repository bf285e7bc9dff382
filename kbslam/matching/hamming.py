"""Brute-force kNN Hamming matching on the MXU.

Replaces cv::BFMatcher(NORM_HAMMING)::knnMatch(k=2) + Lowe ratio test
(reference: VisualOdometry.cpp:18,35-62). With descriptors stored as
unpacked {0,1} int8 vectors, Hamming distance becomes a matmul:

    H(a, b) = |a| + |b| - 2 a.b

so the [Nq, 256] x [256, Nt] product rides the MXU's int8 path in one
launch instead of the CPU's N^2 popcount loop. Invalid (padding) rows
and columns are masked to a large distance.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Plain Python int, NOT jnp.int32: a module-level device scalar captured
# as a jit constant permanently degrades the dispatch path on tunneled
# TPU platforms (measured: every subsequent call +30 ms).
_BIG = 1 << 20


class MatchResult(NamedTuple):
    best_idx: jnp.ndarray     # [Nq] int32 index into train set
    best_dist: jnp.ndarray    # [Nq] int32 Hamming distance
    second_dist: jnp.ndarray  # [Nq] int32 distance of 2nd neighbor
    is_match: jnp.ndarray     # [Nq] bool — passed ratio test and validity


def hamming_distance_matrix(
    query: jnp.ndarray, train: jnp.ndarray
) -> jnp.ndarray:
    """[Nq, B] x [Nt, B] {0,1} descriptors -> [Nq, Nt] int32 distances."""
    q = query.astype(jnp.int8)
    t = train.astype(jnp.int8)
    dot = jax.lax.dot_general(
        q, t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    nq = jnp.sum(query.astype(jnp.int32), axis=1, keepdims=True)
    nt = jnp.sum(train.astype(jnp.int32), axis=1, keepdims=True)
    return nq + nt.T - 2 * dot


def knn2_ratio_match(
    query_desc: jnp.ndarray,
    query_valid: jnp.ndarray,
    train_desc: jnp.ndarray,
    train_valid: jnp.ndarray,
    ratio: float,
    cross_check: bool = False,
) -> MatchResult:
    """k=2 nearest neighbors + Lowe ratio test (ratio 0.6 in the reference).

    Matches the reference's direction: query = last keyframe
    descriptors, train = current frame descriptors
    (VisualOdometry.cpp:39). ``cross_check=True`` additionally requires
    mutual-best agreement (NOT in the reference — the reference's
    BFMatcher is created without crossCheck; this is an opt-in quality
    improvement, config: MatcherConfig.cross_check).
    """
    dist = hamming_distance_matrix(query_desc, train_desc)
    dist = jnp.where(train_valid[None, :], dist, _BIG)
    dist = jnp.where(query_valid[:, None], dist, _BIG)

    # top-2 smallest along axis 1 via double argmin: two VPU reduction
    # passes. (lax.top_k here lets XLA fuse the distance matmul into the
    # sort comparator — measured 90 ms vs 0.06 ms on TPU v5e.)
    best = jnp.min(dist, axis=1)
    best_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    second = jnp.min(jnp.where(cols == best_idx[:, None], _BIG, dist), axis=1)

    is_match = (
        query_valid
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        & (best < _BIG)
    )
    if cross_check:
        rev_best = jnp.argmin(dist, axis=0).astype(jnp.int32)  # per train col
        rows = jnp.arange(dist.shape[0], dtype=jnp.int32)
        is_match = is_match & (rev_best[best_idx] == rows)
    return MatchResult(best_idx, best, second, is_match)
