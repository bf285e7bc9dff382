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

_BIG = jnp.int32(1 << 20)


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
) -> MatchResult:
    """k=2 nearest neighbors + Lowe ratio test (ratio 0.6 in the reference).

    Matches the reference's direction: query = last keyframe
    descriptors, train = current frame descriptors
    (VisualOdometry.cpp:39).
    """
    dist = hamming_distance_matrix(query_desc, train_desc)
    dist = jnp.where(train_valid[None, :], dist, _BIG)

    # top-2 smallest along axis 1 via top_k on negated values
    neg2, idx2 = jax.lax.top_k(-dist, 2)
    best_idx = idx2[:, 0]
    best = -neg2[:, 0]
    second = -neg2[:, 1]

    is_match = (
        query_valid
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        & (best < _BIG)
    )
    return MatchResult(best_idx, best, second, is_match)
