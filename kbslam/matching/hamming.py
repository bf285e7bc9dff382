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

# Plain Python ints, NOT jnp values: a module-level device scalar
# captured as a jit constant permanently degrades the dispatch path on
# tunneled TPU platforms (measured: every subsequent call +30 ms).
# Invalid-entry sentinel: must exceed any real 256-bit Hamming distance
# AND be exactly representable in bfloat16 (the reduction dtype).
_SENTINEL = 512


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
    # The reduction passes over the [Nq, Nt] matrix are HBM-bandwidth
    # bound (~113 MB at int32 for 9216x3072). Hamming distances are
    # integers <= 256 — exact in bfloat16 — so the masked matrix is
    # narrowed to bf16 in the matmul epilogue (sentinel 512, also
    # bf16-exact), halving every pass's traffic.
    sent = jnp.bfloat16(_SENTINEL)
    d16 = jnp.where(train_valid[None, :] & query_valid[:, None],
                    dist.astype(jnp.bfloat16), sent)

    # top-2 smallest along axis 1 via double argmin: two VPU reduction
    # passes. (lax.top_k here lets XLA fuse the distance matmul into the
    # sort comparator — measured 90 ms vs 0.06 ms on TPU v5e.)
    best = jnp.min(d16, axis=1)
    best_idx = jnp.argmin(d16, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d16.shape, 1)
    second = jnp.min(jnp.where(cols == best_idx[:, None], sent, d16), axis=1)

    best_i = best.astype(jnp.int32)
    second_i = second.astype(jnp.int32)
    is_match = (
        query_valid
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        & (best_i < _SENTINEL)
    )
    if cross_check:
        rev_best = jnp.argmin(d16, axis=0).astype(jnp.int32)  # per train col
        rows = jnp.arange(d16.shape[0], dtype=jnp.int32)
        is_match = is_match & (rev_best[best_idx] == rows)
    return MatchResult(best_idx, best_i, second_i, is_match)
