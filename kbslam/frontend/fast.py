"""FAST-9/16 corner detection, fully vectorized over the image plane.

TPU-native replacement for the FAST stage inside cv::ORB
(reference config: threshold 20, VisualOdometry.cpp:15). Instead of the
CPU's pointer-chasing per-pixel test, we build all 16 Bresenham-circle
shifts as whole-image tensors and evaluate every pixel on the VPU at
once; the contiguous-arc test is a reduction over 16 rotated windows.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp

from kbslam.frontend.image import shift2d

# Bresenham circle of radius 3, clockwise from 12 o'clock: (dy, dx).
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9  # FAST-9


def _sliding_windows(arrs, L, op):
    """op-reduction over every length-L window of the list (van Herk:
    blockwise forward/backward prefix passes, ~2 ops/element instead of
    L-1 ops/window — the naive form dominated the FAST stage)."""
    n = len(arrs)
    F = [None] * n
    B = [None] * n
    for i in range(n):
        F[i] = arrs[i] if i % L == 0 else op(F[i - 1], arrs[i])
    for i in reversed(range(n)):
        last = (i % L == L - 1) or (i == n - 1)
        B[i] = arrs[i] if last else op(arrs[i], B[i + 1])
    return [op(B[s], F[s + L - 1]) for s in range(n - L + 1)]


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Corner response map [H, W]; 0 where not a FAST-9 corner.

    Score is the max-over-arcs of the min absolute circle-center
    difference within the arc — the standard "max threshold for which
    this is still a corner" response used for NMS.
    """
    center = img
    diff = [shift2d(img, dy, dx) - center for (dy, dx) in CIRCLE]  # 16x[H,W]

    # bright: diff > t; dark: diff < -t, evaluated per arc of 9.
    ext = diff + diff[: ARC_LEN - 1]                 # circular, 24 entries
    # windows[s] = min/max over the 9-long arc starting at s
    bright_score = _sliding_windows(ext, ARC_LEN, jnp.minimum)
    dark_score = _sliding_windows(ext, ARC_LEN, jnp.maximum)
    bright = functools.reduce(jnp.maximum, bright_score)  # best bright margin
    dark = -functools.reduce(jnp.minimum, dark_score)     # best dark margin
    score = jnp.maximum(bright, dark)
    return jnp.where(score > threshold, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only strict 3x3 local maxima (zero elsewhere)."""
    neigh = [shift2d(score, dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if not (dy == 0 and dx == 0)]
    is_max = jnp.ones_like(score, dtype=bool)
    for n in neigh:
        is_max &= score >= n
    # break ties deterministically: require strictly greater than the
    # lexicographically-later half of the neighborhood
    later = [shift2d(score, dy, dx) for (dy, dx) in
             ((0, 1), (1, -1), (1, 0), (1, 1))]
    for n in later:
        is_max &= score > n
    return jnp.where(is_max, score, 0.0)


def border_mask(h: int, w: int, border: int) -> jnp.ndarray:
    """True inside the detection region (edge_threshold=31 in the reference)."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
