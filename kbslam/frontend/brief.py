"""Rotated BRIEF (rBRIEF) 256-bit descriptors.

Functional equivalent of cv::ORB's steered-BRIEF stage: 256 pixel-pair
comparisons in a 31x31 patch, with the sampling pattern rotated by the
keypoint's IC angle. The reference relies on OpenCV's learned
bit_pattern_31; we use a deterministic Gaussian pattern (seed fixed,
sigma = patch/5, offsets clipped to +-13) — the classic BRIEF
construction — which has equivalent matching behavior while keeping the
code free of copied tables. Bits are stored unpacked ([N, 256] uint8 in
{0,1}) so the matcher can feed them straight to the MXU as int8.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

DESc_BITS = 256
PATTERN_CLIP = 13  # keeps rotated samples within the 31-px edge margin


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """[256, 4] int32 (x1, y1, x2, y2) sampling offsets."""
    rng = np.random.default_rng(42)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(DESc_BITS, 4))
    return np.clip(np.round(pts), -PATTERN_CLIP, PATTERN_CLIP).astype(np.int32)


def describe(
    blurred: jnp.ndarray,
    xy: jnp.ndarray,
    angle: jnp.ndarray,
) -> jnp.ndarray:
    """Descriptors for keypoints on one pyramid level.

    blurred: [H, W] Gaussian-blurred level image.
    xy: [N, 2] float (x, y) level coords; angle: [N] radians.
    Returns [N, 256] uint8 bits. Gathers 512 rotated samples per
    keypoint in one flat take() — XLA turns this into a single gather.
    """
    h, w = blurred.shape
    pat = jnp.asarray(brief_pattern())  # [256, 4]
    p1 = pat[:, :2].astype(jnp.float32)  # (x, y)
    p2 = pat[:, 2:].astype(jnp.float32)

    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]

    def rot(p):  # p: [256, 2] -> [N, 256, 2]
        x = p[None, :, 0] * ca[:, None] - p[None, :, 1] * sa[:, None]
        y = p[None, :, 0] * sa[:, None] + p[None, :, 1] * ca[:, None]
        return jnp.stack([x, y], axis=-1)

    base = xy[:, None, :]  # [N, 1, 2]
    q1 = jnp.round(base + rot(p1)).astype(jnp.int32)
    q2 = jnp.round(base + rot(p2)).astype(jnp.int32)

    def sample(q):
        xq = jnp.clip(q[..., 0], 0, w - 1)
        yq = jnp.clip(q[..., 1], 0, h - 1)
        return blurred.reshape(-1)[(yq * w + xq).reshape(-1)].reshape(q.shape[:-1])

    return (sample(q1) < sample(q2)).astype(jnp.uint8)


def pack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] {0,1} -> [N, 32] uint8 packed (LSB-first per byte)."""
    n = desc.shape[0]
    d = desc.reshape(n, 32, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint32)
    return jnp.sum(d.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[N, 32] uint8 -> [N, 256] {0,1} uint8."""
    n = packed.shape[0]
    bits = (packed[:, :, None].astype(jnp.uint32) >> jnp.arange(8, dtype=jnp.uint32)) & 1
    return bits.reshape(n, 256).astype(jnp.uint8)
