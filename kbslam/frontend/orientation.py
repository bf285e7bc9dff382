"""Keypoint orientation by intensity centroid (IC), computed densely.

cv::ORB assigns each keypoint the angle of the intensity centroid of a
circular patch (radius = half patch = 15): theta = atan2(m01, m10).
Rather than gathering a patch per keypoint, we convolve the level image
once with x- and y-weighted circular kernels — two small convolutions
that XLA maps onto the MXU — and sample the resulting m10/m01 maps at
keypoint locations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _ic_kernels(radius: int):
    """Circular-disc kernels weighted by x and by y, [2r+1, 2r+1]."""
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    # cv::ORB uses the same u_max quantization of the disc; a true disc
    # mask is statistically equivalent.
    disc = (xs * xs + ys * ys) <= radius * radius
    kx = (xs * disc).astype(np.float32)
    ky = (ys * disc).astype(np.float32)
    return kx, ky


def moment_maps(img: jnp.ndarray, radius: int = 15):
    """Dense (m10, m01) maps via 2D convolution (correlation) with disc kernels."""
    kx, ky = _ic_kernels(radius)
    kern = jnp.stack([jnp.asarray(kx), jnp.asarray(ky)])  # [2, K, K]
    x = img[None, None]  # [1, 1, H, W]
    out = jax.lax.conv_general_dilated(
        x,
        kern[:, None],  # [out=2, in=1, K, K]
        window_strides=(1, 1),
        padding="SAME",
    )[0]
    return out[0], out[1]  # m10, m01


def angles_at(m10: jnp.ndarray, m01: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample orientation (radians) at integer keypoint coords [N, 2] (x, y)."""
    x = xy[..., 0].astype(jnp.int32)
    y = xy[..., 1].astype(jnp.int32)
    return jnp.arctan2(m01[y, x], m10[y, x])
