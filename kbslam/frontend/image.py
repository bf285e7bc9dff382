"""Image primitives: grayscale, resize pyramid, separable Gaussian blur.

Replaces the cv::cvtColor / pyramid / GaussianBlur stages inside
cv::ORB::detectAndCompute (reference: VisualOdometry.cpp:25-30). All
shapes are static per config so the whole frontend traces into one XLA
program.
"""
from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# BT.601 luma weights (what cv::cvtColor BGR2GRAY applies) — shared by
# the device path below and the host-side gray ingress (streaming.py)
GRAY_WEIGHTS = (0.299, 0.587, 0.114)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] uint8/float RGB -> [H, W] float32 grayscale.

    The reference converts RGB->BGR then BGR->GRAY (VisualOdometry.cpp:25-29),
    which is the standard luma on the original RGB: 0.299 R + 0.587 G + 0.114 B.
    """
    rgb = rgb.astype(jnp.float32)
    w = jnp.array(GRAY_WEIGHTS, dtype=jnp.float32)
    return rgb @ w


def pyramid_sizes(h: int, w: int, num_levels: int, scale: float) -> List[Tuple[int, int]]:
    """Per-level (h, w), matching cv::ORB's cvRound(size / scale^level)."""
    out = []
    for lv in range(num_levels):
        s = scale ** lv
        out.append((int(round(h / s)), int(round(w / s))))
    return out


def resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize [H, W] -> shape, half-pixel centers (cv2 INTER_LINEAR)."""
    return jax.image.resize(img, shape, method="linear", antialias=False)


def build_pyramid(gray: jnp.ndarray, num_levels: int, scale: float) -> List[jnp.ndarray]:
    h, w = gray.shape
    sizes = pyramid_sizes(h, w, num_levels, scale)
    levels = [gray]
    for lv in range(1, num_levels):
        # Successive downscale from the previous level (cv::ORB resizes from
        # the previous level too) keeps aliasing low without a prefilter.
        levels.append(resize_bilinear(levels[-1], sizes[lv]))
    return levels


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _pad_spec(ndim: int, row_pad, col_pad):
    """Pad widths for the last two axes only (leading axes untouched)."""
    return [(0, 0)] * (ndim - 2) + [row_pad, col_pad]


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with edge replication (cv2 BORDER_REFLECT-ish).

    cv::ORB blurs each level (7x7, sigma 2) before BRIEF sampling.
    Operates on the last two axes; leading axes (e.g. a stacked pyramid)
    are batched.
    """
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    r = ksize // 2
    h, w = img.shape[-2], img.shape[-1]
    padded = jnp.pad(img, _pad_spec(img.ndim, (r, r), (0, 0)), mode="edge")
    # Vertical pass: sum of shifted rows
    rows = sum(padded[..., i : i + h, :] * k[i] for i in range(ksize))
    padded = jnp.pad(rows, _pad_spec(img.ndim, (0, 0), (r, r)), mode="edge")
    cols = sum(padded[..., :, i : i + w] * k[i] for i in range(ksize))
    return cols


def box_filter(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Sum over a ksize x ksize window (zero padded), via shifted adds.

    Operates on the last two axes; leading axes are batched."""
    r = ksize // 2
    h, w = img.shape[-2], img.shape[-1]
    padded = jnp.pad(img, _pad_spec(img.ndim, (r, r), (0, 0)))
    rows = sum(padded[..., i : i + h, :] for i in range(ksize))
    padded = jnp.pad(rows, _pad_spec(img.ndim, (0, 0), (r, r)))
    return sum(padded[..., :, i : i + w] for i in range(ksize))


def shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Image shifted so out[..., y, x] = img[..., y + dy, x + dx] (zero
    fill). Operates on the last two axes; leading axes are batched."""
    padded = jnp.pad(img, _pad_spec(img.ndim, (3, 3), (3, 3)))
    start = (0,) * (img.ndim - 2) + (3 + dy, 3 + dx)
    return jax.lax.dynamic_slice(padded, start, img.shape)
