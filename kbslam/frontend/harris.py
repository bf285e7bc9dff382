"""Dense Harris corner response, used to rank FAST corners.

cv::ORB with HARRIS_SCORE re-scores FAST keypoints with a Harris
response over a 7x7 block (k = 0.04) and keeps the strongest
(reference ORB config: VisualOdometry.cpp:13). We compute the response
densely — Sobel gradients + box-summed second-moment matrix — which is
a handful of shifted adds on the VPU, then sample it at corner pixels.
"""
from __future__ import annotations

import jax.numpy as jnp

from kbslam.frontend.image import box_filter, shift2d


def sobel_gradients(img: jnp.ndarray):
    """3x3 Sobel dx, dy with zero-ish borders (matches cv2 up to border)."""
    # dx kernel: [[-1,0,1],[-2,0,2],[-1,0,1]]
    def s(dy, dx):
        return shift2d(img, dy, dx)

    gx = (s(-1, 1) - s(-1, -1)) + 2.0 * (s(0, 1) - s(0, -1)) + (s(1, 1) - s(1, -1))
    gy = (s(1, -1) - s(-1, -1)) + 2.0 * (s(1, 0) - s(-1, 0)) + (s(1, 1) - s(-1, 1))
    return gx, gy


def harris_response(img: jnp.ndarray, block_size: int = 7, k: float = 0.04) -> jnp.ndarray:
    gx, gy = sobel_gradients(img)
    ixx = box_filter(gx * gx, block_size)
    iyy = box_filter(gy * gy, block_size)
    ixy = box_filter(gx * gy, block_size)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    # scale normalization keeps values in a sane f32 range
    return (det - k * tr * tr) * (1.0 / (block_size * block_size * 255.0) ** 2)
