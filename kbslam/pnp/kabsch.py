"""Batched Kabsch/Procrustes 3D-3D minimal solver.

RGB-D gives us depth in BOTH frames, so pose hypotheses can come from
aligned 3D-3D correspondences — closed-form (centroids + one 3x3 SVD),
fully batched, and free of the planar degeneracy that sinks DLT-style
PnP on wall/desk scenes. The reference never exploits current-frame
depth for pose estimation (cv::solvePnPRansac is 3D-2D only,
VisualOdometry.cpp:72); we use it only to propose hypotheses — scoring
and refinement stay 2D-reprojection with the reference's thresholds, so
the output contract is unchanged.
"""
from __future__ import annotations

import jax.numpy as jnp


def solve_kabsch(src: jnp.ndarray, dst: jnp.ndarray, weights=None):
    """Least-squares rigid transform: dst ~= R @ src + t.

    src, dst: [..., n, 3]. weights: optional [..., n].
    Returns (R [..., 3, 3], t [..., 3]).
    """
    if weights is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = weights
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-12
    cs = jnp.sum(src * w[..., None], axis=-2) / wsum
    cd = jnp.sum(dst * w[..., None], axis=-2) / wsum
    s0 = src - cs[..., None, :]
    d0 = dst - cd[..., None, :]
    H = jnp.einsum("...ni,...nj,...n->...ij", s0, d0, w)
    U, _, Vt = jnp.linalg.svd(H)
    # R = V diag(1,1,det(VU^T)) U^T
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.zeros_like(U).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    R = jnp.swapaxes(Vt, -1, -2) @ D @ jnp.swapaxes(U, -1, -2)
    t = cd - jnp.einsum("...ij,...j->...i", R, cs)
    return R, t
