"""SO(3) projection and small-matrix helpers without LAPACK custom calls.

jnp.linalg.{svd,eigh,det} on small batched matrices lower to iterative
custom calls that dominate the PnP hypothesis stage on TPU (measured:
0.97 ms for 32 12x12 eigh, 1.6 ms for 224 3x3 SVDs per frame). Closest-
rotation projection only needs the orthogonal POLAR factor, which a
scaled Newton iteration delivers in ~5 fused elementwise steps on the
VPU — no custom calls, fully batched.

Note on improper inputs: when det(M) < 0 the Newton iteration converges
to an orthogonal matrix with det -1 (a reflection), NOT the
determinant-constrained Kabsch optimum. RANSAC callers are safe: a
reflection hypothesis projects to garbage and scores zero inliers.
"""
from __future__ import annotations

import jax.numpy as jnp


def det3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of [..., 3, 3]."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adjugate3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate (transposed cofactors) of [..., 3, 3]."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    row1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    row2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inv_transpose3(M: jnp.ndarray) -> jnp.ndarray:
    """M^{-T} for [..., 3, 3] via adjugate/det (no LU custom call)."""
    det = det3(M)
    safe = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = adjugate3(M)
    return jnp.swapaxes(adj, -1, -2) / safe[..., None, None]


def polar_rotation(M: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Orthogonal polar factor of [..., 3, 3] via scaled Newton iteration
    (Higham): X <- 0.5 (g X + (g X)^{-T}), g = |det X|^{-1/3}.

    Quadratically convergent; 6 iterations reach f32 round-off for any
    well-conditioned input. Equals the SVD-based closest rotation when
    det(M) > 0 (see module docstring for det < 0)."""
    # scale to unit Frobenius norm for a well-ranged start
    nrm = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True)) + 1e-20
    X = M / nrm
    for _ in range(iters):
        d = jnp.abs(det3(X))
        g = jnp.where(d < 1e-20, 1.0, d ** (-1.0 / 3.0))[..., None, None]
        Xg = X * g
        X = 0.5 * (Xg + inv_transpose3(Xg))
    return X
