"""Pose-only Gauss-Newton refinement on RANSAC inliers.

Equivalent of the iterative refinement cv::solvePnPRansac performs on
the inlier set. Residuals and analytic Jacobians for every
correspondence are formed at once; 6x6 normal equations are solved per
iteration inside a lax.fori_loop (fixed iteration count — static
shapes, no convergence-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from kbslam.geom.camera import Intrinsics, project
from kbslam.geom.se3 import SE3, cross_matrix


def chol_solve6(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD [..., 6, 6] systems with an unrolled Cholesky.

    ~2x faster than jnp.linalg.solve's LU custom call for small batched
    systems on TPU (pure VPU ops, no pivoting round trips)."""
    L = jnp.zeros_like(H)
    for i in range(6):
        s = H[..., i, i] - sum(L[..., i, k] ** 2 for k in range(i))
        di = jnp.sqrt(jnp.maximum(s, 1e-12))
        L = L.at[..., i, i].set(di)
        for j in range(i + 1, 6):
            s2 = H[..., j, i] - sum(L[..., j, k] * L[..., i, k]
                                    for k in range(i))
            L = L.at[..., j, i].set(s2 / di)
    y = [None] * 6
    for i in range(6):
        y[i] = (g[..., i] - sum(L[..., i, k] * y[k] for k in range(i))) \
            / L[..., i, i]
    x = [None] * 6
    for i in reversed(range(6)):
        x[i] = (y[i] - sum(L[..., k, i] * x[k] for k in range(i + 1, 6))) \
            / L[..., i, i]
    return jnp.stack(x, axis=-1)


def reprojection_residuals(T_cw: SE3, points3d, uv_obs, intr: Intrinsics):
    """Residuals r = proj(T_cw * X) - uv  [N, 2], plus camera-frame z [N]."""
    pc = T_cw.apply(points3d)
    uv, z = project(intr, pc)
    return uv - uv_obs, z, pc


def pose_jacobian(pc: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """d(residual)/d(xi) for left-multiplied tangent xi = [dt, dw]: [N, 2, 6]."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    fx, fy = intr.fx, intr.fy
    zero = jnp.zeros_like(x)
    # d(uv)/d(pc): [N, 2, 3]
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    # d(pc)/d(xi) = [I | -[pc]x]  : [N, 3, 6]
    I = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    J_pc = jnp.concatenate([I, -cross_matrix(pc)], axis=-1)
    return J_proj @ J_pc  # [N, 2, 6]


def refine_pose(
    T_init: SE3,
    points3d: jnp.ndarray,
    uv_obs: jnp.ndarray,
    weights: jnp.ndarray,
    intr: Intrinsics,
    iters: int = 10,
    damping: float = 1e-6,
) -> SE3:
    """Weighted Gauss-Newton; weights (e.g. inlier mask) [N]."""

    def step(_, T):
        q, t = T
        T = SE3(q, t)
        r, z, pc = reprojection_residuals(T, points3d, uv_obs, intr)
        w = weights * (z > 1e-6)
        J = pose_jacobian(pc, intr)  # [N, 2, 6]
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J) + damping * jnp.eye(6, dtype=t.dtype)
        g = jnp.einsum("nij,ni->j", Jw, r)
        delta = -chol_solve6(H, g)
        T_new = SE3.exp(delta).compose(T).normalize()
        ok = jnp.all(jnp.isfinite(delta))
        return (
            jnp.where(ok, T_new.q, T.q),
            jnp.where(ok, T_new.t, T.t),
        )

    q, t = jax.lax.fori_loop(0, iters, step, (T_init.q, T_init.t))
    return SE3(q, t)
