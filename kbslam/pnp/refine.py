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


def chol_factor(H: jnp.ndarray) -> dict:
    """Fully-unrolled Cholesky factor of SPD [..., n, n] (static n).

    ~2x faster than jnp.linalg.solve's LU custom call for small batched
    systems on TPU. The factor entries live as individual [...]-shaped
    arrays (a dict of scalars-per-batch), NOT as .at[].set updates on an
    [..., n, n] tensor — each masked update-slice is its own tiny TPU
    kernel, and the ~60 of them dominated the per-hypothesis polish
    (measured ~2x the arithmetic cost)."""
    n = H.shape[-1]
    L = {"n": n}
    for i in range(n):
        s = H[..., i, i] - sum(L[i, k] * L[i, k] for k in range(i))
        di = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[i, i] = di
        L["inv", i] = 1.0 / di
        for j in range(i + 1, n):
            s2 = H[..., j, i] - sum(L[j, k] * L[i, k] for k in range(i))
            L[j, i] = s2 * L["inv", i]
    return L


def chol_apply(L: dict, g: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = g given a chol_factor result; g is [..., n]."""
    n = L["n"]
    y = [None] * n
    for i in range(n):
        y[i] = (g[..., i] - sum(L[i, k] * y[k] for k in range(i))) * L["inv", i]
    x = [None] * n
    for i in reversed(range(n)):
        x[i] = (y[i] - sum(L[k, i] * x[k] for k in range(i + 1, n))) * L["inv", i]
    return jnp.stack(x, axis=-1)


def chol_solve6(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD [..., 6, 6] systems (see chol_factor)."""
    return chol_apply(chol_factor(H), g)


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


def refine_pose_two_stage(
    T_init: SE3,
    points3d: jnp.ndarray,
    uv_obs: jnp.ndarray,
    w_stage1: jnp.ndarray,
    valid: jnp.ndarray,
    intr: Intrinsics,
    iters: int,
    wide_thr2: float,
    tight_thr2: float = 4.0,
    min_tight: int = 12,
    damping: float = 1e-6,
) -> SE3:
    """Two-stage GN refinement in ONE fori_loop: `iters` iterations with
    w_stage1 (the RANSAC inlier mask), then — from the residuals already
    computed at the stage boundary — reweight to the sub-`tight_thr2`
    subset (falling back to the wide gate when fewer than `min_tight`
    survive) and run `iters` more. Iterate-identical to two chained
    refine_pose calls with the residual pass between them, but saves a
    loop's fixed cost plus that extra residual pass."""

    def step(i, carry):
        q, t, w = carry
        T = SE3(q, t)
        r, z, pc = reprojection_residuals(T, points3d, uv_obs, intr)
        err2 = jnp.sum(r * r, axis=-1)
        tight = (err2 < tight_thr2) & (z > 0) & valid
        wide = (err2 < wide_thr2) & (z > 0) & valid
        w2 = jnp.where(jnp.sum(tight) >= min_tight, tight, wide).astype(
            w_stage1.dtype)
        w = jnp.where(i == iters, w2, w)
        ww = w * (z > 1e-6)
        J = pose_jacobian(pc, intr)
        Jw = J * ww[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J) + damping * jnp.eye(6, dtype=t.dtype)
        g = jnp.einsum("nij,ni->j", Jw, r)
        delta = -chol_solve6(H, g)
        T_new = SE3.exp(delta).compose(T).normalize()
        ok = jnp.all(jnp.isfinite(delta))
        return (
            jnp.where(ok, T_new.q, T.q),
            jnp.where(ok, T_new.t, T.t),
            w,
        )

    q, t, _ = jax.lax.fori_loop(
        0, 2 * iters, step, (T_init.q, T_init.t, w_stage1))
    return SE3(q, t)
