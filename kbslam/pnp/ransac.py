"""Batched PnP-RANSAC: all hypotheses solved and scored in one launch.

Replaces cv::solvePnPRansac (reference: VisualOdometry.cpp:72-73 —
100 iterations, 8 px reprojection threshold, 0.99 confidence). OpenCV's
adaptive early-exit loop becomes a fixed hypothesis budget
(cfg.num_hypotheses >= the reference's cap) evaluated entirely in
parallel: minimal sets are drawn with a fixed per-frame PRNG key
(determinism test hook), solved by the batched DLT, scored against all
correspondences as one [K, N] projection, and the best hypothesis is
polished by weighted Gauss-Newton on its inlier set.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kbslam.config import PnPConfig
from kbslam.geom.camera import Intrinsics, project
from kbslam.geom.se3 import SE3, matrix_to_quat
from kbslam.ops.incidence import incidence_gather
from kbslam.pnp.dlt import normalized_rays, solve_dlt
from kbslam.pnp.kabsch import solve_kabsch
from kbslam.pnp.refine import refine_pose


class PnPResult(NamedTuple):
    success: jnp.ndarray       # [] bool
    T_cw: SE3                  # source(keyframe-camera) -> current-camera
    inlier_ratio: jnp.ndarray  # [] float32 — inliers / num valid matches
    inliers: jnp.ndarray       # [N] bool final inlier set
    num_inliers: jnp.ndarray   # [] int32


def _sample_valid_indices(key, valid: jnp.ndarray, num_sets: int,
                          set_size: int, packed: bool = False):
    """Draw [num_sets, set_size] indices uniformly among valid entries.

    packed=True asserts the caller already placed all valid entries at
    the front (the pipeline's PROSAC-ordered compaction does), skipping
    any rank->index translation. Otherwise ranks map to indices by
    inverse-CDF on the validity prefix count — a [draws, N] comparison
    + argmax instead of an argsort over N (sorts cost ~0.2 ms here;
    the comparison matrix is a couple of fused VPU passes)."""
    n_valid = jnp.sum(valid.astype(jnp.int32))
    u = jax.random.randint(key, (num_sets, set_size), 0, jnp.maximum(n_valid, 1))
    if packed:
        return u
    cnt = jnp.cumsum(valid.astype(jnp.int32))
    # the (u+1)-th valid entry is the unique i with cnt[i] == u+1 AND
    # valid[i] (cnt only increments at valid entries)
    eq = (cnt[None, :] == (u.reshape(-1, 1) + 1)) & valid[None, :]
    return jnp.argmax(eq, axis=1).astype(jnp.int32).reshape(num_sets, set_size)


def ransac_pnp(
    key: jnp.ndarray,
    points3d: jnp.ndarray,   # [N, 3] in keyframe camera frame
    uv_obs: jnp.ndarray,     # [N, 2] pixels in current image
    valid: jnp.ndarray,      # [N] bool
    intr: Intrinsics,
    cfg: PnPConfig,
    points3d_obs: jnp.ndarray | None = None,  # [N, 3] current-camera 3D
    obs_valid: jnp.ndarray | None = None,     # [N] bool (depth > 0)
    valid_packed: bool = False,               # valid entries known packed first
) -> PnPResult:
    """When current-frame depth is available (points3d_obs), half the
    hypothesis budget runs the 3D-3D Kabsch solver — immune to the
    coplanar-scene degeneracy of projective DLT — and half stays DLT
    (covers depth holes). All hypotheses are polished and scored by 2D
    reprojection, so the output matches the reference's PnP contract."""
    K = cfg.num_hypotheses
    n_valid = jnp.sum(valid.astype(jnp.int32))

    key_a, key_b = jax.random.split(key)
    if points3d_obs is not None:
        K_dlt = max(int(K * cfg.dlt_fraction), 1)
        both = valid & obs_valid
        # fall back to `valid` sampling when depth is entirely missing
        any_both = jnp.any(both)
        pool = jnp.where(any_both, both, valid)
        # the Kabsch pool (valid & has-depth) is not prefix-packed even
        # when `valid` is, so it takes the rank->index inverse-CDF path
        idx_k = _sample_valid_indices(key_b, pool, K - K_dlt, cfg.sample_size)
        idx_d = _sample_valid_indices(key_a, valid, K_dlt, cfg.sample_size,
                                      packed=valid_packed)
        idx = jnp.concatenate([idx_d, idx_k], axis=0)
    else:
        K_dlt = K
        idx = _sample_valid_indices(key_a, valid, K, cfg.sample_size,
                                    packed=valid_packed)

    # minimal-set rows move via ONE one-hot incidence matmul ([K*S, N])
    # instead of K*S row gathers (45 ns/element serial on TPU)
    S = cfg.sample_size
    if points3d_obs is not None:
        tab = jnp.concatenate([points3d, uv_obs, points3d_obs], axis=1)
    else:
        tab = jnp.concatenate([points3d, uv_obs], axis=1)
    rows = incidence_gather(idx.reshape(-1), tab).reshape(K, S, -1)
    pts_s = rows[..., :3]                       # [K, S, 3]
    uv_s = rows[..., 3:5]                       # [K, S, 2]
    rays_s = normalized_rays(intr, uv_s[:K_dlt])

    R_d, t_d = solve_dlt(pts_s[:K_dlt], rays_s)  # [K_dlt, 3, 3]
    if points3d_obs is not None:
        R_k, t_k = solve_kabsch(pts_s[K_dlt:], rows[K_dlt:, :, 5:8])
        R = jnp.concatenate([R_d, R_k], axis=0)
        t = jnp.concatenate([t_d, t_k], axis=0)
    else:
        R, t = R_d, t_d

    # float32 DLT on 6 points is only a coarse initializer (the 11th
    # singular value is near the noise floor); polish every hypothesis
    # with Gauss-Newton on its own minimal set — quadratic convergence
    # to the exact minimal solution, fully vmapped across hypotheses.
    T_init = SE3(matrix_to_quat(R), t).normalize()
    ones_s = jnp.ones(cfg.sample_size, dtype=points3d.dtype)
    T_h = jax.vmap(
        lambda q, tt, p, u: refine_pose(SE3(q, tt), p, u, ones_s, intr,
                                        iters=cfg.polish_iters)
    )(T_init.q, T_init.t, pts_s, uv_s)

    # score every hypothesis against every correspondence: [K, N]
    Rh = T_h.rotation_matrix()
    pc = jnp.einsum("kij,nj->kni", Rh, points3d) + T_h.t[:, None, :]
    uv_proj, z = project(intr, pc)
    err2 = jnp.sum((uv_proj - uv_obs[None]) ** 2, axis=-1)
    thr2 = cfg.reproj_threshold * cfg.reproj_threshold
    inlier = (err2 < thr2) & (z > 0) & valid[None, :]
    finite = jnp.all(jnp.isfinite(T_h.q), axis=-1) & jnp.all(
        jnp.isfinite(T_h.t), axis=-1
    )
    counts = jnp.where(finite, jnp.sum(inlier, axis=1), 0)

    # barrier: stop XLA from fusing the whole scoring pipeline into the
    # argmax reduction (recompute blowup on TPU)
    counts = jax.lax.optimization_barrier(counts)
    best = jnp.argmax(counts)
    T0 = SE3(T_h.q[best], T_h.t[best]).normalize()
    best_inliers = inlier[best]

    # polish on the inlier set, then — once the pose is good — on the
    # sub-2px subset, which carries far less correspondence noise than
    # the 8px RANSAC gate (falls back to the wide gate when too few
    # survive). Both stages run in ONE fused loop (refine.py).
    from kbslam.pnp.refine import refine_pose_two_stage
    T = refine_pose_two_stage(
        T0, points3d, uv_obs, best_inliers.astype(jnp.float32), valid,
        intr, iters=cfg.refine_iters, wide_thr2=thr2,
    )

    # recount with the polished pose (reference 8 px gate for the ratio)
    r_fin, z_fin, _ = _residuals(T, points3d, uv_obs, intr)
    err2_fin = jnp.sum(r_fin * r_fin, axis=-1)
    final_inliers = (err2_fin < thr2) & (z_fin > 0) & valid
    num_inliers = jnp.sum(final_inliers)

    ok = (
        (num_inliers >= cfg.min_inliers)
        & (n_valid >= cfg.min_points)
        & jnp.all(jnp.isfinite(T.q))
        & jnp.all(jnp.isfinite(T.t))
    )
    # reference ratio: inliers / all ratio-test matches (VisualOdometry.cpp:91)
    ratio = num_inliers.astype(jnp.float32) / jnp.maximum(
        n_valid.astype(jnp.float32), 1.0
    )
    identity = SE3.identity(dtype=T.t.dtype)
    T_safe = SE3(
        jnp.where(ok, T.q, identity.q), jnp.where(ok, T.t, identity.t)
    )
    return PnPResult(ok, T_safe, jnp.where(ok, ratio, 0.0), final_inliers, num_inliers)


def _residuals(T: SE3, points3d, uv_obs, intr):
    pc = T.apply(points3d)
    uv, z = project(intr, pc)
    return uv - uv_obs, z, pc
