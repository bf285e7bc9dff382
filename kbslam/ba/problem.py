"""Window problem construction for sliding-window bundle adjustment.

Mirrors the construction phase of BundleAdjustment::Optimize
(Optimizers.cpp:50-192) as pure gathers on MapState: the last W
keyframes' poses, their per-slot landmark ids, construction-time
behind-camera and chi^2 gates (fixed for the whole solve, like the
reference), depth-dependent loss scales w = 1/(1 + 0.25 z^2), the
observation/inlier counts that drive post-solve pruning, and the
depth-prior scale anchor (first gated-in observation of the oldest
window keyframe).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from kbslam.config import BAConfig
from kbslam.geom.camera import Intrinsics, project
from kbslam.geom.se3 import SE3
from kbslam.mapping.state import MapState, window_slots


class BAProblem(NamedTuple):
    slots: jnp.ndarray       # [W] ring slots, oldest first
    real: jnp.ndarray        # [W] bool
    cam_q: jnp.ndarray       # [W, 4] initial T_wc
    cam_t: jnp.ndarray       # [W, 3]
    obs_uv: jnp.ndarray      # [W, F, 2]
    mp_id: jnp.ndarray       # [W, F] landmark ids (-1 none)
    active: jnp.ndarray      # [W, F] obs participates in the solve
    w_z: jnp.ndarray         # [W, F] depth loss scale (construction-time)
    z_meas: jnp.ndarray      # [W, F] measured keypoint depth (m; 0 = none)
    w_d: jnp.ndarray         # [W, F] depth-residual weight 1/sigma^2
    # (0 when cfg.depth_residuals is off, depth missing, or gated out)
    total_obs: jnp.ndarray   # [P] per-landmark obs count in window (pre-gate)
    inlier_obs: jnp.ndarray  # [P] per-landmark gated-in count
    touched: jnp.ndarray     # [P] landmark appears in the window
    anchor_mp: jnp.ndarray   # [] int32 (-1 = no anchor)
    anchor_cam: jnp.ndarray  # [] int32 window index of oldest real KF
    anchor_z0: jnp.ndarray   # [] float32
    fixed_cam: jnp.ndarray   # [] int32 window index held constant (newest)


def build_problem(state: MapState, intr: Intrinsics, cfg: BAConfig) -> BAProblem:
    W = cfg.window
    P = state.capacity_mp
    F = state.kf_mp.shape[1]
    slots, _ids, real = window_slots(state, W)

    cam_q = state.kf_q[slots]
    cam_t = state.kf_t[slots]
    obs_uv = state.kf_kp_xy[slots]
    mp_raw = state.kf_mp[slots]
    kp_valid = state.kf_kp_valid[slots]

    # kf_mp stores monotone ids (slot = id % P); stale references whose
    # slot was reallocated after a landmark-ring wrap are excluded here,
    # and mp_id below is SLOT-resolved for all downstream consumers
    has_mp = state.mp_ref_live(mp_raw) & kp_valid & real[:, None]
    mp_id = jnp.where(has_mp, mp_raw % P, -1)

    # construction-time projection with initial poses (Optimizers.cpp:126-153)
    X = state.mp_pos[jnp.clip(mp_id, 0)]                      # [W, F, 3]
    T = SE3(cam_q[:, None, :], cam_t[:, None, :])
    pc = T.inverse().apply(X)
    z = pc[..., 2]
    uv_proj, _ = project(intr, pc)
    err2 = jnp.sum((uv_proj - obs_uv) ** 2, axis=-1)
    gate2 = cfg.chi2_gate * cfg.pixel_sigma * cfg.pixel_sigma

    in_front = z > 0.0
    gated_in = err2 <= gate2
    active = has_mp & in_front & gated_in
    w_z = 1.0 / (cfg.loss_alpha + cfg.loss_beta * z * z)

    # RGB-D depth residuals (deliberate improvement over the reference,
    # which uses measured depth only through ONE anchor residual: on
    # coplanar scenes the reprojection-only objective has a near-null
    # pose/plane valley — its minimum sits tens of mm from the truth,
    # measured — and per-observation depth residuals with a quadratic
    # sensor sigma remove the ambiguity. cfg.depth_residuals=False
    # restores the strict reference objective.)
    z_meas = state.kf_kp_depth[slots]
    if cfg.depth_residuals:
        sigma = jnp.maximum(cfg.depth_res_sigma0 * z_meas * z_meas,
                            cfg.depth_res_sigma_min)
        whitened0 = jnp.abs(z - z_meas) / sigma  # at construction poses
        d_ok = active & (z_meas > 0.0) & (whitened0 <= cfg.depth_res_gate)
        w_d = jnp.where(d_ok, 1.0 / (sigma * sigma), 0.0)
    else:
        w_d = jnp.zeros_like(z_meas)

    # pruning counts (Optimizers.cpp:130-155): total counts every window
    # obs of the landmark; inliers only those passing both gates
    safe_id = jnp.where(has_mp, mp_id, P)
    total_obs = jnp.zeros((P,), jnp.int32).at[safe_id.reshape(-1)].add(
        1, mode="drop"
    )
    act_id = jnp.where(active, mp_id, P)
    inlier_obs = jnp.zeros((P,), jnp.int32).at[act_id.reshape(-1)].add(
        1, mode="drop"
    )
    touched = total_obs > 0

    # depth-prior anchor: first gated-in slot of the oldest real KF
    # (Optimizers.cpp:173-176)
    first_real = jnp.argmax(real.astype(jnp.int32))
    oldest_active = active[first_real]                        # [F]
    j = jnp.argmax(oldest_active.astype(jnp.int32))
    has_anchor = jnp.any(oldest_active)
    anchor_mp = jnp.where(has_anchor, mp_id[first_real, j], -1)
    anchor_z0 = jnp.where(has_anchor, z[first_real, j], 0.0)

    return BAProblem(
        slots=slots,
        real=real,
        cam_q=cam_q,
        cam_t=cam_t,
        obs_uv=obs_uv,
        mp_id=mp_id,
        active=active,
        w_z=w_z,
        z_meas=z_meas,
        w_d=w_d,
        total_obs=total_obs,
        inlier_obs=inlier_obs,
        touched=touched,
        anchor_mp=anchor_mp,
        anchor_cam=first_real,
        anchor_z0=anchor_z0,
        fixed_cam=jnp.int32(W - 1),
    )
