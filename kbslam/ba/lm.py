"""Batched Levenberg-Marquardt with explicit Schur complement — the
TPU-native rebuild of the Ceres solve in BundleAdjustment::Optimize
(Optimizers.cpp:201-213: LM + SPARSE_SCHUR, <=20 iterations).

NOTE: this is the dense REFERENCE solver (full [P]-capacity landmark
tensors, scatter-add accumulation — ~253 ms/solve on TPU v5e).
Production local BA uses the compacted, scatter-free formulation in
ba/compact.py + ba/compact_lm.py (~30 ms/solve, same math); this module
remains as the independently-testable baseline and supplies the shared
_inv3x3/_block_diag helpers.

Design:
  - residuals + analytic Jacobians for every (keyframe, observation)
    pair are formed at once ([W, F, ...] tensors on the VPU/MXU);
  - the landmark block H_pp is block-diagonal 3x3 (closed-form inverse);
  - the reduced camera system S = H_cc - U H_pp^-1 U^T is at most
    [6W, 6W] — a tiny dense solve;
  - landmark updates back-substitute through the same U blocks;
  - the LM damping loop is a lax.while_loop with accept/reject on the
    robust cost, capped at cfg.max_iterations like the reference.

Robustification matches the reference residual-for-residual:
Huber(delta=1) wrapped in a depth-scaled loss w = 1/(1 + 0.25 z^2)
(Optimizers.cpp:162-171) via IRLS weights; chi^2/behind-camera gates
and w are fixed at construction time (problem.py), exactly like Ceres
sees them. Gauge: the newest keyframe is constant (Optimizers.cpp:96);
scale is anchored by the 1-D depth prior (Optimizers.hpp:50-67).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kbslam.config import BAConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3, cross_matrix, quat_conj, quat_to_matrix
from kbslam.ba.problem import BAProblem

_EPS_Z = 1e-8


class BASolution(NamedTuple):
    cam_q: jnp.ndarray    # [W, 4]
    cam_t: jnp.ndarray    # [W, 3]
    mp_pos: jnp.ndarray   # [P, 3]
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray


def _project_terms(cam_q, cam_t, mp_pos, prob: BAProblem, intr: Intrinsics):
    """Common per-observation quantities for cost and Jacobians."""
    X = mp_pos[jnp.clip(prob.mp_id, 0)]                       # [W, F, 3]
    T_inv = SE3(cam_q[:, None, :], cam_t[:, None, :]).inverse()
    pc = T_inv.apply(X)
    z = jnp.maximum(pc[..., 2], _EPS_Z)  # functor clamp (Optimizers.hpp:32)
    u = intr.fx * pc[..., 0] / z + intr.cx
    v = intr.fy * pc[..., 1] / z + intr.cy
    r = jnp.stack([u, v], axis=-1) - prob.obs_uv              # [W, F, 2]
    return X, pc, z, r


def _huber_terms(r, prob: BAProblem, cfg: BAConfig):
    """IRLS weight and robust cost per obs (Huber on the residual norm,
    scaled by the construction-time depth weight)."""
    n2 = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, 1e-18))
    d = cfg.huber_delta
    w_huber = jnp.minimum(1.0, d / n)
    rho = jnp.where(n <= d, n2, 2.0 * d * n - d * d)
    cost = jnp.sum(prob.w_z * rho * prob.active)
    w_irls = prob.w_z * w_huber * prob.active
    return w_irls, cost


def _depth_terms(z, prob: BAProblem, cfg: BAConfig):
    """Per-observation RGB-D depth residual pieces (see BAConfig
    .depth_residuals): unwhitened residual r_z = z_cam - z_meas, IRLS
    weight w_d * huber'(whitened), robust cost. w_d already encodes
    1/sigma^2 and is zero for gated/missing/disabled rows."""
    r_z = z - prob.z_meas
    sqrt_wd = jnp.sqrt(prob.w_d)
    rw = jnp.abs(sqrt_wd * r_z)
    d = cfg.huber_delta
    w_hub = jnp.minimum(1.0, d / jnp.maximum(rw, 1e-18))
    rho = jnp.where(rw <= d, rw * rw, 2.0 * d * rw - d * d)
    cost = jnp.sum(rho * prob.active)
    w_irls_d = prob.w_d * w_hub * prob.active
    return r_z, w_irls_d, cost


def _anchor_terms(cam_q, cam_t, mp_pos, prob: BAProblem, cfg: BAConfig):
    """Depth-prior residual r_d = (1/sigma) (z_cam0(X_a) - z0)."""
    has = prob.anchor_mp >= 0
    Xa = mp_pos[jnp.clip(prob.anchor_mp, 0)]
    q0 = cam_q[prob.anchor_cam]
    t0 = cam_t[prob.anchor_cam]
    R_cw0 = quat_to_matrix(quat_conj(q0))
    pc = R_cw0 @ (Xa - t0)
    sqrt_w = 1.0 / cfg.depth_prior_sigma
    r_d = jnp.where(has, sqrt_w * (pc[2] - prob.anchor_z0), 0.0)
    return has, Xa, R_cw0, r_d, sqrt_w


def _total_cost(cam_q, cam_t, mp_pos, prob, intr, cfg):
    _, _, z, r = _project_terms(cam_q, cam_t, mp_pos, prob, intr)
    _, cost = _huber_terms(r, prob, cfg)
    if cfg.depth_residuals:
        _, _, cost_d = _depth_terms(z, prob, cfg)
        cost = cost + cost_d
    _, _, _, r_d, _ = _anchor_terms(cam_q, cam_t, mp_pos, prob, cfg)
    return cost + r_d * r_d


def _inv3x3(M):
    """Batched closed-form 3x3 inverse via adjugate."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve_window(
    prob: BAProblem,
    mp_pos0: jnp.ndarray,
    intr: Intrinsics,
    cfg: BAConfig,
) -> BASolution:
    W = prob.cam_q.shape[0]
    P = mp_pos0.shape[0]
    F = prob.mp_id.shape[1]

    cam_free = prob.real & (jnp.arange(W) != prob.fixed_cam)
    p_active = (prob.inlier_obs > 0).at[jnp.clip(prob.anchor_mp, 0)].set(
        (prob.inlier_obs[jnp.clip(prob.anchor_mp, 0)] > 0) | (prob.anchor_mp >= 0)
    )

    obs_p = jnp.where(prob.active, prob.mp_id, P).reshape(-1)  # [W*F]
    obs_w = jnp.broadcast_to(jnp.arange(W)[:, None], (W, F)).reshape(-1)

    def normal_equations(cam_q, cam_t, mp_pos):
        X, pc, z, r = _project_terms(cam_q, cam_t, mp_pos, prob, intr)
        w_irls, cost = _huber_terms(r, prob, cfg)

        # J_proj: d(uv)/d(pc) [W, F, 2, 3]
        inv_z = 1.0 / z
        inv_z2 = inv_z * inv_z
        zero = jnp.zeros_like(z)
        J_proj = jnp.stack(
            [
                jnp.stack([intr.fx * inv_z, zero, -intr.fx * pc[..., 0] * inv_z2], -1),
                jnp.stack([zero, intr.fy * inv_z, -intr.fy * pc[..., 1] * inv_z2], -1),
            ],
            axis=-2,
        )
        w_rows = jnp.stack([w_irls, w_irls], axis=-1)         # [W, F, R]
        if cfg.depth_residuals:
            # third residual row: depth z_cam - z_meas. Its d/d(pc) row
            # is (0, 0, 1), so the shared J_pt/J_cam einsums below emit
            # the correct R_cw[2] / [-R_cw[2] | (R_cw [X]x)[2]] rows.
            r_z, w_irls_d, cost_d = _depth_terms(z, prob, cfg)
            cost = cost + cost_d
            row_z = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0]), z.shape + (3,))[..., None, :]
            J_proj = jnp.concatenate([J_proj, row_z], axis=-2)
            r = jnp.concatenate([r, r_z[..., None]], axis=-1)
            w_rows = jnp.concatenate([w_rows, w_irls_d[..., None]], axis=-1)
        R_cw = quat_to_matrix(quat_conj(cam_q))               # [W, 3, 3]
        # d(pc)/d(delta_cam) with left-mult update T <- exp(d) T:
        #   [-R_cw | R_cw [X]x] ;  d(pc)/dX = R_cw
        J_pt = jnp.einsum("wfab,wbc->wfac", J_proj, R_cw)     # [W, F, R, 3]
        Xx = cross_matrix(X)                                  # [W, F, 3, 3]
        J_cam_rot = jnp.einsum("wfab,wfbc->wfac", J_pt, Xx)   # J_proj R [X]x
        J_cam = jnp.concatenate([-J_pt, J_cam_rot], axis=-1)  # [W, F, R, 6]

        # weighted accumulations (per-ROW weights: reprojection rows
        # carry the Huber x depth-scale IRLS weight, the depth row its
        # own sigma-whitened Huber weight)
        H_cc = jnp.einsum("wfri,wfr,wfrj->wij", J_cam, w_rows, J_cam)
        b_c = -jnp.einsum("wfri,wfr,wfr->wi", J_cam, w_rows, r)

        Hp_obs = jnp.einsum("wfri,wfr,wfrj->wfij", J_pt, w_rows, J_pt)
        bp_obs = -jnp.einsum("wfri,wfr,wfr->wfi", J_pt, w_rows, r)
        U_obs = jnp.einsum("wfri,wfr,wfrj->wfij", J_cam, w_rows, J_pt)  # [W,F,6,3]

        H_pp = jnp.zeros((P, 3, 3)).at[obs_p].add(
            Hp_obs.reshape(-1, 3, 3), mode="drop")
        b_p = jnp.zeros((P, 3)).at[obs_p].add(
            bp_obs.reshape(-1, 3), mode="drop")
        U = jnp.zeros((P, W, 6, 3)).at[obs_p, obs_w].add(
            U_obs.reshape(-1, 6, 3), mode="drop")

        # depth prior contributions (Optimizers.cpp:181-189)
        has, Xa, R_cw0, r_d, sqrt_w = _anchor_terms(cam_q, cam_t, mp_pos, prob, cfg)
        Jd_pt = sqrt_w * R_cw0[2]                             # [3]
        Jd_cam = sqrt_w * jnp.concatenate(
            [-R_cw0[2], (R_cw0 @ cross_matrix(Xa))[2]]
        )                                                     # [6]
        hasf = has.astype(jnp.float32)
        c0 = prob.anchor_cam
        pa = jnp.clip(prob.anchor_mp, 0)
        H_cc = H_cc.at[c0].add(hasf * jnp.outer(Jd_cam, Jd_cam))
        b_c = b_c.at[c0].add(-hasf * Jd_cam * r_d)
        H_pp = H_pp.at[pa].add(hasf * jnp.outer(Jd_pt, Jd_pt))
        b_p = b_p.at[pa].add(-hasf * Jd_pt * r_d)
        U = U.at[pa, c0].add(hasf * jnp.outer(Jd_cam, Jd_pt))

        cost = cost + r_d * r_d
        return H_cc, b_c, H_pp, b_p, U, cost

    def lm_step(_, carry):
        cam_q, cam_t, mp_pos, lam, cost, it, done = carry
        H_cc, b_c, H_pp, b_p, U, _ = normal_equations(cam_q, cam_t, mp_pos)

        # damping (multiplicative on the diagonals, Ceres-style)
        def damp(H):
            diag = jnp.diagonal(H, axis1=-2, axis2=-1)
            d = jnp.clip(diag, 1e-8, 1e32)
            return H + lam * d[..., None] * jnp.eye(H.shape[-1], dtype=H.dtype)

        H_cc_d = damp(H_cc)
        H_pp_d = damp(H_pp)

        Hpp_inv = _inv3x3(H_pp_d) * p_active[:, None, None]

        # zero coupling/state for frozen cameras (gauge + padding)
        maskc = cam_free.astype(jnp.float32)
        U_m = U * maskc[None, :, None, None]
        b_c_m = b_c * maskc[:, None]

        # reduced camera system S [W*6, W*6]
        S_blocks = -jnp.einsum("pwak,pkl,pvbl->wavb", U_m, Hpp_inv, U_m)
        S = S_blocks.reshape(W * 6, W * 6) + _block_diag(H_cc_d)
        # identity rows/cols for frozen cams keep S well-posed
        eye_mask = jnp.repeat(maskc, 6)
        S = S * eye_mask[:, None] * eye_mask[None, :] + jnp.diag(1.0 - eye_mask)

        b_tilde = b_c_m - jnp.einsum("pwak,pkl,pl->wa", U_m, Hpp_inv, b_p)
        delta_c = jnp.linalg.solve(S, (b_tilde * maskc[:, None]).reshape(-1))
        delta_c = delta_c.reshape(W, 6) * maskc[:, None]

        # back-substitute landmarks
        rhs = b_p - jnp.einsum("pwak,wa->pk", U_m, delta_c)
        delta_p = jnp.einsum("pkl,pl->pk", Hpp_inv, rhs) * p_active[:, None]

        # trial state
        dT = SE3.exp(delta_c)
        T_new = dT.compose(SE3(cam_q, cam_t)).normalize()
        cam_q_t = jnp.where(cam_free[:, None], T_new.q, cam_q)
        cam_t_t = jnp.where(cam_free[:, None], T_new.t, cam_t)
        mp_t = mp_pos + delta_p

        new_cost = _total_cost(cam_q_t, cam_t_t, mp_t, prob, intr, cfg)
        finite = jnp.isfinite(new_cost) & jnp.all(jnp.isfinite(delta_c))
        accept = finite & (new_cost < cost) & jnp.logical_not(done)

        cam_q = jnp.where(accept, cam_q_t, cam_q)
        cam_t = jnp.where(accept, cam_t_t, cam_t)
        mp_pos = jnp.where(accept, mp_t, mp_pos)
        cost_out = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            done,
            lam,
            jnp.clip(
                jnp.where(accept, lam * cfg.lm_lambda_down,
                          lam * cfg.lm_lambda_up),
                cfg.lm_min_lambda,
                cfg.lm_max_lambda,
            ),
        )
        # converged: accepted step with tiny relative improvement, or the
        # damping saturated. Remaining iterations become masked no-ops —
        # the loop is a FIXED-trip fori_loop on purpose: dynamic
        # while_loop exits cost a per-iteration host round-trip on
        # tunneled TPU runtimes, dwarfing the wasted ~40us of compute.
        rel = jnp.abs(cost - cost_out) / jnp.maximum(cost, 1e-12)
        done = done | (accept & (rel < 1e-6)) | (lam >= cfg.lm_max_lambda)
        it = jnp.where(done, it, it + 1)
        return cam_q, cam_t, mp_pos, lam, cost_out, it, done

    cost0 = _total_cost(prob.cam_q, prob.cam_t, mp_pos0, prob, intr, cfg)
    init = (
        prob.cam_q, prob.cam_t, mp_pos0,
        jnp.float32(cfg.lm_init_lambda), cost0, jnp.int32(0),
        jnp.bool_(False),
    )
    cam_q, cam_t, mp_pos, _, cost, it, _ = jax.lax.fori_loop(
        0, cfg.max_iterations, lm_step, init)
    return BASolution(cam_q, cam_t, mp_pos, cost0, cost, it)


def _block_diag(blocks: jnp.ndarray) -> jnp.ndarray:
    """[W, k, k] -> [W*k, W*k] block diagonal."""
    W, k, _ = blocks.shape
    out = jnp.zeros((W, k, W, k), blocks.dtype)
    idx = jnp.arange(W)
    out = out.at[idx, :, idx, :].set(blocks)
    return out.reshape(W * k, W * k)
