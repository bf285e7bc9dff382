"""Levenberg-Marquardt on the compact problem — scatter-free iterations.

Same math and robustification as ba/lm.py (Huber x depth weights, fixed
gates, gauge, depth-prior anchor, damped accept/reject loop), but every
per-landmark and per-camera accumulation is an incidence one-hot matmul
on [O]-sized observation tensors (see ba/compact.py). Measured ~10x
faster per LM iteration than the scatter-add formulation on TPU v5e.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kbslam.config import BAConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3, cross_matrix, quat_conj, quat_to_matrix
from kbslam.ba.compact import CompactProblem, incidence_apply, incidence_gather
from kbslam.ba.lm import _block_diag, _inv3x3
from kbslam.ba.problem import BAProblem

_EPS_Z = 1e-8


class CompactSolution(NamedTuple):
    cam_q: jnp.ndarray
    cam_t: jnp.ndarray
    Xc: jnp.ndarray          # [L, 3] optimized compact landmark positions
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    accepted: jnp.ndarray    # LM steps that decreased cost (BriefReport's
    # "successful steps" analogue, Optimizers.cpp:215)


def _obs_terms(cam_q, cam_t, Xc, cp: CompactProblem, prob: BAProblem,
               intr: Intrinsics, cfg: BAConfig):
    """Residuals/weights/Jacobian ingredients on the [O] observation
    axis. With cfg.depth_residuals the residual carries a third row
    (z_cam - z_meas, sigma-whitened Huber — see BAConfig); r/w are then
    [O, 3]-shaped with per-row weights."""
    W = cam_q.shape[0]
    R_cw = quat_to_matrix(quat_conj(cam_q))            # [W, 3, 3]
    # per-obs camera data via tiny one-hot matmuls (exact f32)
    Rcw_o = incidence_gather(cp.obs_w, R_cw.reshape(W, 9)).reshape(-1, 3, 3)
    t_o = incidence_gather(cp.obs_w, cam_t)            # [O, 3]
    X_o = incidence_gather(cp.obs_l, Xc)               # [O, 3]

    pc = jnp.einsum("oij,oj->oi", Rcw_o, X_o - t_o)
    z = jnp.maximum(pc[:, 2], _EPS_Z)
    u = intr.fx * pc[:, 0] / z + intr.cx
    v = intr.fy * pc[:, 1] / z + intr.cy
    r = jnp.stack([u, v], axis=-1) - cp.obs_uv         # [O, 2]

    n2 = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, 1e-18))
    d = cfg.huber_delta
    w_irls = cp.obs_wz * jnp.minimum(1.0, d / n) * cp.obs_valid
    rho = jnp.where(n <= d, n2, 2.0 * d * n - d * d)
    cost = jnp.sum(cp.obs_wz * rho * cp.obs_valid)
    w_rows = jnp.stack([w_irls, w_irls], axis=-1)      # [O, R]
    if cfg.depth_residuals:
        r_z = z - cp.obs_zmeas
        rw = jnp.abs(jnp.sqrt(cp.obs_wd) * r_z)
        w_hub = jnp.minimum(1.0, d / jnp.maximum(rw, 1e-18))
        rho_d = jnp.where(rw <= d, rw * rw, 2.0 * d * rw - d * d)
        cost = cost + jnp.sum(rho_d * cp.obs_valid)
        w_d_irls = cp.obs_wd * w_hub * cp.obs_valid
        r = jnp.concatenate([r, r_z[:, None]], axis=-1)
        w_rows = jnp.concatenate([w_rows, w_d_irls[:, None]], axis=-1)
    return r, z, pc, X_o, Rcw_o, w_rows, cost


def _anchor_terms(cam_q, cam_t, Xc, cp: CompactProblem, prob: BAProblem,
                  cfg: BAConfig):
    has = cp.anchor_l >= 0
    Xa = Xc[jnp.clip(cp.anchor_l, 0)]
    q0 = cam_q[prob.anchor_cam]
    t0 = cam_t[prob.anchor_cam]
    R_cw0 = quat_to_matrix(quat_conj(q0))
    pca = R_cw0 @ (Xa - t0)
    sqrt_w = 1.0 / cfg.depth_prior_sigma
    r_d = jnp.where(has, sqrt_w * (pca[2] - prob.anchor_z0), 0.0)
    return has, Xa, R_cw0, r_d, sqrt_w


def _total_cost(cam_q, cam_t, Xc, cp, prob, intr, cfg):
    *_, cost = _obs_terms(cam_q, cam_t, Xc, cp, prob, intr, cfg)
    _, _, _, r_d, _ = _anchor_terms(cam_q, cam_t, Xc, cp, prob, cfg)
    return cost + r_d * r_d


def solve_window_compact(
    prob: BAProblem,
    cp: CompactProblem,
    intr: Intrinsics,
    cfg: BAConfig,
) -> CompactSolution:
    W = prob.cam_q.shape[0]
    L = cp.Xc.shape[0]
    O = cp.obs_valid.shape[0]

    cam_free = prob.real & (jnp.arange(W) != prob.fixed_cam)
    maskc = cam_free.astype(jnp.float32)
    p_act = cp.l_valid

    # combined (landmark, camera) target ids for the U blocks
    lw_ids = jnp.where(cp.obs_valid, cp.obs_l * W + cp.obs_w, L * W)

    def normal_equations(cam_q, cam_t, Xc):
        r, z, pc, X_o, Rcw_o, w, cost = _obs_terms(
            cam_q, cam_t, Xc, cp, prob, intr, cfg)

        inv_z = 1.0 / z
        zero = jnp.zeros_like(z)
        J_proj = jnp.stack(
            [
                jnp.stack([intr.fx * inv_z, zero,
                           -intr.fx * pc[:, 0] * inv_z * inv_z], -1),
                jnp.stack([zero, intr.fy * inv_z,
                           -intr.fy * pc[:, 1] * inv_z * inv_z], -1),
            ],
            axis=-2,
        )                                              # [O, 2, 3]
        if cfg.depth_residuals:
            # depth row: d(z_cam)/d(pc) = (0,0,1); the shared einsums
            # below then emit R_cw[2] / [-R_cw[2] | (R_cw [X]x)[2]]
            row_z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]),
                                     z.shape + (3,))[:, None, :]
            J_proj = jnp.concatenate([J_proj, row_z], axis=-2)  # [O, 3, 3]
        J_pt = jnp.einsum("oab,obc->oac", J_proj, Rcw_o)
        J_cam = jnp.concatenate(
            [-J_pt, jnp.einsum("oab,obc->oac", J_pt, cross_matrix(X_o))],
            axis=-1)                                   # [O, R, 6]

        # camera-side accumulations (tiny: W targets); w is per-ROW
        Hcc_o = jnp.einsum("ori,or,orj->oij", J_cam, w, J_cam).reshape(O, 36)
        bc_o = -jnp.einsum("ori,or,or->oi", J_cam, w, r)
        cam_acc = incidence_apply(cp.obs_w, W,
                                  jnp.concatenate([Hcc_o, bc_o], axis=1),
                                  exact=True)
        H_cc = cam_acc[:, :36].reshape(W, 6, 6)
        b_c = cam_acc[:, 36:]

        # landmark-side accumulations: [L, 9 + 3]
        Hp_o = jnp.einsum("ori,or,orj->oij", J_pt, w, J_pt).reshape(O, 9)
        bp_o = -jnp.einsum("ori,or,or->oi", J_pt, w, r)
        lm_acc = incidence_apply(cp.obs_l, L,
                                 jnp.concatenate([Hp_o, bp_o], axis=1),
                                 exact=True)
        H_pp = lm_acc[:, :9].reshape(L, 3, 3)
        b_p = lm_acc[:, 9:]

        # camera-landmark coupling: [L*W, 18] -> [L, W, 6, 3]
        U_o = jnp.einsum("ori,or,orj->oij", J_cam, w, J_pt).reshape(O, 18)
        U = incidence_apply(lw_ids, L * W, U_o, exact=True).reshape(L, W, 6, 3)

        # depth prior (Optimizers.cpp:181-189)
        has, Xa, R_cw0, r_d, sqrt_w = _anchor_terms(
            cam_q, cam_t, Xc, cp, prob, cfg)
        Jd_pt = sqrt_w * R_cw0[2]
        Jd_cam = sqrt_w * jnp.concatenate(
            [-R_cw0[2], (R_cw0 @ cross_matrix(Xa))[2]])
        hasf = has.astype(jnp.float32)
        oh_c = (jnp.arange(W) == prob.anchor_cam).astype(jnp.float32)
        oh_l = (jnp.arange(L) == cp.anchor_l).astype(jnp.float32)
        H_cc = H_cc + hasf * oh_c[:, None, None] * jnp.outer(Jd_cam, Jd_cam)
        b_c = b_c - hasf * oh_c[:, None] * (Jd_cam * r_d)
        H_pp = H_pp + hasf * oh_l[:, None, None] * jnp.outer(Jd_pt, Jd_pt)
        b_p = b_p - hasf * oh_l[:, None] * (Jd_pt * r_d)
        U = U + (hasf * oh_l[:, None] * oh_c[None, :])[:, :, None, None] \
            * jnp.outer(Jd_cam, Jd_pt)[None, None]

        return H_cc, b_c, H_pp, b_p, U, cost + r_d * r_d

    def lm_step(carry):
        cam_q, cam_t, Xc, lam, cost, ne, it, acc, done, trips = carry
        # normal equations are CACHED from the last accepted state:
        # ~50% of LM iterations reject (measured), and a rejected step
        # only needs a new damping factor on the same H/b — Ceres'
        # evaluate-on-accept behavior. Recomputed under lax.cond below
        # only when the proposal is accepted; bit-identical iterates.
        H_cc, b_c, H_pp, b_p, U = ne

        def damp(H):
            diag = jnp.diagonal(H, axis1=-2, axis2=-1)
            d = jnp.clip(diag, 1e-8, 1e32)
            return H + lam * d[..., None] * jnp.eye(H.shape[-1], dtype=H.dtype)

        H_cc_d = damp(H_cc)
        H_pp_d = damp(H_pp)
        Hpp_inv = _inv3x3(H_pp_d) * p_act[:, None, None]

        U_m = U * maskc[None, :, None, None]
        b_c_m = b_c * maskc[:, None]

        S = (-jnp.einsum("lwak,lkm,lvbm->wavb", U_m, Hpp_inv, U_m)
             ).reshape(W * 6, W * 6) + _block_diag(H_cc_d)
        eye_mask = jnp.repeat(maskc, 6)
        S = S * eye_mask[:, None] * eye_mask[None, :] + jnp.diag(1.0 - eye_mask)

        b_tilde = b_c_m - jnp.einsum("lwak,lkm,lm->wa", U_m, Hpp_inv, b_p)
        delta_c = jnp.linalg.solve(S, (b_tilde * maskc[:, None]).reshape(-1))
        delta_c = delta_c.reshape(W, 6) * maskc[:, None]

        rhs = b_p - jnp.einsum("lwak,wa->lk", U_m, delta_c)
        delta_p = jnp.einsum("lkm,lm->lk", Hpp_inv, rhs) * p_act[:, None]

        dT = SE3.exp(delta_c)
        T_new = dT.compose(SE3(cam_q, cam_t)).normalize()
        cam_q_t = jnp.where(cam_free[:, None], T_new.q, cam_q)
        cam_t_t = jnp.where(cam_free[:, None], T_new.t, cam_t)
        Xc_t = Xc + delta_p

        new_cost = _total_cost(cam_q_t, cam_t_t, Xc_t, cp, prob, intr, cfg)
        finite = jnp.isfinite(new_cost) & jnp.all(jnp.isfinite(delta_c))
        accept = finite & (new_cost < cost) & jnp.logical_not(done)

        if cfg.inner_iterations:
            # Ceres use_inner_iterations analogue (Optimizers.cpp:207):
            # on accept, one Newton step on the LANDMARK-only system
            # re-linearized at the new cameras (the elimination group's
            # coordinate-descent pass), kept only on strict descent.
            def refined_point():
                H_cc2, b_c2, H_pp2, b_p2, U2, _ = normal_equations(
                    cam_q_t, cam_t_t, Xc_t)
                Hpp_inv2 = _inv3x3(
                    H_pp2 + 1e-8 * jnp.eye(3)) * p_act[:, None, None]
                Xc_i = Xc_t + jnp.einsum("lkm,lm->lk", Hpp_inv2, b_p2) \
                    * p_act[:, None]
                c_i = _total_cost(cam_q_t, cam_t_t, Xc_i, cp, prob, intr,
                                  cfg)
                ok = jnp.isfinite(c_i) & (c_i < new_cost)
                Xc_f = jnp.where(ok, Xc_i, Xc_t)
                c_f = jnp.where(ok, c_i, new_cost)
                ne_f = jax.lax.cond(
                    ok,
                    lambda: normal_equations(cam_q_t, cam_t_t, Xc_f)[:5],
                    lambda: (H_cc2, b_c2, H_pp2, b_p2, U2))
                return Xc_f, c_f, ne_f

            Xc_t, new_cost, ne_acc = jax.lax.cond(
                accept, refined_point,
                lambda: (Xc_t, new_cost, ne))
        else:
            ne_acc = None
        cam_q = jnp.where(accept, cam_q_t, cam_q)
        cam_t = jnp.where(accept, cam_t_t, cam_t)
        Xc = jnp.where(accept, Xc_t, Xc)
        cost_out = jnp.where(accept, new_cost, cost)
        ne = jax.lax.cond(
            accept,
            lambda: ne_acc if cfg.inner_iterations
            else normal_equations(cam_q_t, cam_t_t, Xc_t)[:5],
            lambda: ne)
        lam = jnp.where(
            done, lam,
            jnp.clip(jnp.where(accept, lam * cfg.lm_lambda_down,
                               lam * cfg.lm_lambda_up),
                     cfg.lm_min_lambda, cfg.lm_max_lambda))
        rel = jnp.abs(cost - cost_out) / jnp.maximum(cost, 1e-12)
        done = done | (accept & (rel < 1e-6)) | (lam >= cfg.lm_max_lambda)
        it = jnp.where(done, it, it + 1)
        acc = acc + accept.astype(jnp.int32)
        return cam_q, cam_t, Xc, lam, cost_out, ne, it, acc, done, trips + 1

    def lm_cond(carry):
        done, trips = carry[-2], carry[-1]
        # while_loop (not fori): trips after `done` are pure no-ops by
        # construction (every update is where(done)-guarded), so exiting
        # early is bit-identical and skips their full damp/solve/cost
        # work — measured 22.8 -> ~16 ms on fresh windows whose
        # function-tolerance stop fires at 6-9 of the 20-trip Ceres cap
        # (benchmarks/exp_ba_fresh.py; Optimizers.cpp:207 caps at 20,
        # Ceres itself also exits on function_tolerance).
        return jnp.logical_not(done) & (trips < cfg.max_iterations)

    cost0 = _total_cost(prob.cam_q, prob.cam_t, cp.Xc, cp, prob, intr, cfg)
    ne0 = normal_equations(prob.cam_q, prob.cam_t, cp.Xc)[:5]
    init = (prob.cam_q, prob.cam_t, cp.Xc,
            jnp.float32(cfg.lm_init_lambda), cost0, ne0, jnp.int32(0),
            jnp.int32(0), jnp.bool_(False), jnp.int32(0))
    cam_q, cam_t, Xc, _, cost, _, it, acc, _, _ = jax.lax.while_loop(
        lm_cond, lm_step, init)
    return CompactSolution(cam_q, cam_t, Xc, cost0, cost, it, acc)
