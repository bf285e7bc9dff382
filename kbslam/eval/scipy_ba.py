"""f64 scipy oracle for the local-BA window problem.

Solves EXACTLY the problem our compact LM solver sees — the BAProblem
extracted from a MapState snapshot (ba/problem.py, the faithful twin of
Optimizers.cpp:50-192's construction) — with scipy.least_squares in
float64. Used by tests as the "Ceres side" of BASELINE.md's
"OpenCV+Ceres" parity claim: on any window snapshot, our TPU solver
must reach an optimum as good as an f64 sparse trust-region solver of
the same objective.

Huber handling: Ceres applies rho to the squared norm of the unwhitened
2-residual block under a ScaledLoss w; scipy applies it per component
of the sqrt(w)-whitened residual. Both clip the same (already
chi^2-gated <= 2.45 px) tails; the acceptance comparisons are on COST
and POSE error, not the iterate path.
"""
from __future__ import annotations

import numpy as np

from kbslam.eval.reference_slam import _se3_exp, _se3_log


def _q_to_R(q):
    from scipy.spatial.transform import Rotation

    w, x, y, z = q
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def solve_window_scipy(map_state, intr, cfg, max_nfev: int = 60,
                       loss: str = "huber"):
    """Returns dict with slots, cam_t/cam_R (optimized, f64), mp ids and
    positions, plus initial/final cost of the scipy objective."""
    import jax

    from kbslam.ba.problem import build_problem
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    prob = jax.tree.map(np.asarray, build_problem(map_state, intr, cfg))
    W = len(prob.real)
    real_idx = [i for i in range(W) if prob.real[i]]
    fixed = int(prob.fixed_cam)
    free = [i for i in real_idx if i != fixed]

    act = prob.active
    mp_ids = sorted(set(prob.mp_id[act].tolist()))
    mp_loc = {m: i for i, m in enumerate(mp_ids)}
    mp0 = np.asarray(map_state.mp_pos)[mp_ids].astype(np.float64)

    rows = []
    for ki in real_idx:
        for f in np.nonzero(act[ki])[0]:
            rows.append((ki, mp_loc[prob.mp_id[ki, f]],
                         prob.obs_uv[ki, f, 0], prob.obs_uv[ki, f, 1],
                         np.sqrt(prob.w_z[ki, f]),
                         prob.z_meas[ki, f], np.sqrt(prob.w_d[ki, f])))
    obs = np.asarray(rows, np.float64)
    kis = obs[:, 0].astype(int)
    mis = obs[:, 1].astype(int)
    uvs = obs[:, 2:4]
    sqw = obs[:, 4]
    zmeas = obs[:, 5]
    sqwd = obs[:, 6]   # 0 when depth residuals are off / missing / gated

    T_init = {}
    for ki in real_idx:
        T = np.eye(4)
        T[:3, :3] = _q_to_R(prob.cam_q[ki])
        T[:3, 3] = prob.cam_t[ki]
        T_init[ki] = T
    off = {ki: 6 * i for i, ki in enumerate(free)}
    n_pose = 6 * len(free)
    x0 = np.concatenate([_se3_log(T_init[ki]) for ki in free]
                        + [mp0.ravel()])

    fx, fy, cx, cy = intr.fx, intr.fy, intr.cx, intr.cy
    anchor_cam = int(prob.anchor_cam)
    z0 = float(prob.anchor_z0)
    anc_mi = mp_loc.get(int(prob.anchor_mp), None)
    sigma = cfg.depth_prior_sigma

    R_OBS = 3  # u, v, depth (depth row weight 0 when disabled)

    def residuals(x):
        Ts = {ki: (_se3_exp(x[off[ki]:off[ki] + 6]) if ki in off
                   else T_init[ki]) for ki in real_idx}
        pts = x[n_pose:].reshape(-1, 3)
        r = np.zeros(R_OBS * len(obs) + (1 if anc_mi is not None else 0))
        for ki in real_idx:
            sel = kis == ki
            if not sel.any():
                continue
            Tinv = np.linalg.inv(Ts[ki])
            P = pts[mis[sel]]
            pc = P @ Tinv[:3, :3].T + Tinv[:3, 3]
            z = np.maximum(pc[:, 2], 1e-8)
            u = fx * pc[:, 0] / z + cx
            v = fy * pc[:, 1] / z + cy
            idx = np.nonzero(sel)[0]
            r[R_OBS * idx] = sqw[sel] * (u - uvs[sel, 0])
            r[R_OBS * idx + 1] = sqw[sel] * (v - uvs[sel, 1])
            r[R_OBS * idx + 2] = sqwd[sel] * (z - zmeas[sel])
        if anc_mi is not None:
            Tinv = np.linalg.inv(Ts[anchor_cam])
            pc = Tinv[:3, :3] @ pts[anc_mi] + Tinv[:3, 3]
            r[-1] = (pc[2] - z0) / sigma
        return r

    n_res = R_OBS * len(obs) + (1 if anc_mi is not None else 0)
    spar = lil_matrix((n_res, len(x0)), dtype=np.uint8)
    for oi, (ki, mi) in enumerate(zip(kis, mis)):
        if ki in off:
            spar[R_OBS * oi:R_OBS * oi + R_OBS, off[ki]:off[ki] + 6] = 1
        spar[R_OBS * oi:R_OBS * oi + R_OBS,
             n_pose + 3 * mi:n_pose + 3 * mi + 3] = 1
    if anc_mi is not None:
        if anchor_cam in off:
            spar[-1, off[anchor_cam]:off[anchor_cam] + 6] = 1
        spar[-1, n_pose + 3 * anc_mi:n_pose + 3 * anc_mi + 3] = 1

    sol = least_squares(residuals, x0, loss=loss, f_scale=1.0,
                        jac_sparsity=spar, max_nfev=max_nfev, method="trf")
    Ts = {ki: (_se3_exp(sol.x[off[ki]:off[ki] + 6]) if ki in off
               else T_init[ki]) for ki in real_idx}
    return dict(
        slots=prob.slots, real=prob.real, real_idx=real_idx, fixed=fixed,
        T_init=T_init, T_opt=Ts,
        mp_ids=mp_ids, mp_opt=sol.x[n_pose:].reshape(-1, 3),
        cost0=float(np.sum(residuals(x0) ** 2)) / 2,
        cost=float(sol.cost), nfev=int(sol.nfev),
        residual_fn=residuals, x0=x0,
    )
