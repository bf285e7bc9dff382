"""OpenCV+Ceres reference SLAM — the reference's FULL system (tracking
+ map points + sliding-window BA) in Python, used as the end-to-end
parity oracle.

Extends the VO oracle (reference_vo.py) with the backend half of the
reference that BASELINE.md's acceptance metric names ("ATE within 5% of
the OpenCV+Ceres reference"):

  - Map::CreateMapPoints landmark creation/fusion on keyframe insertion
    (Map.cpp:16-65): new point from PREV keyframe depth unprojected to
    world with the prev keyframe pose; shared-object fusion with
    observation bookkeeping.
  - Optimizers::BundleAdjustment window BA (Optimizers.cpp:42-264):
    last-5-KF window, per-KF 6-dof se3 tangent (Sophus log/exp), newest
    keyframe constant (gauge, :96), behind-camera cull (:135) and
    chi^2 gate 5.991 @ sigma=1px (:98-100,150) evaluated at the INITIAL
    values, Huber(1.0) wrapped in depth-scaled loss w=1/(1+0.25 z^2)
    with z the initial camera depth (:162-169), depth prior on the
    first gated-in landmark of the oldest keyframe with sigma 0.30 m
    (:173-189), <=20 LM iterations (:207), then landmark pruning
    (total<2 | inliers<2 | ratio<0.4 -> window slots reset, :225-247)
    and pose/point writeback (:249-259).

The solver is scipy.least_squares (sparse-aware TRF with a hand-built
jacobian-sparsity pattern) instead of Ceres' SPARSE_SCHUR — the
acceptance target is parity on the OPTIMUM (ATE), not the iterate path
(SURVEY §7 hard parts). One documented deviation: scipy applies the
Huber loss per residual COMPONENT of the sqrt(w)-whitened residual,
Ceres to the squared norm of the unwhitened 2-vector block; both
down-weight the same tails (w <= 1 so the effective clip is slightly
wider), and the chi^2 gate has already removed >2.45 px outliers.

BA runs synchronously on each insertion — the reference's commented-out
synchronous variant (main.cpp:48-50), i.e. the same solves without the
background-thread race.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from kbslam.eval.reference_vo import ReferenceVO


class _MapPoint:
    """MapPoint.hpp:8-40 — shared position + observation list."""

    __slots__ = ("pos", "obs")

    def __init__(self, pos):
        self.pos = np.asarray(pos, np.float64)
        self.obs = []  # [(kf, kp_index)]


class _KeyFrame:
    """KeyFrame.hpp:33-40 minus the images we don't need to keep."""

    __slots__ = ("kps", "desc", "depth", "pose", "mps")

    def __init__(self, kps, desc, depth, pose, n_kp):
        self.kps = kps
        self.desc = desc
        self.depth = depth
        self.pose = pose            # [4,4] T_wc
        self.mps: List[Optional[_MapPoint]] = [None] * n_kp


def _se3_log(T):
    from scipy.spatial.transform import Rotation

    R = T[:3, :3]
    t = T[:3, 3]
    rv = Rotation.from_matrix(R).as_rotvec()
    th = np.linalg.norm(rv)
    if th < 1e-10:
        V_inv = np.eye(3)
    else:
        a = rv / th
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        half = th / 2.0
        cot = half / np.tan(half) if abs(np.sin(half)) > 1e-12 else 1.0
        V_inv = (cot * np.eye(3) + (1 - cot) * np.outer(a, a) - half * K)
    return np.concatenate([V_inv @ t, rv])  # Sophus order: (rho, phi)


def _se3_exp(xi):
    from scipy.spatial.transform import Rotation

    rho, phi = xi[:3], xi[3:]
    th = np.linalg.norm(phi)
    R = Rotation.from_rotvec(phi).as_matrix()
    if th < 1e-10:
        V = np.eye(3)
    else:
        a = phi / th
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        V = (np.sin(th) / th * np.eye(3)
             + (1 - np.sin(th) / th) * np.outer(a, a)
             + (1 - np.cos(th)) / th * K)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ rho
    return T


class ReferenceSLAM(ReferenceVO):
    """Full reference system: VO + map + window BA on every insertion."""

    def __init__(self, K, depth_scale: float = 1e-3, window: int = 5,
                 huber_delta: float = 1.0, depth_prior_sigma: float = 0.30,
                 max_iterations: int = 20, num_features: int = 3000):
        super().__init__(K, depth_scale, num_features=num_features)
        self.window = window
        self.huber_delta = huber_delta
        self.depth_prior_sigma = depth_prior_sigma
        self.max_iterations = max_iterations
        self.keyframes: List[_KeyFrame] = []
        self.kf_frames: List[int] = []   # frame index of each insertion
        self.frame_idx = 0
        self.ba_reports: List[dict] = []

    # -- hooks into the VO loop -------------------------------------------
    def track(self, rgb, depth, mask=None) -> bool:
        """VisualOdometry::Track + main loop BA dispatch (main.cpp:34-50)."""
        cv2 = self.cv2
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        kps, desc = self.orb.detectAndCompute(gray, mask)
        if desc is None:
            return False

        success = False
        add_kf = False
        matches = []
        if self.keyframes:
            kf = self.keyframes[-1]
            knn = self.matcher.knnMatch(kf.desc, desc, k=2)
            p3, p2 = [], []
            good = []
            for m in knn:
                if len(m) == 2 and m[0].distance < 0.6 * m[1].distance:
                    good.append(m[0])
                    kp_prev = kf.kps[m[0].queryIdx].pt
                    kp_curr = kps[m[0].trainIdx].pt
                    u, v = int(round(kp_prev[0])), int(round(kp_prev[1]))
                    z = kf.depth[v, u] * self.depth_scale
                    x = (kp_prev[0] - self.K[0, 2]) * z / self.K[0, 0]
                    y = (kp_prev[1] - self.K[1, 2]) * z / self.K[1, 1]
                    p3.append((x, y, z))
                    p2.append(kp_curr)
            if len(p3) >= 4:
                ok, rvec, tvec, inl = cv2.solvePnPRansac(
                    np.asarray(p3, np.float64), np.asarray(p2, np.float64),
                    self.K, None, iterationsCount=100,
                    reprojectionError=8.0, confidence=0.99)
                ratio = (len(inl) / len(p2)) if (ok and inl is not None) else 0.0
                if ok:
                    R = cv2.Rodrigues(rvec)[0]
                    T_cw = np.eye(4)
                    T_cw[:3, :3] = R
                    T_cw[:3, 3] = tvec[:, 0]
                    T = kf.pose @ np.linalg.inv(T_cw)
                    self.poses.append(T)
                    success = True
                self.frames_since_kf += 1
                if self.frames_since_kf >= 10:
                    rel = np.linalg.inv(kf.pose) @ self.poses[-1]
                    trans = np.linalg.norm(rel[:3, 3])
                    ang = np.degrees(np.arccos(
                        np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)))
                    if trans > 0.5 or ang > 5.0 or ratio < 0.4:
                        add_kf = True
                        self.frames_since_kf = 0
                matches = good
        if not self.keyframes or add_kf:
            self.keyframes.append(_KeyFrame(kps, desc, depth.copy(),
                                            self.poses[-1].copy(), len(kps)))
            self.kf_frames.append(self.frame_idx)
            if matches:
                self._create_map_points(matches)
            if len(self.keyframes) >= 2:
                self._bundle_adjust()
        self.frame_idx += 1
        return success

    def _create_map_points(self, matches):
        """Map::CreateMapPoints (Map.cpp:16-65)."""
        prev, curr = self.keyframes[-2], self.keyframes[-1]
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        for m in matches:
            if prev.mps[m.queryIdx] is None:
                u, v = prev.kps[m.queryIdx].pt
                d = prev.depth[int(round(v)), int(round(u))]
                z = float(d) * self.depth_scale
                pc = np.array([(u - cx) * z / fx, (v - cy) * z / fy, z, 1.0])
                pw = (prev.pose @ pc)[:3]
                mp = _MapPoint(pw)
                prev.mps[m.queryIdx] = mp
                curr.mps[m.trainIdx] = mp
                mp.obs.append((prev, m.queryIdx))
                mp.obs.append((curr, m.trainIdx))
            else:
                mp = prev.mps[m.queryIdx]
                curr.mps[m.trainIdx] = mp
                mp.obs.append((curr, m.trainIdx))

    # -- the Ceres half ----------------------------------------------------
    def _bundle_adjust(self):
        """Optimizers::BundleAdjustment::Optimize (Optimizers.cpp:42-264)."""
        from scipy.optimize import least_squares
        from scipy.sparse import lil_matrix

        window = self.keyframes[-self.window:]
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        gate2 = 5.991 * 1.0 * 1.0

        # parameter layout: 6 per window KF (newest held constant),
        # 3 per unique landmark
        tangents = [_se3_log(kf.pose) for kf in window]
        mp_index = {}
        obs = []      # (kf_i, mp_i, u_obs, v_obs, sqrt_w)
        counts = {}   # mp id -> [total, inliers]
        anchor = None  # (mp_i, z0)
        for ki, kf in enumerate(window):
            T_inv = np.linalg.inv(kf.pose)
            for j, mp in enumerate(kf.mps):
                if mp is None:
                    continue
                cnt = counts.setdefault(id(mp), [0, 0, mp])
                cnt[0] += 1
                pcam = (T_inv @ np.append(mp.pos, 1.0))[:3]
                if pcam[2] <= 0.0:
                    continue
                u_proj = fx * pcam[0] / pcam[2] + cx
                v_proj = fy * pcam[1] / pcam[2] + cy
                u_obs, v_obs = kf.kps[j].pt
                err2 = (u_proj - u_obs) ** 2 + (v_proj - v_obs) ** 2
                if err2 > gate2:
                    continue
                cnt[1] += 1
                if id(mp) not in mp_index:
                    mp_index[id(mp)] = (len(mp_index), mp)
                mi = mp_index[id(mp)][0]
                w = 1.0 / (1.0 + 0.25 * pcam[2] ** 2)
                obs.append((ki, mi, u_obs, v_obs, np.sqrt(w)))
                if ki == 0 and anchor is None:
                    anchor = (mi, pcam[2])

        n_kf = len(window)
        n_mp = len(mp_index)
        if not obs or n_mp == 0:
            return
        free_kf = list(range(n_kf - 1))  # newest constant (gauge)
        kf_off = {ki: 6 * i for i, ki in enumerate(free_kf)}
        n_pose = 6 * len(free_kf)
        x0 = np.concatenate(
            [np.concatenate([tangents[ki] for ki in free_kf])
             if free_kf else np.zeros(0)]
            + [v[1].pos for v in sorted(mp_index.values(),
                                        key=lambda t: t[0])])

        obs_arr = np.asarray([(o[0], o[1], o[2], o[3], o[4]) for o in obs])
        kf_is = obs_arr[:, 0].astype(int)
        mp_is = obs_arr[:, 1].astype(int)
        uv_obs = obs_arr[:, 2:4]
        sqw = obs_arr[:, 4]

        def residuals(x):
            Ts = []
            for ki in range(n_kf):
                if ki in kf_off:
                    Ts.append(_se3_exp(x[kf_off[ki]:kf_off[ki] + 6]))
                else:
                    Ts.append(window[ki].pose)
            pts = x[n_pose:].reshape(n_mp, 3)
            r = np.zeros(2 * len(obs) + (1 if anchor else 0))
            Tinvs = [np.linalg.inv(T) for T in Ts]
            for ki in range(n_kf):
                sel = kf_is == ki
                if not np.any(sel):
                    continue
                P = pts[mp_is[sel]]
                pc = P @ Tinvs[ki][:3, :3].T + Tinvs[ki][:3, 3]
                z = np.maximum(pc[:, 2], 1e-8)
                u = fx * pc[:, 0] / z + cx
                v = fy * pc[:, 1] / z + cy
                idx = np.nonzero(sel)[0]
                r[2 * idx] = sqw[sel] * (u - uv_obs[sel, 0])
                r[2 * idx + 1] = sqw[sel] * (v - uv_obs[sel, 1])
            if anchor is not None:
                mi, z0 = anchor
                Tinv0 = np.linalg.inv(Ts[0])
                pc0 = Tinv0[:3, :3] @ pts[mi] + Tinv0[:3, 3]
                r[-1] = (pc0[2] - z0) / self.depth_prior_sigma
            return r

        n_res = 2 * len(obs) + (1 if anchor else 0)
        spar = lil_matrix((n_res, len(x0)), dtype=np.uint8)
        for oi, (ki, mi) in enumerate(zip(kf_is, mp_is)):
            if ki in kf_off:
                spar[2 * oi:2 * oi + 2, kf_off[ki]:kf_off[ki] + 6] = 1
            spar[2 * oi:2 * oi + 2, n_pose + 3 * mi:n_pose + 3 * mi + 3] = 1
        if anchor is not None:
            if 0 in kf_off:
                spar[-1, kf_off[0]:kf_off[0] + 6] = 1
            spar[-1, n_pose + 3 * anchor[0]:n_pose + 3 * anchor[0] + 3] = 1

        sol = least_squares(residuals, x0, loss="huber",
                            f_scale=self.huber_delta, jac_sparsity=spar,
                            max_nfev=self.max_iterations * 3, method="trf",
                            verbose=0)
        self.ba_reports.append(dict(
            cost0=float(np.sum(residuals(x0) ** 2)) / 2,
            cost=float(sol.cost), nfev=int(sol.nfev),
            n_obs=len(obs), n_mp=n_mp))

        # writeback (Optimizers.cpp:249-259)
        for ki in free_kf:
            window[ki].pose = _se3_exp(sol.x[kf_off[ki]:kf_off[ki] + 6])
        pts = sol.x[n_pose:].reshape(n_mp, 3)
        for _, (mi, mp) in mp_index.items():
            mp.pos = pts[mi].copy()
        # the tracked trajectory's latest pose follows the newest KF
        # implicitly in the reference (poses are chained off kf.pose);
        # the newest KF is the gauge so nothing moves here.

        # pruning (Optimizers.cpp:225-247)
        for _, (total, inliers, mp) in counts.items():
            drop = (total < 2) or (inliers < 2) or (
                total > 0 and inliers / total < 0.4)
            if not drop:
                continue
            for kf in window:
                for j in range(len(kf.mps)):
                    if kf.mps[j] is mp:
                        kf.mps[j] = None
