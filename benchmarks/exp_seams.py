#!/usr/bin/env python
"""How big are the submap-atlas SEAMS, and do they matter?

The atlas's documented price (mapping/submap.py, COMPONENTS.md) is
seams: overlapping submaps are distinct rigid bodies, so extraction
yields overlapping, slightly inconsistent point sets instead of one
averaged field. This quantifies that price on the drifting 3-lap
spheres scene (the exp_submap_loop harness — the regime submapping
exists for), two ways:

  1. GT-error split: union-cloud surface error at OVERLAP points
     (world positions where >= 2 live submaps carry near-surface
     observations) vs INTERIOR points (exactly 1). If seams dominated,
     overlap error would sit well above interior error.
  2. Direct seam magnitude, two estimators per adjacent overlapping
     pair: (a) nearest-neighbor distance from A's overlap surface
     points to B's surface cloud — CAUTION: floored by the extraction
     sampling density (~voxel spacing, 85 mm default), so it
     OVERSTATES small seams; (b) |SDF_B| evaluated (trilinear) at A's
     zero-crossing points, in metres — B's signed distance to A's
     surface, sampling-independent within the truncation band. (b) is
     the seam number to quote.

Both under (a) per-insertion loop closures and (b) frozen extraction,
per seed. Decision input for BASELINE.md: weld at extraction only if
seams dominate the ~17-37 mm medians already measured.

CPU run: python benchmarks/exp_seams.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.spatial import cKDTree

from kbslam.io.synthetic import render_sequence
from kbslam.mapping.dense import TSDFState, surface_points
from kbslam.mapping.submap import anchor_poses_now, live_slots
from kbslam.slam import SLAM, pose_T

sys.path.insert(0, os.path.dirname(__file__))
from exp_submap_loop import (_slam_cfg, gt_surface_err_mm, lap_trajectory,
                             sphere_params)


def _log(m):
    print(f"[seams {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def _slot_pose(atlas, map_state, slot):
    poses = anchor_poses_now(atlas, map_state)
    kid = int(np.asarray(atlas.anchor_kf_id)[slot])
    if kid in poses:
        return poses[kid]
    return pose_T(np.asarray(atlas.anchor_q)[slot],
                  np.asarray(atlas.anchor_t)[slot])


def _near_surface_mask(atlas, cfg, slot, T_slot, pts_world):
    """True where a submap carries near-surface observations at the
    given world points (nearest-voxel weight > 0 and |tsdf| inside the
    iso band) — the overlap membership test."""
    nx, ny, nz = cfg.dims
    Tinv = np.linalg.inv(T_slot)
    pl = pts_world @ Tinv[:3, :3].T + Tinv[:3, 3]
    g = np.round((pl - np.asarray(cfg.origin)) / cfg.voxel_size - 0.5)
    gi = g.astype(np.int64)
    inside = ((gi >= 0).all(1) & (gi[:, 0] < nx) & (gi[:, 1] < ny)
              & (gi[:, 2] < nz))
    ci = np.clip(gi, 0, [nx - 1, ny - 1, nz - 1])
    w = np.asarray(atlas.weight)[slot][ci[:, 0], ci[:, 1], ci[:, 2]]
    t = np.asarray(atlas.tsdf)[slot][ci[:, 0], ci[:, 1], ci[:, 2]]
    return inside & (w > 0) & (np.abs(t) < cfg.iso_band)


def _trilinear_sdf_np(tsdf, weight, cfg, pl):
    """Numpy trilinear SDF at LOCAL points pl [N,3]; valid requires
    the full 2x2x2 neighborhood observed and strictly inside the clamp
    band. Returns (|sdf| metres, valid)."""
    nx, ny, nz = cfg.dims
    h = cfg.voxel_size
    g = (pl - np.asarray(cfg.origin)) / h - 0.5
    i0 = np.floor(g).astype(np.int64)
    f = g - i0
    valid = ((i0 >= 0).all(1) & (i0[:, 0] <= nx - 2)
             & (i0[:, 1] <= ny - 2) & (i0[:, 2] <= nz - 2))
    i0c = np.clip(i0, 0, [nx - 2, ny - 2, nz - 2])
    phi = np.zeros(len(pl))
    wsum = np.zeros(len(pl))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (np.where(dx, f[:, 0], 1 - f[:, 0])
                     * np.where(dy, f[:, 1], 1 - f[:, 1])
                     * np.where(dz, f[:, 2], 1 - f[:, 2]))
                ix, iy, iz = i0c[:, 0] + dx, i0c[:, 1] + dy, i0c[:, 2] + dz
                c = tsdf[ix, iy, iz]
                valid &= (weight[ix, iy, iz] > 0)
                phi += w * c
                wsum += w
    valid &= np.abs(phi) < 0.999
    return np.abs(phi) * cfg.truncation, valid


def seam_report(s, cfg, sph_c, sph_r, T0):
    atlas, m = s.atlas, s.state.map
    slots = list(live_slots(atlas))
    clouds, poses = {}, {}
    for sl in slots:
        st = TSDFState(tsdf=np.asarray(atlas.tsdf)[sl],
                       weight=np.asarray(atlas.weight)[sl])
        pts, _ = surface_points(st, cfg)
        T = _slot_pose(atlas, m, sl)
        poses[sl] = T
        clouds[sl] = (np.asarray(pts) @ T[:3, :3].T + T[:3, 3]
                      if len(pts) else np.zeros((0, 3), np.float32))

    # per-point overlap count across the union cloud
    union, counts, owner = [], [], []
    for sl in slots:
        p = clouds[sl]
        if not len(p):
            continue
        c = np.ones(len(p), np.int64)
        for sl2 in slots:
            if sl2 == sl:
                continue
            c += _near_surface_mask(atlas, cfg, sl2, poses[sl2], p)
        union.append(p)
        counts.append(c)
        owner.append(np.full(len(p), sl))
    union = np.concatenate(union)
    counts = np.concatenate(counts)
    e, _n = gt_surface_err_mm(union, T0, sph_c, sph_r)
    ov = counts >= 2
    e_ov, n_ov = gt_surface_err_mm(union[ov], T0, sph_c, sph_r)
    e_in, n_in = gt_surface_err_mm(union[~ov], T0, sph_c, sph_r)

    # direct cross-chunk disagreement on adjacent overlapping pairs
    seams = []
    for a, b in zip(slots[:-1], slots[1:]):
        pa, pb = clouds[a], clouds[b]
        if len(pa) < 50 or len(pb) < 50:
            continue
        in_b = _near_surface_mask(atlas, cfg, b, poses[b], pa)
        if in_b.sum() < 50:
            continue
        d, _ = cKDTree(pb).query(pa[in_b], k=1)
        # sampling-independent: B's trilinear |SDF| at A's surface
        Tb_inv = np.linalg.inv(poses[b])
        pl = pa[in_b] @ Tb_inv[:3, :3].T + Tb_inv[:3, 3]
        sdf, valid = _trilinear_sdf_np(np.asarray(atlas.tsdf)[b],
                                       np.asarray(atlas.weight)[b],
                                       cfg, pl)
        sdf = sdf[valid]
        seams.append(dict(
            pair=[int(a), int(b)], points=int(in_b.sum()),
            nn_median_mm=round(float(np.median(d)) * 1e3, 2),
            nn_p90_mm=round(float(np.percentile(d, 90)) * 1e3, 2),
            sdf_points=int(valid.sum()),
            sdf_median_mm=round(float(np.median(sdf)) * 1e3, 2)
            if valid.any() else None,
            sdf_p90_mm=round(float(np.percentile(sdf, 90)) * 1e3, 2)
            if valid.any() else None))
    return dict(union=e, overlap=e_ov, overlap_points=int(n_ov),
                interior=e_in, interior_points=int(n_in),
                overlap_frac=round(float(ov.mean()), 3),
                pair_seams=seams)


def main():
    F, L = 60, 3
    poses = lap_trajectory(F, L)
    results = {}
    for seed in (0, 1, 2):
        seq = render_sequence(num_frames=len(poses), height=240,
                              width=320, scene="spheres",
                              depth_noise_mm=5.0, seed=seed, poses=poses)
        sph_c, sph_r = sphere_params(seed)
        cfg = _slam_cfg(loop_on=True)
        s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
        for i in range(len(seq.rgb)):
            s.process(seq.rgb[i], seq.depth[i])
        rep = seam_report(s, cfg.dense, sph_c, sph_r, seq.poses[0])
        results[f"seed{seed}"] = rep
        _log(f"seed{seed}: {json.dumps(rep)}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
