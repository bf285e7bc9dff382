#!/usr/bin/env python
"""Does loop closure + offline TSDF re-integration recover surface
accuracy lost to drift?

The online dense volume fuses each keyframe at its TRACKED pose, so
accumulated drift smears the reconstruction; the volume is deliberately
not re-warped by pose-graph corrections (mapping/dense.py limitations).
The documented recovery path is offline re-integration from corrected
poses (``integrate_sequence`` + ``SLAM.refined_trajectory``). This
measures that path end-to-end on a drifting multi-lap plane run:

  1. online volume @ tracked poses        (what --dense gives live)
  2. re-integrated @ refined poses        (BA-anchored, loop-corrected)

Surface error is analytic (the plane is exactly z=0 in the GT world;
points map there through GT frame 0 — CLAUDE.md gauge gotcha #12).

Measured (3 seeds, drifting 3-lap plane, 5 mm depth noise): MIXED —
re-integration mirrors FINAL-ring pose quality. seed0: 36.4/144.7 mm
(median/p90) online -> 16.8/45.3 re-integrated (2-3x better). seeds
1-2: online beats re-integrated (19.0 vs 102.0; 14.5 vs 49.0) because
on this repetitive COPLANAR scene the final ring converges to the loop
measurements' residual bias (~160 mm kf ATE; loop_weight 1/4/16 flat —
it is the measurements, not the weighting), while ONLINE poses benefit
from each closure the moment it fires (drift resets per lap: online
ATE 107.7 vs 261 loop-off). The spheres scene (exp_loop_ate) has no
such bias: closures there cut keyframe ATE 14-66%. Conclusion: offline
re-integration is the right tool exactly when the final ring is good —
check keyframe ATE (or pose-graph residuals) before trusting it on
low-structure coplanar scenes. The planar weakness family is known:
see BAConfig.depth_residuals for the BA-side analogue.

CPU run: python benchmarks/exp_dense_reint.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from kbslam.config import (DenseMapConfig, KeyframePolicyConfig, LoopConfig,
                           MapConfig, OrbConfig, PnPConfig, SLAMConfig)
from kbslam.io.synthetic import default_trajectory, render_sequence
from kbslam.mapping.dense import integrate_sequence, surface_points
from kbslam.slam import SLAM


def _log(m):
    print(f"[dense_reint {time.strftime('%H:%M:%S')}] {m}",
          file=sys.stderr, flush=True)


def lap_trajectory(frames_per_lap, laps):
    one = default_trajectory(frames_per_lap)
    return np.concatenate([one[:-1]] * laps + [one[-1:]])


def surface_err_mm(tsdf, dcfg, T0):
    pts, _ = surface_points(tsdf, dcfg)
    if len(pts) == 0:
        return None, 0
    pts_gt = pts @ T0[:3, :3].T + T0[:3, 3]
    e = np.abs(pts_gt[:, 2])
    return dict(median=round(float(np.median(e)) * 1e3, 2),
                p90=round(float(np.percentile(e, 90)) * 1e3, 2)), len(pts)


def main():
    F, L = 60, 3
    poses = lap_trajectory(F, L)
    results = {}
    for seed in (0, 1, 2):
        seq = render_sequence(num_frames=len(poses), height=240, width=320,
                              scene="plane", depth_noise_mm=5.0,
                              seed=seed, poses=poses)
        cfg = SLAMConfig(
            image_height=240, image_width=320,
            orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
            pnp=PnPConfig(num_hypotheses=128),
            policy=KeyframePolicyConfig(min_frame_gap=3,
                                        rotation_threshold_deg=2.0),
            map=MapConfig(max_keyframes=64, max_map_points=32768),
            loop=LoopConfig(enabled=True, min_separation=10, score_min=0.7,
                            min_inliers=40),
        )
        cfg = cfg.replace(dense=dataclasses.replace(cfg.dense, enabled=True))
        s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
        for i in range(len(poses)):
            s.process(seq.rgb[i], seq.depth[i])
        T0 = seq.poses[0]

        online, n_on = surface_err_mm(s.tsdf, cfg.dense, T0)

        # offline re-integration at the refined (BA-anchored,
        # loop-corrected) per-frame poses — keyframe frames only, the
        # same frames the online volume fused
        refined = s.refined_trajectory()
        kf_frames = [d["frame"] for d in s.diagnostics if d["added_kf"]]
        depths = seq.depth[kf_frames].astype(np.float32) * 0.001
        reint = integrate_sequence(depths, refined[kf_frames],
                                   s.intr, cfg.dense)
        re_err, n_re = surface_err_mm(reint, cfg.dense, T0)

        results[f"seed{seed}"] = dict(
            loops=len(s.loop_events),
            online=online, online_points=n_on,
            reintegrated=re_err, reintegrated_points=n_re,
        )
        _log(f"seed{seed}: {results[f'seed{seed}']}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
