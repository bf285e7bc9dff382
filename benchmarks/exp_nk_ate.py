#!/usr/bin/env python
"""What does track_keyframes=3 buy in ATE over the reference-parity NK=1?

VERDICT r3 weak #1: the default NK=3 costs ~10% FPS (475 vs 511 on TPU)
but its accuracy benefit was never measured. This runs the full SLAM
system (tracking + on-keyframe local BA) at NK=1 vs NK=3 across the
synthetic scene families — including the hard ones (spheres, rotation-
dominant) where a multi-keyframe bank should matter most — and reports
online / refined / keyframe ATE plus failure counts.

CPU run (accuracy is platform-independent; tests run the same path):
  python benchmarks/exp_nk_ate.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.eval.trajectory import ate_rmse
from kbslam.io.synthetic import render_sequence, rotation_trajectory
from kbslam.slam import SLAM


def _log(m):
    print(f"[nk_ate {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def _cfg240(nk):
    return SLAMConfig(
        image_height=240, image_width=320, track_keyframes=nk,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )


def run_one(cfg, seq):
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
    for i in range(len(seq.rgb)):
        s.process(seq.rgb[i], seq.depth[i])
    est = np.stack(s.frame_poses)
    online = ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3])
    refined = ate_rmse(s.refined_trajectory()[:, :3, 3], seq.poses[:, :3, 3])
    kf_frames = [d["frame"] for d in s.diagnostics if d["added_kf"]]
    kf = ate_rmse(s.keyframe_positions(), seq.poses[kf_frames][:, :3, 3])
    fails = sum(not d["success"] for d in s.diagnostics)
    return dict(online_mm=round(online * 1e3, 2),
                refined_mm=round(refined * 1e3, 2),
                kf_mm=round(kf * 1e3, 2),
                fails=fails, keyframes=len(kf_frames))


def scenes(seed):
    T = 48
    yield "plane_smooth", render_sequence(T, 240, 320, seed=seed)
    yield "spheres_smooth", render_sequence(T, 240, 320, seed=seed,
                                            scene="spheres")
    yield "plane_rot", render_sequence(
        T, 240, 320, seed=seed, poses=rotation_trajectory(T))
    yield "spheres_rot", render_sequence(
        T, 240, 320, seed=seed, scene="spheres",
        poses=rotation_trajectory(T))


def main():
    results = {}
    for seed in (0, 1, 2):
        for name, seq in scenes(seed):
            for nk in (1, 3):
                r = run_one(_cfg240(nk), seq)
                results[f"{name}_s{seed}_nk{nk}"] = r
                _log(f"{name} seed={seed} nk={nk}: {r}")
    # aggregate: mean refined/kf ATE per nk
    for nk in (1, 3):
        keys = [k for k in results if k.endswith(f"nk{nk}")]
        agg = {m: round(float(np.mean([results[k][m] for k in keys])), 2)
               for m in ("online_mm", "refined_mm", "kf_mm")}
        agg["fails"] = int(np.sum([results[k]["fails"] for k in keys]))
        results[f"mean_nk{nk}"] = agg
        _log(f"MEAN nk={nk}: {agg}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
