#!/usr/bin/env python
"""What does `--dense-icp refine` buy (or cost) in trajectory accuracy?

Rescue mode's value is pinned by the blackout gate
(tests/test_dense_icp.py: frames the reference contract loses keep
emitting <80 mm poses). Refine mode polishes EVERY successful PnP pose
against the fused volume, accepted only on strict SDF-RMSE
improvement — this measures whether that actually helps online ATE,
per scene family, against the icp-off baseline on identical frames.

Where it should help: depth-noise-dominated scenes, where PnP's
reprojection-only estimate is noisy but the volume (averaging many
frames of depth, Curless-Levoy) is a better geometric anchor. Where it
could hurt: the volume itself is built from tracked poses — early
drift bakes in, and refining toward a drifted model can REINFORCE
drift (the classic frame-to-model coupling).

Measured (3 seeds x {clean, noisy5mm} spheres, 240x320, 34 frames;
online full-trajectory ATE mm, icp-off -> refine): clean
36.1->26.0 / 15.9->53.9 / 17.5->20.1; noisy 64.0->60.1 / 48.7->36.6 /
30.4->24.5. 4/6 cells improve (up to -25%), but clean seed1 is a
3.4x CATASTROPHIC regression — and the strict-RMSE gate accepted
100% of steps in every run (23-24/23-24), i.e. it is NOT selective:
the volume is built from tracked poses, so pulling poses toward it
always reduces SDF RMSE, including when that REINFORCES baked-in
drift (the classic frame-to-model coupling failure). Refined
(BA-anchored) ATE moves the same directions.

VERDICT: refine mode is measurably unsafe as a default — the mode
stays available (and off) with this documented; rescue remains the
validated deployment (its gates only ever fire on frames that would
otherwise FAIL, so it cannot regress a tracking-healthy run).

CPU run: python benchmarks/exp_icp_ate.py
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

from kbslam.config import (DenseMapConfig, KeyframePolicyConfig,
                           MapConfig, OrbConfig, PnPConfig, SLAMConfig)
from kbslam.eval.trajectory import ate_rmse
from kbslam.io.synthetic import render_sequence
from kbslam.slam import SLAM


def _log(m):
    print(f"[icp_ate {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def _cfg(icp_mode, submap_every=0):
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        policy=KeyframePolicyConfig(min_frame_gap=3,
                                    rotation_threshold_deg=2.0),
        map=MapConfig(max_keyframes=32, max_map_points=16384),
    )
    # SLAM-gauge volume: the box sits in front of the start camera
    # (the DenseMapConfig default origin is built for this gauge)
    cfg = cfg.replace(dense=dataclasses.replace(
        cfg.dense, enabled=True, submap_every=submap_every))
    if icp_mode != "off":
        cfg = cfg.replace(dense_icp=dataclasses.replace(
            cfg.dense_icp, mode=icp_mode))
    return cfg


def run_one(seq, mode):
    # "refine_atlas" = refine against the submap atlas with the
    # independent-evidence gate (the ACTIVE submap is excluded from
    # the alignment window — slam._icp_tick exclude_active): the
    # polish is only accepted when geometry the current tracking
    # leg did NOT build supports it
    submap_every = 2 if mode == "refine_atlas" else 0
    icp_mode = "refine" if mode == "refine_atlas" else mode
    cfg = _cfg(icp_mode, submap_every)
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
    for i in range(len(seq.rgb)):
        s.process(seq.rgb[i], seq.depth[i])
    est = np.stack(s.frame_poses)[:, :3, 3]
    ref = s.refined_trajectory()[:, :3, 3]
    gt = seq.poses[:, :3, 3]
    out = dict(online_mm=round(ate_rmse(est, gt) * 1e3, 2),
               refined_mm=round(ate_rmse(ref, gt) * 1e3, 2),
               fails=sum(not d["success"] for d in s.diagnostics))
    if icp_mode == "refine":
        ev = [e for e in s.icp_events if e["mode"] == "refine"]
        out["refines_attempted"] = len(ev)
        out["refines_accepted"] = sum(e["accepted"] for e in ev)
    return out


def main():
    T = 34
    modes = os.environ.get("ICP_ATE_MODES", "off,refine,refine_atlas")
    results = {}
    for fam, noise in (("clean", 0.0), ("noisy5mm", 5.0)):
        for seed in (0, 1, 2):
            seq = render_sequence(num_frames=T, height=240, width=320,
                                  scene="spheres", seed=seed,
                                  depth_noise_mm=noise)
            row = {m: run_one(seq, m) for m in modes.split(",")}
            results[f"{fam}_seed{seed}"] = row
            _log(f"{fam} seed{seed}: " + " ".join(
                f"{m}={row[m]}" for m in row))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
