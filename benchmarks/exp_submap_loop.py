#!/usr/bin/env python
"""Does the submap atlas give re-integration-quality loop correction
for FREE?

The monolithic TSDF fuses at tracked poses and deliberately cannot
follow pose-graph corrections (mapping/dense.py limitations); the
documented offline recovery is re-integration from refined poses
(benchmarks/exp_dense_reint.py — which also showed that on the
coplanar plane scene the final ring's loop-measurement bias can make
re-integration LOSE). The submap atlas (mapping/submap.py) claims a
third way: fuse into keyframe-anchored chunks online, then re-pose
CHUNKS by the anchors' corrected ring poses at extraction — zero
device work, no re-fusion pass.

This measures all four dense models on the drifting 3-lap SPHERES
scene (the family where loop closure is validated to help,
exp_loop_ate: keyframe ATE cut 14-66%):

  1. monolithic @ tracked poses     (what --dense gives live)
  2. re-integrated @ refined poses  (the offline gold, one extra pass)
  3. atlas @ frozen creation poses  (the atlas WITHOUT corrections)
  4. atlas @ corrected anchor poses (what --dense-submaps gives live)

Surface error is analytic: the GT scene is the plane z=0 plus 10
spheres whose centers/radii are replayed from the generator's rng
stream; error = distance to the nearest GT surface.

Two scenarios per seed: A) loop closure ON (closures fire on nearly
every insertion — online tracking is already loop-informed, so
post-hoc corrections are small), and B) loop OFF with ONE global-BA
correction at the end — the large-late-correction regime submapping
exists for.

Measured (3 seeds, 5 mm depth noise; median surface error mm):

  1. The atlas beats the monolithic volume in the drifty regimes:
     loop_on frozen 37.3/27.8/33.8 vs mono 51.4/32.3/30.1 (2/3 seeds,
     up to 27%); late-BA seeds 1-2: atlas 42-60 vs mono 77-92 (short
     rigid chunks stay crisp where one long fusion smears).
  2. Correction-following MIRRORS its pose source, at zero re-fusion
     cost: corrected-vs-frozen moves the same direction as
     reintegrated-vs-monolithic on ALL six runs. When the corrected
     ring is good (seed2 late-BA), corrected extraction 60.2 -> 51.5
     matches the full re-integration pass (55.3) for free; when the
     end-of-run ring is WORSE than insertion-time poses (seeds 0-1
     late-BA; the synthetic-ring bias documented in exp_dense_reint),
     corrected tracks that too — and frozen extraction is a one-flag
     rollback, unlike the monolithic volume whose fusion at bad poses
     is unrecoverable without a second pass.
  3. With per-insertion closures (scenario A) post-hoc corrections add
     only loop-measurement bias on top of already-loop-informed
     placement: frozen beats corrected by 2-6 median on 3/3 (p90
     mixed: corrected wins seed1 110->80). Matches the exp_dense_reint
     lesson; check keyframe ATE before preferring corrected anchors on
     repetitive synthetic scenes.

The mid-submap gauge rule this experiment exposed (fusion must use the
anchor's CURRENT ring pose, not its frozen creation pose) is pinned by
tests/test_submap.py::test_mid_submap_correction_fuses_gauge_consistently.

CPU run: python benchmarks/exp_submap_loop.py
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

from kbslam.config import (KeyframePolicyConfig, LoopConfig, MapConfig,
                           OrbConfig, PnPConfig, SLAMConfig)
from kbslam.io.synthetic import (_texture, default_trajectory,
                                 render_sequence)
from kbslam.mapping.dense import integrate_sequence, surface_points
from kbslam.mapping.submap import extract_atlas_surface
from kbslam.slam import SLAM, pose_T


def _log(m):
    print(f"[submap_loop {time.strftime('%H:%M:%S')}] {m}",
          file=sys.stderr, flush=True)


def lap_trajectory(frames_per_lap, laps):
    one = default_trajectory(frames_per_lap)
    return np.concatenate([one[:-1]] * laps + [one[-1:]])


def sphere_params(seed, texture_rects=600, n_sph=10):
    """Replay render_sequence's rng stream (texture first, then the
    sphere draws — io/synthetic.py) to recover the GT geometry."""
    rng = np.random.default_rng(seed)
    _texture(rng, num_rects=texture_rects)
    c = np.stack([rng.uniform(-2.2, 2.2, n_sph),
                  rng.uniform(-2.2, 2.2, n_sph),
                  rng.uniform(-1.3, -0.35, n_sph)], axis=1)
    r = rng.uniform(0.18, 0.45, n_sph)
    return c.astype(np.float32), r.astype(np.float32)


def gt_surface_err_mm(pts_world_slam, T0, sph_c, sph_r):
    """Distance of each point to the nearest GT surface (plane z=0
    union spheres), after mapping SLAM-gauge points to the GT world
    via frame 0 (CLAUDE.md gauge gotcha #12)."""
    if len(pts_world_slam) == 0:
        return None, 0
    p = pts_world_slam @ T0[:3, :3].T + T0[:3, 3]
    e = np.abs(p[:, 2])
    for c, r in zip(sph_c, sph_r):
        e = np.minimum(e, np.abs(np.linalg.norm(p - c, axis=1) - r))
    return dict(median=round(float(np.median(e)) * 1e3, 2),
                p90=round(float(np.percentile(e, 90)) * 1e3, 2)), len(p)


def _slam_cfg(loop_on):
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4,
                      max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        policy=KeyframePolicyConfig(min_frame_gap=3,
                                    rotation_threshold_deg=2.0),
        map=MapConfig(max_keyframes=64, max_map_points=32768),
        loop=LoopConfig(enabled=loop_on, min_separation=10,
                        score_min=0.7, min_inliers=40,
                        max_trans_disc=0.30, max_rot_disc_deg=10.0),
    )
    return cfg.replace(dense=dataclasses.replace(
        cfg.dense, enabled=True, submap_every=2, max_submaps=32))


def run_scenario(seq, sph_c, sph_r, loop_on, global_ba_at_end):
    cfg = _slam_cfg(loop_on)
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
    for i in range(len(seq.rgb)):
        s.process(seq.rgb[i], seq.depth[i])
    T0 = seq.poses[0]
    kf_frames = [d["frame"] for d in s.diagnostics if d["added_kf"]]
    depths = seq.depth[kf_frames].astype(np.float32) * 0.001
    tracked = np.stack(s.frame_poses)[kf_frames]

    # atlas @ last-fusion-time anchor poses = the dense model WITHOUT
    # any post-hoc correction (extract before the end-of-run solve,
    # with an empty current-pose dict)
    e_frz, n_frz = gt_surface_err_mm(
        extract_atlas_surface(s.atlas, cfg.dense, {})[0],
        T0, sph_c, sph_r)

    if global_ba_at_end:
        # ONE big late correction: full-map BA over the ring (oldest
        # keyframe gauge-fixed, so the frame-0 gauge is preserved)
        s.run_global_ba()
    # corrected pose source: the CURRENT ring (loop-corrected and/or
    # post-global-BA keyframe poses)
    m = s.state.map
    ring_q = np.asarray(m.kf_q)
    ring_t = np.asarray(m.kf_t)
    cap = ring_q.shape[0]
    corrected = np.stack([pose_T(ring_q[k % cap], ring_t[k % cap])
                          for k in range(len(kf_frames))])

    # 1. monolithic @ tracked poses (== online --dense fusion)
    mono = integrate_sequence(depths, tracked, s.intr, cfg.dense)
    e_mono, n_mono = gt_surface_err_mm(
        surface_points(mono, cfg.dense)[0], T0, sph_c, sph_r)
    # 2. re-integrated @ corrected ring poses (offline gold: a full
    #    second fusion pass over every keyframe depth image)
    reint = integrate_sequence(depths, corrected, s.intr, cfg.dense)
    e_re, n_re = gt_surface_err_mm(
        surface_points(reint, cfg.dense)[0], T0, sph_c, sph_r)
    # 3. atlas @ corrected anchor poses (what --dense-submaps gives
    #    live — zero device work, no re-fusion)
    e_cor, n_cor = gt_surface_err_mm(
        s.dense_surface()[0], T0, sph_c, sph_r)

    return dict(
        loops=len(s.loop_events), keyframes=len(kf_frames),
        submaps=int(min(int(s.atlas.count), s.atlas.capacity)),
        monolithic=e_mono, monolithic_points=n_mono,
        reintegrated=e_re, reintegrated_points=n_re,
        atlas_frozen=e_frz, atlas_frozen_points=n_frz,
        atlas_corrected=e_cor, atlas_corrected_points=n_cor,
    )


def main():
    F, L = 60, 3
    poses = lap_trajectory(F, L)
    results = {}
    for seed in (0, 1, 2):
        seq = render_sequence(num_frames=len(poses), height=240,
                              width=320, scene="spheres",
                              depth_noise_mm=5.0, seed=seed, poses=poses)
        sph_c, sph_r = sphere_params(seed)
        # A: per-insertion loop closures (online tracking already
        #    loop-informed — corrections are small and continuous)
        a = run_scenario(seq, sph_c, sph_r, loop_on=True,
                         global_ba_at_end=False)
        _log(f"seed{seed} loop_on: {a}")
        # B: loop OFF, ONE big global-BA correction at the end — the
        #    regime submapping exists for (large LATE corrections)
        b = run_scenario(seq, sph_c, sph_r, loop_on=False,
                         global_ba_at_end=True)
        _log(f"seed{seed} late_gba: {b}")
        results[f"seed{seed}"] = dict(loop_on=a, late_global_ba=b)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
