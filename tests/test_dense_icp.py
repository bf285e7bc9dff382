"""Frame-to-model dense tracking (mapping/icp.py) — capability
extension: the reference loses tracking whenever feature matching
starves (ORB -> BFMatcher -> solvePnPRansac only, VisualOdometry.cpp:
35-97, no relocalization — SURVEY §5.3). Direct TSDF alignment gives a
texture-free pose source.

Scene choice matters: the plane-only scene constrains just 3 DoF under
a point-to-SDF objective (in-plane translation + yaw slide freely; the
Levenberg damping holds them at the initial pose), so the solver tests
use the spheres scene (plane + 10 textured spheres = full 6-DoF
constraint). The SLAM-level test instead creates the failure the
feature freely: a mask blackout (all pixels flagged dynamic) starves
ORB while the depth geometry stays perfectly informative.
"""
import dataclasses

import numpy as np

import jax.numpy as jnp

from kbslam.config import (DenseIcpConfig, DenseMapConfig, MapConfig,
                           OrbConfig, PnPConfig, SLAMConfig)
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.mapping.dense import empty_tsdf, integrate_sequence
from kbslam.mapping.icp import make_icp
from kbslam.slam import SLAM, pose_T


def _pose_err(q, t, T_ref):
    """(translation m, rotation deg) between (q, t) and a 4x4 pose."""
    T = pose_T(np.asarray(q), np.asarray(t))
    dT = np.linalg.inv(T_ref) @ T
    ang = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2,
                                       -1.0, 1.0)))
    return float(np.linalg.norm(dT[:3, 3])), float(ang)


def _fused_spheres(T=12, voxel=0.05):
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    intr = Intrinsics.from_matrix(seq.K)
    # GT poses live in the scene world (plane z=0, camera near z=-2.5):
    # place the box around the geometry (CLAUDE.md gauge gotcha).
    # 50 mm voxels: ICP's converged accuracy is ~0.18 voxel (the
    # projective-TSDF zero crossing is displaced by discretization —
    # measured 13.7/9.2/6.5 mm at 85/50/34 mm voxels), so the gates
    # below are stated in voxel units.
    cfg = DenseMapConfig(voxel_size=voxel, dims=(120, 120, 40),
                         origin=(-3.0, -3.0, -1.6))
    st = integrate_sequence(seq.depth.astype(np.float32) * 0.001,
                            seq.poses, intr, cfg)
    return seq, intr, cfg, st


def test_icp_recovers_perturbed_pose():
    """A pose perturbed by ~4 cm / ~1.5 deg must be pulled back to the
    ground truth within a quarter voxel / a tenth of a degree against a
    volume fused from GT-posed depth."""
    seq, intr, cfg, st = _fused_spheres()
    icp = DenseIcpConfig(iters=10)
    f = make_icp(cfg, icp, intr, depth_scale=0.001)

    T_gt = seq.poses[6]
    gt = SE3.from_matrix(jnp.asarray(T_gt, jnp.float32))
    delta = SE3.exp(jnp.array([0.025, -0.02, 0.02, 0.012, -0.015, 0.010]))
    pert = delta @ gt
    e0_t, e0_r = _pose_err(pert.q, pert.t, T_gt)
    assert e0_t > 0.02  # the perturbation is real

    r = f(st, jnp.asarray(seq.depth[6]), pert.q, pert.t)
    e1_t, e1_r = _pose_err(r.q, r.t, T_gt)
    assert int(r.num_valid) > 1000, int(r.num_valid)
    assert float(r.rmse) < float(r.rmse_init), (float(r.rmse),
                                                float(r.rmse_init))
    assert e1_t < 0.25 * cfg.voxel_size, (e0_t, e1_t)
    assert e1_t < e0_t / 4, (e0_t, e1_t)
    assert e1_r < 0.3, (e0_r, e1_r)


def test_icp_zero_perturbation_is_stable():
    """Starting AT the ground truth, the solve must stay within the
    discretization bias (quarter voxel) — no runaway self-drift."""
    seq, intr, cfg, st = _fused_spheres()
    f = make_icp(cfg, DenseIcpConfig(), intr, depth_scale=0.001)
    T_gt = seq.poses[6]
    gt = SE3.from_matrix(jnp.asarray(T_gt, jnp.float32))
    r = f(st, jnp.asarray(seq.depth[6]), gt.q, gt.t)
    e_t, e_r = _pose_err(r.q, r.t, T_gt)
    assert e_t < 0.25 * cfg.voxel_size, e_t
    assert e_r < 0.3, e_r


def test_icp_empty_volume_rejected():
    """An empty (never-observed) volume yields zero live samples — the
    host acceptance gate must see num_valid == 0, and the pose must
    come back unchanged (the NaN-step guard holds it)."""
    seq, intr, cfg, _ = _fused_spheres(T=2)
    f = make_icp(cfg, DenseIcpConfig(), intr, depth_scale=0.001)
    gt = SE3.from_matrix(jnp.asarray(seq.poses[1], jnp.float32))
    r = f(empty_tsdf(cfg), jnp.asarray(seq.depth[1]), gt.q, gt.t)
    assert int(r.num_valid) == 0
    np.testing.assert_allclose(np.asarray(r.q), np.asarray(gt.q))
    np.testing.assert_allclose(np.asarray(r.t), np.asarray(gt.t))


def _blackout_cfg():
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )
    return cfg.replace(dense=dataclasses.replace(cfg.dense, enabled=True))


def test_slam_icp_rescue_through_mask_blackout():
    """Comparative gate: a 6-frame mask blackout (every pixel flagged
    dynamic) starves ORB and the reference contract just fails those
    frames — with dense_icp mode 'rescue', geometry alone must keep
    emitting poses through the blackout, close to ground truth."""
    T = 34
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    mask = seq.mask.copy()
    black = list(range(16, 22))
    mask[black] = 0

    def run(icp_mode):
        cfg = _blackout_cfg()
        if icp_mode != "off":
            cfg = cfg.replace(dense_icp=dataclasses.replace(
                cfg.dense_icp, mode=icp_mode))
        s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=True)
        for i in range(T):
            s.process(seq.rgb[i], seq.depth[i], mask[i])
        return s

    s_off = run("off")
    assert all(not s_off.diagnostics[i]["success"] for i in black), \
        "fixture broken: blackout frames should fail without ICP"

    s_on = run("rescue")
    rescued = [e for e in s_on.icp_events
               if e["mode"] == "rescue" and e["accepted"]]
    assert len(rescued) >= 4, s_on.icp_events
    n_ok = sum(s_on.diagnostics[i]["success"] for i in black)
    assert n_ok >= 4, [s_on.diagnostics[i] for i in black]

    # rescued poses must be metrically sane: compare in the GT world
    # (SLAM world = GT frame 0's camera -> left-multiply by T0)
    T0 = seq.poses[0]
    for i in black:
        if not s_on.diagnostics[i]["success"]:
            continue
        T_est = T0 @ s_on.frame_poses[i]
        err = np.linalg.norm(T_est[:3, 3] - seq.poses[i][:3, 3])
        assert err < 0.08, (i, err)

    # and tracking must re-acquire normally after the blackout
    assert s_on.diagnostics[-1]["success"]


def test_slam_icp_refine_accepts_only_improvement():
    """Refine mode runs on successful frames and the acceptance gate
    requires a strict SDF-RMSE decrease — so every accepted event must
    show rmse < rmse_init, and the trajectory must stay close to the
    unrefined one (polish, not teleport)."""
    T = 26
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    cfg = _blackout_cfg()
    cfg = cfg.replace(dense_icp=dataclasses.replace(cfg.dense_icp,
                                                    mode="refine"))
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i])
    refines = [e for e in s.icp_events if e["mode"] == "refine"]
    assert refines, "refine mode never ran"
    for e in refines:
        if e["accepted"]:
            assert e["rmse"] < e["rmse_init"], e
    # keyframe frames are skipped (the inserted KF pose belongs to the
    # sparse pipeline): no refine event on added_kf frames
    kf_frames = {d["frame"] for d in s.diagnostics if d["added_kf"]}
    assert not kf_frames & {e["frame"] for e in refines}


def test_cli_dense_icp_smoke(tmp_path):
    """CLI surface: --dense --dense-icp rescue reports rescue/refine
    counters in the summary."""
    import json
    import sys
    from io import StringIO

    from kbslam.cli import main

    argv = ["--source", "synthetic", "--frames", "12",
            "--width", "160", "--height", "120",
            "--ba", "off", "--dense", "--dense-icp", "rescue"]
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        main(argv)
    finally:
        sys.stdout = old
    summary = json.loads(cap.getvalue().strip().splitlines()[-1])
    assert "icp_rescues" in summary and "icp_refines" in summary


def test_icp_rescue_does_not_mask_loss_from_reloc_counter():
    """Interplay contract: an accepted rescue emits a successful pose
    but the SPARSE pipeline is still lost (PnP keeps anchoring to a
    stale keyframe) — so the relocalization failure counter must keep
    counting through rescued frames, letting reloc re-anchor the map on
    schedule. (A rescue that reset the counter would suppress reloc for
    as long as geometry kept it alive.)"""
    from kbslam.config import LoopConfig

    T = 28
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    mask = seq.mask.copy()
    black = list(range(16, 22))
    mask[black] = 0

    cfg = _blackout_cfg()
    cfg = cfg.replace(
        dense_icp=dataclasses.replace(cfg.dense_icp, mode="rescue"),
        # reloc machinery ON (the counter runs) but with a threshold
        # beyond the blackout so the count itself is observable
        loop=LoopConfig(reloc_after=99))
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=True)
    streaks = []
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i], mask[i])
        streaks.append(s._fail_streak)

    rescued = sum(1 for e in s.icp_events
                  if e["mode"] == "rescue" and e["accepted"])
    assert rescued >= 4, s.icp_events
    # the streak must have accumulated across the rescued frames
    # (pre-fix behavior: every accepted rescue reset it -> max 1)
    assert max(streaks[black[0]:black[-1] + 1]) >= 4, streaks
    # and PnP re-acquiring after the blackout clears it
    assert streaks[-1] == 0, streaks


# --- submap-atlas composition (round 5): ICP against the newest K
# submaps re-posed by their anchors' CURRENT poses — recovery keeps
# working in the drifty regime submaps exist for ------------------------

def _fused_two_submap_atlas(voxel=0.05):
    """Two submaps over the spheres sequence, anchored at GT camera
    poses of frames 2 and 8 (frames 0-5 fused into A, 6-11 into B) —
    the local box sits in front of each anchor camera."""
    from kbslam.mapping.submap import empty_atlas, integrate_active
    from kbslam.mapping.submap import start_submap

    T = 12
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    intr = Intrinsics.from_matrix(seq.K)
    cfg = DenseMapConfig(voxel_size=voxel, dims=(96, 96, 56),
                         origin=(-2.4, -2.4, 0.6))
    atlas = empty_atlas(cfg, 4)
    for anchor_i, frames in ((2, range(0, 6)), (8, range(6, 12))):
        Ta = SE3.from_matrix(jnp.asarray(seq.poses[anchor_i], jnp.float32))
        atlas = start_submap(atlas, Ta.q, Ta.t, kf_id=anchor_i)
        for i in frames:
            Ti = SE3.from_matrix(jnp.asarray(seq.poses[i], jnp.float32))
            atlas = integrate_active(
                atlas, jnp.asarray(seq.depth[i], jnp.float32) * 0.001,
                Ti.q, Ti.t, intr, cfg, Ta.q, Ta.t)
    return seq, intr, cfg, atlas


def test_icp_atlas_recovers_perturbed_pose():
    """align_depth_to_atlas over two submaps must pull a ~4 cm/1.5 deg
    perturbation back like the monolithic solver (same voxel-unit
    gates), selecting the newest valid submap per point."""
    from kbslam.mapping.icp import make_icp_atlas

    seq, intr, cfg, atlas = _fused_two_submap_atlas()
    icp = DenseIcpConfig(iters=10, atlas_slots=2)
    f = make_icp_atlas(cfg, icp, intr, depth_scale=0.001)
    slots = jnp.array([1, 0], jnp.int32)      # newest first (B, A)
    aq = atlas.anchor_q[jnp.array([1, 0])]
    at = atlas.anchor_t[jnp.array([1, 0])]

    T_gt = seq.poses[6]
    gt = SE3.from_matrix(jnp.asarray(T_gt, jnp.float32))
    delta = SE3.exp(jnp.array([0.025, -0.02, 0.02, 0.012, -0.015, 0.010]))
    pert = delta @ gt
    e0_t, _ = _pose_err(pert.q, pert.t, T_gt)
    assert e0_t > 0.02

    r = f(atlas, slots, aq, at, jnp.asarray(seq.depth[6]), pert.q, pert.t)
    e1_t, e1_r = _pose_err(r.q, r.t, T_gt)
    assert int(r.num_valid) > 1000, int(r.num_valid)
    assert float(r.rmse) < float(r.rmse_init)
    assert e1_t < 0.25 * cfg.voxel_size, (e0_t, e1_t)
    assert e1_r < 0.3, e1_r

    # padding by slot repetition must not change the solution (the
    # host pads short windows this way)
    f3 = make_icp_atlas(cfg, DenseIcpConfig(iters=10, atlas_slots=3),
                        intr, depth_scale=0.001)
    r3 = f3(atlas, jnp.array([1, 0, 0], jnp.int32),
            atlas.anchor_q[jnp.array([1, 0, 0])],
            atlas.anchor_t[jnp.array([1, 0, 0])],
            jnp.asarray(seq.depth[6]), pert.q, pert.t)
    np.testing.assert_allclose(np.asarray(r3.t), np.asarray(r.t),
                               atol=1e-5)


def test_icp_atlas_follows_reposed_anchors():
    """THE submap property: when the anchors are re-posed (a loop/BA
    correction moved every keyframe by a rigid G), aligning with the
    CURRENT anchor poses must recover G·T_gt — the model geometry
    followed the correction, so recovery works in the corrected gauge.
    The monolithic solver structurally cannot do this."""
    from kbslam.mapping.icp import make_icp_atlas

    seq, intr, cfg, atlas = _fused_two_submap_atlas()
    icp = DenseIcpConfig(iters=10, atlas_slots=2)
    f = make_icp_atlas(cfg, icp, intr, depth_scale=0.001)
    slots = jnp.array([1, 0], jnp.int32)

    G = SE3.exp(jnp.array([0.3, -0.2, 0.15, 0.08, -0.05, 0.06]))
    aq = jnp.stack([(G @ SE3(atlas.anchor_q[s], atlas.anchor_t[s])).q
                    for s in (1, 0)])
    at = jnp.stack([(G @ SE3(atlas.anchor_q[s], atlas.anchor_t[s])).t
                    for s in (1, 0)])

    T_gt = seq.poses[6]
    gt = SE3.from_matrix(jnp.asarray(T_gt, jnp.float32))
    target = G @ gt                            # truth in the new gauge
    delta = SE3.exp(jnp.array([0.025, -0.02, 0.02, 0.012, -0.015, 0.010]))
    pert = delta @ target
    r = f(atlas, slots, aq, at, jnp.asarray(seq.depth[6]), pert.q, pert.t)
    T_target = pose_T(np.asarray(target.q), np.asarray(target.t))
    e1_t, e1_r = _pose_err(r.q, r.t, T_target)
    assert int(r.num_valid) > 1000
    assert e1_t < 0.25 * cfg.voxel_size, e1_t
    assert e1_r < 0.3, e1_r


def test_slam_icp_rescue_blackout_with_submaps():
    """The round-4 exclusion is gone: the mask-blackout rescue gate
    must hold with --dense-submaps — rescue aligns against the newest
    atlas submaps re-posed by their anchors (the drifty-regime config
    finally has a texture-free recovery story)."""
    T = 34
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    mask = seq.mask.copy()
    black = list(range(16, 22))
    mask[black] = 0

    cfg = _blackout_cfg()
    cfg = cfg.replace(
        dense=dataclasses.replace(cfg.dense, submap_every=1),
        dense_icp=dataclasses.replace(cfg.dense_icp, mode="rescue"))
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=True)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i], mask[i])

    rescued = [e for e in s.icp_events
               if e["mode"] == "rescue" and e["accepted"]]
    assert len(rescued) >= 4, s.icp_events
    n_ok = sum(s.diagnostics[i]["success"] for i in black)
    assert n_ok >= 4, [s.diagnostics[i] for i in black]
    # Gate is wider than the monolithic test's 0.08: atlas rescue lands
    # in the RING gauge (submaps re-posed by their anchors' current
    # ring poses; local BA holds the NEWEST keyframe so old anchors
    # absorb gauge motion — measured 37-82 mm world-gauge drift of KF0
    # here while the ring's RELATIVE KF0<->KF10 error stayed 4.6 mm).
    # Ring gauge is the product-consistent choice: post-blackout PnP
    # re-acquires against BA-merged landmarks, i.e. in the same gauge.
    # With BA off the gauges coincide and rescue is bit-identical to
    # the monolithic solver (test below).
    T0 = seq.poses[0]
    for i in black:
        if not s.diagnostics[i]["success"]:
            continue
        T_est = T0 @ s.frame_poses[i]
        err = np.linalg.norm(T_est[:3, 3] - seq.poses[i][:3, 3])
        assert err < 0.12, (i, err)
    assert s.diagnostics[-1]["success"]


def test_slam_icp_atlas_rescue_matches_monolithic_when_ba_off():
    """Gauge-coincidence pin: with BA disabled the ring never moves, so
    a submap atlas whose first anchor is the identity holds the same
    geometry as the monolithic volume in the same world frame — the
    atlas rescue path must emit (numerically) the same poses as the
    monolithic rescue path through the blackout. Isolates the solver
    path from the ring-gauge effects of the test above."""
    T = 26
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    mask = seq.mask.copy()
    black = list(range(16, 22))
    mask[black] = 0

    def run(submap_every):
        cfg = _blackout_cfg()
        cfg = cfg.replace(
            dense=dataclasses.replace(cfg.dense,
                                      submap_every=submap_every),
            dense_icp=dataclasses.replace(cfg.dense_icp, mode="rescue"))
        s = SLAM(cfg, seq.K, ba_mode="disabled", use_mask=True)
        for i in range(T):
            s.process(seq.rgb[i], seq.depth[i], mask[i])
        return s

    s_mono = run(0)
    s_atlas = run(4)   # one submap window covers all insertions here
    ok_mono = [s_mono.diagnostics[i]["success"] for i in black]
    ok_atlas = [s_atlas.diagnostics[i]["success"] for i in black]
    assert ok_mono == ok_atlas and sum(ok_mono) >= 4
    for i in black:
        if not ok_mono[black.index(i)]:
            continue
        np.testing.assert_allclose(s_atlas.frame_poses[i],
                                   s_mono.frame_poses[i], atol=1e-4)


def test_slam_icp_refine_with_submaps_needs_independent_evidence():
    """With the atlas, refine aligns ONLY against submaps the active
    fusion did not build (exclude_active): no refine event can fire
    while a single submap is live, and accepted refines still require
    a strict RMSE decrease on that independent geometry."""
    T = 26
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    cfg = _blackout_cfg()
    cfg = cfg.replace(
        dense=dataclasses.replace(cfg.dense, submap_every=1),
        dense_icp=dataclasses.replace(cfg.dense_icp, mode="refine"))
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
    second_kf_frame = None
    for i in range(T):
        d = s.process(seq.rgb[i], seq.depth[i])
        if d["added_kf"] and second_kf_frame is None and i > 0:
            second_kf_frame = i
    refines = [e for e in s.icp_events if e["mode"] == "refine"]
    assert refines, "refine mode never ran"
    # no refine before a SECOND submap exists (exclude_active leaves
    # an empty evidence window until then)
    assert second_kf_frame is not None
    assert all(e["frame"] > second_kf_frame for e in refines), (
        second_kf_frame, refines[:3])
    for e in refines:
        if e["accepted"]:
            assert e["rmse"] < e["rmse_init"], e


def test_cli_dense_icp_with_submaps_smoke():
    """CLI surface: --dense --dense-submaps --dense-icp rescue is now a
    supported combination (round-4's exclusion removed) and reports the
    rescue counters."""
    import json
    import sys
    from io import StringIO

    from kbslam.cli import main

    argv = ["--source", "synthetic", "--frames", "12",
            "--width", "160", "--height", "120", "--ba", "off",
            "--dense", "--dense-submaps", "2", "--dense-icp", "rescue"]
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        main(argv)
    finally:
        sys.stdout = old
    summary = json.loads(cap.getvalue().strip().splitlines()[-1])
    assert "icp_rescues" in summary and summary["tsdf_submaps"] >= 1
