"""End-to-end accuracy with local BA in the loop, on hard synthetic data
(non-planar sphere scene with occlusion rims, Kinect-style quadratic
depth noise, depth dropout; plus a rotation-dominant low-texture
trajectory). Acceptance gates:
  - enabling BA must not hurt the ONLINE trajectory (per seed,
    BA-on <= 1.05 x BA-off + 1 mm) and must strictly help somewhere;
  - the BA-refined trajectory (keyframe-anchored post-hoc correction,
    SLAM.refined_trajectory) must beat the online one — this is where
    the window solves' accuracy becomes visible, since the newest-KF
    gauge hides it from online estimates (reference main.cpp semantics).

Covers the full reference loop (main.cpp:24-63 track + Optimizers.cpp
BundleAdjustment on keyframe insertion), which round-1 testing only
exercised on hand-built windows."""
import numpy as np
import pytest

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.eval.trajectory import ate_rmse
from kbslam.io.synthetic import render_sequence, rotation_trajectory
from kbslam.slam import SLAM


def _cfg(max_kf=16, max_mp=8192):
    # track_keyframes=3 (the opt-in multi-keyframe bank, not the NK=1
    # reference-parity default): these gates measure the ACCURACY VALUE
    # of BA + keyframe-anchored refinement on hard noisy scenes, which
    # is only visible when within-interval VO drift doesn't dominate —
    # at NK=1 on the noisy sphere scene the online trajectory carries
    # ~66 mm of frame-to-anchor drift that no keyframe refinement can
    # remove (measured round 4; benchmarks/exp_nk_ate.py has the full
    # NK=1 vs NK=3 study). The BA-never-hurts contract at NK=1 is
    # separately pinned below (test_ba_not_hurting_at_reference_parity).
    return SLAMConfig(
        image_height=240, image_width=320, track_keyframes=3,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=max_kf, max_map_points=max_mp),
    )


def _track(seq, mode, cfg=None):
    s = SLAM(cfg or _cfg(), seq.K, ba_mode=mode, use_mask=False)
    for i in range(len(seq.rgb)):
        s.process(seq.rgb[i], seq.depth[i])
    est = np.stack(s.frame_poses)
    n_succ = sum(d["success"] for d in s.diagnostics)
    return ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3]), n_succ, s


def test_ba_in_loop_on_hard_scene_three_seeds():
    results = []
    for seed in (0, 1, 2):
        seq = render_sequence(num_frames=40, height=240, width=320,
                              scene="spheres", depth_noise_mm=2.0,
                              depth_dropout=0.02, seed=seed)
        ate_off, succ_off, _ = _track(seq, "disabled")
        ate_on, succ_on, s_on = _track(seq, "on_keyframe")
        refined = s_on.refined_trajectory()
        ate_ref = ate_rmse(refined[:, :3, 3], seq.poses[:, :3, 3])
        results.append((seed, ate_off, ate_on, ate_ref))
        assert succ_on >= 36, (seed, succ_on)
        assert len(s_on.ba_stats) >= 2, "BA never ran"
        # BA must not hurt the online estimate, per seed
        assert ate_on <= 1.05 * ate_off + 1e-3, (seed, ate_on, ate_off)
        assert ate_on < 0.09, (seed, ate_on)
        # the refined trajectory carries the solves' accuracy
        assert ate_ref <= ate_on + 1e-3, (seed, ate_ref, ate_on)
        assert ate_ref < 0.05, (seed, ate_ref)
    # and refinement strictly helps somewhere
    assert any(r < 0.8 * on for _, _, on, r in results), results


def test_ba_in_loop_rotation_dominant_low_texture():
    """Rotation-dominant sweep (policy fires on the 5-degree trigger,
    short baselines) over a low-texture sphere scene with 10% depth
    dropout, 120 frames — the harder trajectory class VERDICT r2 asked
    for. Same contract: BA helps, refinement helps more."""
    cfg = _cfg(max_kf=32, max_mp=16384)
    N = 120
    seq = render_sequence(num_frames=N, height=240, width=320, seed=0,
                          poses=rotation_trajectory(N), scene="spheres",
                          depth_noise_mm=2.0, depth_dropout=0.10,
                          texture_rects=180)
    ate_off, succ_off, _ = _track(seq, "disabled", cfg)
    ate_on, succ_on, s_on = _track(seq, "on_keyframe", cfg)
    refined = s_on.refined_trajectory()
    ate_ref = ate_rmse(refined[:, :3, 3], seq.poses[:, :3, 3])
    assert succ_on >= N - 6, succ_on
    assert len(s_on.ba_stats) >= 6, "BA rarely ran on a 12-KF run"
    assert ate_on <= 1.05 * ate_off + 1e-3, (ate_on, ate_off)
    assert ate_ref <= ate_on + 1e-3, (ate_ref, ate_on)
    assert ate_ref < 0.06, ate_ref


def test_ba_not_hurting_at_reference_parity():
    """At the NK=1 reference-parity default, enabling BA must not hurt
    the online trajectory on the hard noisy scene (the reference runs
    its BA concurrently with exactly this matching config). Refinement
    accuracy gates live in the NK=3 tests above — at NK=1 online
    frame-to-anchor drift dominates and refinement is ~neutral
    (measured 66.4 -> 66.5 mm, seed 0)."""
    seq = render_sequence(num_frames=40, height=240, width=320,
                          scene="spheres", depth_noise_mm=2.0,
                          depth_dropout=0.02, seed=0)
    cfg = _cfg().replace(track_keyframes=1)
    ate_off, _, _ = _track(seq, "disabled", cfg)
    ate_on, succ_on, s_on = _track(seq, "on_keyframe", cfg)
    assert succ_on >= 36, succ_on
    assert len(s_on.ba_stats) >= 2
    assert ate_on <= 1.05 * ate_off + 1e-3, (ate_on, ate_off)
