"""End-to-end accuracy with local BA in the loop, on hard synthetic data
(non-planar sphere scene with occlusion rims, Kinect-style quadratic
depth noise, 2% depth dropout). The acceptance gate: enabling BA must
not hurt — per seed, BA-on ATE <= 1.05 x BA-off ATE (+1 mm slack) and
stays below an absolute bound.

Covers the full reference loop (main.cpp:24-63 track + Optimizers.cpp
BundleAdjustment on keyframe insertion), which round-1 testing only
exercised on hand-built windows."""
import numpy as np
import pytest

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.eval.trajectory import ate_rmse
from kbslam.io.synthetic import render_sequence
from kbslam.slam import SLAM


def _cfg():
    return SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )


def _track(seq, mode):
    s = SLAM(_cfg(), seq.K, ba_mode=mode, use_mask=False)
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
        results.append((seed, ate_off, ate_on))
        assert succ_on >= 36, (seed, succ_on)
        assert len(s_on.ba_stats) >= 2, "BA never ran"
        # BA must help (or at worst be neutral), per seed
        assert ate_on <= 1.05 * ate_off + 1e-3, (seed, ate_on, ate_off)
        assert ate_on < 0.08, (seed, ate_on)
    # and strictly help somewhere
    assert any(on < 0.9 * off for _, off, on in results), results
