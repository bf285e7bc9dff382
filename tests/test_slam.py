"""System-level test: the SLAM host shell with BA enabled (reference
configs 1 and 2 from BASELINE.json: VO-only and full keyframe SLAM)."""
import numpy as np
import pytest

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.eval.trajectory import ate_rmse
from kbslam.io.synthetic import render_sequence
from kbslam.slam import SLAM


def cfg240():
    return SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )


@pytest.mark.parametrize("ba_mode", ["disabled", "on_keyframe"])
def test_slam_end_to_end(ba_mode):
    seq = render_sequence(num_frames=40, height=240, width=320)
    slam = SLAM(cfg240(), seq.K, ba_mode=ba_mode, use_mask=False)
    for i in range(40):
        slam.process(seq.rgb[i], seq.depth[i])

    n_success = sum(d["success"] for d in slam.diagnostics)
    assert n_success >= 38
    est = np.stack(slam.frame_poses)
    ate = ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3])
    assert ate < 0.05
    assert slam.num_keyframes >= 2
    if ba_mode == "on_keyframe":
        assert len(slam.ba_stats) >= 1
        for s in slam.ba_stats:
            assert s["final_cost"] <= s["initial_cost"] * 1.001
    assert slam.map_points().shape[0] > 50
    assert slam.keyframe_positions().shape[0] == min(slam.num_keyframes, 16)
