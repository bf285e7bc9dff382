"""Long-run stability: ring-buffer wrap, landmark-ring reuse, culling,
and async BA together over a 200-frame palindrome sequence on a small
map capacity — exercises every masked-scatter edge the short tests
don't (keyframe slot reuse, BA merge after wrap, pruning on stale ids)."""
import numpy as np
import dataclasses

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig, BAConfig
from kbslam.eval.trajectory import ate_rmse
from kbslam.io.synthetic import render_sequence
from kbslam.slam import SLAM


def test_longrun_ring_wrap_with_async_ba_and_cull():
    seq = render_sequence(num_frames=25, height=120, width=160, fx=130.0)
    order = list(range(25)) + list(range(23, 0, -1))
    frames = [order[i % len(order)] for i in range(200)]

    cfg = SLAMConfig(
        image_height=120, image_width=160,
        orb=OrbConfig(num_features=256, num_levels=3, max_features=256),
        pnp=PnPConfig(num_hypotheses=64),
        map=MapConfig(max_keyframes=6, max_map_points=512),  # tiny rings
        ba=BAConfig(window=3, compact_obs=512, compact_landmarks=512,
                    max_iterations=5),
    )
    cfg = cfg.replace(cull=dataclasses.replace(cfg.cull, enabled=True))
    slam = SLAM(cfg, seq.K, ba_mode="async", use_mask=False)

    for i, j in enumerate(frames):
        d = slam.process(seq.rgb[j], seq.depth[j])
    slam.finish()

    n_success = sum(x["success"] for x in slam.diagnostics)
    assert n_success > 150, n_success
    # keyframe ring (capacity 6) wrapped multiple times
    assert slam.num_keyframes > 12
    assert int(slam.state.map.num_mp) > 100
    # no NaNs anywhere in the final state
    m = slam.state.map
    for arr in (m.kf_q, m.kf_t, m.mp_pos):
        assert np.all(np.isfinite(np.asarray(arr)))
    # trajectory stays bounded (the palindrome revisits the same span)
    est = np.stack(slam.frame_poses)
    assert np.abs(est[:, :3, 3]).max() < 10.0
    assert len(slam.ba_stats) >= 3


def test_longrun_chunked_ring_wrap_with_async_ba_and_cull():
    """The chunked executor under the same 200-frame palindrome stress:
    chunk-late cull + async-BA merges interacting with keyframe-ring
    wrap and landmark-slot reuse (the per-frame test above covers the
    SLAM path; this covers ChunkedStream's snapshot/merge timing)."""
    from kbslam.pipeline import init_state
    from kbslam.geom.camera import Intrinsics
    from kbslam.streaming import ChunkedStream

    seq = render_sequence(num_frames=25, height=120, width=160, fx=130.0)
    order = list(range(25)) + list(range(23, 0, -1))
    frames = [order[i % len(order)] for i in range(200)]

    cfg = SLAMConfig(
        image_height=120, image_width=160,
        orb=OrbConfig(num_features=256, num_levels=3, max_features=256),
        pnp=PnPConfig(num_hypotheses=64),
        map=MapConfig(max_keyframes=6, max_map_points=512),
        ba=BAConfig(window=3, compact_obs=512, compact_landmarks=512,
                    max_iterations=5),
    )
    cfg = cfg.replace(cull=dataclasses.replace(cfg.cull, enabled=True))
    intr = Intrinsics.from_matrix(seq.K)
    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8, ba_mode="async")

    got = []
    for j in frames:
        got += cs.feed(seq.rgb[j], seq.depth[j])
    got += cs.flush()

    assert len(got) == 200
    n_success = sum(r["success"] for r in got)
    assert n_success > 150, n_success
    n_kf = sum(r["added_kf"] for r in got)
    assert n_kf > 12  # capacity-6 ring wrapped multiple times
    m = cs.state.map
    assert int(m.num_mp) > 100
    for arr in (m.kf_q, m.kf_t, m.mp_pos):
        assert np.all(np.isfinite(np.asarray(arr)))
    est_t = np.stack([r["pose_t"] for r in got])
    assert np.abs(est_t).max() < 10.0
    assert len(cs.ba_stats) >= 3
    for s in cs.ba_stats:
        assert np.isfinite(s["final_cost"])
