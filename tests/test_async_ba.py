"""Async BA mode: tracking overlaps a snapshot solve; merge is race-free
and applies only where still valid (the reference's background-thread
semantics without its data race — SURVEY §2.3)."""
import numpy as np
import jax
import jax.numpy as jnp

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig, BAConfig
from kbslam.eval.trajectory import ate_rmse
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.mapping.state import empty_map, insert_keyframe
from kbslam.ba.merge import merge_ba_result
from kbslam.slam import SLAM
from tests.test_mapstate import fake_feats


def cfg240():
    return SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
        ba=BAConfig(compact_obs=1024, compact_landmarks=1024),
    )


def test_async_slam_end_to_end():
    seq = render_sequence(num_frames=40, height=240, width=320)
    slam = SLAM(cfg240(), seq.K, ba_mode="async", use_mask=False)
    for i in range(40):
        slam.process(seq.rgb[i], seq.depth[i])
    slam.finish()
    assert len(slam.ba_stats) >= 1
    est = np.stack(slam.frame_poses)
    ate = ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3])
    assert ate < 0.05
    for s in slam.ba_stats:
        assert s["final_cost"] <= s["initial_cost"] * 1.001


def test_merge_skips_overwritten_slots():
    from kbslam.config import MapConfig, OrbConfig

    mcfg = MapConfig(max_keyframes=4, max_map_points=64)
    ocfg = OrbConfig(max_features=8, num_levels=1)
    bacfg = BAConfig(window=3)
    rng = np.random.default_rng(0)

    snap = empty_map(mcfg, ocfg)
    for i in range(4):  # fill the ring: ids 0-3 in slots 0-3
        snap = insert_keyframe(
            snap, fake_feats(rng), jnp.ones(8),
            SE3.identity()._replace(t=jnp.array([float(i), 0, 0])))

    # "BA result": poses shifted by +10 in y, landmark 5 moved
    ba = snap._replace(
        kf_t=snap.kf_t + jnp.array([0.0, 10.0, 0.0]),
        mp_pos=snap.mp_pos.at[5].set(jnp.array([9.0, 9.0, 9.0])),
    )
    # landmark 5 is referenced by the snapshot window (slots 1-3)
    snap = snap._replace(kf_mp=snap.kf_mp.at[2, 0].set(5))

    # current: ring advanced by two — slots 0 and 1 overwritten
    current = snap
    for t in (10.0, 11.0):
        current = insert_keyframe(
            current, fake_feats(rng), jnp.ones(8),
            SE3.identity()._replace(t=jnp.array([t, 0, 0])))
    assert int(current.kf_id[1]) == 5  # slot 1 reused (window slot!)

    merged = merge_ba_result(current, snap, ba, bacfg)
    # overwritten window slot 1 keeps the tracked pose
    np.testing.assert_allclose(np.asarray(merged.kf_t[1]), [11.0, 0, 0])
    # intact window slots 2, 3 take the BA poses
    np.testing.assert_allclose(np.asarray(merged.kf_t[2]), [2.0, 10.0, 0.0])
    np.testing.assert_allclose(np.asarray(merged.kf_t[3]), [3.0, 10.0, 0.0])
    # window landmark takes BA position; untouched landmark unchanged
    np.testing.assert_allclose(np.asarray(merged.mp_pos[5]), [9.0, 9.0, 9.0])
    np.testing.assert_allclose(np.asarray(merged.mp_pos[6]),
                               np.asarray(current.mp_pos[6]))


def test_merge_keeps_fresh_id_over_stale_snapshot_reference():
    """After a landmark-ring wrap, a snapshot window entry can hold a
    STALE id (>= 0 but below the snapshot's live window). BA leaves it
    untouched; if tracking re-fused a FRESH id into that entry while the
    solve was in flight, the merge must keep the fresh id — not restore
    the stale one from the BA result."""
    from kbslam.config import MapConfig, OrbConfig

    mcfg = MapConfig(max_keyframes=4, max_map_points=8)
    ocfg = OrbConfig(max_features=8, num_levels=1)
    bacfg = BAConfig(window=3)
    rng = np.random.default_rng(1)

    snap = empty_map(mcfg, ocfg)
    for i in range(3):
        snap = insert_keyframe(
            snap, fake_feats(rng), jnp.ones(8),
            SE3.identity()._replace(t=jnp.array([float(i), 0, 0])))
    # landmark ring (capacity 8) has wrapped: live ids are 2..9
    snap = snap._replace(num_mp=jnp.int32(10))
    # newest window KF: entry 0 references STALE id 1, entry 1 live id 5
    snap = snap._replace(kf_mp=snap.kf_mp.at[2, 0].set(1).at[2, 1].set(5))
    # BA pruned the live landmark 5; the stale entry is untouched
    ba = snap._replace(kf_mp=snap.kf_mp.at[2, 1].set(-1))
    # tracking re-fused FRESH id 10 into entry 0 while the solve ran
    current = snap._replace(
        kf_mp=snap.kf_mp.at[2, 0].set(10), num_mp=jnp.int32(11))

    merged = merge_ba_result(current, snap, ba, bacfg)
    assert int(merged.kf_mp[2, 0]) == 10  # fresh id kept
    assert int(merged.kf_mp[2, 1]) == -1  # live entry takes BA's pruning
