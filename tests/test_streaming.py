"""Chunked streaming executor: per-frame-path equivalence, partial-chunk
flush semantics, latency contract."""
import numpy as np
import jax
import jax.numpy as jnp

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.io.synthetic import render_sequence
from kbslam.pipeline import init_state, make_track_step
from kbslam.streaming import ChunkedStream


def _cfg():
    return SLAMConfig(
        image_height=120, image_width=160,
        orb=OrbConfig(num_features=256, num_levels=3, max_features=256),
        pnp=PnPConfig(num_hypotheses=64),
        map=MapConfig(max_keyframes=8, max_map_points=4096),
    )


def test_chunked_stream_matches_per_frame_path():
    """25 frames through chunk=8 (flush pads the final 1-frame chunk):
    identical per-frame poses, keyframe decisions, and final map as the
    per-frame dispatch path — chunking is a pure execution-schedule
    change."""
    cfg = _cfg()
    seq = render_sequence(num_frames=25, height=120, width=160)
    intr = Intrinsics.from_matrix(seq.K)

    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    ref_state = init_state(cfg)
    ref = []
    for i in range(25):
        ref_state, out = step(ref_state, jnp.asarray(seq.rgb[i]),
                              jnp.asarray(seq.depth[i]))
        ref.append(jax.device_get(out))

    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8)
    got = []
    for i in range(25):
        got += cs.feed(seq.rgb[i], seq.depth[i])
    got += cs.flush()

    assert len(got) == 25
    for i, (r, g) in enumerate(zip(ref, got)):
        assert g["frame"] == i
        assert g["success"] == bool(r.success), i
        assert g["added_kf"] == bool(r.added_kf), i
        assert g["num_inliers"] == int(r.num_inliers), i
        np.testing.assert_allclose(g["pose_t"], np.asarray(r.pose_t),
                                   atol=1e-5)
        np.testing.assert_allclose(g["pose_q"], np.asarray(r.pose_q),
                                   atol=1e-5)

    # padding frames did not touch the stream state
    assert int(cs.state.frame_count) == 25
    assert int(cs.state.map.num_kf) == int(ref_state.map.num_kf)
    np.testing.assert_allclose(np.asarray(cs.state.map.kf_t),
                               np.asarray(ref_state.map.kf_t), atol=1e-5)


def test_chunked_stream_latency_bound():
    """Results arrive no later than 2 chunks after the frame enters."""
    cfg = _cfg()
    seq = render_sequence(num_frames=24, height=120, width=160)
    intr = Intrinsics.from_matrix(seq.K)
    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=4)
    seen = -1
    for i in range(24):
        for d in cs.feed(seq.rgb[i % 24], seq.depth[i % 24]):
            seen = d["frame"]
        if i >= 8:
            assert seen >= i - 8, (i, seen)
    assert [d["frame"] for d in cs.flush()] == list(range(seen + 1, 24))


def test_gray_ingress_matches_gray_fed_per_frame_path():
    """gray=True host conversion: identical results to feeding the same
    uint8 luma frames through the per-frame path (the 1.6x-bandwidth
    ingress mode changes bytes on the wire, not the algorithm)."""
    cfg = _cfg()
    seq = render_sequence(num_frames=9, height=120, width=160)
    intr = Intrinsics.from_matrix(seq.K)
    from kbslam.frontend.image import GRAY_WEIGHTS
    # same rounding as ChunkedStream's gray ingress (round, not
    # truncate — keeps u8 within 0.5 gray levels of the float path)
    luma = [np.round(f.astype(np.float32)
                     @ np.array(GRAY_WEIGHTS, np.float32)).astype(np.uint8)
            for f in seq.rgb]

    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    ref_state = init_state(cfg)
    ref = []
    for i in range(9):
        ref_state, out = step(ref_state, jnp.asarray(luma[i]),
                              jnp.asarray(seq.depth[i]))
        ref.append(jax.device_get(out))

    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=4, gray=True)
    got = []
    for i in range(9):
        got += cs.feed(seq.rgb[i], seq.depth[i])
    got += cs.flush()
    assert len(got) == 9
    for r, g in zip(ref, got):
        assert g["success"] == bool(r.success)
        np.testing.assert_allclose(g["pose_t"], np.asarray(r.pose_t),
                                   atol=1e-5)


def test_packed_mask_unpack_roundtrip():
    """Device-side bit unpack inverts np.packbits for arbitrary widths."""
    import jax.numpy as jnp

    from kbslam.streaming import unpack_mask_bits

    rng = np.random.default_rng(3)
    for w in (160, 123, 8):
        m = (rng.random((24, w)) > 0.4).astype(np.uint8)
        packed = np.packbits(m > 0, axis=-1)
        got = np.asarray(unpack_mask_bits(jnp.asarray(packed), w))
        np.testing.assert_array_equal(got, m)


def test_chunked_mask_matches_per_frame_path():
    """Masked tracking through the chunked executor == per-frame path
    (the reference applies the static-element mask on EVERY frame,
    VisualOdometry.cpp:30 — the fast path must too)."""
    cfg = _cfg()
    seq = render_sequence(num_frames=17, height=120, width=160,
                          moving_box=True)
    intr = Intrinsics.from_matrix(seq.K)

    step = make_track_step(cfg, intr, use_mask=True, auto_key=True)
    ref_state = init_state(cfg)
    ref = []
    for i in range(17):
        ref_state, out = step(ref_state, jnp.asarray(seq.rgb[i]),
                              jnp.asarray(seq.depth[i]),
                              jnp.asarray(seq.mask[i]))
        ref.append(jax.device_get(out))

    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8, use_mask=True)
    got = []
    for i in range(17):
        got += cs.feed(seq.rgb[i], seq.depth[i], seq.mask[i])
    got += cs.flush()
    assert len(got) == 17
    for i, (r, g) in enumerate(zip(ref, got)):
        assert g["success"] == bool(r.success), i
        assert g["added_kf"] == bool(r.added_kf), i
        np.testing.assert_allclose(g["pose_t"], np.asarray(r.pose_t),
                                   atol=1e-5)


def test_chunked_gray_packed_mask_matches_gray_per_frame():
    """gray=True + use_mask: the mask travels bit-packed (1 bpp) and is
    unpacked on device — identical results to feeding luma + u8 mask
    through the per-frame path."""
    cfg = _cfg()
    seq = render_sequence(num_frames=9, height=120, width=160,
                          moving_box=True)
    intr = Intrinsics.from_matrix(seq.K)
    from kbslam.frontend.image import GRAY_WEIGHTS

    luma = [np.round(f.astype(np.float32)
                     @ np.array(GRAY_WEIGHTS, np.float32)).astype(np.uint8)
            for f in seq.rgb]
    step = make_track_step(cfg, intr, use_mask=True, auto_key=True)
    ref_state = init_state(cfg)
    ref = []
    for i in range(9):
        ref_state, out = step(ref_state, jnp.asarray(luma[i]),
                              jnp.asarray(seq.depth[i]),
                              jnp.asarray((seq.mask[i] > 0).astype(np.uint8)))
        ref.append(jax.device_get(out))

    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=4, use_mask=True,
                       gray=True)
    got = []
    for i in range(9):
        got += cs.feed(seq.rgb[i], seq.depth[i], seq.mask[i])
    got += cs.flush()
    assert len(got) == 9
    for i, (r, g) in enumerate(zip(ref, got)):
        assert g["success"] == bool(r.success), i
        np.testing.assert_allclose(g["pose_t"], np.asarray(r.pose_t),
                                   atol=1e-5)


def test_chunked_async_ba_on_hard_scene():
    """Concurrent chunk-late BA on the streaming path (the reference
    tracks at camera rate WHILE BA refines in background, main.cpp:40-47
    — round 2 only had this on the per-frame path). Gates:
      - solves actually run and never increase cost;
      - chunked+async ONLINE ATE is no worse than chunked VO-only;
      - the REFINED trajectories (keyframe-anchored correction) of the
        chunked and per-frame async paths agree within 10% + 1 mm —
        chunk-late solves merge a chunk later, so the online estimates
        legitimately differ, but both paths' final maps carry the same
        window accuracy and the refined trajectories must show it."""
    from kbslam.config import BAConfig
    from kbslam.eval.trajectory import ate_rmse
    from kbslam.slam import SLAM, _quat_to_matrix_np, refine_frame_poses

    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
        ba=BAConfig(compact_obs=1024, compact_landmarks=1024),
    )
    seq = render_sequence(num_frames=40, height=240, width=320,
                          scene="spheres", depth_noise_mm=2.0,
                          depth_dropout=0.02, seed=0)
    intr = Intrinsics.from_matrix(seq.K)

    def run_chunked(ba_mode):
        cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8,
                           ba_mode=ba_mode)
        got = []
        for i in range(40):
            got += cs.feed(seq.rgb[i], seq.depth[i])
        got += cs.flush()
        assert len(got) == 40
        poses, anchors = [], []
        for r in got:
            T = np.eye(4)
            T[:3, :3] = _quat_to_matrix_np(r["pose_q"])
            T[:3, 3] = r["pose_t"]
            poses.append(T)
            Ta = np.eye(4)
            Ta[:3, :3] = _quat_to_matrix_np(r["anchor_q"])
            Ta[:3, 3] = r["anchor_t"]
            anchors.append((r["anchor_id"], Ta))
        est = np.stack(poses)
        refined = refine_frame_poses(poses, anchors, cs.state.map)
        return (ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3]),
                ate_rmse(refined[:, :3, 3], seq.poses[:, :3, 3]), cs)

    ate_vo, _, _ = run_chunked("off")
    ate_ba, ate_ba_ref, cs = run_chunked("async")
    assert len(cs.ba_stats) >= 2, "async BA never ran on the chunked path"
    for s in cs.ba_stats:
        assert s["final_cost"] <= s["initial_cost"] * 1.001
    assert ate_ba <= 1.05 * ate_vo + 1e-3, (ate_ba, ate_vo)

    slam = SLAM(cfg, seq.K, ba_mode="async", use_mask=False)
    for i in range(40):
        slam.process(seq.rgb[i], seq.depth[i])
    slam.finish()
    refined_pf = slam.refined_trajectory()
    ate_pf_ref = ate_rmse(refined_pf[:, :3, 3], seq.poses[:, :3, 3])
    assert ate_ba_ref <= 1.10 * ate_pf_ref + 1e-3, (ate_ba_ref, ate_pf_ref)


def test_flush_merges_inflight_ba_without_is_ready():
    """flush() must merge a still-pending async solve UNCONDITIONALLY
    under block=True: on the tunneled TPU runtime block_until_ready can
    return before work completes (CLAUDE.md gotcha #2), so gating the
    final merge on leaf.is_ready() silently dropped the last solve.
    Simulated here by swapping the in-flight tree for host numpy arrays,
    which have no is_ready at all — the merge may only happen via the
    unconditional block path (code-review r3 fix)."""
    cfg = _cfg()
    seq = render_sequence(num_frames=16, height=120, width=160)
    intr = Intrinsics.from_matrix(seq.K)
    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8, ba_mode="async")
    for i in range(16):
        cs.feed(seq.rgb[i], seq.depth[i])
    assert cs._ba_inflight is not None, "no solve in flight after 2 chunks"
    snapshot, result, stats = cs._ba_inflight
    cs._ba_inflight = (snapshot, jax.device_get(result),
                       jax.device_get(stats))
    n_before = len(cs.ba_stats)
    cs.flush()
    assert cs._ba_inflight is None
    assert len(cs.ba_stats) > n_before, "final in-flight solve was dropped"


def test_chunked_loop_closure_on_revisit():
    """Loop closure on the chunked streaming path (cfg.loop.enabled):
    probes run chunk-late on each drained keyframe insertion — the same
    place-recognition + verification + pose-graph machinery the
    per-frame path runs (tests/test_loop.py e2e), composed with the
    chunked executor. Gates mirror the per-frame e2e test: closures
    fire against much older keyframes with enough inliers, loop-off
    streams produce none, and keyframe-ring accuracy (where the
    correction lives) does not degrade."""
    from kbslam.config import KeyframePolicyConfig, LoopConfig
    from kbslam.eval.trajectory import ate_rmse
    from kbslam.slam import map_keyframe_positions

    T = 60
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres", depth_noise_mm=3.0, seed=1)
    intr = Intrinsics.from_matrix(seq.K)

    def run(loop_on):
        cfg = SLAMConfig(
            image_height=240, image_width=320,
            orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
            pnp=PnPConfig(num_hypotheses=128),
            policy=KeyframePolicyConfig(min_frame_gap=3,
                                        rotation_threshold_deg=2.0),
            map=MapConfig(max_keyframes=32, max_map_points=16384),
            loop=LoopConfig(enabled=loop_on, min_separation=8,
                            score_min=0.7, min_inliers=40,
                            max_trans_disc=0.10, max_rot_disc_deg=5.0),
        )
        cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8)
        got = []
        for i in range(T):
            got += cs.feed(seq.rgb[i], seq.depth[i])
        got += cs.flush()
        assert len(got) == T
        kf_frames = [r["frame"] for r in got if r["added_kf"]]
        kf_ate = ate_rmse(map_keyframe_positions(cs.state.map),
                          seq.poses[kf_frames][:, :3, 3])
        return cs, kf_ate

    cs_off, kf_off = run(False)
    cs_on, kf_on = run(True)

    assert not cs_off.loop_events
    assert len(cs_on.loop_events) >= 1, "no loop ever closed (chunked)"
    for e in cs_on.loop_events:
        # revisits must close against a much older keyframe
        assert e["query_id"] - e["cand_id"] >= 8, e
        assert e["inliers"] >= 40, e
        assert e["pg_final_cost"] <= e["pg_initial_cost"] * 1.001, e
    assert kf_on <= 1.15 * kf_off + 1e-3, (kf_on, kf_off)


def test_chunked_loop_closure_composes_with_async_ba():
    """Loop probes and async BA share the chunked executor: probes are
    pending-queued while a solve is in flight (loop/runner.py) and drain
    on quiet ticks — before the fix, every insertion dispatched a solve
    right before the probe check, so --loop --ba async never closed a
    single loop. Gates: solves ran, closures fired against much older
    keyframes, and the merge/correction interleave kept the ring sane
    (monotone ids, pose-graph cost non-increasing)."""
    from kbslam.config import KeyframePolicyConfig, LoopConfig

    T = 60
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres", depth_noise_mm=3.0, seed=1)
    intr = Intrinsics.from_matrix(seq.K)
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        policy=KeyframePolicyConfig(min_frame_gap=3,
                                    rotation_threshold_deg=2.0),
        map=MapConfig(max_keyframes=32, max_map_points=16384),
        loop=LoopConfig(enabled=True, min_separation=8, score_min=0.7,
                        min_inliers=40, max_trans_disc=0.10,
                        max_rot_disc_deg=5.0),
    )
    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8,
                       ba_mode="async")
    got = []
    for i in range(T):
        got += cs.feed(seq.rgb[i], seq.depth[i])
    got += cs.flush()
    assert len(got) == T
    assert len(cs.ba_stats) >= 1, "async BA never solved"
    assert len(cs.loop_events) >= 1, "no loop closed under async BA"
    for e in cs.loop_events:
        assert e["query_id"] - e["cand_id"] >= 8, e
        assert e["pg_final_cost"] <= e["pg_initial_cost"] * 1.001, e
    ids = np.asarray(cs.state.map.kf_id)
    live = ids[ids >= 0]
    assert live.size == int(cs.state.map.num_kf)
