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
