"""Integration tests: full tracking on synthetic RGB-D sequences with
exact ground truth (the reference has no tests — SURVEY §4 — so the
acceptance gate is trajectory accuracy, not oracle equality)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.eval.trajectory import ate_rmse, rpe
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import quat_to_matrix
from kbslam.io.synthetic import render_sequence
from kbslam.pipeline import init_state, make_track_step


def small_cfg():
    return SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )


def run_sequence(seq, cfg, use_mask=False, intr=None):
    if intr is None:
        intr = Intrinsics.from_matrix(seq.K)
    step = make_track_step(cfg, intr, use_mask=use_mask)
    state = init_state(cfg)
    est = []
    outs = []
    for i in range(len(seq.rgb)):
        args = [state, jnp.asarray(seq.rgb[i]), jnp.asarray(seq.depth[i])]
        if use_mask:
            args.append(jnp.asarray(seq.mask[i]))
        args.append(jax.random.PRNGKey(i))
        state, out = step(*args)
        o = jax.device_get(out)
        T = np.eye(4)
        T[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(o.pose_q)))
        T[:3, 3] = o.pose_t
        est.append(T)
        outs.append(o)
    return np.stack(est), outs, state


@pytest.fixture(scope="module")
def tracked():
    seq = render_sequence(num_frames=30, height=240, width=320)
    est, outs, state = run_sequence(seq, small_cfg())
    return seq, est, outs, state


def test_tracking_succeeds(tracked):
    _, _, outs, _ = tracked
    assert all(o.success for o in outs[1:])
    assert all(o.num_inliers >= 50 for o in outs[1:])


def test_ate_below_threshold(tracked):
    seq, est, _, _ = tracked
    ate = ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3])
    assert ate < 0.05, f"ATE {ate:.3f} m too high"


def test_rpe_below_threshold(tracked):
    seq, est, _, _ = tracked
    t_err, r_err = rpe(est, seq.poses)
    assert t_err < 0.04
    assert r_err < 0.02


def test_keyframes_inserted(tracked):
    _, _, outs, state = tracked
    n_kf = int(state.map.num_kf)
    assert n_kf >= 2
    assert int(state.map.num_mp) > 100
    assert outs[0].added_kf  # first frame always inserts


def test_deterministic():
    seq = render_sequence(num_frames=8, height=240, width=320)
    est1, _, _ = run_sequence(seq, small_cfg())
    est2, _, _ = run_sequence(seq, small_cfg())
    np.testing.assert_array_equal(est1, est2)


def test_mask_path_ignores_dynamic_object():
    """Comparative gate: the static-element mask must HELP on a scene
    with a textured rigid dynamic object (the reference's mask purpose,
    VisualOdometry.cpp:30 / Camera.cpp multipart part 3). Mask-off runs
    the same compiled step with an all-ones mask; measured margins
    (seeds 0-2): mask-on 17.9-35.7 mm vs mask-off 163.7-173.2 mm —
    the moving object's consistent wrong-motion feature cluster drags
    the unmasked pose estimate by ~5-9x ATE."""
    seq = render_sequence(num_frames=20, height=240, width=320, moving_box=True)
    est, outs, _ = run_sequence(seq, small_cfg(), use_mask=True)
    assert all(o.success for o in outs[1:])
    ate_on = ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3])
    assert ate_on < 0.06

    seq_off = seq._replace(mask=np.full_like(seq.mask, 255))
    est_off, _, _ = run_sequence(seq_off, small_cfg(), use_mask=True)
    ate_off = ate_rmse(est_off[:, :3, 3], seq.poses[:, :3, 3])
    assert ate_on < ate_off, (
        f"mask did not help: on={ate_on:.4f} off={ate_off:.4f}")
    # not just better — decisively so (measured ~5-9x; gate at 2x)
    assert ate_off > 2.0 * ate_on, (
        f"mask benefit marginal: on={ate_on:.4f} off={ate_off:.4f}")


def test_frames_since_kf_counts_only_attempted_frames():
    """Reference parity: framesSinceLastKf increments inside
    ShouldAddKeyFrame, which only runs on frames with >=4 match pairs
    (VisualOdometry.cpp:102-103,146-150) — blank/dropout frames must
    not advance the keyframe cadence."""
    cfg = small_cfg()
    seq = render_sequence(num_frames=4, height=240, width=320)
    intr = Intrinsics.from_matrix(seq.K)
    step = make_track_step(cfg, intr, use_mask=False)
    state = init_state(cfg)
    blank_rgb = np.zeros((240, 320, 3), np.uint8)
    blank_depth = np.zeros((240, 320), np.uint16)

    def run(state, i, rgb, depth):
        return step(state, jnp.asarray(rgb), jnp.asarray(depth),
                    jax.random.PRNGKey(i))

    state, _ = run(state, 0, seq.rgb[0], seq.depth[0])   # first KF
    state, o1 = run(state, 1, seq.rgb[1], seq.depth[1])  # attempted
    assert int(o1.num_matches) >= 4
    base = int(state.frames_since_kf)
    for i in range(2, 5):                                 # 3 dropout frames
        state, od = run(state, i, blank_rgb, blank_depth)
        assert int(od.num_matches) < 4
    assert int(state.frames_since_kf) == base             # counter held
    state, _ = run(state, 5, seq.rgb[2], seq.depth[2])    # attempted again
    assert int(state.frames_since_kf) in (0, base + 1)    # +1 or KF reset


def test_tracking_on_distorted_rendering():
    """End-to-end with lens distortion: the synthetic pinhole rendering is
    warped through the Brown-Conrady forward model (simulating the
    reference's raw camera, Camera.cpp:108-124), and tracking with the
    coefficient vector recovers near-rectified accuracy while ignoring
    the coefficients degrades it."""
    from scipy.ndimage import map_coordinates
    from kbslam.geom.camera import undistort_points

    dist = (0.22, -0.4, 0.0, 0.0, 0.0)  # TUM-fr1-strength radial
    seq = render_sequence(num_frames=20, height=240, width=320)
    intr_d = Intrinsics.from_matrix(seq.K, dist=dist)

    # I_dist(u_d) = I_rect(undistort(u_d)): sample the pinhole rendering
    # at the rectified source of every distorted grid pixel
    h, w = 240, 320
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1))
    src = np.asarray(undistort_points(intr_d, grid))
    coords = np.stack([src[:, 1].reshape(h, w), src[:, 0].reshape(h, w)])

    def warp(img, order):
        if img.ndim == 3:
            return np.stack([map_coordinates(img[..., c].astype(np.float32),
                                             coords, order=order, mode="nearest")
                             for c in range(img.shape[2])], -1).astype(img.dtype)
        return map_coordinates(img.astype(np.float32), coords, order=order,
                               mode="nearest").astype(img.dtype)

    rgb_d = np.stack([warp(f, 1) for f in seq.rgb])
    dep_d = np.stack([warp(f, 0) for f in seq.depth])
    seq_d = type(seq)(rgb=rgb_d, depth=dep_d, mask=seq.mask, poses=seq.poses,
                      K=seq.K)

    est_d, outs_d, _ = run_sequence(seq_d, small_cfg(), intr=intr_d)
    gt = np.stack(seq.poses)
    ate_with_model = ate_rmse(est_d[:, :3, 3], gt[:, :3, 3])

    est_no, _, _ = run_sequence(seq_d, small_cfg())  # coefficients ignored
    ate_without = ate_rmse(est_no[:, :3, 3], gt[:, :3, 3])

    assert sum(o.success for o in outs_d[1:]) >= len(outs_d) - 3
    # re-based for the NK=1 reference-parity default (round 4): measured
    # 34.5 mm (was ~25 at NK=3) — the binding check is the comparative
    # one below (model-on must beat coefficients-ignored decisively)
    assert ate_with_model < 0.040, ate_with_model
    assert ate_with_model < 0.6 * ate_without, (ate_with_model, ate_without)


def test_rim_gate_range_aware_threshold():
    """The absolute rim gate (depth_edge_max_spread) false-positives on
    z^2 sensor noise: at 6 m with a 3 mm@1m model the 3x3 spread of
    PURE NOISE (~0.3 m) exceeds the 0.15 m threshold and all far depth
    is zeroed — measured catastrophic on the corridor scene (SLAM
    diverges ~1e10 m; benchmarks/exp_loop_ate.py notes). The
    range-aware term (depth_edge_rel_per_m2, thr = max(abs, rel*z^2))
    must keep noisy-but-smooth far depth while BOTH configs still zero
    true occlusion rims."""
    import dataclasses

    from kbslam.geom.camera import Intrinsics
    from kbslam.pipeline import extract_frame

    rng = np.random.default_rng(3)
    H, W = 240, 320
    rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)

    z_bg, z_sq = 6.0, 1.0     # smooth far wall; near square (true rim)
    clean = np.full((H, W), z_bg, np.float32)
    clean[90:150, 120:200] = z_sq
    sigma = 0.003 * clean**2  # 3 mm@1m Kinect-style quadratic model
    noisy = clean + rng.normal(0.0, 1.0, clean.shape).astype(np.float32) * sigma
    depth = np.clip(noisy * 1000.0, 1, 65535).astype(np.uint16)

    # true 3x3 spread from the CLEAN depth classifies rim vs smooth
    from scipy.ndimage import grey_dilation, grey_erosion

    true_spread = grey_dilation(clean, 3) - grey_erosion(clean, 3)

    cfg = small_cfg()
    intr = Intrinsics.from_matrix(
        np.array([[260.0, 0, (W - 1) / 2], [0, 260.0, (H - 1) / 2],
                  [0, 0, 1]]))

    def gate_stats(rel):
        c = cfg.replace(map=dataclasses.replace(
            cfg.map, depth_edge_rel_per_m2=rel))
        feats, depth_kp = jax.jit(
            lambda r, d: extract_frame(r, d, None, intr, c))(
                jnp.asarray(rgb), jnp.asarray(depth))
        feats, depth_kp = jax.device_get((feats, depth_kp))
        xy = np.round(feats.xy).astype(int)
        v = (np.asarray(feats.valid)
             & (xy[:, 0] >= 1) & (xy[:, 0] < W - 1)
             & (xy[:, 1] >= 1) & (xy[:, 1] < H - 1))
        ts = true_spread[xy[v, 1], xy[v, 0]]
        kept = np.asarray(depth_kp)[v] > 0
        far_smooth = (ts < 0.1) & (clean[xy[v, 1], xy[v, 0]] > 3.0)
        rim = ts > 1.0
        return kept, far_smooth, rim

    kept_abs, far_abs, rim_abs = gate_stats(0.0)
    kept_rel, far_rel, rim_rel = gate_stats(0.03)

    assert far_abs.sum() > 50 and rim_abs.sum() > 3, "degenerate scene"
    # absolute-only: noise spread (~0.3 m) kills nearly all far depth
    assert kept_abs[far_abs].mean() < 0.10, kept_abs[far_abs].mean()
    # range-aware: far smooth depth survives (thr = 0.03 * 36 = 1.08 m)
    assert kept_rel[far_rel].mean() > 0.70, kept_rel[far_rel].mean()
    # both configs still gate true rims (5 m step >> either threshold)
    assert kept_abs[rim_abs].mean() < 0.05
    assert kept_rel[rim_rel].mean() < 0.05
