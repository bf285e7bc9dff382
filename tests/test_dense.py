"""Dense TSDF volume (mapping/dense.py) — a capability extension: the
reference's world model is sparse landmarks only (Map.cpp/MapPoint.hpp),
so it offers no reconstructed surface or free-space map.

The synthetic plane scene has analytic geometry (the textured plane is
exactly z = 0, io/synthetic.py), so surface accuracy is a direct gate:
extracted zero-crossing points must sit on z = 0.
"""
import numpy as np

import jax
import jax.numpy as jnp

from kbslam.config import DenseMapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.mapping.dense import (empty_tsdf, integrate,
                                  integrate_sequence, surface_points)


def test_tsdf_plane_surface_accuracy_with_gt_poses():
    """Fusing GT-posed depth of the analytic plane must reconstruct
    z = 0 to well under a voxel (the gradient refinement is the
    sub-voxel step: voxels are 85 mm, the surface must land within a
    few mm)."""
    T = 12
    seq = render_sequence(num_frames=T, height=240, width=320)
    intr = Intrinsics.from_matrix(seq.K)
    # GT poses live in the GT world frame (plane z=0, camera near
    # z=-2.5): place the box around the plane, not in front of frame 0
    # (the default origin serves the SLAM gauge — see DenseMapConfig)
    cfg = DenseMapConfig(origin=(-4.08, -4.08, -1.36))
    st = integrate_sequence(seq.depth.astype(np.float32) * 0.001,
                            seq.poses, intr, cfg)
    pts, _ = surface_points(st, cfg)
    assert len(pts) > 2000, len(pts)
    err = np.abs(pts[:, 2])  # analytic surface: plane z = 0
    assert np.median(err) < 0.005, np.median(err)
    assert np.percentile(err, 90) < 0.02, np.percentile(err, 90)


def test_tsdf_truncation_and_freespace_semantics():
    """Curless–Levoy contract on one synthetic wall: free space in
    front of the surface reads +1 (observed, fully truncated), the band
    straddles zero at the wall, and space behind the surface beyond the
    truncation band stays UNOBSERVED (weight 0) — carving it would
    corrupt later views through the wall."""
    cfg = DenseMapConfig(dims=(32, 32, 64), voxel_size=0.05,
                         origin=(-0.8, -0.8, 0.0), truncation=0.15)
    H, W = 120, 160
    intr = Intrinsics.create(fx=130.0, fy=130.0, cx=79.5, cy=59.5)
    depth = jnp.full((H, W), 2.0, jnp.float32)   # wall at z = 2 m
    pose = SE3(jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))  # camera at origin
    st = integrate(empty_tsdf(cfg), depth, pose, intr, cfg)
    t = np.asarray(st.tsdf)
    w = np.asarray(st.weight)

    # the voxel column through the image center (x=y=0 ray)
    ix = iy = 16  # centers at -0.8 + (16+0.5)*0.05 = 0.025 -> near axis
    zs = cfg.origin[2] + (np.arange(64) + 0.5) * cfg.voxel_size
    col_t, col_w = t[ix, iy], w[ix, iy]
    front = (zs > 0.3) & (zs < 2.0 - cfg.truncation)
    band = np.abs(zs - 2.0) < cfg.truncation * 0.5
    behind = zs > 2.0 + cfg.truncation
    assert np.all(col_w[front] > 0)
    assert np.all(col_t[front] > 0.99)
    assert np.all(col_w[band] > 0)
    assert np.all(np.abs(col_t[band]) < 0.6)
    assert np.all(col_w[behind] == 0)
    # sign flips from + (in front) to - (just behind) across the wall
    just_behind = (zs > 2.0 + 0.03) & (zs < 2.0 + cfg.truncation * 0.9)
    assert np.all(col_t[just_behind][col_w[just_behind] > 0] < 0)


def test_slam_dense_end_to_end_tracked_poses():
    """SLAM with dense.enabled fuses each keyframe's depth at its
    TRACKED pose: surface error now carries tracking error, so the gate
    is looser than the GT-pose test but must stay centimetre-scale on
    the clean plane scene."""
    from kbslam.config import MapConfig, OrbConfig, PnPConfig, SLAMConfig
    from kbslam.slam import SLAM

    T = 30
    seq = render_sequence(num_frames=T, height=240, width=320)
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )
    import dataclasses
    cfg = cfg.replace(dense=dataclasses.replace(cfg.dense, enabled=True))
    s = SLAM(cfg, seq.K, ba_mode="on_keyframe", use_mask=False)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i])
    pts, _ = s.dense_surface()
    assert len(pts) > 1000, len(pts)
    # points live in the SLAM world frame (= GT frame 0's camera):
    # map into the GT world, where the plane is exactly z = 0
    T0 = seq.poses[0]
    pts_gt = pts @ T0[:3, :3].T + T0[:3, 3]
    err = np.abs(pts_gt[:, 2])
    assert np.median(err) < 0.02, np.median(err)
    # API contract: disabled SLAM refuses
    s2 = SLAM(cfg.replace(dense=dataclasses.replace(cfg.dense,
                                                    enabled=False)),
              seq.K, ba_mode="disabled", use_mask=False)
    try:
        s2.dense_surface()
        assert False, "dense_surface must raise when disabled"
    except RuntimeError:
        pass


def test_cli_dense_smoke(tmp_path):
    """CLI surface: --dense --save-surface writes the point cloud and
    the summary reports volume stats."""
    import json
    import sys
    from io import StringIO

    from kbslam.cli import main

    out = tmp_path / "surf.npy"
    argv = ["--source", "synthetic", "--frames", "16",
            "--width", "160", "--height", "120",
            "--ba", "off", "--dense", "--save-surface", str(out)]
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        main(argv)
    finally:
        sys.stdout = old
    summary = json.loads(cap.getvalue().strip().splitlines()[-1])
    assert summary["tsdf_observed_voxels"] > 0
    assert summary["tsdf_surface_points"] > 0
    pts = np.load(out)
    assert pts.shape[1] == 3 and len(pts) == summary["tsdf_surface_points"]


def test_chunked_dense_matches_per_frame_path():
    """Chunked streaming fuses the same keyframes at the same drained
    poses the per-frame path does (chunked == per-frame tracking is
    pinned in test_streaming.py), so with BA off the TSDF volume must
    come out identical."""
    import dataclasses

    from kbslam.config import MapConfig, OrbConfig, PnPConfig, SLAMConfig
    from kbslam.pipeline import init_state
    from kbslam.slam import SLAM
    from kbslam.streaming import ChunkedStream

    T = 24
    seq = render_sequence(num_frames=T, height=240, width=320)
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )
    cfg = cfg.replace(dense=dataclasses.replace(cfg.dense, enabled=True))
    intr = Intrinsics.from_matrix(seq.K)

    s = SLAM(cfg, seq.K, ba_mode="disabled", use_mask=False)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i])

    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8)
    got = []
    for i in range(T):
        got += cs.feed(seq.rgb[i], seq.depth[i])
    got += cs.flush()
    assert len(got) == T
    assert not cs._depth_ring, "depth ring must drain"

    np.testing.assert_allclose(np.asarray(cs.tsdf.weight),
                               np.asarray(s.tsdf.weight))
    np.testing.assert_allclose(np.asarray(cs.tsdf.tsdf),
                               np.asarray(s.tsdf.tsdf), atol=1e-6)


def test_dense_checkpoint_roundtrip(tmp_path):
    """--save-checkpoint persists the TSDF volume and --resume restores
    it (without this, a resumed dense run silently restarts the volume
    empty while the sparse map covers pre-resume keyframes)."""
    import json
    import sys
    from io import StringIO

    from kbslam.cli import main

    ckpt = tmp_path / "c.npz"

    def run(argv):
        cap = StringIO()
        old = sys.stdout
        sys.stdout = cap
        try:
            main(argv)
        finally:
            sys.stdout = old
        return json.loads(cap.getvalue().strip().splitlines()[-1])

    base = ["--source", "synthetic", "--frames", "16",
            "--width", "160", "--height", "120", "--ba", "off", "--dense"]
    s1 = run(base + ["--save-checkpoint", str(ckpt)])
    assert s1["tsdf_observed_voxels"] > 0

    # resuming the same scene must START from the saved volume: with
    # zero new keyframes processed... frames still insert; instead
    # verify the loaded volume is present via the direct API
    from kbslam.config import DEFAULT_CONFIG
    from kbslam.io.checkpoint import load_checkpoint_tsdf
    import dataclasses

    cfg = DEFAULT_CONFIG.replace(image_height=120, image_width=160)
    cfg = cfg.replace(dense=dataclasses.replace(cfg.dense, enabled=True))
    tsdf = load_checkpoint_tsdf(str(ckpt), cfg)
    assert tsdf is not None
    assert int((np.asarray(tsdf.weight) > 0).sum()) \
        == s1["tsdf_observed_voxels"]

    # and the CLI resume path reports at least as many observed voxels
    s2 = run(base + ["--resume", str(ckpt)])
    assert s2["tsdf_observed_voxels"] >= s1["tsdf_observed_voxels"]


def test_tsdf_distorted_camera():
    """Depth images live in distorted pixel space (the tracking path
    samples depth at raw coords, pipeline.py), so voxel projection must
    push through the forward Brown-Conrady model — gated to its valid
    radius: ungated, far-outside voxels FOLD back into the image and
    fuse garbage (measured 25k junk points at 85 mm median). Gates: the
    modeled fusion must beat the coefficient-ignoring one at the edges
    (p90) and stay sub-voxel overall."""
    from scipy.ndimage import map_coordinates

    from kbslam.geom.camera import undistort_points

    dist = (0.22, -0.4, 0.0, 0.0, 0.0)  # TUM-fr1-strength radial
    T = 10
    seq = render_sequence(num_frames=T, height=240, width=320)
    intr_d = Intrinsics.from_matrix(seq.K, dist=dist)
    intr_0 = Intrinsics.from_matrix(seq.K)
    h, w = 240, 320
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1))
    src = np.asarray(undistort_points(intr_d, grid))
    coords = np.stack([src[:, 1].reshape(h, w), src[:, 0].reshape(h, w)])
    dep_d = np.stack([map_coordinates(f.astype(np.float32), coords,
                                      order=0, mode="nearest")
                      for f in seq.depth])
    cfg = DenseMapConfig(origin=(-4.08, -4.08, -1.36))

    def err_of(intr):
        st = integrate_sequence(dep_d * 0.001, seq.poses, intr, cfg)
        pts, _ = surface_points(st, cfg)
        return pts, np.abs(pts[:, 2])

    pts_d, err_d = err_of(intr_d)
    pts_0, err_0 = err_of(intr_0)
    # no fold-back junk: point count comparable to the rectified run
    assert len(pts_d) < 1.2 * len(pts_0), (len(pts_d), len(pts_0))
    assert np.median(err_d) < 0.005
    assert np.percentile(err_d, 90) < np.percentile(err_0, 90)
