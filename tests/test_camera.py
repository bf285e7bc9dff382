"""Pinhole projection/unprojection parity tests."""
import numpy as np
import jax.numpy as jnp

from kbslam.geom.camera import Intrinsics, project, unproject, depth_at, to_display_coords

INTR = Intrinsics.create(525.0, 525.0, 319.5, 239.5)  # TUM fr1-style


def test_project_unproject_round_trip():
    rng = np.random.default_rng(0)
    pts = rng.uniform(low=[-2, -2, 0.5], high=[2, 2, 5.0], size=(100, 3)).astype(np.float32)
    uv, z = project(INTR, jnp.asarray(pts))
    back = unproject(INTR, uv, z)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_unproject_matches_reference_formula():
    # reference: x = (u - cx) * z / fx (VisualOdometry.cpp:52-54)
    uv = jnp.array([[100.0, 200.0]])
    z = jnp.array([2.0])
    p = np.asarray(unproject(INTR, uv, z))[0]
    assert abs(p[0] - (100.0 - 319.5) * 2.0 / 525.0) < 1e-6
    assert abs(p[1] - (200.0 - 239.5) * 2.0 / 525.0) < 1e-6
    assert p[2] == 2.0


def test_depth_at_rounds_and_scales():
    depth = jnp.zeros((480, 640), dtype=jnp.uint16).at[240, 320].set(1500)
    # cvRound semantics: 319.6 -> 320, 240.4 -> 240
    d = depth_at(depth, jnp.array([[319.6, 240.4]]), 0.001)
    np.testing.assert_allclose(np.asarray(d), [1.5], atol=1e-6)


def test_display_coords():
    p = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(to_display_coords(p)), [[1.0, -3.0, -2.0]])


# ---------------------------------------------------------------------------
# Lens distortion (reference DistCoeffs: Camera.cpp:108-124, passed to
# cv::solvePnPRansac at VisualOdometry.cpp:72)
# ---------------------------------------------------------------------------
# TUM fr1 ROS-default coefficients (k1, k2, p1, p2, k3)
DIST = (0.2624, -0.9531, -0.0054, 0.0026, 1.1633)
DINTR = Intrinsics.create(517.3, 516.5, 318.6, 255.3, DIST)


def _grid_pixels(n=200, margin=60, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(low=[margin, margin],
                       high=[640 - margin, 480 - margin],
                       size=(n, 2)).astype(np.float32)


def test_distort_matches_cv2_projectPoints():
    import cv2
    from kbslam.geom.camera import distort_points

    uv = _grid_pixels()
    # lift rectified pixels to z=1 rays, project through cv2's model
    rays = np.stack([(uv[:, 0] - DINTR.cx) / DINTR.fx,
                     (uv[:, 1] - DINTR.cy) / DINTR.fy,
                     np.ones(len(uv))], axis=1)
    K = np.array([[DINTR.fx, 0, DINTR.cx], [0, DINTR.fy, DINTR.cy], [0, 0, 1]])
    ref, _ = cv2.projectPoints(rays, np.zeros(3), np.zeros(3), K,
                               np.asarray(DIST))
    ours = np.asarray(distort_points(DINTR, jnp.asarray(uv)))
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-3)


def test_undistort_matches_cv2_undistortPoints():
    import cv2
    from kbslam.geom.camera import distort_points, undistort_points

    uv_rect = _grid_pixels(seed=1)
    uv_dist = np.asarray(distort_points(DINTR, jnp.asarray(uv_rect)))
    K = np.array([[DINTR.fx, 0, DINTR.cx], [0, DINTR.fy, DINTR.cy], [0, 0, 1]])
    ref = cv2.undistortPoints(uv_dist.reshape(-1, 1, 2).astype(np.float64),
                              K, np.asarray(DIST), P=K).reshape(-1, 2)
    ours = np.asarray(undistort_points(DINTR, jnp.asarray(uv_dist)))
    np.testing.assert_allclose(ours, ref, atol=2e-2)
    # round trip recovers the rectified pixels
    np.testing.assert_allclose(ours, uv_rect, atol=2e-2)


def test_zero_coeffs_is_identity_and_statically_gated():
    from kbslam.geom.camera import undistort_points

    assert not INTR.has_distortion and DINTR.has_distortion
    uv = jnp.asarray(_grid_pixels(seed=2))
    np.testing.assert_allclose(np.asarray(undistort_points(INTR, uv)),
                               np.asarray(uv), atol=1e-4)


def test_pnp_with_distortion_matches_cv2_solvePnPRansac():
    """Distorted observations: undistort-then-PnP (our path) recovers the
    same pose as cv2.solvePnPRansac fed raw points + DistCoeffs."""
    import cv2
    import jax
    from kbslam.config import DEFAULT_CONFIG
    from kbslam.geom.camera import distort_points, undistort_points, project
    from kbslam.geom.se3 import SE3
    from kbslam.pnp.ransac import ransac_pnp

    rng = np.random.default_rng(3)
    pts3d = rng.uniform(low=[-1.5, -1.0, 1.0], high=[1.5, 1.0, 4.0],
                        size=(120, 3)).astype(np.float32)
    # ground-truth camera: small rotation + translation
    rvec_gt = np.array([0.03, -0.05, 0.02])
    tvec_gt = np.array([0.1, -0.05, 0.15])
    R_gt, _ = cv2.Rodrigues(rvec_gt)
    pts_cam = pts3d @ R_gt.T + tvec_gt
    uv_rect, _ = project(DINTR, jnp.asarray(pts_cam, jnp.float32))
    uv_dist = np.asarray(distort_points(DINTR, uv_rect))

    K = np.array([[DINTR.fx, 0, DINTR.cx], [0, DINTR.fy, DINTR.cy], [0, 0, 1]])
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        pts3d.astype(np.float64), uv_dist.astype(np.float64).reshape(-1, 1, 2),
        K, np.asarray(DIST), flags=cv2.SOLVEPNP_ITERATIVE,
        reprojectionError=8.0, iterationsCount=100)
    assert ok

    uv_ours = undistort_points(DINTR, jnp.asarray(uv_dist, jnp.float32))
    valid = jnp.ones(len(pts3d), bool)
    sol = ransac_pnp(jax.random.PRNGKey(0), jnp.asarray(pts3d), uv_ours,
                     valid, DINTR, DEFAULT_CONFIG.pnp)
    assert bool(sol.success)
    R_ours = np.asarray(sol.T_cw.matrix())[:3, :3]
    t_ours = np.asarray(sol.T_cw.t)
    R_cv, _ = cv2.Rodrigues(rvec)
    # both must match ground truth (and hence each other)
    assert np.linalg.norm(t_ours - tvec_gt) < 5e-3
    assert np.linalg.norm(R_ours - R_gt) < 1e-3
    assert np.linalg.norm(t_ours - tvec.ravel()) < 5e-3
    assert np.linalg.norm(R_ours - R_cv) < 1e-3
