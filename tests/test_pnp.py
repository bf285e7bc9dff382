"""Batched PnP-RANSAC accuracy tests on synthetic correspondences."""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from kbslam.config import PnPConfig
from kbslam.geom.camera import Intrinsics, project
from kbslam.geom.se3 import SE3
from kbslam.pnp.dlt import solve_dlt, normalized_rays
from kbslam.pnp.ransac import ransac_pnp

INTR = Intrinsics.create(525.0, 525.0, 319.5, 239.5)


def make_scene(rng, n=200, outlier_frac=0.0, noise_px=0.0, rotvec=(0.1, -0.2, 0.05),
               t=(0.3, -0.1, 0.2)):
    pts = rng.uniform(low=[-2, -2, 1.0], high=[2, 2, 6.0], size=(n, 3)).astype(np.float32)
    R = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    t = np.asarray(t, np.float32)
    pc = pts @ R.T + t
    uv = np.stack([
        525.0 * pc[:, 0] / pc[:, 2] + 319.5,
        525.0 * pc[:, 1] / pc[:, 2] + 239.5,
    ], axis=-1)
    uv += rng.normal(scale=noise_px, size=uv.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] = rng.uniform(low=[0, 0], high=[640, 480], size=(n_out, 2))
    return pts, uv.astype(np.float32), R, t


def test_dlt_initializer_on_clean_points():
    """float32 DLT on a 6-point minimal set: coarse but in the basin."""
    rng = np.random.default_rng(0)
    pts, uv, R, t = make_scene(rng, n=6)
    rays = normalized_rays(INTR, jnp.asarray(uv))
    R_est, t_est = solve_dlt(jnp.asarray(pts)[None], rays[None])
    assert np.abs(np.asarray(R_est[0]) - R).max() < 0.1
    assert np.linalg.norm(np.asarray(t_est[0]) - t) < 0.3


def test_dlt_plus_gn_exact_on_clean_points():
    """DLT init + minimal-set Gauss-Newton recovers the exact pose."""
    from kbslam.geom.se3 import SE3, matrix_to_quat
    from kbslam.pnp.refine import refine_pose

    rng = np.random.default_rng(0)
    pts, uv, R, t = make_scene(rng, n=6)
    rays = normalized_rays(INTR, jnp.asarray(uv))
    R0, t0 = solve_dlt(jnp.asarray(pts)[None], rays[None])
    T0 = SE3(matrix_to_quat(R0[0]), t0[0]).normalize()
    T = refine_pose(T0, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(6), INTR, iters=8)
    np.testing.assert_allclose(np.asarray(T.rotation_matrix()), R, atol=2e-4)
    np.testing.assert_allclose(np.asarray(T.t), t, atol=1e-3)


def test_ransac_recovers_pose_with_outliers():
    rng = np.random.default_rng(1)
    pts, uv, R, t = make_scene(rng, n=300, outlier_frac=0.4, noise_px=0.5)
    cfg = PnPConfig()
    res = jax.jit(
        lambda k, p, u, v: ransac_pnp(k, p, u, v, INTR, cfg)
    )(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uv),
      jnp.ones(300, bool))

    assert bool(res.success)
    R_est = np.asarray(res.T_cw.rotation_matrix())
    t_est = np.asarray(res.T_cw.t)
    assert np.abs(R_est - R).max() < 5e-3
    assert np.linalg.norm(t_est - t) < 2e-2
    # ~60% of points are inliers
    assert 0.45 < float(res.inlier_ratio) < 0.75


def test_ransac_deterministic_with_fixed_key():
    rng = np.random.default_rng(2)
    pts, uv, _, _ = make_scene(rng, n=100, outlier_frac=0.3)
    args = (jax.random.PRNGKey(7), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(100, bool))
    cfg = PnPConfig()
    r1 = ransac_pnp(*args, INTR, cfg)
    r2 = ransac_pnp(*args, INTR, cfg)
    np.testing.assert_array_equal(np.asarray(r1.T_cw.t), np.asarray(r2.T_cw.t))


def test_ransac_fails_gracefully_on_garbage():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    uv = rng.uniform(low=0, high=640, size=(50, 2)).astype(np.float32)
    cfg = PnPConfig()
    res = ransac_pnp(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uv),
                     jnp.ones(50, bool), INTR, cfg)
    # must not produce NaNs even when it fails
    assert np.all(np.isfinite(np.asarray(res.T_cw.q)))
    assert np.all(np.isfinite(np.asarray(res.T_cw.t)))


def test_ransac_respects_valid_mask():
    rng = np.random.default_rng(4)
    pts, uv, R, t = make_scene(rng, n=100, noise_px=0.3)
    # corrupt half the points but mark them invalid
    uv2 = uv.copy()
    uv2[50:] = rng.uniform(low=0, high=640, size=(50, 2))
    valid = np.zeros(100, bool)
    valid[:50] = True
    cfg = PnPConfig()
    res = ransac_pnp(jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(uv2),
                     jnp.asarray(valid), INTR, cfg)
    assert bool(res.success)
    assert np.abs(np.asarray(res.T_cw.rotation_matrix()) - R).max() < 1e-2
    # invalid entries can never be inliers
    assert not np.asarray(res.inliers)[50:].any()


def test_parity_with_cv2_solvepnpransac():
    """Same data through cv2.solvePnPRansac: recovered poses agree."""
    rng = np.random.default_rng(5)
    pts, uv, R, t = make_scene(rng, n=200, outlier_frac=0.3, noise_px=0.5)
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        pts.astype(np.float64), uv.astype(np.float64),
        np.asarray(INTR.matrix(), np.float64), None,
        iterationsCount=100, reprojectionError=8.0, confidence=0.99)
    assert ok
    cfg = PnPConfig()
    res = ransac_pnp(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uv),
                     jnp.ones(200, bool), INTR, cfg)
    R_cv = cv2.Rodrigues(rvec)[0]
    np.testing.assert_allclose(np.asarray(res.T_cw.rotation_matrix()), R_cv, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.T_cw.t), tvec[:, 0], atol=5e-2)
