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
