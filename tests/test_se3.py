"""SE(3)/SO(3) parity tests vs scipy.spatial.transform (the Sophus oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from kbslam.geom.se3 import SE3, quat_rotate, quat_to_matrix, matrix_to_quat


def random_se3(rng, n=16):
    rotvec = rng.normal(size=(n, 3)) * 1.5
    R = Rotation.from_rotvec(rotvec)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    q = R.as_quat(scalar_first=True).astype(np.float32)
    return SE3(jnp.asarray(q), jnp.asarray(t)), R, t


def test_quat_rotate_matches_scipy():
    rng = np.random.default_rng(0)
    T, R, _ = random_se3(rng)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    got = np.asarray(quat_rotate(T.q, jnp.asarray(v)))
    want = R.apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matrix_round_trip():
    rng = np.random.default_rng(1)
    T, R, _ = random_se3(rng)
    M = np.asarray(quat_to_matrix(T.q))
    np.testing.assert_allclose(M, R.as_matrix(), atol=1e-5)
    q_back = np.asarray(matrix_to_quat(jnp.asarray(R.as_matrix().astype(np.float32))))
    # quaternions are canonicalized w>=0
    want = R.as_quat(scalar_first=True)
    want = want * np.where(want[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q_back, want, atol=1e-4)


def test_exp_log_round_trip():
    rng = np.random.default_rng(2)
    xi = rng.normal(size=(32, 6)).astype(np.float32)
    xi[:, 3:] *= 0.8
    T = SE3.exp(jnp.asarray(xi))
    xi_back = np.asarray(T.log())
    # float32: the V/V^-1 products lose a few mantissa bits at large angles
    np.testing.assert_allclose(xi_back, xi, atol=5e-3, rtol=1e-2)


def test_exp_log_small_angle():
    xi = jnp.array([[1e-6, -2e-6, 3e-6, 1e-7, -1e-7, 2e-7],
                    [0.0] * 6], dtype=jnp.float32)
    T = SE3.exp(xi)
    np.testing.assert_allclose(np.asarray(T.log()), np.asarray(xi), atol=1e-6)


def test_compose_inverse_apply():
    rng = np.random.default_rng(3)
    A, Ra, ta = random_se3(rng)
    B, Rb, tb = random_se3(rng)
    p = rng.normal(size=(16, 3)).astype(np.float32)

    # compose parity: (A*B) x == A (B x)
    got = np.asarray(A.compose(B).apply(jnp.asarray(p)))
    want = Ra.apply(Rb.apply(p) + tb) + ta
    np.testing.assert_allclose(got, want, atol=1e-4)

    # inverse: A * A^-1 == I
    I = A.compose(A.inverse())
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(I.q)[:, 0]), 1.0, atol=1e-5)


def test_log_matches_sophus_convention():
    """Tangent ordering must be [upsilon, omega] (translation first),
    matching Sophus::SE3d::log used at Optimizers.cpp:81."""
    # pure translation: log == [t, 0]
    T = SE3(jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(
        np.asarray(T.log()), [1.0, 2.0, 3.0, 0, 0, 0], atol=1e-6
    )


def test_rotation_angle():
    axis = np.array([0.0, 0.0, 1.0])
    ang = 0.3
    R = Rotation.from_rotvec(axis * ang)
    T = SE3(jnp.asarray(R.as_quat(scalar_first=True), dtype=jnp.float32),
            jnp.zeros(3))
    assert abs(float(T.rotation_angle()) - ang) < 1e-5


def test_jit_and_vmap():
    xi = jnp.ones((8, 6)) * 0.1
    f = jax.jit(lambda x: SE3.exp(x).log())
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-5)
    g = jax.vmap(lambda x: SE3.exp(x).inverse().t)
    assert g(xi).shape == (8, 3)
