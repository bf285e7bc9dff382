"""Pure-JAX SE(3)/SO(3) Lie group ops (quaternion representation).

TPU-native replacement for the Sophus usage in the reference
(VisualOdometry.cpp:85-88,108-115; Optimizers.cpp:81,128,252;
Map.cpp:119-126). Tangent-vector convention matches Sophus:
``xi = [upsilon(3), omega(3)]`` — translation part first — so
``SE3.exp(log(T)) == T`` round-trips against Sophus semantics.

All ops broadcast over leading batch dimensions and are jit/vmap safe
(small-angle branches use Taylor expansions selected with jnp.where).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class SE3(NamedTuple):
    """Rigid transform as unit quaternion (wxyz) + translation.

    ``q``: [..., 4] (w, x, y, z), ``t``: [..., 3].
    Acts on points as ``x' = R(q) x + t``.
    """

    q: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        q = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), batch_shape + (4,)
        )
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return SE3(q, t)

    # -- group ops ---------------------------------------------------------
    def compose(self, other: "SE3") -> "SE3":
        """self * other (apply ``other`` first, then ``self``)."""
        return SE3(
            quat_mul(self.q, other.q),
            quat_rotate(self.q, other.t) + self.t,
        )

    def __matmul__(self, other: "SE3") -> "SE3":
        return self.compose(other)

    def inverse(self) -> "SE3":
        q_inv = quat_conj(self.q)
        return SE3(q_inv, -quat_rotate(q_inv, self.t))

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform points [..., 3]."""
        return quat_rotate(self.q, points) + self.t

    # -- conversions -------------------------------------------------------
    def rotation_matrix(self) -> jnp.ndarray:
        return quat_to_matrix(self.q)

    def matrix(self) -> jnp.ndarray:
        """[..., 4, 4] homogeneous matrix."""
        R = quat_to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
            top.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def from_matrix(M: jnp.ndarray) -> "SE3":
        return SE3(matrix_to_quat(M[..., :3, :3]), M[..., :3, 3])

    @staticmethod
    def from_rotation_translation(R: jnp.ndarray, t: jnp.ndarray) -> "SE3":
        return SE3(matrix_to_quat(R), t)

    def normalize(self) -> "SE3":
        q = self.q / jnp.linalg.norm(self.q, axis=-1, keepdims=True)
        # Canonicalize sign (w >= 0) so storage is unique.
        sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
        return SE3(q * sign, self.t)

    # -- exp/log -----------------------------------------------------------
    @staticmethod
    def exp(xi: jnp.ndarray) -> "SE3":
        """Exponential map from tangent [..., 6] = [upsilon, omega]."""
        upsilon = xi[..., :3]
        omega = xi[..., 3:]
        theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
        theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))

        q = quat_exp(omega)
        # V matrix: V = I + (1-cos th)/th^2 [w]x + (th - sin th)/th^3 [w]x^2
        small = theta2 < _EPS
        A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
        B = jnp.where(
            small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
        )
        wx = cross_matrix(omega)
        V = (
            jnp.eye(3, dtype=xi.dtype)
            + A[..., None] * wx
            + B[..., None] * (wx @ wx)
        )
        t = jnp.einsum("...ij,...j->...i", V, upsilon)
        return SE3(q, t)

    def log(self) -> jnp.ndarray:
        """Logarithm map to tangent [..., 6] = [upsilon, omega]."""
        omega = quat_log(self.q)
        theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
        theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
        half = 0.5 * theta
        small = theta2 < _EPS
        # V^{-1} = I - 1/2 [w]x + C [w]x^2,  C = (1 - th/2 * cot(th/2)) / th^2
        C = jnp.where(
            small,
            1.0 / 12.0 + theta2 / 720.0,
            (1.0 - half * jnp.cos(half) / jnp.sin(half)) / theta2,
        )
        wx = cross_matrix(omega)
        V_inv = (
            jnp.eye(3, dtype=self.t.dtype)
            - 0.5 * wx
            + C[..., None] * (wx @ wx)
        )
        upsilon = jnp.einsum("...ij,...j->...i", V_inv, self.t)
        return jnp.concatenate([upsilon, omega], axis=-1)

    # -- metrics (keyframe policy, Map culling) ----------------------------
    def translation_norm(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.t, axis=-1)

    def rotation_angle(self) -> jnp.ndarray:
        """|log(R)| in radians (VisualOdometry.cpp:115)."""
        return jnp.linalg.norm(quat_log(self.q), axis=-1)


# --------------------------------------------------------------------------
# quaternion helpers (wxyz convention)
# --------------------------------------------------------------------------
def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    qv = q[..., 1:]
    qw = q[..., :1]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> unit quaternion."""
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < _EPS
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    s = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([w, s * omega], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> so(3) rotation vector."""
    # Force w >= 0 to stay in the principal branch.
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q = q * sign
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn2 = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn2, _EPS * _EPS))
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn2 < _EPS
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / vn)
    return scale * q[..., 1:]


def cross_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion (wxyz), branch-free.

    Uses the standard four-candidate construction and picks the
    numerically best (largest denominator) with jnp.where, so it is safe
    under vmap/jit for any input rotation.
    """
    m = R
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    def _cand_w():
        r = jnp.sqrt(jnp.maximum(1.0 + t, _EPS))
        s = 0.5 / r
        return jnp.stack(
            [0.5 * r,
             (m[..., 2, 1] - m[..., 1, 2]) * s,
             (m[..., 0, 2] - m[..., 2, 0]) * s,
             (m[..., 1, 0] - m[..., 0, 1]) * s],
            axis=-1,
        )

    def _cand_x():
        r = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS))
        s = 0.5 / r
        return jnp.stack(
            [(m[..., 2, 1] - m[..., 1, 2]) * s,
             0.5 * r,
             (m[..., 0, 1] + m[..., 1, 0]) * s,
             (m[..., 0, 2] + m[..., 2, 0]) * s],
            axis=-1,
        )

    def _cand_y():
        r = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS))
        s = 0.5 / r
        return jnp.stack(
            [(m[..., 0, 2] - m[..., 2, 0]) * s,
             (m[..., 0, 1] + m[..., 1, 0]) * s,
             0.5 * r,
             (m[..., 1, 2] + m[..., 2, 1]) * s],
            axis=-1,
        )

    def _cand_z():
        r = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS))
        s = 0.5 / r
        return jnp.stack(
            [(m[..., 1, 0] - m[..., 0, 1]) * s,
             (m[..., 0, 2] + m[..., 2, 0]) * s,
             (m[..., 1, 2] + m[..., 2, 1]) * s,
             0.5 * r],
            axis=-1,
        )

    scores = jnp.stack([t, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([_cand_w(), _cand_x(), _cand_y(), _cand_z()], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q * sign
