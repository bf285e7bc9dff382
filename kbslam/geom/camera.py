"""Pinhole camera model: projection / depth unprojection / distortion.

Replaces the scattered intrinsics math in the reference
(VisualOdometry.cpp:52-54 unprojection, Optimizers.cpp:140-141
projection, Map.cpp:29-44 depth-to-world). Intrinsics carry fx/fy/cx/cy
plus the reference's 5-vector Brown-Conrady distortion (k1, k2, p1, p2,
k3) that Camera.cpp:108-124 hands to cv::solvePnPRansac
(VisualOdometry.cpp:72). Instead of projecting through the distortion
model inside PnP/BA like OpenCV does, keypoints are undistorted ONCE
after extraction (iterative inverse model, the cv::undistortPoints
algorithm) so all downstream geometry runs on rectified coordinates.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics as HOST floats.

    Deliberately not device arrays: intrinsics are captured in jit
    closures, and concrete device scalars captured as constants
    permanently degrade the dispatch path on tunneled TPU platforms
    (see kbslam/matching/hamming.py). Python floats embed as literals.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    # Brown-Conrady (k1, k2, p1, p2, k3) — the reference's 5-vector
    # (Camera.cpp:108-124). All zero = rectified input (TUM default).
    dist: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)

    @property
    def has_distortion(self) -> bool:
        return any(c != 0.0 for c in self.dist)

    @staticmethod
    def from_matrix(K, dist=None) -> "Intrinsics":
        import numpy as _np

        K = _np.asarray(K)
        if dist is not None:
            dv = _np.asarray(dist).ravel()
            if len(dv) > 5 and _np.any(dv[5:]):
                # e.g. OpenCV's 8-coefficient rational model: silently
                # dropping k4..k6 would yield wrong geometry
                raise ValueError(
                    f"unsupported distortion model: got {len(dv)} "
                    "coefficients with nonzero tail; only the 5-vector "
                    "Brown-Conrady (k1,k2,p1,p2,k3) of the reference "
                    "(Camera.cpp:108-124) is supported")
            d = tuple(float(c) for c in dv[:5])
        else:
            d = (0.0,) * 5
        d = d + (0.0,) * (5 - len(d))
        return Intrinsics(float(K[0, 0]), float(K[1, 1]),
                          float(K[0, 2]), float(K[1, 2]), d)

    @staticmethod
    def create(fx, fy, cx, cy, dist=(0.0,) * 5) -> "Intrinsics":
        return Intrinsics(float(fx), float(fy), float(cx), float(cy),
                          tuple(float(c) for c in dist))

    def matrix(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def project(intr: Intrinsics, points_cam: jnp.ndarray, eps: float = 1e-9):
    """Camera-frame points [..., 3] -> pixel coords [..., 2], plus depth.

    Matches the reference projection u = fx*(x/z)+cx, v = fy*(y/z)+cy
    (Optimizers.cpp:140-141). Returns (uv, z); caller masks on z > 0.
    """
    z = points_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < eps, eps, z)
    u = intr.fx * points_cam[..., 0] * inv_z + intr.cx
    v = intr.fy * points_cam[..., 1] * inv_z + intr.cy
    return jnp.stack([u, v], axis=-1), z


def unproject(intr: Intrinsics, uv: jnp.ndarray, depth_m: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] + metric depth [...] -> camera-frame points [..., 3].

    Matches VisualOdometry.cpp:52-54 / Map.cpp:39-42:
    x = (u - cx) * z / fx, y = (v - cy) * z / fy.
    """
    x = (uv[..., 0] - intr.cx) * depth_m / intr.fx
    y = (uv[..., 1] - intr.cy) * depth_m / intr.fy
    return jnp.stack([x, y, depth_m], axis=-1)


def distort_points(intr: Intrinsics, uv: jnp.ndarray) -> jnp.ndarray:
    """Rectified pixels [..., 2] -> distorted pixels (forward model).

    The Brown-Conrady forward map OpenCV applies inside projectPoints
    when given the reference's DistCoeffs (VisualOdometry.cpp:72).
    Used by tests/synthetic rendering; the tracking path only ever
    inverts it (undistort_points).
    """
    k1, k2, p1, p2, k3 = intr.dist
    x = (uv[..., 0] - intr.cx) / intr.fx
    y = (uv[..., 1] - intr.cy) / intr.fy
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([intr.fx * xd + intr.cx, intr.fy * yd + intr.cy],
                     axis=-1)


def undistort_points(intr: Intrinsics, uv: jnp.ndarray,
                     iters: int = 8) -> jnp.ndarray:
    """Distorted pixels [..., 2] -> rectified pixels.

    Fixed-point iteration x <- (x_d - tangential(x)) / radial(x), the
    cv::undistortPoints algorithm; 8 iterations converge below 1e-3 px
    for typical RGB-D lenses. Pure elementwise VPU work, unrolled at
    trace time (no data-dependent control flow). Identity when the
    coefficient vector is zero — callers gate on intr.has_distortion to
    skip even that.
    """
    k1, k2, p1, p2, k3 = intr.dist
    xd = (uv[..., 0] - intr.cx) / intr.fx
    yd = (uv[..., 1] - intr.cy) / intr.fy
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv = 1.0 / radial
        x = (xd - dx) * inv
        y = (yd - dy) * inv
    return jnp.stack([intr.fx * x + intr.cx, intr.fy * y + intr.cy],
                     axis=-1)


def depth_at(depth_u16: jnp.ndarray, uv: jnp.ndarray, depth_scale: float) -> jnp.ndarray:
    """Sample a uint16 depth image at rounded pixel coords -> metres.

    Matches the reference's nearest-pixel lookup
    ``depth.at<uint16_t>(cvRound(y), cvRound(x)) * 0.001``
    (VisualOdometry.cpp:52, Map.cpp:31-33). Out-of-bounds coords clamp
    (callers must mask separately if that matters).
    """
    h, w = depth_u16.shape[-2:]
    u = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, w - 1)
    v = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, h - 1)
    d = depth_u16[..., v, u] if depth_u16.ndim == 2 else jnp.take_along_axis(
        depth_u16.reshape(depth_u16.shape[:-2] + (-1,)), v * w + u, axis=-1
    )
    return d.astype(jnp.float32) * depth_scale


# Display-coordinate remap used everywhere in the reference viewer path:
# (x, y, z) -> (x, -z, -y)  (Map.cpp:86,96; VisualOdometry.cpp:181).
def to_display_coords(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([p[..., 0], -p[..., 2], -p[..., 1]], axis=-1)
