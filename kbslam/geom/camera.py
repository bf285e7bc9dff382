"""Pinhole camera model: projection / depth unprojection.

Replaces the scattered intrinsics math in the reference
(VisualOdometry.cpp:52-54 unprojection, Optimizers.cpp:140-141
projection, Map.cpp:29-44 depth-to-world). Intrinsics are carried as a
flat [4] array (fx, fy, cx, cy); distortion is assumed rectified (the
reference passes its 5-vector straight to OpenCV but TUM-style inputs
are pre-rectified; a distortion model can be layered on later).
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

    @staticmethod
    def from_matrix(K) -> "Intrinsics":
        import numpy as _np

        K = _np.asarray(K)
        return Intrinsics(float(K[0, 0]), float(K[1, 1]),
                          float(K[0, 2]), float(K[1, 2]))

    @staticmethod
    def create(fx, fy, cx, cy) -> "Intrinsics":
        return Intrinsics(float(fx), float(fy), float(cx), float(cy))

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
