"""TSDF raycasting — render depth/normal images from the dense volume.

Capability extension on top of mapping/dense.py (the reference has no
dense world model at all): given the fused TSDF and any camera pose,
produce the depth image the map PREDICTS for that view. Uses:

  - model-based visualization (the KinectFusion-style rendered view);
  - a map-quality metric: rendered vs observed depth at keyframe poses
    (``render_consistency``) quantifies how well the volume explains
    the sensor data — drift shows up as growing disagreement;
  - groundwork for frame-to-model tracking.

TPU formulation. Ray marching is gather-bound (CLAUDE.md gotcha #7:
~45 ns/element serial floor, measured ~13 ns vectorized in dense.py),
so the design minimizes samples per ray instead of chasing fancy
traversal:

  - ONE batched gather of shape [S, H*W] fetches every sample of every
    ray at once (fixed step = 0.75·truncation — the TSDF is clamped to
    ±1 outside the band, so a surface crossing cannot be stepped over:
    the +→− transition is always bracketed);
  - the first +→− transition index per ray comes from one argmax over
    the step axis (no while_loop: every ray runs the same fixed trip
    count, XLA-friendly);
  - the hit is refined by linear interpolation of the bracketing TSDF
    values — sub-step accuracy from 2 values already fetched, no extra
    gather;
  - normals are the central-difference TSDF gradient at the hit voxel
    (6 more gathers, hit pixels only — still batched dense).

Out-of-volume and never-observed samples read +1 (free space), so rays
that miss report depth 0 with a zero normal.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kbslam.config import DenseMapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3, quat_rotate
from kbslam.mapping.dense import TSDFState


class RaycastResult(NamedTuple):
    depth: jnp.ndarray    # [H, W] f32 metres, 0 where the ray missed
    normal: jnp.ndarray   # [H, W, 3] f32 unit world normals, 0 on miss
    hit: jnp.ndarray      # [H, W] bool


def _sample(tsdf_flat, weight_flat, cfg: DenseMapConfig, X):
    """Nearest-neighbor TSDF at world points X [..., 3]; unobserved or
    out-of-volume reads +1 (free space)."""
    nx, ny, nz = cfg.dims
    g = (X - jnp.asarray(cfg.origin, jnp.float32)) / cfg.voxel_size - 0.5
    gi = jnp.round(g).astype(jnp.int32)
    inside = ((gi[..., 0] >= 0) & (gi[..., 0] < nx)
              & (gi[..., 1] >= 0) & (gi[..., 1] < ny)
              & (gi[..., 2] >= 0) & (gi[..., 2] < nz))
    ci = jnp.clip(gi, 0, jnp.array([nx - 1, ny - 1, nz - 1]))
    flat = (ci[..., 0] * ny + ci[..., 1]) * nz + ci[..., 2]
    t = tsdf_flat[flat]
    observed = weight_flat[flat] > 0
    return jnp.where(inside & observed, t, 1.0), inside


def raycast(state: TSDFState, pose: SE3, intr: Intrinsics,
            height: int, width: int, cfg: DenseMapConfig,
            t_min: float = 0.05, t_max: float = 12.0) -> RaycastResult:
    """Render the volume from camera-to-world ``pose`` (pinhole — the
    prediction lives in undistorted pixel space)."""
    tsdf_flat = state.tsdf.reshape(-1)
    weight_flat = state.weight.reshape(-1)

    # pixel rays in camera frame (unit z), rotated to world
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    d_cam = jnp.stack([(u - intr.cx) / intr.fx,
                       (v - intr.cy) / intr.fy,
                       jnp.ones_like(u)], axis=-1).reshape(-1, 3)
    d_world = quat_rotate(pose.q, d_cam)               # [R, 3]
    o = pose.t                                         # [3]

    step = 0.75 * cfg.truncation
    # host math: n_steps must stay a static Python int under trace
    n_steps = int(-(-(t_max - t_min) // step)) + 1
    ts = t_min + step * jnp.arange(n_steps, dtype=jnp.float32)  # [S]

    X = o + ts[:, None, None] * d_world[None]          # [S, R, 3]
    s, _ = _sample(tsdf_flat, weight_flat, cfg, X)     # [S, R]
    # house rule (CLAUDE.md gotcha #6): don't fuse a big gather
    # producer into any/argmax reductions — materialize it first
    s = jax.lax.optimization_barrier(s)

    # first +→− transition along each ray
    cross = (s[:-1] > 0) & (s[1:] <= 0)                # [S-1, R]
    hit = cross.any(axis=0)
    k = jnp.argmax(cross, axis=0)                      # [R]
    rr = jnp.arange(s.shape[1])
    s0 = s[k, rr]
    s1 = s[k + 1, rr]
    frac = s0 / jnp.maximum(s0 - s1, 1e-12)
    t_hit = ts[k] + frac * step                        # [R]

    Xh = o + t_hit[:, None] * d_world                  # [R, 3]

    # central-difference gradient at the hit point → world normal
    h = cfg.voxel_size
    eye = h * jnp.eye(3, dtype=jnp.float32)
    sp, _ = _sample(tsdf_flat, weight_flat, cfg,
                    Xh[None] + eye[:, None])           # [3, R]
    sm, _ = _sample(tsdf_flat, weight_flat, cfg,
                    Xh[None] - eye[:, None])
    g = (sp - sm).T                                    # [R, 3]
    gn = jnp.linalg.norm(g, axis=1, keepdims=True)
    normal = jnp.where(gn > 1e-9, g / jnp.maximum(gn, 1e-9), 0.0)

    # depth = z-component in the camera frame (matches sensor depth
    # images), not the ray parameter
    z = t_hit * d_cam[:, 2]                            # d_cam z ≡ 1
    depth = jnp.where(hit, z, 0.0).reshape(height, width)
    normal = jnp.where(hit[:, None], normal, 0.0).reshape(height, width, 3)
    return RaycastResult(depth=depth, normal=normal,
                         hit=hit.reshape(height, width))


@functools.lru_cache(maxsize=8)
def make_raycast(cfg: DenseMapConfig, intr: Intrinsics,
                 height: int, width: int,
                 t_min: float = 0.05, t_max: float = 12.0):
    """lru_cached jit factory (per-instance jit wrappers retrace — the
    round-3 async-BA lesson). Call as f(state, q, t) with a wxyz quat
    and translation (camera-to-world)."""

    def run(state, q, t):
        with jax.default_matmul_precision("highest"):
            return raycast(state, SE3(q, t), intr, height, width, cfg,
                           t_min=t_min, t_max=t_max)

    return jax.jit(run)


def resolve_render_model(tsdf, atlas, map_state, q, t):
    """Host-side: pick the TSDF volume + model-frame pose for rendering
    camera-to-world (q, t) from whichever dense model is configured.
    Monolithic volume: identity mapping. Submap atlas: the ACTIVE
    submap re-posed by its anchor's CURRENT ring pose — a single-chunk
    approximation (the newest chunk is where the camera looks; a
    multi-submap compositor would need per-submap ray intersection,
    not worth it for a viewer/metric surface). Returns
    (TSDFState, SE3 pose in the model frame, anchor SE3 or None), or
    (None, None, None) when no fused model exists. Shared by the
    per-frame SLAM shell and the chunked streaming executor."""
    T_cam = SE3(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))
    if tsdf is not None:
        return tsdf, T_cam, None
    if atlas is None or int(atlas.count) == 0:
        return None, None, None
    from kbslam.mapping.submap import recent_slots_with_poses

    slots, aq, at = recent_slots_with_poses(atlas, map_state, 1)
    s = int(slots[0])
    vol = TSDFState(tsdf=atlas.tsdf[s], weight=atlas.weight[s])
    anchor = SE3(jnp.asarray(aq[0]), jnp.asarray(at[0]))
    return vol, (anchor.inverse() @ T_cam).normalize(), anchor


def render_consistency(state: TSDFState, pose: SE3, depth_obs,
                       intr: Intrinsics, cfg: DenseMapConfig,
                       t_max: float = 12.0) -> dict:
    """Rendered-vs-observed depth agreement at one pose (map-quality
    metric; host-side convenience, not hot). ``depth_obs`` is [H, W]
    metric depth in the SENSOR's (distorted, when the camera has a
    distortion model) pixel space. Returns median/p90 absolute depth
    error over pixels where both the render hit and the sensor
    returned valid depth, plus the coverage fraction.

    The render lives in undistorted pixel space (raycast docstring);
    with a distorted camera the same pixel index points along different
    rays toward the image edges, so the observation is resampled at the
    forward-distorted coordinates of each rendered pixel (depth == z is
    invariant to the pixel warp — only the lookup position moves),
    matching how dense.integrate reads distorted-space depth."""
    import numpy as np

    H, W = depth_obs.shape
    f = make_raycast(cfg, intr, H, W, t_max=t_max)
    r = f(state, pose.q, pose.t)
    dr = np.asarray(r.depth)
    ob = np.asarray(depth_obs)
    hit = np.asarray(r.hit)
    if intr.has_distortion:
        from kbslam.geom.camera import distort_points

        uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        uvd = np.asarray(distort_points(
            intr, jnp.asarray(np.stack([uu, vv], axis=-1))))
        ui = np.round(uvd[..., 0]).astype(np.int64)
        vi = np.round(uvd[..., 1]).astype(np.int64)
        inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ob = np.where(inb, ob[np.clip(vi, 0, H - 1),
                              np.clip(ui, 0, W - 1)], 0.0)
        hit = hit & inb
    valid = hit & (ob > cfg.min_depth) & (ob < cfg.max_depth)
    if not valid.any():
        return {"median_err_m": float("nan"), "p90_err_m": float("nan"),
                "coverage": 0.0}
    err = np.abs(dr[valid] - ob[valid])
    return {"median_err_m": float(np.median(err)),
            "p90_err_m": float(np.percentile(err, 90)),
            "coverage": float(valid.mean())}
