"""Frame-to-model dense tracking — direct TSDF alignment on TPU.

Capability extension (the reference tracks frame-to-KEYFRAME only:
ORB -> BFMatcher -> solvePnPRansac, VisualOdometry.cpp:35-97 — when
feature matching starves, tracking is simply lost until PnP succeeds
again, SURVEY §5.3). This aligns the current depth image directly
against the fused TSDF volume (mapping/dense.py), giving the SLAM
shell a geometry-only pose source that needs NO texture: the
KinectFusion-style frame-to-model idea, but formulated as a direct
SDF objective (à la Bylow et al. / voxblox trackers) instead of
raycast + projective point-to-plane ICP.

Why direct SDF instead of raycast ICP on TPU:

  - raycasting is gather-bound: S samples x R rays of serial-ish
    gathers per *iteration-independent* render (mapping/raycast.py
    pays ~n_steps x rays gathers once); the direct objective needs
    only 8 gathers per point per Gauss-Newton iteration (the
    trilinear corner fetch), and the TRILINEAR GRADIENT IS ANALYTIC
    FROM THE SAME 8 CORNERS — zero extra memory traffic for the
    Jacobian;
  - every stage is a fixed-shape batched op: one [P,8] gather, VPU
    elementwise for the interpolation weights, ONE [6,P]x[P,6]
    HIGHEST-precision matmul for the 6x6 normal equations
    (CLAUDE.md gotcha #4: normal equations need real f32), one tiny
    host-free 6x6 solve — no data-dependent control flow; the GN
    loop is a fixed-trip fori_loop.

Objective: r_i = tau * T_tsdf(T p_i) — the trilinear TSDF value (in
metres) at the transformed sample point IS the signed distance to the
nearest surface inside the truncation band. Minimize sum_i w_i r_i^2
over a left-multiplied se(3) perturbation (J_i = [g_i, X_i x g_i],
g = metric TSDF gradient), Huber-weighted, masked to points whose full
trilinear neighborhood is observed and whose TSDF is strictly inside
the clamp band (clamped cells have zero gradient and only bias the
cost).

The SLAM shell (slam.py) uses this as:
  - mode "rescue": when PnP fails, re-acquire the pose from geometry
    alone (chained from the last emitted pose);
  - mode "refine": polish every successful PnP pose against the map,
    accepted only when the SDF RMSE strictly improves.
Acceptance gates are host-side on the returned stats; an empty or
never-observed volume yields num_valid == 0 and is rejected.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kbslam.config import DenseIcpConfig, DenseMapConfig
from kbslam.geom.camera import Intrinsics, undistort_points
from kbslam.geom.se3 import SE3, quat_rotate, quat_to_matrix
from kbslam.mapping.dense import TSDFState


class IcpResult(NamedTuple):
    q: jnp.ndarray          # [4] refined camera-to-world rotation (wxyz)
    t: jnp.ndarray          # [3] refined translation
    num_valid: jnp.ndarray  # i32 — points alive in the FINAL evaluation
    rmse_init: jnp.ndarray  # f32 metres — robust-weighted SDF RMSE before
    rmse: jnp.ndarray       # f32 metres — and after the solve


_SENTINEL = 4.0  # packed "unobserved" marker; real TSDF is in [-1, 1]


def pack_volume(state: TSDFState) -> jnp.ndarray:
    """Fold observedness into the value array: unobserved voxels read
    the out-of-band sentinel. Halves the gather traffic of the solve
    (the corner fetch is its cost center — one [P,8] gather instead of
    two): any corner >= 2 marks the whole trilinear neighborhood
    invalid, and invalid points are masked out of the normal equations
    anyway, so the corrupted interpolant is never consumed."""
    return jnp.where(state.weight > 0, state.tsdf, _SENTINEL).reshape(-1)


def _trilinear_sdf(packed_flat, cfg: DenseMapConfig, X):
    """Trilinear TSDF at world points X [P,3] from a pack_volume array.

    Returns (phi [P] tsdf-units, grad [P,3] tsdf-units/metre, valid [P]).
    The gradient is the analytic derivative of the trilinear interpolant
    — computed from the SAME 8 corner values, no extra gathers. valid
    requires the whole 2x2x2 neighborhood inside the grid and observed:
    the interpolant (and its gradient) is meaningless across unobserved
    cells.
    """
    nx, ny, nz = cfg.dims
    h = cfg.voxel_size
    g = (X - jnp.asarray(cfg.origin, jnp.float32)) / h - 0.5
    i0 = jnp.floor(g).astype(jnp.int32)                       # [P,3]
    f = g - i0                                                # [P,3] in [0,1)
    valid = ((i0 >= 0) & (i0 <= jnp.array([nx - 2, ny - 2, nz - 2]))
             ).all(axis=-1)
    i0c = jnp.clip(i0, 0, jnp.array([nx - 2, ny - 2, nz - 2]))

    base = (i0c[:, 0] * ny + i0c[:, 1]) * nz + i0c[:, 2]      # [P]
    # corner offset order: bit 2 -> +x, bit 1 -> +y, bit 0 -> +z
    off = jnp.array([(dx * ny + dy) * nz + dz
                     for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                    jnp.int32)                                # [8]
    idx = base[:, None] + off[None, :]                        # [P,8]
    c = packed_flat[idx]                                      # ONE gather
    valid = valid & (c < 2.0).all(axis=1)

    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    wx = jnp.stack([1 - fx, fx], 1)                           # [P,2]
    wy = jnp.stack([1 - fy, fy], 1)
    wz = jnp.stack([1 - fz, fz], 1)
    # weights per corner, same bit order as off
    w = (wx[:, [0, 0, 0, 0, 1, 1, 1, 1]]
         * wy[:, [0, 0, 1, 1, 0, 0, 1, 1]]
         * wz[:, [0, 1, 0, 1, 0, 1, 0, 1]])                   # [P,8]
    phi = (c * w).sum(axis=1)

    # analytic gradient: difference the corner pairs along each axis,
    # weighted by the other two axes' factors (all VPU elementwise)
    dwx = wy[:, [0, 0, 1, 1]] * wz[:, [0, 1, 0, 1]]           # [P,4]
    dwy = wx[:, [0, 0, 1, 1]] * wz[:, [0, 1, 0, 1]]
    dwz = wx[:, [0, 0, 1, 1]] * wy[:, [0, 1, 0, 1]]
    gx = ((c[:, 4:8] - c[:, 0:4]) * dwx).sum(axis=1)
    gy = ((c[:, [2, 3, 6, 7]] - c[:, [0, 1, 4, 5]]) * dwy).sum(axis=1)
    gz = ((c[:, [1, 3, 5, 7]] - c[:, [0, 2, 4, 6]]) * dwz).sum(axis=1)
    grad = jnp.stack([gx, gy, gz], axis=1) / h                # per metre
    return phi, grad, valid


def _frame_points(depth_m, intr: Intrinsics, cfg: DenseMapConfig,
                  stride: int):
    """Strided back-projection of the depth image to camera-frame points
    [P,3] + validity [P] (static shapes; invalid depth keeps a masked
    row). Depth pixels live in DISTORTED space — rays are undistorted
    before unprojection when the model is active (same convention as
    the tracking path, pipeline.py)."""
    H, W = depth_m.shape
    d = depth_m[::stride, ::stride]
    u = jax.lax.broadcasted_iota(jnp.float32, d.shape, 1) * stride
    v = jax.lax.broadcasted_iota(jnp.float32, d.shape, 0) * stride
    uv = jnp.stack([u, v], axis=-1).reshape(-1, 2)
    d = jnp.nan_to_num(d, nan=0.0).reshape(-1)
    ok = (d > cfg.min_depth) & (d < cfg.max_depth)
    if intr.has_distortion:
        uv = undistort_points(intr, uv)
    p = jnp.stack([(uv[:, 0] - intr.cx) / intr.fx * d,
                   (uv[:, 1] - intr.cy) / intr.fy * d, d], axis=1)
    return p, ok


def _residuals(sdf_fn, cfg, icp, p_cam, p_ok, q, t):
    """One trilinear fetch at a pose -> masked residuals + weights.
    ``sdf_fn(X_world) -> (phi, grad_world, valid)`` abstracts the model
    (monolithic volume or submap atlas). Returns (X [P,3], r [P]
    metres, g [P,3], valid [P], wv [P], n i32, rmse f32)."""
    X = quat_rotate(q, p_cam) + t                             # [P,3]
    phi, grad, valid = sdf_fn(X)
    # clamped cells (|tsdf| ~ 1) have zero gradient — drop them so
    # they cannot bias the Huber scale estimate either
    valid = valid & p_ok & (jnp.abs(phi) < 0.999)
    r = phi * cfg.truncation                                  # metres
    g = grad * cfg.truncation                                 # unitless
    w = jnp.minimum(1.0, icp.huber_m / jnp.maximum(jnp.abs(r), 1e-12))
    wv = jnp.where(valid, w, 0.0)
    n = valid.sum().astype(jnp.int32)
    rmse = jnp.sqrt((wv * r * r).sum() / jnp.maximum(wv.sum(), 1e-12))
    return X, r, g, valid, wv, n, rmse


def _gn_align(sdf_fn, p_cam, p_ok, q0, t0, cfg: DenseMapConfig,
              icp: DenseIcpConfig) -> IcpResult:
    """Gauss-Newton alignment of back-projected points to an SDF model,
    starting from camera-to-world (q0, t0). Fixed icp.iters trips; each
    trip is one trilinear fetch + one 6x6 damped normal-equation solve.
    The initial stats fall out of trip 0's residuals (no extra fetch);
    one post-loop fetch evaluates the final pose — iters+1 fetches
    total, and the [P,8] corner gather is the measured cost center.
    Shared by the monolithic-volume and submap-atlas solvers.
    """

    def body(k, carry):
        q, t, n0, rmse0 = carry
        X, r, g, valid, wv, n, rmse = _residuals(
            sdf_fn, cfg, icp, p_cam, p_ok, q, t)
        first = k == 0
        n0 = jnp.where(first, n, n0)
        rmse0 = jnp.where(first, rmse, rmse0)
        wv = wv[:, None]
        J = jnp.concatenate([g, jnp.cross(X, g)], axis=1)     # [P,6]
        Jw = J * wv
        H = Jw.T @ J                                          # [6,6]
        b = -(Jw * r[:, None]).sum(axis=0)                    # [6]
        # Levenberg diagonal damping keeps the step sane when the
        # visible geometry under-constrains a direction (e.g. a single
        # plane: 3 null dofs — damping freezes them at the prior pose)
        Hd = H + (icp.damping * jnp.trace(H) / 6.0 + 1e-9) * jnp.eye(6)
        xi = jnp.linalg.solve(Hd, b)
        # guard: no valid points -> H singular -> NaN step; hold pose
        xi = jnp.where(jnp.isfinite(xi).all() & (n > 0), xi, 0.0)
        T = SE3.exp(xi) @ SE3(q, t)
        Tn = T.normalize()
        return (Tn.q, Tn.t, n0, rmse0)

    q, t, n0, rmse0 = jax.lax.fori_loop(
        0, icp.iters, body, (q0, t0, jnp.int32(0), jnp.float32(0.0)))
    _, _, _, _, _, n1, rmse1 = _residuals(
        sdf_fn, cfg, icp, p_cam, p_ok, q, t)
    return IcpResult(q=q, t=t, num_valid=jnp.minimum(n0, n1),
                     rmse_init=rmse0, rmse=rmse1)


def align_depth_to_tsdf(state: TSDFState, depth_m, q0, t0,
                        intr: Intrinsics, cfg: DenseMapConfig,
                        icp: DenseIcpConfig) -> IcpResult:
    """GN alignment of one metric depth image to the monolithic volume
    (see _gn_align)."""
    packed_flat = pack_volume(state)
    p_cam, p_ok = _frame_points(depth_m, intr, cfg, icp.stride)
    sdf_fn = functools.partial(_trilinear_sdf, packed_flat, cfg)
    return _gn_align(sdf_fn, p_cam, p_ok, q0, t0, cfg, icp)


def align_depth_to_atlas(atlas, slots, anchor_q, anchor_t, depth_m,
                         q0, t0, intr: Intrinsics, cfg: DenseMapConfig,
                         icp: DenseIcpConfig) -> IcpResult:
    """GN alignment of one metric depth image to K submaps of a
    SubmapAtlas (mapping/submap.py), each re-posed by its anchor
    keyframe's CURRENT ring pose — the composition the monolithic
    solver cannot offer: recovery keeps working in exactly the drifty
    regime submaps exist for, because the model geometry follows
    BA/loop corrections through the anchors.

      slots     [K] i32 — atlas ring slots, NEWEST FIRST (duplicates
                are harmless: per-point selection takes the first
                valid slot, and duplicates carry identical values —
                the host pads short windows by repeating a slot);
      anchor_q  [K,4], anchor_t [K,3] — each slot's anchor pose NOW
                (current ring pose; frozen creation pose fallback).

    Per GN trip: one [P,8] corner gather PER SLOT (points transformed
    into each slot's local anchor frame), then a per-point newest-
    valid-wins select — overlapping submaps are slightly inconsistent
    rigid bodies (the documented seam price), so summing their normal
    equations would average disagreeing gradients; selection keeps
    each point's residual internally consistent. Local gradients map
    to world through the anchor rotation (X_l = Rᵀ(X_w − t) ⇒
    ∇_w = R ∇_l). Cost scales linearly in K (the corner gather is the
    measured cost center of the monolithic solve)."""
    shp = (1,) + atlas.tsdf.shape[1:]

    def pack_slot(s):
        tv = jax.lax.dynamic_slice(atlas.tsdf, (s, 0, 0, 0), shp)[0]
        wv = jax.lax.dynamic_slice(atlas.weight, (s, 0, 0, 0), shp)[0]
        return jnp.where(wv > 0, tv, _SENTINEL).reshape(-1)

    packed = jax.vmap(pack_slot)(slots)                       # [K, V]
    R = jax.vmap(quat_to_matrix)(anchor_q)                    # [K,3,3]
    p_cam, p_ok = _frame_points(depth_m, intr, cfg, icp.stride)

    def sdf_fn(X):                                            # [P,3] world
        def per_slot(pk, Rk, tk):
            Xl = (X - tk) @ Rk                                # Rᵀ(X−t) rows
            phi, g, valid = _trilinear_sdf(pk, cfg, Xl)
            return phi, g @ Rk.T, valid                       # ∇ to world
        phis, gws, valids = jax.vmap(per_slot)(packed, R, anchor_t)
        # house rule (CLAUDE.md gotcha #6): don't fuse the gather
        # producers into the argmax selection
        valids = jax.lax.optimization_barrier(valids)
        idx = jnp.argmax(valids, axis=0)                      # first valid
        sel = (jax.lax.broadcasted_iota(jnp.int32, valids.shape, 0)
               == idx[None]) & valids
        phi = jnp.where(sel, phis, 0.0).sum(axis=0)
        gw = jnp.where(sel[:, :, None], gws, 0.0).sum(axis=0)
        return phi, gw, valids.any(axis=0)

    return _gn_align(sdf_fn, p_cam, p_ok, q0, t0, cfg, icp)


@functools.lru_cache(maxsize=8)
def make_icp(cfg: DenseMapConfig, icp: DenseIcpConfig, intr: Intrinsics,
             depth_scale: float = 1.0):
    """lru_cached jit factory (per-instance jit wrappers retrace — the
    round-3 async-BA lesson). Call as f(state, depth_raw, q, t);
    ``depth_scale`` converts raw input to metres in-graph (1.0 if
    already metric, MapConfig.depth_scale for u16 sensor depth)."""

    def run(state, depth_raw, q, t):
        # normal equations and the 6x6 solve need real f32 (CLAUDE.md
        # gotcha #4: TPU matmuls default to bf16 passes)
        with jax.default_matmul_precision("highest"):
            return align_depth_to_tsdf(
                state, depth_raw.astype(jnp.float32) * depth_scale,
                q, t, intr, cfg, icp)

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def make_icp_atlas(cfg: DenseMapConfig, icp: DenseIcpConfig,
                   intr: Intrinsics, depth_scale: float = 1.0):
    """lru_cached jit factory for the submap-atlas solver. Call as
    f(atlas, slots [K] i32, anchor_q [K,4], anchor_t [K,3], depth_raw,
    q, t) — slots newest first, each anchor pose its CURRENT ring pose
    (kbslam.mapping.submap.recent_slots_with_poses builds the triple).
    K is static per compilation (one trace per window size)."""

    def run(atlas, slots, aq, at, depth_raw, q, t):
        with jax.default_matmul_precision("highest"):
            return align_depth_to_atlas(
                atlas, slots, aq, at,
                depth_raw.astype(jnp.float32) * depth_scale,
                q, t, intr, cfg, icp)

    return jax.jit(run)
