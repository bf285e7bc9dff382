"""Dense TSDF volume — voxel-centric projective integration on TPU.

A deliberate capability EXTENSION: the reference's world model is
sparse landmarks only (Map.cpp / MapPoint.hpp — positions observed by
keyframes), so a reference user has no surface reconstruction, free
space, or collision geometry. This adds the KinectFusion-style
truncated signed distance volume, formulated the TPU way:

  - The volume is a fixed [Nx, Ny, Nz] f32 pair (tsdf, weight): static
    shapes, jit-stable, no sparse voxel-block bookkeeping (a hash map of
    active blocks is the GPU idiom; on TPU the dense grid IS the fast
    path — regular memory, fused elementwise updates).
  - Integration is voxel-centric: transform EVERY voxel center into the
    keyframe camera (one batched quaternion rotation on the VPU),
    project with dense arithmetic, and read the depth image at the projected pixel
    with ONE nearest-neighbor gather per voxel — the gather is the cost
    center (~45 ns/element serially, CLAUDE.md gotcha #7), so the
    default grid keeps V ≈ 295k and bilinear sampling (4 gathers) is
    deliberately NOT used: the truncation band swallows the sub-pixel
    difference.
  - The update is the standard running weighted average
    (Curless–Levoy), all where-ops — XLA fuses the whole post-gather
    pipeline into the gather consumer.

Integration runs per KEYFRAME insertion (the reference's world-model
update cadence, VisualOdometry.cpp:155-165), not per frame: at the
default policy rate (≥10 frames/KF) the measured 3.8 ms/KF fusion
(TPU v5e, 295k voxels) amortizes to ~0.4 ms/frame, and keyframe depth
is exactly what the sparse map already trusts.

Surface extraction (host-side, not hot): voxels in the iso band with
positive weight, refined along the TSDF gradient to the zero crossing.

Limitations (documented, standard): the volume is NOT re-warped by
loop-closure pose-graph corrections (a TSDF cannot be rigidly carried
per-keyframe the way landmarks are — loop/closure.py); for
loop-corrected trajectories, re-integrate offline from the corrected
poses (``integrate_sequence``).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kbslam.config import DenseMapConfig
from kbslam.geom.camera import Intrinsics, distort_points
from kbslam.geom.se3 import SE3


class TSDFState(NamedTuple):
    tsdf: jnp.ndarray     # [Nx, Ny, Nz] f32 in [-1, 1] (units of truncation)
    weight: jnp.ndarray   # [Nx, Ny, Nz] f32 accumulated observation weight


def empty_tsdf(cfg: DenseMapConfig) -> TSDFState:
    nx, ny, nz = cfg.dims
    return TSDFState(tsdf=jnp.ones((nx, ny, nz), jnp.float32),
                     weight=jnp.zeros((nx, ny, nz), jnp.float32))


def _voxel_centers(cfg: DenseMapConfig) -> jnp.ndarray:
    """[V, 3] world positions of voxel centers (traced iota — never a
    module-level constant, CLAUDE.md gotcha #5)."""
    nx, ny, nz = cfg.dims
    ix = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 2)
    grid = jnp.stack([ix, iy, iz], axis=-1).reshape(-1, 3)
    origin = jnp.asarray(cfg.origin, jnp.float32)
    return origin + (grid + 0.5) * cfg.voxel_size


def integrate(state: TSDFState, depth_m: jnp.ndarray, pose: SE3,
              intr: Intrinsics, cfg: DenseMapConfig) -> TSDFState:
    """Fuse one metric depth image taken at camera-to-world ``pose``.

    Projective TSDF: for each voxel center X, sdf = depth(π(X_cam)) −
    z(X_cam), clamped to ±truncation and averaged into the volume where
    observed (in front of, or within the band behind, the surface)."""
    H, W = depth_m.shape
    nx, ny, nz = cfg.dims

    X = _voxel_centers(cfg)                                  # [V, 3]
    Xc = pose.inverse().apply(X)                             # [V, 3]
    z = Xc[:, 2]
    u = intr.fx * Xc[:, 0] / jnp.where(z > 0, z, 1.0) + intr.cx
    v = intr.fy * Xc[:, 1] / jnp.where(z > 0, z, 1.0) + intr.cy
    in_domain = jnp.bool_(True)
    if intr.has_distortion:
        # depth images live in DISTORTED pixel space (the tracking path
        # samples depth at raw coords and undistorts keypoints after,
        # pipeline.py) — the voxel's pinhole projection must be pushed
        # through the forward model before the gather, or edge pixels
        # read depth from the wrong surface. The Brown-Conrady
        # polynomial is only valid near the calibrated FOV: at large
        # normalized radius the radial terms FOLD far-outside points
        # back into the image, gathering garbage depth — gate the model
        # to 1.5x the image-corner radius (measured: ungated, a
        # distorted plane fused 25k junk surface points at 85 mm median
        # vs 3.8k at sub-mm gated).
        xn = (u - intr.cx) / intr.fx
        yn = (v - intr.cy) / intr.fy
        r2_corner = ((W / 2.0) / intr.fx) ** 2 + ((H / 2.0) / intr.fy) ** 2
        in_domain = (xn * xn + yn * yn) <= 2.25 * r2_corner
        uv = distort_points(intr, jnp.stack([u, v], axis=-1))
        u, v = uv[..., 0], uv[..., 1]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inside = (z > cfg.min_depth) & in_domain & (ui >= 0) & (ui < W) \
        & (vi >= 0) & (vi < H)

    flat = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
    d = depth_m.reshape(-1)[flat]                            # ONE gather
    # real sensors export NaN invalids: sanitize BEFORE arithmetic, or
    # NaN*0 slips through the where and poisons accumulated voxels
    d = jnp.nan_to_num(d, nan=0.0)
    depth_ok = (d > cfg.min_depth) & (d < cfg.max_depth)

    sdf = d - z
    # observed = in front of the surface or within the band behind it
    observed = inside & depth_ok & (sdf > -cfg.truncation)
    tsdf_new = jnp.clip(sdf / cfg.truncation, -1.0, 1.0)
    w_new = observed.astype(jnp.float32)

    t_old = state.tsdf.reshape(-1)
    w_old = state.weight.reshape(-1)
    w_sum = w_old + w_new
    t = jnp.where(w_sum > 0, (t_old * w_old + tsdf_new * w_new)
                  / jnp.maximum(w_sum, 1.0), t_old)
    w = jnp.minimum(w_sum, cfg.max_weight)
    return TSDFState(tsdf=t.reshape(nx, ny, nz),
                     weight=w.reshape(nx, ny, nz))


@functools.lru_cache(maxsize=8)
def make_integrate(cfg: DenseMapConfig, intr: Intrinsics,
                   depth_scale: float = 1.0):
    """lru_cached jit (per-instance jit wrappers retrace — the round-3
    async-BA lesson). Call as f(state, depth_raw, pose_q, pose_t);
    ``depth_scale`` converts the raw image to metres in-graph (1.0 for
    already-metric input, MapConfig.depth_scale for u16 sensor depth)."""

    def fuse(s, d, q, t):
        # house rule for new geometric jit entry points (CLAUDE.md):
        # explicit HIGHEST wrap. Benign today — the camera transform is
        # a quat rotation on the VPU, not a matmul — but it pins the
        # behavior if apply() ever becomes the matmul form.
        with jax.default_matmul_precision("highest"):
            return integrate(s, d.astype(jnp.float32) * depth_scale,
                             SE3(q, t), intr, cfg)

    return jax.jit(fuse)


def shard_tsdf(state: TSDFState, mesh, axis: str = "vox") -> TSDFState:
    """Lay the volume out with its leading (x) voxel axis sharded over
    ``mesh``'s ``axis`` — each device owns an [nx/D, ny, nz] slab in its
    own HBM, lifting the volume-size ceiling from one chip's memory to
    the pod slice's."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    nx = state.tsdf.shape[0]
    d = mesh.shape[axis]
    if nx % d != 0:
        raise ValueError(f"dims[0]={nx} not divisible by the {d}-device "
                         f"mesh axis {axis!r}")
    sh = NamedSharding(mesh, P(axis))
    return TSDFState(tsdf=jax.device_put(state.tsdf, sh),
                     weight=jax.device_put(state.weight, sh))


@functools.lru_cache(maxsize=8)
def make_sharded_integrate(cfg: DenseMapConfig, intr: Intrinsics, mesh,
                           axis: str = "vox", depth_scale: float = 1.0):
    """Multi-chip fusion: the SAME integrate() program jitted with the
    volume's x-axis sharded over the mesh and the depth image/pose
    replicated. Projective TSDF has no cross-voxel dependency — every
    voxel transforms, projects, and gathers from its device's REPLICATED
    depth copy independently — so the SPMD partition is collective-free
    (the one gather indexes a replicated operand) and bit-identical to
    the single-device program: ICI carries nothing during fusion. The
    scale lever is volume size: a 512^3 f32 pair is ~1 GB, past a
    single v5e chip's comfortable budget but an easy 8-way slab split.
    Call as f(state, depth_raw, pose_q, pose_t) like make_integrate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if cfg.dims[0] % mesh.shape[axis] != 0:
        raise ValueError(f"dims[0]={cfg.dims[0]} not divisible by the "
                         f"{mesh.shape[axis]}-device mesh axis {axis!r}")
    vol = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def fuse(s, d, q, t):
        with jax.default_matmul_precision("highest"):
            return integrate(s, d.astype(jnp.float32) * depth_scale,
                             SE3(q, t), intr, cfg)

    return jax.jit(fuse,
                   in_shardings=(TSDFState(tsdf=vol, weight=vol),
                                 rep, rep, rep),
                   out_shardings=TSDFState(tsdf=vol, weight=vol))


@functools.lru_cache(maxsize=8)
def _make_integrate_scan(cfg: DenseMapConfig, intr: Intrinsics):
    def run(s, depths, qs, ts):
        def body(s, xs):
            d, q, t = xs
            return integrate(s, d, SE3(q, t), intr, cfg), None
        return jax.lax.scan(body, s, (depths, qs, ts))[0]

    return jax.jit(run)


def integrate_sequence(depths_m, poses, intr: Intrinsics,
                       cfg: DenseMapConfig,
                       state: TSDFState | None = None) -> TSDFState:
    """Offline helper: fuse a whole sequence in one lax.scan dispatch —
    [T,H,W] METRIC depth plus poses as either [T,4,4] matrices or one
    batched SE3 (q [T,4], t [T,3]). Use after loop closure / global BA
    with the corrected poses (the online volume is deliberately not
    re-warped by pose-graph corrections)."""
    if state is None:
        state = empty_tsdf(cfg)
    if isinstance(poses, SE3):
        qs, ts = np.asarray(poses.q, np.float32), np.asarray(poses.t,
                                                             np.float32)
    else:
        poses = np.asarray(poses, np.float32)
        if poses.ndim != 3 or poses.shape[1:] != (4, 4):
            raise ValueError("poses must be [T,4,4] matrices or a "
                             "batched SE3")
        qs = np.stack([_rot_to_quat(p[:3, :3]) for p in poses])
        ts = poses[:, :3, 3]

    run = _make_integrate_scan(cfg, intr)
    return run(state, jnp.asarray(depths_m), jnp.asarray(qs),
               jnp.asarray(ts))


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """[3,3] -> wxyz (host-side, eval/offline only)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def surface_points(state: TSDFState, cfg: DenseMapConfig,
                   min_weight: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the zero-crossing point cloud (host-side; not hot).

    Voxels with |tsdf| < iso_band and enough weight are surface
    candidates; each is refined along the central-difference TSDF
    gradient to the zero crossing: X_s = X − tsdf·τ·∇t/|∇t|.
    Returns (points [M,3] world, per-point |tsdf| residual [M])."""
    t = np.asarray(state.tsdf)
    w = np.asarray(state.weight)
    band = (np.abs(t) < cfg.iso_band) & (w >= min_weight)
    # gradient only valid where the neighborhood is observed
    w_ok = w >= min_weight
    interior = np.zeros_like(band)
    interior[1:-1, 1:-1, 1:-1] = (
        band[1:-1, 1:-1, 1:-1]
        & w_ok[2:, 1:-1, 1:-1] & w_ok[:-2, 1:-1, 1:-1]
        & w_ok[1:-1, 2:, 1:-1] & w_ok[1:-1, :-2, 1:-1]
        & w_ok[1:-1, 1:-1, 2:] & w_ok[1:-1, 1:-1, :-2])
    idx = np.argwhere(interior)
    if idx.size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0,), np.float32)
    ix, iy, iz = idx[:, 0], idx[:, 1], idx[:, 2]
    g = np.stack([
        t[ix + 1, iy, iz] - t[ix - 1, iy, iz],
        t[ix, iy + 1, iz] - t[ix, iy - 1, iz],
        t[ix, iy, iz + 1] - t[ix, iy, iz - 1],
    ], axis=1) / (2.0 * cfg.voxel_size)          # d tsdf / d metre
    gn = np.linalg.norm(g, axis=1, keepdims=True)
    g = g / np.maximum(gn, 1e-9)
    X = np.asarray(cfg.origin, np.float32) \
        + (idx.astype(np.float32) + 0.5) * cfg.voxel_size
    tv = t[ix, iy, iz]
    pts = X - (tv * cfg.truncation)[:, None] * g
    return pts.astype(np.float32), np.abs(tv).astype(np.float32)
