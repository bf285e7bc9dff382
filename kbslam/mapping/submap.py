"""Submap TSDF atlas — a dense world model that FOLLOWS pose-graph and
BA corrections.

Capability extension beyond mapping/dense.py's monolithic volume, which
is deliberately NOT re-warped by loop closure (a single TSDF cannot be
rigidly carried — see dense.py's limitations note; the reference has no
dense model at all, MapPoint.hpp). The standard fix is submapping
(Whelan et al. / Cartographer-style): split the volume into rigid
chunks, each ANCHORED to a keyframe, fuse locally, and re-pose chunks —
not voxels — when the trajectory is corrected.

TPU formulation:

  - The atlas is ONE fixed-shape array pair ``[S, nx, ny, nz]`` — a
    ring of S submaps, jit-stable, no allocation at runtime. Starting a
    submap zeroes a slot (masked where-op); fusing writes one slot
    (dynamic slice in / update out — the slice traffic is ~1 MB at the
    default dims, trivial at the keyframe cadence).
  - Each submap's local frame IS its anchor keyframe's camera frame at
    creation time. Fusion converts the frame pose to the local frame
    (``T_local = T_anchor_creation⁻¹ · T_frame``) and reuses
    dense.integrate unchanged — the local box (cfg.origin/dims) sits in
    front of the anchor camera exactly like the monolithic box sits in
    front of the SLAM start pose.
  - Corrections need NO explicit propagation: extraction re-reads each
    anchor keyframe's CURRENT pose from the map ring (by global kf_id,
    falling back to the frozen creation pose if the ring slot was
    reallocated), so local-BA writeback, global BA, and loop-closure
    pose-graph corrections all flow to the dense model for free —
    world points = T_anchor_now · X_local.

Local consistency comes from VO/BA within the submap's short keyframe
window; global consistency comes from the anchor poses. The price is
seams: overlapping submaps extract overlapping (slightly inconsistent)
point sets instead of a single averaged field.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kbslam.config import DenseMapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from kbslam.mapping.dense import TSDFState, integrate, surface_points


class SubmapAtlas(NamedTuple):
    tsdf: jnp.ndarray          # [S, nx, ny, nz] f32
    weight: jnp.ndarray        # [S, nx, ny, nz] f32
    anchor_q: jnp.ndarray      # [S, 4] creation-time anchor pose (wxyz)
    anchor_t: jnp.ndarray      # [S, 3]
    anchor_kf_id: jnp.ndarray  # [S] i32 global keyframe id (-1 = empty)
    count: jnp.ndarray         # [] i32 monotone submap counter

    @property
    def capacity(self) -> int:
        return self.tsdf.shape[0]

    def active_slot(self) -> jnp.ndarray:
        """Ring slot of the newest submap (undefined if count == 0)."""
        return (self.count - 1) % self.capacity


def empty_atlas(cfg: DenseMapConfig, num_submaps: int) -> SubmapAtlas:
    nx, ny, nz = cfg.dims
    s = num_submaps
    return SubmapAtlas(
        tsdf=jnp.ones((s, nx, ny, nz), jnp.float32),
        weight=jnp.zeros((s, nx, ny, nz), jnp.float32),
        anchor_q=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (s, 1)),
        anchor_t=jnp.zeros((s, 3), jnp.float32),
        anchor_kf_id=jnp.full((s,), -1, jnp.int32),
        count=jnp.int32(0))


def start_submap(atlas: SubmapAtlas, q, t, kf_id) -> SubmapAtlas:
    """Open a new submap anchored at camera-to-world (q, t) = the just-
    inserted keyframe's pose; ring-overwrites the oldest slot when
    full (the fixed-capacity convention used everywhere in kbslam)."""
    slot = atlas.count % atlas.capacity
    nx, ny, nz = atlas.tsdf.shape[1:]
    sel = jax.lax.broadcasted_iota(
        jnp.int32, (atlas.capacity, 1, 1, 1), 0) == slot
    return SubmapAtlas(
        tsdf=jnp.where(sel, jnp.float32(1.0), atlas.tsdf),
        weight=jnp.where(sel, jnp.float32(0.0), atlas.weight),
        anchor_q=atlas.anchor_q.at[slot].set(q),
        anchor_t=atlas.anchor_t.at[slot].set(t),
        anchor_kf_id=atlas.anchor_kf_id.at[slot].set(
            jnp.asarray(kf_id, jnp.int32)),
        count=atlas.count + 1)


def integrate_active(atlas: SubmapAtlas, depth_m, q, t,
                     intr: Intrinsics, cfg: DenseMapConfig,
                     anchor_q=None, anchor_t=None) -> SubmapAtlas:
    """Fuse one metric depth image taken at WORLD pose (q, t) into the
    active submap, in that submap's local (anchor-camera) frame.

    ``anchor_q/anchor_t``: the anchor keyframe's CURRENT ring pose.
    Frame poses live in the current (BA/loop-corrected) gauge, so the
    local conversion must use the anchor's pose in the SAME gauge —
    using the frozen creation pose when a correction fired between
    creation and this fusion bakes the correction delta INTO the chunk,
    and extraction (which re-poses by the current anchor pose) then
    applies it twice. Measured on the drifting 3-lap spheres scene
    (benchmarks/exp_submap_loop.py): the frozen-anchor fusion made
    corrected extraction WORSE than frozen extraction by 5-9 mm median.
    The pose used is also stored back as the slot's anchor, keeping the
    frozen-extraction fallback consistent with the newest content.
    Defaults to the stored anchor when omitted."""
    slot = atlas.active_slot()
    if anchor_q is None:
        anchor_q = atlas.anchor_q[slot]
        anchor_t = atlas.anchor_t[slot]
    shp = (1,) + atlas.tsdf.shape[1:]
    sub = TSDFState(
        tsdf=jax.lax.dynamic_slice(atlas.tsdf, (slot, 0, 0, 0),
                                   shp)[0],
        weight=jax.lax.dynamic_slice(atlas.weight, (slot, 0, 0, 0),
                                     shp)[0])
    anchor = SE3(jnp.asarray(anchor_q), jnp.asarray(anchor_t))
    local = anchor.inverse() @ SE3(q, t)
    sub = integrate(sub, depth_m, local, intr, cfg)
    return atlas._replace(
        tsdf=jax.lax.dynamic_update_slice(atlas.tsdf, sub.tsdf[None],
                                          (slot, 0, 0, 0)),
        weight=jax.lax.dynamic_update_slice(atlas.weight,
                                            sub.weight[None],
                                            (slot, 0, 0, 0)),
        anchor_q=atlas.anchor_q.at[slot].set(anchor.q),
        anchor_t=atlas.anchor_t.at[slot].set(anchor.t))


@functools.lru_cache(maxsize=8)
def make_submap_ops(cfg: DenseMapConfig, intr: Intrinsics,
                    num_submaps: int, depth_scale: float = 1.0):
    """lru_cached jit factories (per-instance jit wrappers retrace —
    the round-3 async-BA lesson). Returns (start, fuse):
    start(atlas, q, t, kf_id);
    fuse(atlas, depth_raw, q, t, anchor_q, anchor_t) — the caller
    passes the anchor's CURRENT ring pose (see integrate_active)."""

    def start(atlas, q, t, kf_id):
        return start_submap(atlas, q, t, kf_id)

    def fuse(atlas, depth_raw, q, t, anchor_q, anchor_t):
        # house rule: explicit HIGHEST wrap on geometric jit entry
        # points (CLAUDE.md gotcha #4)
        with jax.default_matmul_precision("highest"):
            return integrate_active(
                atlas, depth_raw.astype(jnp.float32) * depth_scale,
                q, t, intr, cfg, anchor_q, anchor_t)

    return jax.jit(start), jax.jit(fuse)


def live_slots(atlas: SubmapAtlas) -> np.ndarray:
    """Host-side: ring slots currently holding a live submap, oldest
    first."""
    c = int(atlas.count)
    s = atlas.capacity
    n = min(c, s)
    return np.array([(c - n + k) % s for k in range(n)], np.int32)


def anchor_poses_now(atlas: SubmapAtlas, map_state) -> dict:
    """kf_id -> CURRENT 4x4 ring pose for every live submap anchor
    (BA/loop-corrected); anchors whose map-ring slot was since
    reallocated are omitted (extraction falls back to the frozen
    creation pose). Host-side, extraction-time only (syncs the map
    ring to the host). Shared by the per-frame SLAM shell and the
    chunked streaming executor."""
    from kbslam.slam import pose_T

    ring_ids = np.asarray(map_state.kf_id)
    cap = ring_ids.shape[0]
    qs, ts = np.asarray(map_state.kf_q), np.asarray(map_state.kf_t)
    ids = np.asarray(atlas.anchor_kf_id)
    poses = {}
    for slot in live_slots(atlas):
        kid = int(ids[slot])
        if kid >= 0 and ring_ids[kid % cap] == kid:
            poses[kid] = pose_T(qs[kid % cap], ts[kid % cap])
    return poses


def recent_slots_with_poses(atlas: SubmapAtlas, map_state, k: int,
                            exclude_active: bool = False):
    """Host-side: the newest (up to) ``k`` live submap slots, NEWEST
    FIRST, each with its anchor keyframe's CURRENT ring pose (frozen
    creation pose when the ring slot was since reallocated — the same
    fallback as extraction). Pads short windows by repeating the last
    entry (duplicates are harmless to align_depth_to_atlas's first-
    valid-wins selection). Returns (slots [k] i32, anchor_q [k,4] f32,
    anchor_t [k,3] f32) as numpy, or None when no slot qualifies
    (empty atlas, or exclude_active with a single live submap).

    ``exclude_active`` drops the newest (actively fused) submap — the
    independent-evidence window for ICP "refine": older submaps'
    geometry was fused under poses not correlated with the most recent
    drift, and their anchors have felt BA/loop corrections."""
    slots = live_slots(atlas)[::-1]          # newest first
    if exclude_active and len(slots):
        slots = slots[1:]
    if not len(slots):
        return None
    slots = slots[:k]
    ring_ids = np.asarray(map_state.kf_id)
    cap = ring_ids.shape[0]
    qs, ts = np.asarray(map_state.kf_q), np.asarray(map_state.kf_t)
    ids = np.asarray(atlas.anchor_kf_id)
    aq = np.asarray(atlas.anchor_q).copy()
    at = np.asarray(atlas.anchor_t).copy()
    out_q, out_t = [], []
    for s in slots:
        kid = int(ids[s])
        if kid >= 0 and ring_ids[kid % cap] == kid:
            out_q.append(qs[kid % cap])
            out_t.append(ts[kid % cap])
        else:
            out_q.append(aq[s])
            out_t.append(at[s])
    while len(out_q) < k:                    # pad by repetition
        slots = np.append(slots, slots[-1])
        out_q.append(out_q[-1])
        out_t.append(out_t[-1])
    return (np.asarray(slots[:k], np.int32),
            np.stack(out_q).astype(np.float32),
            np.stack(out_t).astype(np.float32))


def atlas_mesh(atlas: SubmapAtlas, cfg: DenseMapConfig,
               anchor_poses: Optional[dict] = None):
    """Union TriangleMesh of the atlas (host-side; not hot): per-submap
    marching-tetrahedra meshes re-posed by their anchors' CURRENT poses
    (``anchor_poses``: kf_id -> 4x4; frozen creation pose when absent)
    and concatenated — welded within each submap, not across seams
    (overlapping chunks are distinct rigid bodies by design)."""
    from kbslam.mapping.mesh import TriangleMesh, marching_tetrahedra
    from kbslam.slam import pose_T

    anchor_poses = anchor_poses or {}
    tsdf = np.asarray(atlas.tsdf)
    weight = np.asarray(atlas.weight)
    ids = np.asarray(atlas.anchor_kf_id)
    aq = np.asarray(atlas.anchor_q)
    at = np.asarray(atlas.anchor_t)
    verts, faces, off = [], [], 0
    for slot in live_slots(atlas):
        m = marching_tetrahedra(
            TSDFState(tsdf=jnp.asarray(tsdf[slot]),
                      weight=jnp.asarray(weight[slot])), cfg)
        if m.vertices.shape[0] == 0:
            continue
        T = anchor_poses.get(int(ids[slot]))
        if T is None:
            T = pose_T(aq[slot], at[slot])
        verts.append(m.vertices @ np.asarray(T[:3, :3], np.float32).T
                     + np.asarray(T[:3, 3], np.float32))
        faces.append(m.faces + off)
        off += m.vertices.shape[0]
    if not verts:
        return TriangleMesh(np.zeros((0, 3), np.float32),
                            np.zeros((0, 3), np.int32))
    return TriangleMesh(np.concatenate(verts).astype(np.float32),
                        np.concatenate(faces).astype(np.int32))


def extract_atlas_surface(
        atlas: SubmapAtlas, cfg: DenseMapConfig,
        anchor_poses: Optional[dict] = None,
        min_weight: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the union surface cloud (host-side; not hot).

    ``anchor_poses`` maps global kf_id -> CURRENT 4x4 camera-to-world
    pose of that anchor keyframe (from the map ring — BA/loop-corrected);
    submaps whose anchor is absent from the dict use their frozen
    creation pose. Returns (points [M,3] world, |tsdf| residual [M])."""
    anchor_poses = anchor_poses or {}
    tsdf = np.asarray(atlas.tsdf)
    weight = np.asarray(atlas.weight)
    aq = np.asarray(atlas.anchor_q)
    at = np.asarray(atlas.anchor_t)
    ids = np.asarray(atlas.anchor_kf_id)
    pts_all, res_all = [], []
    for slot in live_slots(atlas):
        st = TSDFState(tsdf=tsdf[slot], weight=weight[slot])
        pts, res = surface_points(st, cfg, min_weight=min_weight)
        if pts.shape[0] == 0:
            continue
        T = anchor_poses.get(int(ids[slot]))
        if T is None:
            T = np.asarray(SE3(jnp.asarray(aq[slot]),
                               jnp.asarray(at[slot])).matrix())
        pts_all.append(pts @ np.asarray(T[:3, :3], np.float32).T
                       + np.asarray(T[:3, 3], np.float32))
        res_all.append(res)
    if not pts_all:
        return np.zeros((0, 3), np.float32), np.zeros((0,), np.float32)
    return (np.concatenate(pts_all).astype(np.float32),
            np.concatenate(res_all).astype(np.float32))
