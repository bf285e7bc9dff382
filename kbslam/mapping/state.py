"""Fixed-capacity, padded, SoA map state — the TPU-native world model.

Replaces the reference's pointer-rich shared state (Map.cpp,
KeyFrame.hpp:33-40, MapPoint.hpp:8-40): keyframes live in a ring of
padded arrays, the per-keypoint ``shared_ptr<MapPoint>`` slots become an
int32 landmark-id table (-1 = empty), and every mutation
(AddKeyframe, CreateMapPoints fusion, pruning) is a masked
scatter/gather on static shapes, so tracking and BA jit-compile once.

Concurrency contract: there is none to manage — ``track_step`` and
``local_ba`` are pure functions on this state; the single global mutex
(Utils.hpp:15) and its documented races disappear by construction.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kbslam.config import MapConfig, OrbConfig
from kbslam.frontend.orb import Features
from kbslam.geom.se3 import SE3
from kbslam.matching.hamming import MatchResult

# Plain Python int, NOT jnp.int32 (module-level device scalars poison the
# dispatch path on tunneled TPU platforms; see matching/hamming.py note).
NO_MP = -1


@jax.jit
def device_copy(tree):
    """Fresh device buffers for a state tree (jitted identity XLA cannot
    alias away: arithmetic no-op per dtype, bools get ``& True``).
    Needed wherever tracking DONATES its buffers but a snapshot must
    survive the next step — async-BA snapshots (slam.py, streaming.py)
    and bench fresh-window capture."""
    return jax.tree.map(lambda x: x + 0 if x.dtype != bool else x & True,
                        tree)


class MapState(NamedTuple):
    # --- keyframe ring (capacity M = max_keyframes) -----------------------
    kf_q: jnp.ndarray        # [M, 4] T_wc rotation (reference sophPose)
    kf_t: jnp.ndarray        # [M, 3]
    kf_kp_xy: jnp.ndarray    # [M, F, 2] keypoint pixel coords (level 0)
    kf_kp_depth: jnp.ndarray # [M, F] metric depth at keypoint (0 = missing)
    kf_desc: jnp.ndarray     # [M, F, 256] uint8 descriptor bits
    kf_kp_valid: jnp.ndarray # [M, F] bool
    kf_mp: jnp.ndarray       # [M, F] int32 MONOTONE landmark id (-1 empty);
    #   storage slot = id % P. A reference is live iff id >= num_mp - P
    #   (older ids had their slot reused by a later allocation) — this
    #   replaces shared_ptr lifetime semantics (MapPoint.hpp:8-40)
    #   without any gather: staleness is a pure comparison.
    kf_id: jnp.ndarray       # [M] int32 global keyframe id (-1 = slot empty)
    num_kf: jnp.ndarray      # [] int32 monotone insertion counter
    # --- landmarks (capacity P = max_map_points) --------------------------
    mp_pos: jnp.ndarray      # [P, 3] world positions
    mp_valid: jnp.ndarray    # [P] bool
    num_mp: jnp.ndarray      # [] int32 monotone allocation counter

    @property
    def capacity_kf(self) -> int:
        return self.kf_q.shape[0]

    @property
    def capacity_mp(self) -> int:
        return self.mp_pos.shape[0]

    def last_slot(self) -> jnp.ndarray:
        """Ring slot of the most recent keyframe (undefined if empty)."""
        m = self.capacity_kf
        return (self.num_kf - 1) % m

    def is_empty(self) -> jnp.ndarray:
        """Map::IsTrackingEmpty (Map.cpp:103-105)."""
        return self.num_kf == 0

    def last_kf_pose(self) -> SE3:
        s = self.last_slot()
        return SE3(self.kf_q[s], self.kf_t[s])

    def mp_ref_live(self, ids: jnp.ndarray) -> jnp.ndarray:
        """True where a kf_mp entry still points at a live landmark:
        non-empty AND its ring slot has not been reallocated since."""
        return (ids >= 0) & (ids >= self.num_mp - self.capacity_mp)

    def mp_ref_slot(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Storage slot of a kf_mp entry (only meaningful where live)."""
        return jnp.clip(ids, 0) % self.capacity_mp


def empty_map(map_cfg: MapConfig, orb_cfg: OrbConfig) -> MapState:
    m, f, p = map_cfg.max_keyframes, orb_cfg.max_features, map_cfg.max_map_points
    return MapState(
        kf_q=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (m, 1)),
        kf_t=jnp.zeros((m, 3), jnp.float32),
        kf_kp_xy=jnp.zeros((m, f, 2), jnp.float32),
        kf_kp_depth=jnp.zeros((m, f), jnp.float32),
        kf_desc=jnp.zeros((m, f, 256), jnp.uint8),
        kf_kp_valid=jnp.zeros((m, f), bool),
        kf_mp=jnp.full((m, f), NO_MP),
        kf_id=jnp.full((m,), -1, jnp.int32),
        num_kf=jnp.int32(0),
        mp_pos=jnp.zeros((p, 3), jnp.float32),
        mp_valid=jnp.zeros((p,), bool),
        num_mp=jnp.int32(0),
    )


def insert_keyframe(
    state: MapState,
    feats: Features,
    depth_at_kp: jnp.ndarray,
    pose: SE3,
    do: Optional[jnp.ndarray] = None,
) -> MapState:
    """Map::AddKeyframe (Map.cpp:7-14): write the new KF into the next ring
    slot. Landmark slots start empty; fusion happens in create_map_points.

    ``do`` (bool scalar) makes the insertion BRANCHLESS: when False, the
    scatter indices go out of bounds (mode="drop") and the counter does
    not advance — bit-identical to not calling this at all. Exists for
    the vmapped multistream path, where wrapping insertion in lax.cond
    degenerates to executing both branches AND select-copying the whole
    map state every frame (~0.85 ms/stream measured,
    benchmarks/exp_multistream2.py)."""
    slot = state.num_kf % state.capacity_kf
    if do is not None:
        slot = jnp.where(do, slot, state.capacity_kf)
        inc = do.astype(state.num_kf.dtype)
    else:
        inc = 1
    return state._replace(
        kf_q=state.kf_q.at[slot].set(pose.q, mode="drop"),
        kf_t=state.kf_t.at[slot].set(pose.t, mode="drop"),
        kf_kp_xy=state.kf_kp_xy.at[slot].set(feats.xy, mode="drop"),
        kf_kp_depth=state.kf_kp_depth.at[slot].set(depth_at_kp, mode="drop"),
        kf_desc=state.kf_desc.at[slot].set(feats.desc, mode="drop"),
        kf_kp_valid=state.kf_kp_valid.at[slot].set(feats.valid, mode="drop"),
        kf_mp=state.kf_mp.at[slot].set(
            jnp.full_like(state.kf_mp[0], NO_MP), mode="drop"),
        kf_id=state.kf_id.at[slot].set(state.num_kf, mode="drop"),
        num_kf=state.num_kf + inc,
    )


def create_map_points(
    state: MapState,
    match: MatchResult,
    intr_fx, intr_fy, intr_cx, intr_cy,
    do: Optional[jnp.ndarray] = None,
    prev_slot: Optional[jnp.ndarray] = None,
) -> MapState:
    """Map::CreateMapPoints (Map.cpp:16-65), as masked scatters.

    For each ratio-test match between the previous keyframe (query q)
    and the just-inserted keyframe (train match.best_idx[q]):
      - prev slot empty  -> allocate a new landmark at the world position
        of the prev KF's depth-unprojected keypoint (Map.cpp:28-55);
      - prev slot filled -> share the landmark id into the current slot
        (Map.cpp:56-59).
    Observation bookkeeping is implicit: observations ARE the kf_mp
    entries pointing at a landmark.
    """
    m = state.capacity_kf
    if prev_slot is None:
        # default: the previous-last keyframe (Map.cpp:24). Callers that
        # matched against an arbitrary keyframe (relocalization) pass
        # that keyframe's slot so fusion binds the right rows.
        prev_slot = (state.num_kf - 2) % m
    curr_slot = (state.num_kf - 1) % m

    q_idx = jnp.arange(state.kf_mp.shape[1])
    matched = match.is_match
    if do is not None:
        # branchless gating (see insert_keyframe): every write below is
        # keyed off ``matched`` or a slot index, so masking the former
        # and dropping the latter makes do=False a provable no-op
        matched = matched & do
        prev_slot = jnp.where(do, prev_slot, m)
        curr_slot = jnp.where(do, curr_slot, m)
    t_idx = match.best_idx

    prev_mp = state.kf_mp[prev_slot]                 # [F]
    # a stale reference (slot reused after ring wrap) counts as empty,
    # so the match allocates a fresh landmark instead of re-binding to
    # whatever now occupies the slot
    prev_live = state.mp_ref_live(prev_mp)
    needs_new = matched & jnp.logical_not(prev_live)

    # allocate contiguous MONOTONE ids; storage wraps at id % P
    offset = jnp.cumsum(needs_new.astype(jnp.int32)) - 1
    new_id = state.num_mp + offset
    n_new = jnp.sum(needs_new.astype(jnp.int32))

    # world position from prev KF depth unprojection (Map.cpp:29-44)
    xy = state.kf_kp_xy[prev_slot]
    z = state.kf_kp_depth[prev_slot]
    x = (xy[:, 0] - intr_cx) * z / intr_fx
    y = (xy[:, 1] - intr_cy) * z / intr_fy
    p_cam = jnp.stack([x, y, z], axis=-1)
    prev_pose = SE3(state.kf_q[prev_slot], state.kf_t[prev_slot])
    p_world = prev_pose.apply(p_cam)                 # [F, 3]

    # masked scatters: non-participating lanes get an out-of-bounds index
    # and are dropped, so they can never clobber a real write.
    drop_new = jnp.where(needs_new, new_id % state.capacity_mp,
                         state.capacity_mp)
    mp_pos = state.mp_pos.at[drop_new].set(p_world, mode="drop")
    mp_valid = state.mp_valid.at[drop_new].set(True, mode="drop")

    # prev KF slots gain the new ids; current KF slots gain new-or-shared
    # ids; unmatched stale entries are scrubbed to empty
    prev_mp_new = jnp.where(needs_new, new_id,
                            jnp.where(prev_live, prev_mp, NO_MP))
    share_id = prev_mp_new
    drop_t = jnp.where(matched, t_idx, state.kf_mp.shape[1])
    curr_mp = state.kf_mp[curr_slot]
    curr_mp_new = curr_mp.at[drop_t].set(share_id, mode="drop")

    kf_mp = (state.kf_mp.at[prev_slot].set(prev_mp_new, mode="drop")
             .at[curr_slot].set(curr_mp_new, mode="drop"))
    return state._replace(
        kf_mp=kf_mp,
        mp_pos=mp_pos,
        mp_valid=mp_valid,
        num_mp=state.num_mp + n_new,
    )


def window_slots(state: MapState, window: int) -> jnp.ndarray:
    """Ring slots of the last ``window`` keyframes, oldest first, padded
    with the oldest available when fewer exist (Map::GetNKeyFrames,
    Map.cpp:72-78). Also returns via mask which entries are real."""
    n = state.num_kf
    w = window
    # ids num_kf-w .. num_kf-1, clamped at 0
    ids = jnp.arange(-w, 0) + n
    ids = jnp.maximum(ids, 0)
    return ids % state.capacity_kf, ids, (jnp.arange(-w, 0) + n) >= 0
