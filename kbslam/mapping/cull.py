"""Keyframe culling — implemented but DISABLED by default, exactly like
the reference (Map.cpp:107-177 exists; its call site Map.cpp:63 is
commented out; CullConfig.enabled mirrors that).

Keep-decision parity: the first and last keyframes always survive; a
middle keyframe survives iff its relative motion to EITHER neighbor
exceeds 1.5 m translation or 0.1 rad rotation (Map.cpp:128-132); if
fewer than 5 would survive, keyframes are re-kept from the
second-newest backwards (Map.cpp:135-145).

Representation difference: the reference erases keyframes from its
vector; with a fixed-capacity ring we *invalidate in place* (kf_id=-1,
keypoints invalid, landmark slots cleared) — landmarks that drop below
2 observations lose their remaining slots like MapPoint::IsBad cleanup
(Map.cpp:153-167).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kbslam.config import CullConfig
from kbslam.geom.se3 import SE3
from kbslam.mapping.state import MapState


def cull_decision(kf_q, kf_t, valid, cfg: CullConfig):
    """keep mask per position, on poses ordered oldest->newest.

    kf_q/kf_t: [N,4]/[N,3] poses of the *valid* keyframes in order;
    valid: [N] bool (invalid rows are padding and never kept).
    """
    n = kf_q.shape[0]
    count = jnp.sum(valid.astype(jnp.int32))
    T = SE3(kf_q, kf_t)
    # relative motion to the previous/next valid position
    prev = SE3(jnp.roll(kf_q, 1, 0), jnp.roll(kf_t, 1, 0))
    nxt = SE3(jnp.roll(kf_q, -1, 0), jnp.roll(kf_t, -1, 0))
    rel_p = prev.inverse().compose(T)
    rel_n = T.inverse().compose(nxt)
    tr_p = rel_p.translation_norm()
    tr_n = rel_n.translation_norm()
    ro_p = rel_p.rotation_angle()
    ro_n = rel_n.rotation_angle()
    keep = (
        (tr_p > cfg.translation_threshold)
        | (tr_n > cfg.translation_threshold)
        | (ro_p > cfg.rotation_threshold)
        | (ro_n > cfg.rotation_threshold)
    )
    idx = jnp.arange(n)
    first_idx = jnp.argmax(valid.astype(jnp.int32))
    last_idx = n - 1 - jnp.argmax(valid[::-1].astype(jnp.int32))
    keep = keep | (idx == first_idx) | (idx == last_idx)
    keep = keep & valid

    # ensure at least min_keep survive: re-keep from second-newest back
    deficit = jnp.maximum(cfg.min_keep - jnp.sum(keep.astype(jnp.int32)), 0)
    # order candidates newest-first, excluding already-kept
    cand = valid & jnp.logical_not(keep) & (idx != last_idx)
    # rank: larger idx first
    rank = jnp.where(cand, idx, -1)
    order = jnp.argsort(-rank, stable=True)
    take = jnp.zeros(n, bool).at[order].set(jnp.arange(n) < deficit)
    keep = keep | (take & cand)
    return jnp.where(count <= cfg.min_keep, valid, keep)


def cull_keyframes(state: MapState, cfg: CullConfig) -> MapState:
    """Apply the cull decision to the ring (invalidate-in-place)."""
    m = state.capacity_kf
    # positions ordered by insertion id; invalid slots (id<0) are padding
    order = jnp.argsort(jnp.where(state.kf_id >= 0, state.kf_id, 1 << 30))
    valid = state.kf_id[order] >= 0
    keep_ord = cull_decision(state.kf_q[order], state.kf_t[order], valid, cfg)
    keep = jnp.zeros(m, bool).at[order].set(keep_ord)

    dropped = (state.kf_id >= 0) & jnp.logical_not(keep)

    # landmarks lose observations held by dropped KFs (kf_mp holds
    # monotone ids; stale references are treated as already gone)
    kf_mp = jnp.where(dropped[:, None], -1, state.kf_mp)
    live = state.mp_ref_live(kf_mp)
    # MapPoint::IsBad cleanup: obs count < 2 -> clear remaining slots
    P = state.capacity_mp
    slot = state.mp_ref_slot(kf_mp)
    safe = jnp.where(live, slot, P)
    obs = jnp.zeros((P,), jnp.int32).at[safe.reshape(-1)].add(1, mode="drop")
    bad = obs < 2
    kf_mp = jnp.where((bad[slot] | jnp.logical_not(live)) & (kf_mp >= 0),
                      -1, kf_mp)

    return state._replace(
        kf_id=jnp.where(dropped, -1, state.kf_id),
        kf_kp_valid=jnp.where(dropped[:, None], False, state.kf_kp_valid),
        kf_mp=kf_mp,
    )


@functools.lru_cache(maxsize=16)
def make_cull(cfg: CullConfig):
    """lru_cached jit (see ba.local_ba.make_local_ba): per-instance
    wrappers retrace on each host shell's first cull."""
    return jax.jit(lambda m: cull_keyframes(m, cfg))
