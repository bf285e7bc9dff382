"""Merge asynchronously-computed BA results into a live map.

The reference's background BA thread writes optimized poses/points back
under the global mutex while tracking keeps inserting keyframes
(main.cpp:40-47, Optimizers.cpp:222-262) — with a documented race in
problem construction. Our async mode is race-free by construction:
tracking continues on the live MapState while BA runs on a SNAPSHOT;
this merge applies the BA result only where it is still valid:

  - window keyframe poses / pruned landmark slots are taken from the BA
    result iff the ring slot still holds the same keyframe id (the ring
    may have wrapped during long BA runs);
  - landmark positions are taken from the BA result only for landmarks
    that were referenced by the snapshot window (new landmarks created
    during the solve keep their tracked positions).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from kbslam.config import BAConfig
from kbslam.mapping.state import MapState, window_slots


def merge_ba_result(
    current: MapState,
    snapshot: MapState,
    ba_result: MapState,
    cfg: BAConfig,
) -> MapState:
    W = cfg.window
    M = current.capacity_kf
    P = current.capacity_mp
    slots, _ids, real = window_slots(snapshot, W)

    same = real & (current.kf_id[slots] == snapshot.kf_id[slots])
    rows = jnp.where(same, slots, M)

    kf_q = current.kf_q.at[rows].set(ba_result.kf_q[slots], mode="drop")
    kf_t = current.kf_t.at[rows].set(ba_result.kf_t[slots], mode="drop")
    # per-entry kf_mp merge: take the BA result only where the SNAPSHOT
    # had a reference (pruning may have cleared it); keep the current
    # entry where the snapshot was empty — tracking may have fused new
    # landmark ids into the newest window row while the solve was in
    # flight, and a row-wise overwrite would orphan those observations.
    snap_rows = snapshot.kf_mp[slots]                       # [Wn, F]
    # "had a reference" means LIVE in the snapshot (id within the
    # snapshot's allocation window): after a landmark-ring wrap a STALE
    # id is also >= 0, BA leaves it untouched, and tracking may have
    # re-fused a fresh id into that entry mid-solve — taking the BA row
    # there would clobber the fresh id with the stale one.
    snap_live = (snap_rows >= 0) & (snap_rows >= snapshot.num_mp - P)
    merged_rows = jnp.where(snap_live, ba_result.kf_mp[slots],
                            current.kf_mp[slots])
    kf_mp = current.kf_mp.at[rows].set(merged_rows, mode="drop")

    # landmarks referenced by the snapshot window — validated against the
    # CURRENT allocation counter, so a slot reallocated mid-solve keeps
    # its new (tracked) position instead of the stale optimized one
    flat = snap_rows.reshape(-1)
    flat_ok = (flat >= 0) & (flat >= current.num_mp - P)
    touched = jnp.zeros((P,), bool).at[
        jnp.where(flat_ok, flat % P, P)].set(True, mode="drop")
    mp_pos = jnp.where(touched[:, None], ba_result.mp_pos, current.mp_pos)

    return current._replace(kf_q=kf_q, kf_t=kf_t, kf_mp=kf_mp, mp_pos=mp_pos)


@functools.lru_cache(maxsize=16)
def make_merge(cfg: BAConfig):
    """lru_cached for the same reason as make_local_ba: per-instance jit
    wrappers retrace on first use inside latency-sensitive loops."""
    return jax.jit(lambda c, s, b: merge_ba_result(c, s, b, cfg))
