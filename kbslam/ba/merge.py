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
    # pruning clears slots in the BA result's window rows
    kf_mp = current.kf_mp.at[rows].set(ba_result.kf_mp[slots], mode="drop")

    # landmarks referenced by the snapshot window
    flat = snapshot.kf_mp[slots].reshape(-1)
    touched = jnp.zeros((P,), bool).at[
        jnp.where(flat >= 0, flat, P)].set(True, mode="drop")
    mp_pos = jnp.where(touched[:, None], ba_result.mp_pos, current.mp_pos)

    return current._replace(kf_q=kf_q, kf_t=kf_t, kf_mp=kf_mp, mp_pos=mp_pos)


def make_merge(cfg: BAConfig):
    return jax.jit(lambda c, s, b: merge_ba_result(c, s, b, cfg))
