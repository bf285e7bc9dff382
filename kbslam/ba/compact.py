"""Compact observation/landmark problem layout for bundle adjustment.

The padded [W, F] observation layout carries ~15k slots of which only
~2-3k are active, and landmark accumulations over the full map capacity
P = 65536 force scatter-adds — which lower to SERIAL per-index updates
on TPU (~4 ms per scatter per LM iteration, measured). This module
compacts a window problem ONCE per solve into:

  - O static observation slots (active obs sorted first, then padding)
  - L static landmark slots (window-unique landmark ids)

so the LM iterations (ba/compact_lm.py) run entirely on [O]/[L]-sized
tensors and assemble every landmark/camera quantity with incidence
one-hot MATMULS on the MXU instead of scatters. The only scatters left
are the per-solve compaction table and the final writeback.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kbslam.ba.problem import BAProblem
from kbslam.ops.incidence import incidence_apply, incidence_gather  # noqa: F401
# (re-exported: the incidence matmuls moved to ops/incidence.py so the
# tracking pipeline can share them without importing the BA layer)


class CompactProblem(NamedTuple):
    # observations, active-first, capacity O
    obs_valid: jnp.ndarray   # [O] bool
    obs_w: jnp.ndarray       # [O] int32 window-camera index
    obs_uv: jnp.ndarray      # [O, 2]
    obs_wz: jnp.ndarray      # [O] depth loss scale
    obs_zmeas: jnp.ndarray   # [O] measured keypoint depth (m)
    obs_wd: jnp.ndarray      # [O] depth-residual weight 1/sigma^2 (0 = off)
    obs_l: jnp.ndarray       # [O] int32 compact landmark id (L = padding)
    # landmarks, capacity L
    uniq_global: jnp.ndarray # [L] int32 global landmark id (-1 = padding)
    Xc: jnp.ndarray          # [L, 3] positions (compact copy)
    l_valid: jnp.ndarray     # [L] bool
    anchor_l: jnp.ndarray    # [] int32 compact id of the depth anchor (-1)


def compact_problem(prob: BAProblem, mp_pos: jnp.ndarray,
                    O: int, L: int) -> CompactProblem:
    W, F = prob.mp_id.shape
    WF = W * F
    P = mp_pos.shape[0]

    active = prob.active.reshape(-1)
    mp_flat = jnp.where(active, prob.mp_id.reshape(-1), P)
    w_flat = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, F)).reshape(-1)

    # active observations first (stable), truncate to O
    order = jnp.argsort(jnp.logical_not(active), stable=True)[:O]
    obs_valid = active[order]
    obs_w = w_flat[order]
    obs_uv = prob.obs_uv.reshape(WF, 2)[order]
    obs_wz = jnp.where(obs_valid, prob.w_z.reshape(-1)[order], 0.0)
    obs_zmeas = jnp.where(obs_valid, prob.z_meas.reshape(-1)[order], 0.0)
    obs_wd = jnp.where(obs_valid, prob.w_d.reshape(-1)[order], 0.0)
    gids = jnp.where(obs_valid, mp_flat[order], P)     # [O] global ids

    # landmark compaction: sort ids, mark firsts, rank by prefix sum
    sorted_g = jnp.sort(gids)
    is_new = (sorted_g < P) & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_g[1:] != sorted_g[:-1]])
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1    # compact id per pos
    # global -> compact table (single scatter, once per solve)
    table = jnp.full((P + 1,), L, jnp.int32)
    table = table.at[jnp.where(is_new, sorted_g, P)].set(
        jnp.where(is_new & (rank < L), rank, L), mode="drop")
    table = table.at[P].set(L)
    obs_l = table[gids]                                # [O]
    obs_valid = obs_valid & (obs_l < L)

    uniq_global = jnp.full((L,), -1, jnp.int32)
    uniq_global = uniq_global.at[
        jnp.where(is_new & (rank < L), rank, L)].set(sorted_g, mode="drop")
    l_valid = uniq_global >= 0
    Xc = jnp.where(l_valid[:, None], mp_pos[jnp.clip(uniq_global, 0)], 0.0)

    anchor_l = jnp.where(
        prob.anchor_mp >= 0,
        table[jnp.clip(prob.anchor_mp, 0, P)],
        L,
    )
    anchor_l = jnp.where(anchor_l >= L, -1, anchor_l)

    return CompactProblem(
        obs_valid=obs_valid,
        obs_w=obs_w,
        obs_uv=obs_uv,
        obs_wz=obs_wz,
        obs_zmeas=obs_zmeas,
        obs_wd=obs_wd,
        obs_l=jnp.where(obs_valid, obs_l, L),
        uniq_global=uniq_global,
        Xc=Xc,
        l_valid=l_valid,
        anchor_l=anchor_l,
    )
