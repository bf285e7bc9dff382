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


class CompactProblem(NamedTuple):
    # observations, active-first, capacity O
    obs_valid: jnp.ndarray   # [O] bool
    obs_w: jnp.ndarray       # [O] int32 window-camera index
    obs_uv: jnp.ndarray      # [O, 2]
    obs_wz: jnp.ndarray      # [O] depth loss scale
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
        obs_l=jnp.where(obs_valid, obs_l, L),
        uniq_global=uniq_global,
        Xc=Xc,
        l_valid=l_valid,
        anchor_l=anchor_l,
    )


def incidence_apply(ids: jnp.ndarray, n_targets: int, values: jnp.ndarray,
                    exact: bool = False) -> jnp.ndarray:
    """sum-by-id via a one-hot incidence matmul: [T, O] @ [O, C] -> [T, C].

    Replaces scatter-add (serial on TPU) with an MXU matmul. ids ==
    n_targets rows are dropped (one-hot row is all-zero). With
    exact=True the matmul runs in f32 (exact selection/sum of f32
    values); otherwise bf16 operands with f32 accumulation (~0.4%
    value rounding — fine for Jacobian products, not for positions).
    """
    O = ids.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (n_targets, O), 0)
              == ids[None, :])
    if exact:
        # HIGHEST precision is required: TPU f32 dots default to bf16
        # multiply passes, which silently rounds the "exact" selection.
        return jax.lax.dot_general(
            onehot.astype(jnp.float32), values.astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        onehot.astype(jnp.bfloat16), values.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def incidence_gather(ids: jnp.ndarray, table: jnp.ndarray,
                     exact: bool = True) -> jnp.ndarray:
    """values-by-id via one-hot matmul: out[i] = table[ids[i]].

    [O, T] @ [T, C] — the transpose of incidence_apply; replaces a
    row gather (45 ns/element on TPU). ids == T produce zero rows.
    """
    T = table.shape[0]
    O = ids.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (O, T), 1) == ids[:, None])
    if exact:
        return jax.lax.dot_general(
            onehot.astype(jnp.float32), table.astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        onehot.astype(jnp.bfloat16), table.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
