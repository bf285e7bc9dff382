"""One-hot incidence matmuls: TPU-native scatter/gather replacements.

Gathers cost ~45 ns/element (serial) and scatter-adds lower to serial
per-index updates on TPU; for id sets in the hundreds-to-thousands a
one-hot [T, O] matmul on the MXU does the same data movement in tens of
microseconds. Shared by the BA compact solver (ba/compact.py) and the
tracking pipeline's correspondence compaction (pipeline.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


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
