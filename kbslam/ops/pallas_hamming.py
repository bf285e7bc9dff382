"""Pallas TPU kernel: fused Hamming distance + top-2 neighbor search.

The matcher's XLA form materializes a [Nq, Nt] int32 distance matrix in
HBM and re-reads it for two argmin passes (~37 MB of traffic for the
3072x3072 case, plus whatever the fusion planner decides). This kernel
tiles both descriptor sets through VMEM, computes each distance tile on
the MXU (bf16 x bf16 -> f32: the 256-long {0,1} contraction is exact in
f32), and maintains the running (best, second, argmin) per query row in
VMEM scratch — the full distance matrix never exists.

Grid: one program per query tile; the train dimension is walked inside
the kernel. Shapes must be multiples of the tile size (the padded
feature capacity 3072 = 24 x 128 already is).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # python float: pallas kernels must not capture device constants


def _kernel(q_ref, t_ref, tvalid_ref, best_ref, second_ref, idx_ref,
            *, tile_t: int, n_train: int):
    q = q_ref[:].astype(jnp.bfloat16)            # [TQ, B]
    nq = jnp.sum(q_ref[:].astype(jnp.float32), axis=1, keepdims=True)  # [TQ,1]

    tq = q.shape[0]
    best = jnp.full((tq,), BIG, jnp.float32)
    second = jnp.full((tq,), BIG, jnp.float32)
    bidx = jnp.zeros((tq,), jnp.int32)

    def body(j, carry):
        best, second, bidx = carry
        t_blk = t_ref[pl.ds(j * tile_t, tile_t), :]           # [TT, B]
        tv = tvalid_ref[pl.ds(j * tile_t, tile_t)]            # [TT]
        dot = jax.lax.dot_general(
            q, t_blk.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [TQ, TT]
        nt = jnp.sum(t_blk.astype(jnp.float32), axis=1)        # [TT]
        d = nq + nt[None, :] - 2.0 * dot
        d = jnp.where((tv > 0)[None, :], d, BIG)

        tile_best = jnp.min(d, axis=1)
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        tile_second = jnp.min(
            jnp.where(cols == tile_arg[:, None], BIG, d), axis=1)

        # merge running top-2 with the tile's top-2
        new_best = jnp.minimum(best, tile_best)
        new_second = jnp.minimum(
            jnp.minimum(second, tile_second), jnp.maximum(best, tile_best))
        new_idx = jnp.where(tile_best < best, tile_arg + j * tile_t, bidx)
        return new_best, new_second, new_idx

    n_tiles = n_train // tile_t
    best, second, bidx = jax.lax.fori_loop(0, n_tiles, body,
                                           (best, second, bidx))
    best_ref[:] = best.astype(jnp.int32)
    second_ref[:] = second.astype(jnp.int32)
    idx_ref[:] = bidx


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t"))
def hamming_top2_pallas(
    query: jnp.ndarray,    # [Nq, B] {0,1} uint8
    train: jnp.ndarray,    # [Nt, B] {0,1} uint8
    train_valid: jnp.ndarray,  # [Nt] bool
    tile_q: int = 256,
    tile_t: int = 512,
):
    """Returns (best [Nq] i32, best_idx [Nq] i32, second [Nq] i32)."""
    nq, nb = query.shape
    nt = train.shape[0]
    assert nq % tile_q == 0 and nt % tile_t == 0, (nq, nt)

    grid = (nq // tile_q,)
    best, second, idx = pl.pallas_call(
        functools.partial(_kernel, tile_t=tile_t, n_train=nt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, nb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq,), jnp.int32),
            jax.ShapeDtypeStruct((nq,), jnp.int32),
            jax.ShapeDtypeStruct((nq,), jnp.int32),
        ],
    )(query, train, train_valid.astype(jnp.int8))
    return best, idx, second
