"""Pallas TPU kernel: fused Hamming distance + top-2 neighbor search.

The matcher's XLA form materializes a [Nq, Nt] int32 distance matrix in
HBM and re-reads it for two argmin passes. This kernel walks a 2D grid
of (query-tile, train-tile) blocks; each distance tile is computed on
the MXU (bf16 x bf16 -> f32: the 256-long {0,1} contraction is exact in
f32) and merged into running (best, second, argmin) VMEM scratch that
persists across the sequential train-tile grid steps — the full
distance matrix never exists.

axon/Mosaic AOT toolchain constraints baked in (each crashes the
compile helper otherwise): no u8 casts inside kernels (cast to int32 in
XLA first), no rank-1 outputs/scratch (everything is [1, N]), no
scalar-prefetch dynamic DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # python float: pallas kernels must not capture device constants


def _kernel(q_ref, t_ref, tv_ref, best_ref, second_ref, idx_ref,
            b_sc, s_sc, i_sc, *, tile_t: int):
    tj = pl.program_id(1)
    n_tj = pl.num_programs(1)

    @pl.when(tj == 0)
    def _():
        b_sc[:] = jnp.full_like(b_sc, BIG)
        s_sc[:] = jnp.full_like(s_sc, BIG)
        i_sc[:] = jnp.zeros_like(i_sc)

    qf = q_ref[:].astype(jnp.float32)                      # [TQ, B]
    nq = jnp.sum(qf, axis=1, keepdims=True)
    t_f = t_ref[:].astype(jnp.float32)                     # [TT, B]
    nt = jnp.sum(t_f, axis=1)

    dot = jax.lax.dot_general(
        qf.astype(jnp.bfloat16), t_f.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [TQ, TT]
    d = nq + nt[None, :] - 2.0 * dot
    d = jnp.where((tv_ref[0, :] > 0)[None, :], d, BIG)

    tile_best = jnp.min(d, axis=1)[None, :]                # [1, TQ]
    tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[None, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    tile_second = jnp.min(
        jnp.where(cols == tile_arg.T, BIG, d), axis=1)[None, :]

    best = b_sc[:]
    second = s_sc[:]
    bidx = i_sc[:]
    b_sc[:] = jnp.minimum(best, tile_best)
    s_sc[:] = jnp.minimum(jnp.minimum(second, tile_second),
                          jnp.maximum(best, tile_best))
    i_sc[:] = jnp.where(tile_best < best, tile_arg + tj * tile_t, bidx)

    @pl.when(tj == n_tj - 1)
    def _():
        best_ref[:] = b_sc[:].astype(jnp.int32)
        second_ref[:] = s_sc[:].astype(jnp.int32)
        idx_ref[:] = i_sc[:]


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t"))
def hamming_top2_pallas(
    query: jnp.ndarray,    # [Nq, B] {0,1} uint8
    train: jnp.ndarray,    # [Nt, B] {0,1} uint8
    train_valid: jnp.ndarray,  # [Nt] bool
    tile_q: int = 512,
    tile_t: int = 512,
):
    """Returns (best [Nq] i32, best_idx [Nq] i32, second [Nq] i32).

    Tie-breaking across train tiles may differ from a global argmin
    when two neighbors have EQUAL distance (either index is returned);
    distances themselves are exact.
    """
    nq, nb = query.shape
    nt = train.shape[0]
    assert nq % tile_q == 0 and nt % tile_t == 0, (nq, nt)

    query = query.astype(jnp.int32)
    train = train.astype(jnp.int32)

    grid = (nq // tile_q, nt // tile_t)
    out_spec = pl.BlockSpec((1, tile_q), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        functools.partial(_kernel, tile_t=tile_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, nb), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, nb), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_q), jnp.float32),
            pltpu.VMEM((1, tile_q), jnp.float32),
            pltpu.VMEM((1, tile_q), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(query, train, train_valid.astype(jnp.int32)[None, :])
    return best[0], idx[0], second[0]
