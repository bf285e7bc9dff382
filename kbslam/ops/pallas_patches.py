"""Pallas TPU kernel: batched 40x40 patch extraction via aligned DMA.

The XLA form (vmap of dynamic_slice) costs ~1.9 us/patch on v5e
(~5.7 ms/frame at 3000 keypoints). This kernel scalar-prefetches the
per-keypoint (level, y0, x0) origins and, for each patch, DMAs an
ALIGNED [48, 256] block (sublane offsets must be multiples of 8, lane
offsets multiples of 128 for HBM slices) into VMEM double-buffered,
then slices the 40x40 window out of the block with the residual
(dy in [0,8], dx in [0,216]) offsets.

Callers must pre-clamp y0 to [0, H-40] and x0 to [0, W-40]; the image
stack must be [L, H, W] with H % 8 == 0, W % 128 == 0 and W >= 256
(pyramid levels narrower than the stack read into the zero padding,
which is safe because the valid window never crosses level bounds).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK_H = 48
_BLK_W = 256


def _kernel(lv_ref, yA_ref, xA_ref, dy_ref, dx_ref, img_ref, out_ref,
            scratch, sems, *, tile: int, S: int):
    i = pl.program_id(0)

    def get_dma(slot, j):
        k = i * tile + j
        return pltpu.make_async_copy(
            img_ref.at[lv_ref[k], pl.ds(yA_ref[k], _BLK_H),
                       pl.ds(xA_ref[k], _BLK_W)],
            scratch.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < tile)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        k = i * tile + j
        # Mosaic cannot prove alignment for dynamic sublane/lane offsets
        # in VMEM loads; select the window with two exact one-hot
        # matmuls instead (iota-compare selection rides the MXU).
        blk = scratch[slot]                              # [48, 256]
        dy = dy_ref[k]
        dx = dx_ref[k]
        ri = jax.lax.broadcasted_iota(jnp.int32, (S, _BLK_H), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (S, _BLK_H), 1)
        rowsel = (rj == ri + dy).astype(jnp.float32)     # [S, 48]
        rows = jax.lax.dot_general(
            rowsel, blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [S, 256]
        ci = jax.lax.broadcasted_iota(jnp.int32, (_BLK_W, S), 0)
        cj = jax.lax.broadcasted_iota(jnp.int32, (_BLK_W, S), 1)
        colsel = (ci == cj + dx).astype(jnp.float32)     # [256, S]
        out_ref[j, :, :] = jax.lax.dot_general(
            rows, colsel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("patch_size", "tile"))
def extract_patches_pallas(
    stacked: jnp.ndarray,   # [L, H, W] float32, H % 8 == 0, W % 128 == 0
    level: jnp.ndarray,     # [N] int32
    y0: jnp.ndarray,        # [N] int32 pre-clamped to [0, H - S]
    x0: jnp.ndarray,        # [N] int32 pre-clamped to [0, W - S]
    patch_size: int = 40,
    tile: int = 64,
) -> jnp.ndarray:
    """Returns [N, patch_size, patch_size] float32."""
    n = level.shape[0]
    assert n % tile == 0, (n, tile)
    L, H, W = stacked.shape
    assert H % 8 == 0 and W % 128 == 0 and W >= _BLK_W and H >= _BLK_H
    S = patch_size

    yA = jnp.minimum(y0 & ~7, H - _BLK_H)
    xA = jnp.minimum(x0 & ~127, W - _BLK_W)
    dy = y0 - yA
    dx = x0 - xA

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tile, S, S), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _BLK_H, _BLK_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, tile=tile, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, S, S), jnp.float32),
    )(level, yA, xA, dy, dx, stacked)
