"""Pallas TPU kernel: batched 40x40 patch extraction.

The XLA form (vmap of dynamic_slice) costs ~2 us PER SLICE regardless
of slice size (slice-count bound) — ~5.7 ms/frame at 3000 keypoints.
This kernel cuts that to ~1 ms.

Design, shaped by axon/Mosaic AOT toolchain constraints (manual
`make_async_copy` with dynamic offsets crashes the compile helper;
dynamic sublane/lane offsets cannot be proven aligned for vector
loads):
  - dynamically-addressed HBM blocks move via scalar-prefetched BLOCK
    indices in BlockSpec index_maps — the one supported mechanism;
  - P patches per grid step, each with FOUR input specs (the 2x2 window
    of (48, 128)-aligned blocks covering a patch) — per-grid-step
    overhead dominates small fetches, so fewer/fatter steps win;
  - callers sort keypoints by (level, block-row, block-col) so
    consecutive steps reference the SAME blocks and the Pallas pipeline
    skips the redundant copies (orb.detect_and_compute does this);
  - the 40x40 window is cut from each assembled 96x256 block with
    one-hot selection matmuls. ``precision`` picks the MXU pass count
    (measured, 3072 patches/call, hard-barriered): DEFAULT 1 bf16 pass,
    1.30 ms, quantizes intensities to bf16 (max |err| 0.5 gray — the
    production choice, config.patch_precision, ATE-validated);
    "split3" 3 bf16 passes, 1.70 ms, BIT-IDENTICAL to f32 (see
    _onehot_dot); HIGHEST ~6 passes, 1.80 ms. benchmarks/
    exp_patch_precision.py reproduces the table.

Constraints: stacked image [L, H, W] with H % 48 == 0 and W % 128 == 0
(callers pad); y0 in [0, H-40], x0 in [0, W-40]; N % patches_per_step
== 0 (feature capacities are multiples of 128).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BH = 48   # block rows; 2 blocks -> 96 >= 40 + max dy 56
_BW = 128  # block cols; 2 blocks -> 256 >= 40 + max dx 216


def _split3(x):
    """Exact 3-term bf16 decomposition of f32 (24 significand bits =
    3 x 8): x == hi + mid + lo bit-exactly for the u8-range gray values
    this kernel selects (each residual of round-to-nearest is exactly
    representable, and three 8-bit chunks cover the f32 significand)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_dot(sel, x, dims, precision):
    """sel @ x (or x @ sel) where ``sel`` is ONE-HOT 0/1. precision
    "split3": sel is exact in bf16 and x splits exactly into 3 bf16
    terms, so 3 native bf16 MXU passes reproduce the f32 result
    bit-exactly — vs ~6 passes for a HIGHEST f32 dot (the asymmetry XLA
    cannot exploit: it must split BOTH operands). Mosaic has no HIGH."""
    if precision != "split3":
        return jax.lax.dot_general(sel, x, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
    selb = sel.astype(jnp.bfloat16)
    out = None
    for term in _split3(x):
        d = jax.lax.dot_general(selb, term, dims,
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def _kernel(lv_ref, byf_ref, bxf_ref, dy_ref, dx_ref,
            *refs, S: int, P: int, precision):
    blocks, out_ref = refs[:-1], refs[-1]
    i = pl.program_id(0)
    for p in range(P):
        b00, b01, b10, b11 = blocks[4 * p: 4 * p + 4]
        top = jnp.concatenate([b00[0], b01[0]], axis=1)   # [48, 256]
        bot = jnp.concatenate([b10[0], b11[0]], axis=1)
        blk = jnp.concatenate([top, bot], axis=0)         # [96, 256]
        dy = dy_ref[i * P + p]
        dx = dx_ref[i * P + p]
        ri = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * _BH), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * _BH), 1)
        rowsel = (rj == ri + dy).astype(jnp.float32)
        rows = _onehot_dot(rowsel, blk, (((1,), (0,)), ((), ())),
                           precision)                     # [S, 256]
        ci = jax.lax.broadcasted_iota(jnp.int32, (2 * _BW, S), 0)
        cj = jax.lax.broadcasted_iota(jnp.int32, (2 * _BW, S), 1)
        colsel = (ci == cj + dx).astype(jnp.float32)
        if precision == "split3":
            # second selection: split the (exact f32) selected rows
            selb = colsel.astype(jnp.bfloat16)
            acc = None
            for term in _split3(rows):
                d = jax.lax.dot_general(
                    term, selb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            out_ref[p] = acc
        else:
            out_ref[p] = jax.lax.dot_general(
                rows, colsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)


@functools.partial(
    jax.jit, static_argnames=("patch_size", "patches_per_step", "precision"))
def extract_patches_pallas(
    stacked: jnp.ndarray,   # [L, H, W] float32; H % 48 == 0, W % 128 == 0
    level: jnp.ndarray,     # [N] int32
    y0: jnp.ndarray,        # [N] int32 pre-clamped to [0, H - S]
    x0: jnp.ndarray,        # [N] int32 pre-clamped to [0, W - S]
    patch_size: int = 40,
    patches_per_step: int = 4,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Returns [N, patch_size, patch_size] float32."""
    n = level.shape[0]
    L, H, W = stacked.shape
    assert H % _BH == 0 and W % _BW == 0, (H, W)
    S = patch_size
    P = patches_per_step
    while n % P:
        P //= 2
    assert P >= 1

    byf = jnp.minimum(y0 // _BH, H // _BH - 2)
    bxf = jnp.minimum(x0 // _BW, W // _BW - 2)

    def spec(p, dj, dk):
        return pl.BlockSpec(
            (1, _BH, _BW),
            lambda i, lv, byf, bxf, dy, dx, p=p, dj=dj, dk=dk:
                (lv[i * P + p], byf[i * P + p] + dj, bxf[i * P + p] + dk),
            memory_space=pltpu.VMEM,
        )

    in_specs = [spec(p, dj, dk)
                for p in range(P) for dj in (0, 1) for dk in (0, 1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n // P,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (P, S, S), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, S=S, P=P, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, S, S), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(level, byf, bxf, y0 - byf * _BH, x0 - bxf * _BW,
      *([stacked] * (4 * P)))


# NOTE(perf, measured): a "quad-shift" variant (four pre-shifted pyramid
# copies so each patch needs ONE (88, 128) block spec instead of this
# kernel's four (48, 128) specs, with 2.75x smaller selection matmuls)
# was built and timed on real pipeline keypoints: 0.826 ms including the
# quad build vs 0.757 ms for this kernel, bit-identical output. With
# block-locality-sorted keypoints the 2x2 window's copies are mostly
# reused across consecutive grid steps, so fewer/fatter specs do not
# help — the kernel is DMA/pipeline-bound at ~0.75 ms. Don't rebuild it.
