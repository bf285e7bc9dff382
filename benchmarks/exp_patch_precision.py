#!/usr/bin/env python
"""Patch-kernel selection-matmul precision: HIGHEST vs HIGH vs DEFAULT.

Rationale: the kernel cuts each 40x40 patch out of an assembled 96x256
block with ONE-HOT selection matmuls. On TPU, f32 dots at HIGHEST run
~6 bf16 passes; HIGH runs 3. A 3-term bf16 split of an f32 is exact to
24 significand bits and the one-hot operand is exact, so HIGH should be
BIT-IDENTICAL here at half the MXU passes. DEFAULT (1 pass) quantizes
intensities to bf16 (8 bits) — measured for reference only.

Timing per CLAUDE.md rules: many kernel calls per dispatch via
lax.scan with per-iteration-varying operands, full-output consumption,
np.asarray barrier, best-of-N.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/kbslam_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from kbslam.ops.pallas_patches import extract_patches_pallas

L, H, W = 8, 480, 640
HP = ((H + 47) // 48) * 48   # 480
WP = ((W + 127) // 128) * 128  # 640
N = 3072
S = 40
ITERS = 50

rng = np.random.default_rng(0)
stacked = jnp.asarray(rng.uniform(0, 255, (L, HP, WP)).astype(np.float32))
# block-locality-sorted keypoints like orb.detect_and_compute produces
lv = np.sort(rng.integers(0, L, N)).astype(np.int32)
y0 = rng.integers(0, HP - S, N).astype(np.int32)
x0 = rng.integers(0, WP - S, N).astype(np.int32)
order = np.lexsort((x0 // 128, y0 // 48, lv))
lv, y0, x0 = lv[order], y0[order], x0[order]
lv_d, y0_d, x0_d = jnp.asarray(lv), jnp.asarray(y0), jnp.asarray(x0)


def timed(precision, label):
    def body(carry, i):
        # vary operands per iteration so XLA can't hoist (CLAUDE.md #3)
        yy = jnp.minimum(y0_d + i, HP - S)
        out = extract_patches_pallas(stacked, lv_d, yy, x0_d,
                                     precision=precision)
        return carry + jnp.sum(out), None

    @jax.jit
    def run():
        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return tot

    np.asarray(run())  # compile+warm
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label:8s}: {best * 1e3:.3f} ms / call ({N} patches)")
    return best


ref = np.asarray(extract_patches_pallas(
    stacked, lv_d, y0_d, x0_d, precision=jax.lax.Precision.HIGHEST))
for prec, label in [("split3", "split3"),
                    (jax.lax.Precision.DEFAULT, "DEFAULT")]:
    out = np.asarray(extract_patches_pallas(
        stacked, lv_d, y0_d, x0_d, precision=prec))
    bitsame = np.array_equal(out, ref)
    maxerr = float(np.max(np.abs(out - ref)))
    print(f"{label:8s}: bit-identical to HIGHEST = {bitsame}, "
          f"max |err| = {maxerr:.3e}")
for prec, label in [(jax.lax.Precision.HIGHEST, "HIGHEST"),
                    ("split3", "split3"),
                    (jax.lax.Precision.DEFAULT, "DEFAULT")]:
    timed(prec, label)
