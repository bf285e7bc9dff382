#!/usr/bin/env python
"""Deferred-insertion multistream throughput (VERDICT r3 weak #3).

exp_multistream2 root-caused the 8-stream aggregate gap to the
always-executed insertion tail (~0.37 ms/stream/frame under vmap) plus
a fixed scan-carry cost. make_multistream_scan defers insertion to once
per K frames structurally (nested scan, no cond). This measures
immediate (branchless) vs deferred at S=8 on the real chip, plus the
K sweep.

Run on real TPU: python benchmarks/exp_multistream3.py
"""
import json
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
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from kbslam.config import DEFAULT_CONFIG
from kbslam.geom.camera import Intrinsics
from kbslam.parallel.multistream import (batched_init_state,
                                         make_multistream_scan,
                                         make_multistream_step)


def _log(m):
    print(f"[ms3 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main():
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    order = list(range(12)) + list(range(10, 0, -1))
    cfg = DEFAULT_CONFIG
    intr = Intrinsics.from_matrix(z["K"])
    S, T = 8, 24

    rgb = jnp.asarray(np.stack(
        [np.stack([z["rgb"][order[(t + s) % len(order)]] for s in range(S)])
         for t in range(T)]))
    dep = jnp.asarray(np.stack(
        [np.stack([z["depth"][order[(t + s) % len(order)]] for s in range(S)])
         for t in range(T)]))

    results = {}

    # warm maps (deferral is a steady-state mode)
    vstep = make_multistream_step(cfg, intr, donate=False)
    st0 = batched_init_state(cfg, S)
    for t in range(4):
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(0), st0.frame_count[0] * S + i)
        )(jnp.arange(S))
        st0, out = vstep(st0, rgb[t % T], dep[t % T], keys)
    jax.block_until_ready(out)

    # immediate branchless scan (the round-3 bench path)
    def imm_scan_factory():
        vstep_d = make_multistream_step(cfg, intr, donate=False)

        @jax.jit
        def run(st, rgb, dep):
            def body(carry, xs):
                r, d = xs
                keys = jax.vmap(lambda i: jax.random.fold_in(
                    jax.random.PRNGKey(0), carry.frame_count[0] * S + i)
                )(jnp.arange(S))
                st2, out = vstep_d(carry, r, d, keys)
                return st2, out.num_inliers
            return jax.lax.scan(body, st, (rgb, dep))
        return run

    def measure(runner, st, label):
        st2, ninl = runner(st, rgb, dep)
        np.asarray(ninl)
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            st2, ninl = runner(st2, rgb, dep)
            np.asarray(ninl)
            best = min(best, time.perf_counter() - t0)
        fps = S * T / best
        _log(f"{label}: {fps:.1f} aggregate FPS "
             f"({best / T * 1e3:.2f} ms/step)")
        return round(fps, 1)

    results["immediate"] = measure(imm_scan_factory(), st0, "immediate")
    for K in (4, 8):
        scan = make_multistream_scan(cfg, intr, apply_every=K, donate=False)
        results[f"deferred_k{K}"] = measure(scan, st0, f"deferred K={K}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
