#!/usr/bin/env python
"""Multistream regression investigation (VERDICT r2 weak #4): the
8-stream vmapped aggregate (327 FPS) measured LOWER than single-stream
(453 FPS). Find where vmap loses throughput:

  - scaling curve: aggregate FPS at S = 1, 2, 4, 8 (scan over T steps);
  - stage ablation under vmap vs S sequential calls: extract (detect +
    patches + descriptors), match, pnp.

Methodology: CLAUDE.md gotchas #2/#3 (varying operands, consumed
outputs, hard barrier, best-of-N).
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
from kbslam.frontend import orb
from kbslam.parallel.multistream import batched_init_state, make_multistream_step


def _log(m):
    print(f"[ms {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    cfg = DEFAULT_CONFIG
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    rgb_np, dep_np, K = z["rgb"], z["depth"], z["K"]
    intr = Intrinsics.from_matrix(K)
    order = list(range(12)) + list(range(10, 0, -1))
    results = {}

    # --- scaling curve ----------------------------------------------------
    T = 22
    for S in (1, 2, 4, 8):
        ms_state = batched_init_state(cfg, S)
        rgb = jnp.asarray(np.stack(
            [np.stack([rgb_np[order[(t + s) % len(order)]]
                       for s in range(S)]) for t in range(T)]))
        dep = jnp.asarray(np.stack(
            [np.stack([dep_np[order[(t + s) % len(order)]]
                       for s in range(S)]) for t in range(T)]))
        vstep = make_multistream_step(cfg, intr, donate=False)

        @jax.jit
        def scan(st, rgb, dep):
            def body(carry, xs):
                r, d = xs
                keys = jax.vmap(lambda i: jax.random.fold_in(
                    jax.random.PRNGKey(0), carry.frame_count[0] * S + i)
                )(jnp.arange(S))
                st2, out = vstep(carry, r, d, keys)
                return st2, out.num_inliers
            return jax.lax.scan(body, st, (rgb, dep))

        ms_state, ninl = scan(ms_state, rgb, dep)
        np.asarray(ninl)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            ms_state, ninl = scan(ms_state, rgb, dep)
            np.asarray(ninl)
            best = min(best, time.perf_counter() - t0)
        fps = S * T / best
        results[f"fps_S{S}"] = round(fps, 1)
        _log(f"S={S}: {fps:.1f} FPS aggregate ({best / T * 1e3:.2f} ms/step)")

    # --- stage ablation: vmapped extract vs 1-stream extract --------------
    def time_scan(name, fn, xs, n_rep=5, tile=3):
        xs = jax.tree.map(lambda a: jnp.concatenate([a] * tile), xs)
        TT = jax.tree.leaves(xs)[0].shape[0]

        @jax.jit
        def run(xs):
            def body(c, x):
                out = fn(x)
                return c + sum(jnp.sum(o.astype(jnp.float32))
                               for o in jax.tree.leaves(out)), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return tot

        np.asarray(run(xs))
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.perf_counter()
            np.asarray(run(xs))
            best = min(best, (time.perf_counter() - t0) / TT)
        _log(f"{name}: {best * 1e3:.3f} ms")
        return best * 1e3

    T2 = 11
    rgb1 = jnp.asarray(np.stack([rgb_np[order[t]] for t in range(T2)]))
    rgb8 = jnp.asarray(np.stack(
        [np.stack([rgb_np[order[(t + s) % len(order)]] for s in range(8)])
         for t in range(T2)]))

    def ex1(g):
        with jax.default_matmul_precision("highest"):
            f = orb.extract(g, None, cfg.orb)
        return f.desc, f.xy

    def ex8(g):
        with jax.default_matmul_precision("highest"):
            f = jax.vmap(lambda x: orb.extract(x, None, cfg.orb))(g)
        return f.desc, f.xy

    e1 = time_scan("extract_1", ex1, rgb1)
    e8 = time_scan("extract_8vmap", ex8, rgb8)
    results["extract_1_ms"] = round(e1, 3)
    results["extract_8vmap_ms"] = round(e8, 3)
    results["extract_vmap_ratio"] = round(e8 / (8 * e1), 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
