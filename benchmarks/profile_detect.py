#!/usr/bin/env python
"""Sub-stage profiling of the detect stage (pyramid/FAST/Harris/top_k)."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/kbslam_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from kbslam.config import DEFAULT_CONFIG
from kbslam.frontend.fast import border_mask, fast_score_map, nms3x3
from kbslam.frontend.harris import harris_response
from kbslam.frontend.image import build_pyramid, gaussian_blur, pyramid_sizes, rgb_to_gray
from kbslam.frontend.orb import level_quotas

def _log(m): print(f"[det {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

def _consume(tree):
    tot = jnp.float32(0.0)
    for x in jax.tree.leaves(tree):
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot

def time_scan(name, fn, xs, n_rep=5, tile=5):
    xs = jax.tree.map(lambda a: jnp.concatenate([a] * tile), xs)
    T = jax.tree.leaves(xs)[0].shape[0]
    @jax.jit
    def run(xs):
        def body(c, x):
            return c + _consume(fn(x)), ()
        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]
    np.asarray(run(xs))
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter(); np.asarray(run(xs))
        best = min(best, (time.perf_counter() - t0) / T)
    _log(f"{name}: {best*1e3:.3f} ms")
    return best * 1e3

def main():
    cfg = DEFAULT_CONFIG
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    T = 22
    order = (list(range(12)) + list(range(10, 0, -1)))[:T]
    rgb = jnp.asarray(np.stack([z["rgb"][j] for j in order]))
    L = cfg.orb.num_levels
    sizes = pyramid_sizes(480, 640, L, cfg.orb.scale_factor)
    quotas = level_quotas(cfg.orb)
    results = {}

    results["gray_pyramid"] = time_scan(
        "gray_pyramid", lambda x: build_pyramid(rgb_to_gray(x), L, cfg.orb.scale_factor), rgb)

    @jax.jit
    def pyr_of(x):
        return tuple(build_pyramid(rgb_to_gray(x), L, cfg.orb.scale_factor))
    pyrs = [pyr_of(rgb[i]) for i in range(T)]
    pyr = jax.tree.map(lambda *xs: jnp.stack(xs), *pyrs)

    results["blur_all_levels"] = time_scan(
        "blur_all_levels",
        lambda p: [gaussian_blur(p[lv], cfg.orb.blur_kernel, cfg.orb.blur_sigma) for lv in range(L)],
        pyr)
    results["fast_nms_all_levels"] = time_scan(
        "fast_nms_all_levels",
        lambda p: [nms3x3(fast_score_map(p[lv], float(cfg.orb.fast_threshold))) for lv in range(L)],
        pyr)
    results["harris_all_levels"] = time_scan(
        "harris_all_levels",
        lambda p: [harris_response(p[lv], cfg.orb.harris_block_size, cfg.orb.harris_k) for lv in range(L)],
        pyr)

    @jax.jit
    def cand_of(p):
        out = []
        for lv in range(L):
            score = nms3x3(fast_score_map(p[lv], float(cfg.orb.fast_threshold)))
            region = border_mask(*sizes[lv], cfg.orb.edge_threshold)
            h = harris_response(p[lv], cfg.orb.harris_block_size, cfg.orb.harris_k)
            out.append(jnp.where((score > 0) & region, h, -1e30))
        return tuple(out)
    cands = [cand_of(jax.tree.map(lambda a: a[i], pyr)) for i in range(T)]
    cand = jax.tree.map(lambda *xs: jnp.stack(xs), *cands)

    results["topk_all_levels"] = time_scan(
        "topk_all_levels",
        lambda c: [jax.lax.top_k(jax.lax.optimization_barrier(c[lv].reshape(-1)), quotas[lv])
                   for lv in range(L)],
        cand)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))

if __name__ == "__main__":
    main()
