#!/usr/bin/env python
"""Sub-stage profiling of the detect stage (pyramid/FAST/Harris/top-k).

A/Bs the per-level dense loop against the stacked [L, H, W] form and
exact top_k against approx_max_k, all in ONE process so the numbers
share a congestion window (tunnel timing methodology: CLAUDE.md #2/#3).
"""
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
    h0, w0 = 480, 640
    sizes = pyramid_sizes(h0, w0, L, cfg.orb.scale_factor)
    quotas = level_quotas(cfg.orb)
    results = {}

    results["gray_pyramid"] = time_scan(
        "gray_pyramid", lambda x: build_pyramid(rgb_to_gray(x), L, cfg.orb.scale_factor), rgb)

    @jax.jit
    def pyr_of(x):
        return tuple(build_pyramid(rgb_to_gray(x), L, cfg.orb.scale_factor))
    pyrs = [pyr_of(rgb[i]) for i in range(T)]
    pyr = jax.tree.map(lambda *xs: jnp.stack(xs), *pyrs)

    @jax.jit
    def stack_of(p):
        s = jnp.zeros((L, h0, w0), jnp.float32)
        for lv in range(L):
            hl, wl = sizes[lv]
            s = s.at[lv, :hl, :wl].set(p[lv])
        return s
    stk = jnp.stack([stack_of(jax.tree.map(lambda a: a[i], pyr)) for i in range(T)])

    def dense_perlevel(p):
        return [(nms3x3(fast_score_map(p[lv], float(cfg.orb.fast_threshold))),
                 harris_response(p[lv], cfg.orb.harris_block_size, cfg.orb.harris_k))
                for lv in range(L)]
    results["dense_perlevel"] = time_scan("dense_perlevel", dense_perlevel, pyr)

    def dense_stacked(s):
        return (nms3x3(fast_score_map(s, float(cfg.orb.fast_threshold))),
                harris_response(s, cfg.orb.harris_block_size, cfg.orb.harris_k))
    results["dense_stacked"] = time_scan("dense_stacked", dense_stacked, stk)

    results["blur_perlevel"] = time_scan(
        "blur_perlevel",
        lambda p: [gaussian_blur(p[lv], cfg.orb.blur_kernel, cfg.orb.blur_sigma)
                   for lv in range(L)], pyr)
    results["blur_stacked"] = time_scan(
        "blur_stacked",
        lambda s: gaussian_blur(s, cfg.orb.blur_kernel, cfg.orb.blur_sigma), stk)

    # candidate maps (stacked layout), precomputed for selection timing
    ys = jnp.arange(h0)[None, :, None]
    xs_ = jnp.arange(w0)[None, None, :]
    hl_arr = jnp.asarray([s[0] for s in sizes])[:, None, None]
    wl_arr = jnp.asarray([s[1] for s in sizes])[:, None, None]
    b = cfg.orb.edge_threshold
    region = ((ys >= b) & (ys < hl_arr - b) & (xs_ >= b) & (xs_ < wl_arr - b))

    @jax.jit
    def cand_of(s):
        score, har = dense_stacked(s)
        return jnp.where((score > 0) & region, har, -1e30)
    cand = jnp.stack([cand_of(stk[i]) for i in range(T)])

    results["sel_approx"] = time_scan(
        "sel_approx",
        lambda c: [jax.lax.approx_max_k(c[lv].reshape(-1), quotas[lv],
                                        recall_target=0.95) for lv in range(L)],
        cand)
    results["sel_exact"] = time_scan(
        "sel_exact",
        lambda c: [jax.lax.top_k(c[lv].reshape(-1), quotas[lv]) for lv in range(L)],
        cand)

    # subpixel parabolic offsets (gather cost at the selected corners)
    @jax.jit
    def sel_of(c):
        out = []
        for lv in range(L):
            v, i = jax.lax.approx_max_k(c[lv].reshape(-1), quotas[lv],
                                        recall_target=0.95)
            out.append(i)
        return tuple(out)
    idxs = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[sel_of(cand[i]) for i in range(T)])

    def subpix(x):
        c, idx = x
        outs = []
        for lv in range(L):
            hl, wl = sizes[lv]
            xi = idx[lv] % w0
            yi = idx[lv] // w0
            hb = c[lv]
            def at(dy, dx):
                return hb[jnp.clip(yi + dy, 0, hl - 1), jnp.clip(xi + dx, 0, wl - 1)]
            c0 = at(0, 0)
            outs.append(at(0, -1) + c0 + at(0, 1) + at(-1, 0) + at(1, 0))
        return outs
    results["subpixel_gathers"] = time_scan("subpixel_gathers", subpix, (cand, idxs))

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))

if __name__ == "__main__":
    main()
