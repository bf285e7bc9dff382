#!/usr/bin/env python
"""Does scan unrolling shrink the per-frame scheduling bubble?

The round-3 xplane floor table shows 1.891 ms/frame of compute busy vs
~2.16 ms wall: a ~0.27 ms gap of dispatch RTT + per-iteration
scheduling bubble. lax.scan(unroll=k) stitches k iterations into one
loop body, letting XLA overlap the tail of frame i with the head of
frame i+1. Measures the unroll=1 baseline across track_keyframes
(NK=3 default vs NK=1 strict reference parity) ONLY: unroll>=2 fails
to compile on this toolchain — XLA relayouts the u8 [T,480,640,3]
input channel-minor padded 3->128 lanes (42.7x allocation) and OOMs —
so it was intentionally dropped from the sweep (see CLAUDE.md).

Run on real TPU: python benchmarks/exp_scan_unroll.py
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
from kbslam.pipeline import init_state, track_step


def _log(m):
    print(f"[unroll {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def measure(cfg, intr, rgb, dep, unroll):
    def body(st, xs):
        r, d = xs
        key = jax.random.fold_in(jax.random.PRNGKey(0), st.frame_count)
        st, o = track_step(st, r, d, None, key, intr, cfg)
        return st, o.num_inliers

    @jax.jit
    def scan(st, rgb, dep):
        return jax.lax.scan(body, st, (rgb, dep), unroll=unroll)

    T = rgb.shape[0]
    st = init_state(cfg)
    st, ninl = scan(st, rgb, dep)
    np.asarray(ninl)  # compile + warm
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        st, ninl = scan(st, rgb, dep)
        np.asarray(ninl)
        best = min(best, time.perf_counter() - t0)
    return {"ms_per_frame": round(best / T * 1e3, 4),
            "fps": round(T / best, 1)}


def main():
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    intr = Intrinsics.from_matrix(z["K"])
    order = list(range(12)) + list(range(10, 0, -1))
    reps = 20  # 440 frames/dispatch
    rgb = jnp.asarray(np.stack([z["rgb"][j] for j in order * reps]))
    dep = jnp.asarray(np.stack([z["depth"][j] for j in order * reps]))

    results = {}
    for nk in (3, 1):
        cfg = DEFAULT_CONFIG.replace(track_keyframes=nk)
        for unroll in (1,):
            r = measure(cfg, intr, rgb, dep, unroll)
            results[f"nk{nk}_unroll{unroll}"] = r
            _log(f"nk={nk} unroll={unroll}: {r}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
