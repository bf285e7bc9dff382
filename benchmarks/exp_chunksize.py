#!/usr/bin/env python
"""How much of the measured per-frame wall is dispatch RTT amortization?

bench.py measures the device-resident loop at 220 frames per dispatch;
one tunnel dispatch costs ~25 ms wall (CLAUDE.md gotcha #11), i.e.
~0.11 ms/frame of non-device overhead at that chunk size. This sweeps
frames-per-dispatch to find where FPS saturates (= the true device
throughput) and reports per-frame wall at each size.

Run on real TPU: python benchmarks/exp_chunksize.py
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
    print(f"[chunksize {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main():
    cfg = DEFAULT_CONFIG
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    intr = Intrinsics.from_matrix(z["K"])
    order = list(range(12)) + list(range(10, 0, -1))

    def body(st, xs):
        r, d = xs
        key = jax.random.fold_in(jax.random.PRNGKey(0), st.frame_count)
        st, o = track_step(st, r, d, None, key, intr, cfg)
        return st, o.num_inliers

    @jax.jit
    def scan(st, rgb, dep):
        return jax.lax.scan(body, st, (rgb, dep))

    results = {}
    for reps in (10, 40):
        T = len(order) * reps
        rgb = jnp.asarray(np.stack([z["rgb"][j] for j in order * reps]))
        dep = jnp.asarray(np.stack([z["depth"][j] for j in order * reps]))
        st = init_state(cfg)
        st, ninl = scan(st, rgb, dep)
        np.asarray(ninl)  # compile + warm
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            st, ninl = scan(st, rgb, dep)
            np.asarray(ninl)
            best = min(best, time.perf_counter() - t0)
        results[T] = {"ms_per_frame": round(best / T * 1e3, 4),
                      "fps": round(T / best, 1)}
        _log(f"T={T}: {results[T]}")
        del rgb, dep, st, ninl
    print(json.dumps(results))


if __name__ == "__main__":
    main()
