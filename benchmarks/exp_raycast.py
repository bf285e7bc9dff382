"""TSDF raycast cost on the real TPU (mapping/raycast.py).

Methodology per CLAUDE.md: batch many renders into ONE dispatch via
lax.scan with per-iteration-VARYING operands (poses), consume the full
output (sums), and barrier with np.asarray; best-of-N over repeats.

Run: python benchmarks/exp_raycast.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/kbslam_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from kbslam.config import DenseMapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.mapping.dense import integrate_sequence
from kbslam.mapping.raycast import raycast


def main():
    seq = render_sequence(num_frames=8, height=240, width=320)
    intr = Intrinsics.from_matrix(seq.K)
    cfg = DenseMapConfig(origin=(-4.08, -4.08, -1.36))
    st = integrate_sequence(seq.depth.astype(np.float32) * 0.001,
                            seq.poses, intr, cfg)

    for (H, W), t_max, reps in (((240, 320), 6.0, 32), ((480, 640), 6.0, 16)):
        intr_s = Intrinsics.create(intr.fx * W / 320, intr.fy * H / 240,
                                   intr.cx * W / 320, intr.cy * H / 240)

        def run(state, qs, ts_):
            def body(acc, xs):
                q, t = xs
                r = raycast(state, SE3(q, t), intr_s, H, W, cfg,
                            t_max=t_max)
                return acc + jnp.sum(r.depth) + jnp.sum(r.normal), None
            return jax.lax.scan(body, 0.0, (qs, ts_))[0]

        f = jax.jit(run, static_argnames=())
        rng = np.random.default_rng(0)
        # poses VARY per iteration (hoisting guard): jitter around frame 0
        qs = np.tile([1.0, 0, 0, 0], (reps, 1)).astype(np.float32)
        qs[:, 1:] += rng.normal(0, 0.01, (reps, 3)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        ts_ = (seq.poses[0][:3, 3] + rng.normal(0, 0.02, (reps, 3))
               ).astype(np.float32)

        out = f(st, jnp.asarray(qs), jnp.asarray(ts_))
        np.asarray(out)  # warm/compile barrier
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(st, jnp.asarray(qs), jnp.asarray(ts_))
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        n_steps = int(np.ceil((t_max - 0.05) / (0.75 * cfg.truncation))) + 1
        print(f"raycast {H}x{W} t_max={t_max} steps={n_steps}: "
              f"{best * 1e3:.2f} ms/render "
              f"({H * W * n_steps / 1e6:.1f}M samples)")


if __name__ == "__main__":
    main()
