#!/usr/bin/env python
"""Submap-atlas fusion cost on TPU, at production scale.

What it answers: what does `--dense-submaps` pay per keyframe fusion
vs the monolithic volume? `integrate_active` (kbslam/mapping/submap.py)
is the monolithic `integrate` plus a [1,nx,ny,nz] dynamic-slice in and
dynamic-update-slice out of the [S,nx,ny,nz] ring (2 x 1.18 MB at the
default 96x96x32 f32 dims), plus the anchor-frame pose compose; plus
the once-per-K-insertions `start_submap` slot reset (a masked where
over the whole ring).

Timing rules (CLAUDE.md gotchas #2/#3): many fusions batched into one
lax.scan dispatch with per-iteration-VARYING poses/frames, outputs
consumed in full (sums over the whole ring), np.asarray as the
barrier, best-of-N against tunnel congestion.

Run on real TPU: python benchmarks/exp_submap.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/kbslam_jaxcache")

from kbslam.config import DenseMapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.mapping.dense import empty_tsdf, integrate
from kbslam.mapping.submap import (empty_atlas, integrate_active,
                                   start_submap)


def _log(m):
    print(f"[exp_submap] {m}", flush=True)


def _time_scan(fn, args, n):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + warm-up
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # hard barrier (gotcha #2)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    H, W = 480, 640
    T = 12
    _log(f"rendering {T} frames at {W}x{H}")
    seq = render_sequence(num_frames=T, height=H, width=W, fx=520.0,
                          scene="spheres")
    intr = Intrinsics.from_matrix(seq.K)
    cfg = DenseMapConfig()
    depths = jnp.asarray(seq.depth.astype(np.float32) * 0.001)
    poses = [SE3.from_matrix(jnp.asarray(p, jnp.float32))
             for p in seq.poses]
    qs = jnp.stack([p.q for p in poses])
    ts = jnp.stack([p.t for p in poses])
    N = 64  # fusions per dispatch: amortizes the ~25 ms tunnel RTT
    S = 16

    # --- monolithic baseline: plain integrate, same scan harness -------
    def run_mono(st, depths, qs, ts):
        def body(st, k):
            i = k % T
            # VARY the pose per trip (gotcha #3) so nothing hoists
            t = ts[i] + 1e-4 * jnp.sin(k.astype(jnp.float32))
            st = integrate(st, depths[i], SE3(qs[i], t), intr, cfg)
            return st, None
        st, _ = jax.lax.scan(body, st, jnp.arange(N, dtype=jnp.int32))
        # consume the FULL result
        return jnp.sum(st.tsdf) + jnp.sum(st.weight)

    mono = _time_scan(jax.jit(run_mono),
                      (empty_tsdf(cfg), depths, qs, ts), N)
    _log(f"monolithic integrate: {mono:.3f} ms/fusion")

    # --- atlas fusion: slice in/out of the [S,nx,ny,nz] ring ----------
    def run_atlas(atlas, depths, qs, ts):
        def body(atlas, k):
            i = k % T
            t = ts[i] + 1e-4 * jnp.sin(k.astype(jnp.float32))
            atlas = integrate_active(atlas, depths[i], qs[i], t, intr,
                                     cfg)
            return atlas, None
        atlas, _ = jax.lax.scan(body, atlas,
                                jnp.arange(N, dtype=jnp.int32))
        return jnp.sum(atlas.tsdf) + jnp.sum(atlas.weight)

    atlas0 = start_submap(empty_atlas(cfg, S), qs[0], ts[0], 0)
    fuse = _time_scan(jax.jit(run_atlas), (atlas0, depths, qs, ts), N)
    _log(f"atlas integrate_active: {fuse:.3f} ms/fusion "
         f"(S={S} ring, +{fuse - mono:.3f} over monolithic)")

    # --- start_submap: the once-per-K-insertions slot reset -----------
    def run_start(atlas, qs, ts):
        def body(atlas, k):
            i = k % T
            atlas = start_submap(atlas, qs[i], ts[i], k)
            return atlas, None
        atlas, _ = jax.lax.scan(body, atlas,
                                jnp.arange(N, dtype=jnp.int32))
        return jnp.sum(atlas.tsdf) + jnp.sum(atlas.weight)

    start = _time_scan(jax.jit(run_start), (atlas0, qs, ts), N)
    _log(f"start_submap: {start:.3f} ms/open (every K insertions)")

    print(json.dumps({
        "monolithic_ms_per_fusion": round(mono, 3),
        "atlas_ms_per_fusion": round(fuse, 3),
        "start_submap_ms": round(start, 3),
        "ring_submaps": S,
        "volume_voxels": int(np.prod(cfg.dims)),
        "image": f"{W}x{H}",
    }))


if __name__ == "__main__":
    main()
