"""Frame-to-model dense ICP cost on TPU, at production scale.

What it answers: how much does a `--dense-icp` solve cost? One solve
(kbslam/mapping/icp.py make_icp) is ONE dispatch: strided depth
back-projection + icp.iters Gauss-Newton trips, each trip ONE [P,8]
trilinear corner gather + a [6,P]x[P,6] HIGHEST normal-equation matmul
+ a 6x6 solve. At 640x480 stride 4, P = 19,200 samples.

Context for the numbers: rescue mode pays this only on PnP-failure
frames (rare); refine mode pays it per frame on top of the 1.96 ms
tracking step.

Timing rules (CLAUDE.md gotchas #2/#3): many solves batched into one
lax.scan dispatch with per-iteration-VARYING initial poses and depth
frames, outputs consumed in full, np.asarray as the barrier,
best-of-N against tunnel congestion.

Run on real TPU: python benchmarks/exp_icp.py
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

from kbslam.config import DenseIcpConfig, DenseMapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.mapping.dense import integrate_sequence
from kbslam.mapping.icp import align_depth_to_tsdf


def _log(m):
    print(f"[exp_icp] {m}", flush=True)


def main():
    H, W = 480, 640
    T = 12
    _log(f"rendering {T} frames at {W}x{H} + fusing the volume")
    seq = render_sequence(num_frames=T, height=H, width=W, fx=520.0,
                          scene="spheres")
    intr = Intrinsics.from_matrix(seq.K)
    cfg = DenseMapConfig(origin=(-4.08, -4.08, -1.36))
    st = integrate_sequence(seq.depth.astype(np.float32) * 0.001,
                            seq.poses, intr, cfg)
    st = jax.tree.map(jnp.asarray, st)

    depths = jnp.asarray(seq.depth.astype(np.float32) * 0.001)
    poses = [SE3.from_matrix(jnp.asarray(p, jnp.float32))
             for p in seq.poses]
    qs = jnp.stack([p.q for p in poses])
    ts = jnp.stack([p.t for p in poses])

    N = 64  # solves per dispatch: amortizes the ~25 ms tunnel RTT
    results = {}
    for label, icp in [
        ("stride4_iters8", DenseIcpConfig(stride=4, iters=8)),
        ("stride4_iters4", DenseIcpConfig(stride=4, iters=4)),
        ("stride2_iters8", DenseIcpConfig(stride=2, iters=8)),
        ("stride8_iters8", DenseIcpConfig(stride=8, iters=8)),
    ]:
        def run(st, depths, qs, ts, keys):
            def body(c, k):
                # VARY the operand per iteration (gotcha #3): rotate
                # through frames and jitter the initial pose per trip
                i = k % T
                dq = jnp.where(jnp.arange(4) == 0, 1.0,
                               1e-3 * jnp.cos(k.astype(jnp.float32)))
                q0 = qs[i] + dq - jnp.array([1.0, 0, 0, 0])
                t0 = ts[i] + 1e-2 * jnp.sin(k.astype(jnp.float32))
                with jax.default_matmul_precision("highest"):
                    r = align_depth_to_tsdf(st, depths[i], q0, t0,
                                            intr, cfg, icp)
                # consume the FULL result
                s = (jnp.sum(r.q) + jnp.sum(r.t) + r.rmse + r.rmse_init
                     + r.num_valid.astype(jnp.float32))
                return c + s, None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(N, dtype=jnp.int32))[0]

        fn = jax.jit(run)
        keys = jnp.arange(N, dtype=jnp.int32)
        out = fn(st, depths, qs, ts, keys)
        np.asarray(out)  # warm-up + compile
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(st, depths, qs, ts, keys)
            np.asarray(out)  # hard barrier (gotcha #2)
            best = min(best, (time.perf_counter() - t0) / N * 1e3)
        results[label] = round(best, 3)
        _log(f"{label}: {best:.3f} ms/solve")

    # --- submap-atlas solver (--dense-icp + --dense-submaps): cost of
    # align_depth_to_atlas vs K, the evidence-window width. Each GN
    # trip pays K [P,8] corner gathers + the newest-valid-wins select;
    # expectation: ~linear in K on the gather-bound solve.
    from kbslam.mapping.icp import align_depth_to_atlas
    from kbslam.mapping.submap import empty_atlas, integrate_active
    from kbslam.mapping.submap import start_submap

    _log("building a 4-submap atlas (3 frames each)")
    atlas = empty_atlas(cfg, 8)
    for s_i in range(4):
        anchor = poses[s_i * 3]
        atlas = start_submap(atlas, anchor.q, anchor.t, kf_id=s_i * 3)
        for j in range(s_i * 3, s_i * 3 + 3):
            atlas = integrate_active(atlas, depths[j], qs[j], ts[j],
                                     intr, cfg, anchor.q, anchor.t)
    atlas = jax.tree.map(jnp.asarray, atlas)

    for K in (1, 2, 3, 4):
        icp = DenseIcpConfig(stride=4, iters=8, atlas_slots=K)
        slot_ids = jnp.asarray(
            np.array([3, 2, 1, 0][:K], np.int32))      # newest first
        aqs = atlas.anchor_q[slot_ids]
        ats = atlas.anchor_t[slot_ids]

        def run_a(atlas, depths, qs, ts, ks):
            def body(c, k):
                i = k % T
                dq = jnp.where(jnp.arange(4) == 0, 1.0,
                               1e-3 * jnp.cos(k.astype(jnp.float32)))
                q0 = qs[i] + dq - jnp.array([1.0, 0, 0, 0])
                t0 = ts[i] + 1e-2 * jnp.sin(k.astype(jnp.float32))
                with jax.default_matmul_precision("highest"):
                    r = align_depth_to_atlas(atlas, slot_ids, aqs, ats,
                                             depths[i], q0, t0, intr,
                                             cfg, icp)
                s = (jnp.sum(r.q) + jnp.sum(r.t) + r.rmse + r.rmse_init
                     + r.num_valid.astype(jnp.float32))
                return c + s, None
            return jax.lax.scan(body, jnp.float32(0.0), ks)[0]

        fn = jax.jit(run_a)
        ks = jnp.arange(N, dtype=jnp.int32)
        np.asarray(fn(atlas, depths, qs, ts, ks))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(atlas, depths, qs, ts, ks)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / N * 1e3)
        results[f"atlas_K{K}_stride4_iters8"] = round(best, 3)
        _log(f"atlas K={K}: {best:.3f} ms/solve")

    print(json.dumps({"icp_ms_per_solve": results,
                      "volume_voxels": int(np.prod(cfg.dims)),
                      "image": f"{W}x{H}"}))


if __name__ == "__main__":
    main()
