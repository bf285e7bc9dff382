#!/usr/bin/env python
"""Multistream regression, part 2: stage-by-stage vmap ablation.

Times S=8-vmapped vs single-stream versions of cumulative pipeline
prefixes (extract | +match+compact | +pnp | full step) to localize
where vmap loses throughput (exp_multistream.py showed extract alone
vmaps at 0.77x per-stream cost — the regression is downstream)."""
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
from kbslam.geom.camera import Intrinsics, depth_at, unproject
from kbslam.geom.se3 import SE3
from kbslam.ops.incidence import incidence_gather
from kbslam.pipeline import init_state, make_track_step, track_step
from kbslam.frontend import orb
from kbslam.matching.hamming import knn2_ratio_match
from kbslam.pnp.ransac import ransac_pnp

cfg = DEFAULT_CONFIG


def _log(m):
    print(f"[ms2 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


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


def main():
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    rgb_np, dep_np, K = z["rgb"], z["depth"], z["K"]
    intr = Intrinsics.from_matrix(K)
    order = list(range(12)) + list(range(10, 0, -1))

    # warm a tracked state for a realistic keyframe bank
    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    st = init_state(cfg)
    for i in range(40):
        j = order[i % len(order)]
        st, out = step(st, jnp.asarray(rgb_np[j]), jnp.asarray(dep_np[j]))
    jax.block_until_ready(out)
    m = st.map

    NK = cfg.track_keyframes
    ids = m.num_kf - 1 - jnp.arange(NK)
    kslots = jnp.maximum(ids, 0) % m.capacity_kf
    q_desc = m.kf_desc[kslots].reshape(-1, 256)
    q_valid = (m.kf_kp_valid[kslots] & (ids >= 0)[:, None]).reshape(-1)
    p_cam = unproject(intr, m.kf_kp_xy[kslots], m.kf_kp_depth[kslots])
    kf_T = SE3(m.kf_q[kslots][:, None, :], m.kf_t[kslots][:, None, :])
    pts3d_bank = kf_T.apply(p_cam).reshape(-1, 3)

    def stage(x, upto):
        rgb, dep, key = x
        with jax.default_matmul_precision("highest"):
            feats = orb.extract(rgb, None, cfg.orb)
            feats = jax.lax.optimization_barrier(feats)
            if upto == "extract":
                return feats.desc, feats.xy
            dkp = depth_at(dep, feats.xy, cfg.map.depth_scale)
            match = knn2_ratio_match(q_desc, q_valid, feats.desc, feats.valid,
                                     cfg.matcher.ratio)
            M = min(cfg.pnp.max_correspondences, q_desc.shape[0])
            score = jnp.where(match.is_match,
                              match.best_dist.astype(jnp.float32), jnp.inf)
            _, cidx = jax.lax.top_k(jax.lax.optimization_barrier(-score), M)
            sel_valid = match.is_match[cidx]
            pts3d_m = incidence_gather(cidx, pts3d_bank)
            t_idx = match.best_idx[cidx]
            tab = jnp.concatenate([feats.xy, dkp[:, None]], axis=1)
            train_m = incidence_gather(t_idx, tab)
            if upto == "match":
                return pts3d_m, train_m, sel_valid
            pts2d = train_m[:, :2]
            dcur = jnp.where(sel_valid, train_m[:, 2], 0.0)
            p3o = unproject(intr, pts2d, dcur)
            r = ransac_pnp(key, pts3d_m, pts2d, sel_valid, intr, cfg.pnp,
                           points3d_obs=p3o, obs_valid=dcur > 0,
                           valid_packed=True)
            return r.T_cw.q, r.T_cw.t, r.num_inliers

    T = 11
    results = {}
    for S, label in ((None, "1"), (8, "8vmap")):
        if S is None:
            rgb = jnp.asarray(np.stack([rgb_np[order[t]] for t in range(T)]))
            dep = jnp.asarray(np.stack([dep_np[order[t]] for t in range(T)]))
            keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), t)
                              for t in range(T)])
            wrap = lambda f: f
            div = 1
        else:
            rgb = jnp.asarray(np.stack(
                [np.stack([rgb_np[order[(t + s) % len(order)]]
                           for s in range(S)]) for t in range(T)]))
            dep = jnp.asarray(np.stack(
                [np.stack([dep_np[order[(t + s) % len(order)]]
                           for s in range(S)]) for t in range(T)]))
            keys = jnp.stack(
                [jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), t * 8 + s)
                            for s in range(S)]) for t in range(T)])
            wrap = jax.vmap
            div = S
        for upto in ("extract", "match", "pnp"):
            fn = wrap(lambda x, u=upto: stage(x, u))
            ms = time_scan(f"{upto}_{label}", fn, (rgb, dep, keys)) / div
            results[f"{upto}_{label}_per_stream_ms"] = round(ms, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
