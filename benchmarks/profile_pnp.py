#!/usr/bin/env python
"""Sub-stage profiling of ransac_pnp on real tracked intermediates."""
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
from kbslam.geom.se3 import SE3, matrix_to_quat
from kbslam.io.synthetic import render_sequence
from kbslam.pipeline import init_state, make_track_step
from kbslam.frontend import orb
from kbslam.matching.hamming import knn2_ratio_match
from kbslam.pnp.dlt import normalized_rays, solve_dlt
from kbslam.pnp.kabsch import solve_kabsch
from kbslam.pnp.ransac import _sample_valid_indices, _residuals
from kbslam.pnp.refine import refine_pose
from kbslam.geom.camera import project


def _log(m):
    print(f"[pnp {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _consume(tree):
    tot = jnp.float32(0.0)
    for x in jax.tree.leaves(tree):
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def time_scan(name, fn, xs, n_rep=5, tile=5):
    # tile the frame axis so T x stage-ms clears the tunnel RTT floor
    xs = jax.tree.map(lambda a: jnp.concatenate([a] * tile), xs)
    T = jax.tree.leaves(xs)[0].shape[0]

    @jax.jit
    def run(xs):
        def body(c, x):
            with jax.default_matmul_precision("highest"):
                return c + _consume(fn(x)), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return tot

    np.asarray(run(xs))
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        best = min(best, (time.perf_counter() - t0) / T)
    _log(f"{name}: {best * 1e3:.3f} ms")
    return best * 1e3


def main():
    cfg = DEFAULT_CONFIG
    pcfg = cfg.pnp
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    rgb_np, dep_np, K = z["rgb"], z["depth"], z["K"]
    intr = Intrinsics.from_matrix(K)
    T = 22
    order = (list(range(12)) + list(range(10, 0, -1)))[:T]

    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    state = init_state(cfg)
    for i in range(40):
        j = order[i % T]
        state, out = step(state, jnp.asarray(rgb_np[j]), jnp.asarray(dep_np[j]))
    jax.block_until_ready(out)
    m = state.map

    rgb = jnp.asarray(np.stack([rgb_np[j] for j in order]))
    dep = jnp.asarray(np.stack([dep_np[j] for j in order]))

    @jax.jit
    def front(rgbi):
        with jax.default_matmul_precision("highest"):
            return orb.extract(rgbi, None, cfg.orb)

    NK = cfg.track_keyframes
    ids = m.num_kf - 1 - jnp.arange(NK)
    kslots = jnp.maximum(ids, 0) % m.capacity_kf
    q_desc = m.kf_desc[kslots].reshape(-1, 256)
    q_valid = (m.kf_kp_valid[kslots] & (ids >= 0)[:, None]).reshape(-1)
    p_cam = unproject(intr, m.kf_kp_xy[kslots], m.kf_kp_depth[kslots])
    kf_T = SE3(m.kf_q[kslots][:, None, :], m.kf_t[kslots][:, None, :])
    pts3d_bank = kf_T.apply(p_cam).reshape(-1, 3)

    @jax.jit
    def mk(rgbi, depi):
        f = front(rgbi)
        mt = knn2_ratio_match(q_desc, q_valid, f.desc, f.valid, cfg.matcher.ratio)
        dkp = depth_at(depi, f.xy, cfg.map.depth_scale)
        uv = f.xy[mt.best_idx]
        dcur = dkp[mt.best_idx]
        return uv, unproject(intr, uv, dcur), dcur, mt.is_match, mt.best_dist

    rows = [mk(rgb[i], dep[i]) for i in range(T)]
    uv = jnp.stack([r[0] for r in rows])
    p3o = jnp.stack([r[1] for r in rows])
    dcur = jnp.stack([r[2] for r in rows])
    is_m = jnp.stack([r[3] for r in rows])
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), i)
                      for i in range(T)])
    print("mean matches:", float(jnp.mean(jnp.sum(is_m, 1))), file=sys.stderr)

    results = {}
    Kh = pcfg.num_hypotheses
    K_dlt = max(int(Kh * pcfg.dlt_fraction), 1)

    # 1. sampling
    def sampling(x):
        key, v, ov = x
        ka, kb = jax.random.split(key)
        both = v & ov
        pool = jnp.where(jnp.any(both), both, v)
        i1 = _sample_valid_indices(kb, pool, Kh - K_dlt, pcfg.sample_size)
        i2 = _sample_valid_indices(ka, v, K_dlt, pcfg.sample_size)
        return i1, i2

    results["sampling"] = time_scan("sampling", sampling,
                                    (keys, is_m, dcur > 0))

    # 2. hypothesis solve + polish
    def hyp(x):
        key, v, ov, uvx, p3 = x
        ka, kb = jax.random.split(key)
        both = v & ov
        pool = jnp.where(jnp.any(both), both, v)
        i1 = _sample_valid_indices(kb, pool, Kh - K_dlt, pcfg.sample_size)
        i2 = _sample_valid_indices(ka, v, K_dlt, pcfg.sample_size)
        idx = jnp.concatenate([i2, i1], 0)
        pts_s = pts3d_bank[idx]
        uv_s = uvx[idx]
        rays_s = normalized_rays(intr, uv_s[:K_dlt])
        R_d, t_d = solve_dlt(pts_s[:K_dlt], rays_s)
        R_k, t_k = solve_kabsch(pts_s[K_dlt:], p3[idx[K_dlt:]])
        R = jnp.concatenate([R_d, R_k], 0)
        t = jnp.concatenate([t_d, t_k], 0)
        T0 = SE3(matrix_to_quat(R), t).normalize()
        ones_s = jnp.ones(pcfg.sample_size, jnp.float32)
        Th = jax.vmap(lambda q, tt, p, u: refine_pose(
            SE3(q, tt), p, u, ones_s, intr, iters=pcfg.polish_iters))(
            T0.q, T0.t, pts_s, uv_s)
        return Th.q, Th.t

    results["hypotheses_solve_polish"] = time_scan(
        "hypotheses_solve_polish", hyp, (keys, is_m, dcur > 0, uv, p3o))

    # 2b. fine split of the hypothesis stage
    idx_fixed = jax.jit(sampling)((keys[0], is_m[0], dcur[0] > 0))
    idx_all = jnp.concatenate([idx_fixed[1], idx_fixed[0]], 0)

    def gathers_only(x):
        uvx, p3 = x
        pts_s = pts3d_bank[idx_all]
        return pts_s, uvx[idx_all], p3[idx_all]

    results["hyp_gathers"] = time_scan("hyp_gathers", gathers_only, (uv, p3o))

    pts_s_f = pts3d_bank[idx_all]

    def dlt_only(x):
        uvx = x
        uv_s = uvx[idx_all[:K_dlt]]
        rays_s = normalized_rays(intr, uv_s)
        return solve_dlt(pts_s_f[:K_dlt], rays_s)

    results["hyp_dlt32"] = time_scan("hyp_dlt32", dlt_only, uv)

    def kabsch_only(x):
        p3 = x
        return solve_kabsch(pts_s_f[K_dlt:], p3[idx_all[K_dlt:]])

    results["hyp_kabsch224"] = time_scan("hyp_kabsch224", kabsch_only, p3o)

    # precompute hypothesis poses for scoring stage
    hyp_j = jax.jit(lambda x: hyp(x))
    hq, ht = [], []
    for i in range(T):
        q_, t_ = hyp_j((keys[i], is_m[i], dcur[i] > 0, uv[i], p3o[i]))
        hq.append(q_); ht.append(t_)
    hq = jnp.stack(hq); ht = jnp.stack(ht)

    def polish_only(x):
        uvx, q_, t_ = x
        uv_s = uvx[idx_all]
        ones_s = jnp.ones(pcfg.sample_size, jnp.float32)
        Th = jax.vmap(lambda qq, tt, p, u: refine_pose(
            SE3(qq, tt), p, u, ones_s, intr, iters=pcfg.polish_iters))(
            q_, t_, pts_s_f, uv_s)
        return Th.q, Th.t

    results["hyp_polish"] = time_scan("hyp_polish", polish_only, (uv, hq, ht))

    # 3. scoring
    def score(x):
        q_, t_, uvx, v = x
        Th = SE3(q_, t_)
        Rh = Th.rotation_matrix()
        pc = jnp.einsum("kij,nj->kni", Rh, pts3d_bank) + Th.t[:, None, :]
        uv_proj, zz = project(intr, pc)
        err2 = jnp.sum((uv_proj - uvx[None]) ** 2, -1)
        thr2 = pcfg.reproj_threshold ** 2
        inlier = (err2 < thr2) & (zz > 0) & v[None, :]
        counts = jax.lax.optimization_barrier(jnp.sum(inlier, 1))
        best = jnp.argmax(counts)
        return counts, best

    results["scoring"] = time_scan("scoring", score, (hq, ht, uv, is_m))

    # 4. one full-set refine (5 iters)
    def ref1(x):
        q_, t_, uvx, v = x
        T0 = SE3(q_[0], t_[0])
        return refine_pose(T0, pts3d_bank, uvx, v.astype(jnp.float32), intr,
                           iters=pcfg.refine_iters).q

    results["refine_5it_fullset"] = time_scan(
        "refine_5it_fullset", ref1, (hq, ht, uv, is_m))

    # 5. residual recount
    def recount(x):
        q_, t_, uvx, v = x
        r, zz, _ = _residuals(SE3(q_[0], t_[0]), pts3d_bank, uvx, intr)
        e2 = jnp.sum(r * r, -1)
        return jnp.sum((e2 < 64.0) & (zz > 0) & v)

    results["recount"] = time_scan("recount", recount, (hq, ht, uv, is_m))

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
