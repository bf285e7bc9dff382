#!/usr/bin/env python
"""Per-stage TPU profiling of the tracking hot path.

Methodology (CLAUDE.md platform gotchas #2/#3): each stage runs inside a
lax.scan over REAL per-frame intermediates captured from the bench
sequence (operands vary per iteration), every output is fully consumed
into a scalar, and the dispatch is hard-barriered with np.asarray.
best-of-N over repeated dispatches. Prints one JSON line with
ms-per-frame per stage.
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
from kbslam.geom.camera import Intrinsics, depth_at, unproject
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.pipeline import init_state, make_track_step, track_step
from kbslam.frontend import orb, brief
from kbslam.frontend.image import build_pyramid, pyramid_sizes, rgb_to_gray
from kbslam.matching.hamming import knn2_ratio_match
from kbslam.pnp.ransac import ransac_pnp


def _log(m):
    print(f"[prof {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _consume(tree):
    leaves = jax.tree.leaves(tree)
    tot = jnp.float32(0.0)
    for x in leaves:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def time_scan(name, fn, xs, n_rep=5, tile=5):
    """fn(x) runs once per scan iteration over stacked xs; returns ms/iter."""
    xs = jax.tree.map(lambda a: jnp.concatenate([a] * tile), xs)
    T = jax.tree.leaves(xs)[0].shape[0]

    @jax.jit
    def run(xs):
        def body(c, x):
            return c + _consume(fn(x)), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return tot

    r = run(xs)
    np.asarray(r)  # compile + barrier
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        r = run(xs)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / T)
    _log(f"{name}: {best * 1e3:.3f} ms")
    return best * 1e3


def main():
    cfg = DEFAULT_CONFIG
    cache = "/tmp/kbslam_bench_seq_v1.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        rgb_np, dep_np, K = z["rgb"], z["depth"], z["K"]
    else:
        seq = render_sequence(num_frames=12, height=480, width=640, fx=525.0)
        np.savez(cache, rgb=seq.rgb, depth=seq.depth, K=seq.K)
        rgb_np, dep_np, K = seq.rgb, seq.depth, seq.K
    intr = Intrinsics.from_matrix(K)
    T = 22  # frames per dispatch (palindrome of the 12 rendered)
    order = (list(range(12)) + list(range(10, 0, -1)))[:T]

    # --- warm a real tracked state so the keyframe bank is realistic ------
    _log("warming tracked state")
    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    state = init_state(cfg)
    for i in range(40):
        j = order[i % T]
        state, out = step(state, jnp.asarray(rgb_np[j]), jnp.asarray(dep_np[j]))
    jax.block_until_ready(out)
    m = state.map

    rgb = jnp.asarray(np.stack([rgb_np[j] for j in order]))
    dep = jnp.asarray(np.stack([dep_np[j] for j in order]))

    results = {}

    # --- full step (scan carry = live state) -------------------------------
    def full_body(st, x):
        key = jax.random.fold_in(jax.random.PRNGKey(0), st.frame_count)
        st, o = track_step(st, x[0], x[1], None, key, intr, cfg)
        return st, (o.success, o.num_inliers)

    @jax.jit
    def full_run(st, rgb, dep):
        return jax.lax.scan(full_body, st, (rgb, dep))

    st2, (succ, ninl) = full_run(state, rgb, dep)
    np.asarray(ninl)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        st2, (succ, ninl) = full_run(state, rgb, dep)
        np.asarray(ninl)
        best = min(best, (time.perf_counter() - t0) / T)
    results["full_step"] = best * 1e3
    _log(f"full_step: {best * 1e3:.3f} ms")

    # --- stage inputs (captured intermediates, stacked over T frames) ------
    _log("capturing intermediates")

    @jax.jit
    def front(rgbi):
        with jax.default_matmul_precision("highest"):
            f = orb.extract(rgbi, None, cfg.orb)
        return f

    feats_list = [front(rgb[i]) for i in range(T)]
    feats = jax.tree.map(lambda *xs: jnp.stack(xs), *feats_list)

    # keyframe bank (fixed across frames, like the real step between KFs)
    NK = cfg.track_keyframes
    ids = m.num_kf - 1 - jnp.arange(NK)
    kslots = jnp.maximum(ids, 0) % m.capacity_kf
    q_desc = m.kf_desc[kslots].reshape(-1, 256)
    q_valid = (m.kf_kp_valid[kslots] & (ids >= 0)[:, None]).reshape(-1)
    p_cam = unproject(intr, m.kf_kp_xy[kslots], m.kf_kp_depth[kslots])
    kf_T = SE3(m.kf_q[kslots][:, None, :], m.kf_t[kslots][:, None, :])
    pts3d_bank = kf_T.apply(p_cam).reshape(-1, 3)

    @jax.jit
    def matcher(f):
        return knn2_ratio_match(q_desc, q_valid, f.desc, f.valid,
                                cfg.matcher.ratio)

    match_list = [matcher(jax.tree.map(lambda a: a[i], feats)) for i in range(T)]
    matches = jax.tree.map(lambda *xs: jnp.stack(xs), *match_list)

    @jax.jit
    def pnp_inputs(f, mt, depi):
        dkp = depth_at(depi, f.xy, cfg.map.depth_scale)
        pts2d = f.xy[mt.best_idx]
        dcur = dkp[mt.best_idx]
        return pts2d, unproject(intr, pts2d, dcur), dcur

    pi = [pnp_inputs(jax.tree.map(lambda a: a[i], feats),
                     jax.tree.map(lambda a: a[i], matches), dep[i])
          for i in range(T)]
    pts2d = jnp.stack([x[0] for x in pi])
    pts3d_obs = jnp.stack([x[1] for x in pi])
    dcur = jnp.stack([x[2] for x in pi])
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), i)
                      for i in range(T)])

    # --- frontend stages ----------------------------------------------------
    results["extract_total"] = time_scan(
        "extract_total",
        lambda x: front(x), rgb)

    L = cfg.orb.num_levels
    h0, w0 = 480, 640

    def detect_only(rgbi):
        with jax.default_matmul_precision("highest"):
            gray = rgb_to_gray(rgbi)
            pyr = build_pyramid(gray, L, cfg.orb.scale_factor)
            from kbslam.frontend.fast import border_mask, fast_score_map, nms3x3
            from kbslam.frontend.harris import harris_response
            sizes = pyramid_sizes(h0, w0, L, cfg.orb.scale_factor)
            outs = []
            from kbslam.frontend.orb import level_quotas
            for lv in range(L):
                img = pyr[lv]
                hl, wl = sizes[lv]
                score = nms3x3(fast_score_map(img, float(cfg.orb.fast_threshold)))
                region = border_mask(hl, wl, cfg.orb.edge_threshold)
                harris = harris_response(img, cfg.orb.harris_block_size, cfg.orb.harris_k)
                cand = jnp.where((score > 0) & region, harris, -1e30)
                vals, idx = jax.lax.top_k(
                    jax.lax.optimization_barrier(cand.reshape(-1)),
                    level_quotas(cfg.orb)[lv])
                outs.append(vals)
            return outs

    results["detect_fast_harris_topk"] = time_scan(
        "detect_fast_harris_topk", detect_only, rgb)

    # patch extraction + descriptor path, on a real stacked pyramid
    @jax.jit
    def make_stacked(rgbi):
        from kbslam.frontend.image import gaussian_blur
        gray = rgb_to_gray(rgbi)
        pyr = build_pyramid(gray, L, cfg.orb.scale_factor)
        sizes = pyramid_sizes(h0, w0, L, cfg.orb.scale_factor)
        stacked = jnp.zeros((L, h0, w0), jnp.float32)
        for lv in range(L):
            hl, wl = sizes[lv]
            stacked = stacked.at[lv, :hl, :wl].set(
                gaussian_blur(pyr[lv], cfg.orb.blur_kernel, cfg.orb.blur_sigma))
        return stacked

    stacked = jnp.stack([make_stacked(rgb[i]) for i in range(T)])
    sizes = pyramid_sizes(h0, w0, L, cfg.orb.scale_factor)
    level_dims = jnp.asarray(sizes, jnp.int32)
    scales = jnp.asarray([cfg.orb.scale_factor ** lv for lv in range(L)],
                         jnp.float32)
    # level coords of the captured keypoints
    xy_lvl = feats.xy / scales[feats.level][..., None]

    results["patches"] = time_scan(
        "patches",
        lambda x: brief.extract_patches(x[0], level_dims, x[1], x[2],
                                        precision=cfg.orb.patch_precision),
        (stacked, xy_lvl, feats.level))

    def desc_from_patches(x):
        patches = brief.extract_patches(x[0], level_dims, x[1], x[2],
                                        precision=cfg.orb.patch_precision)
        ang = brief.ic_angles(patches, radius=cfg.orb.patch_size // 2)
        return brief.bits_from_patches(patches, ang)

    results["patches_angles_desc"] = time_scan(
        "patches_angles_desc", desc_from_patches, (stacked, xy_lvl, feats.level))

    # --- match --------------------------------------------------------------
    results["match"] = time_scan(
        "match", lambda f: matcher(f), feats)

    # --- PnP ----------------------------------------------------------------
    def pnp_fn(x):
        key, uv, p3o, dc, is_m = x
        with jax.default_matmul_precision("highest"):
            r = ransac_pnp(key, pts3d_bank, uv, is_m, intr, cfg.pnp,
                           points3d_obs=p3o, obs_valid=dc > 0)
        return r.num_inliers, r.T_cw.q, r.T_cw.t

    results["pnp"] = time_scan(
        "pnp", pnp_fn, (keys, pts2d, pts3d_obs, dcur, matches.is_match))

    # --- map update (insert + fuse, forced every iteration) ----------------
    from kbslam.mapping.state import create_map_points, insert_keyframe

    def insert_fn(x):
        f, dkp, mt = x
        m2 = insert_keyframe(m, f, dkp, SE3.identity())
        m2 = create_map_points(m2, mt, intr.fx, intr.fy, intr.cx, intr.cy)
        return m2.num_mp, m2.kf_mp[0, :8], m2.mp_pos[:8]

    dkp_all = jnp.stack([depth_at(dep[i], feats.xy[i], cfg.map.depth_scale)
                         for i in range(T)])
    fuse = jax.tree.map(lambda a: a[:, :feats.xy.shape[1]], matches)
    results["map_insert_fuse"] = time_scan(
        "map_insert_fuse", insert_fn, (feats, dkp_all, fuse))

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
