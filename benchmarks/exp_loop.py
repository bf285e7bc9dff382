"""Loop-closure probe cost on TPU, at production scale.

What it answers: how much does `--loop` cost per keyframe insertion?
A probe (kbslam/loop/detect.py make_loop_probe) is ONE dispatch:
bag-of-words signatures over the FULL keyframe ring + [K,W]x[W]
scoring + mutual-best Hamming verification + batched PnP-RANSAC.
At the production keyframe rate (one insertion per ~10 frames,
KeyframePolicyConfig.min_frame_gap) the per-frame amortized cost is
probe_ms / 10, to set against the 1.96-1.99 ms/frame tracking step.

Also times the pose-graph correction (make_close_loop) — paid only on
a VERIFIED loop, i.e. rarely.

Timing rules (CLAUDE.md gotchas #2/#3): many probes batched into one
lax.scan dispatch with per-iteration-VARYING query slots, outputs
consumed in full (sums over every field), np.asarray as the barrier,
best-of-N against tunnel congestion.

Run on real TPU: python benchmarks/exp_loop.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/kbslam_jaxcache")

from kbslam.config import DEFAULT_CONFIG
from kbslam.geom.camera import Intrinsics
from kbslam.io.synthetic import render_sequence
from kbslam.loop.closure import make_close_loop
from kbslam.loop.detect import make_loop_probe
from kbslam.pipeline import init_state, make_track_step


def _log(m):
    print(f"[exp_loop] {m}", flush=True)


def main():
    cfg = DEFAULT_CONFIG
    lc = cfg.loop

    # populate a production-scale map (640x480, 3000 feats) by tracking
    # a palindrome-extended synthetic sweep — same recipe as bench.py
    cache = "/tmp/kbslam_bench_seq_v1.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        rgb, depth, K = z["rgb"], z["depth"], z["K"]
    else:
        seq = render_sequence(num_frames=12, height=480, width=640, fx=525.0)
        np.savez(cache, rgb=seq.rgb, depth=seq.depth, K=seq.K)
        rgb, depth, K = seq.rgb, seq.depth, seq.K
    intr = Intrinsics.from_matrix(K)
    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    state = init_state(cfg)
    _log("tracking 110 frames to populate the keyframe ring")
    order = list(range(len(rgb))) + list(range(len(rgb) - 2, 0, -1))
    for j in order * 5:
        state, out = step(state, jnp.asarray(rgb[j]), jnp.asarray(depth[j]))
    num_kf = int(state.map.num_kf)
    _log(f"map has {num_kf} keyframes")

    probe = make_loop_probe(cfg, intr, word_bits=lc.word_bits,
                            min_separation=lc.min_separation,
                            score_min=lc.score_min,
                            min_inliers=lc.min_inliers,
                            max_trans_disc=lc.max_trans_disc,
                            max_rot_disc_deg=lc.max_rot_disc_deg)

    N = 32  # probes per dispatch

    def probe_scan(m, slots, keys):
        def body(acc, xs):
            slot, key = xs
            cand, cons = probe(m, slot, m.kf_id[slot], key)
            # consume EVERY output so nothing is hoisted or sliced away
            s = (cand.score + jnp.sum(cand.scores)
                 + cons.num_inliers + jnp.sum(cons.rel_q)
                 + jnp.sum(cons.rel_t) + cand.slot
                 + cons.ok.astype(jnp.float32))
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (slots, keys))
        return acc

    probe_scan_j = jax.jit(probe_scan)
    slots = jnp.arange(N, dtype=jnp.int32) % max(num_kf, 1)
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    _log("compiling probe scan")
    np.asarray(probe_scan_j(state.map, slots, keys))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe_scan_j(state.map, slots, keys))
        best = min(best, (time.perf_counter() - t0) / N * 1e3)
    _log(f"probe: {best:.3f} ms per keyframe insertion "
         f"(ring {state.map.capacity_kf} x {state.map.kf_desc.shape[1]} "
         f"desc, {N}/dispatch, best of 5)")

    # pose-graph correction cost (paid only on a verified loop)
    close = make_close_loop(lc.max_iterations)
    m = state.map
    qslot = jnp.int32((num_kf - 1) % m.capacity_kf)
    cslot = jnp.int32(0)
    # a plausible constraint: the map's own T_cq, perturbed per
    # iteration (a few mm of "drift" for the solver to absorb — and the
    # varying operand keeps XLA from hoisting the solve, gotcha #3)
    from kbslam.geom.se3 import SE3
    rel = SE3(m.kf_q[cslot], m.kf_t[cslot]).inverse().compose(
        SE3(m.kf_q[qslot], m.kf_t[qslot]))
    rq, rt = rel.q, rel.t

    def close_scan(m, n):
        def body(acc, i):
            nm, stats = close(m, cslot, qslot, rq, rt + 2e-3 * (i + 1.0),
                              jnp.bool_(True))
            s = (jnp.sum(nm.kf_t) + jnp.sum(nm.kf_q) + stats.final_cost
                 + stats.accepted)
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n, dtype=jnp.float32))
        return acc

    Nc = 16
    close_scan_j = jax.jit(close_scan, static_argnums=(1,))
    _log("compiling close scan")
    np.asarray(close_scan_j(m, Nc))
    bestc = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(close_scan_j(m, Nc))
        bestc = min(bestc, (time.perf_counter() - t0) / Nc * 1e3)
    _log(f"pose-graph close: {bestc:.3f} ms per verified loop "
         f"({Nc}/dispatch, best of 5)")
    kf_rate = cfg.policy.min_frame_gap
    _log(f"amortized probe cost at one insertion per {kf_rate} frames: "
         f"{best / kf_rate:.3f} ms/frame")


if __name__ == "__main__":
    main()
