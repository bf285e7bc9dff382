#!/usr/bin/env python
"""Root-cause the async-BA streaming collapse (VERDICT r3 weak #2).

BENCH_r03: streaming 101.9 FPS -> 43.4 FPS when 2 chunk-late async BA
solves run concurrently. The design claim (streaming.py) is that BA
overlaps tracking via JAX async dispatch; a 2.3x drop from two solves
says something serializes. This instruments the feed loop per call:
which feeds dispatched a chunk, which dispatched/merged BA, and what
each cost in wall time — so the serialization point is measurable, not
guessed.

Run on real TPU: python benchmarks/exp_async_ba.py
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
from kbslam.io.synthetic import render_sequence
from kbslam.pipeline import init_state, make_track_step
from kbslam.streaming import ChunkedStream


def _log(m):
    print(f"[async_ba {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def load_seq():
    cache = "/tmp/kbslam_bench_seq_v1.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["rgb"], z["depth"], z["K"]
    seq = render_sequence(num_frames=12, height=480, width=640, fx=525.0)
    np.savez(cache, rgb=seq.rgb, depth=seq.depth, K=seq.K)
    return seq.rgb, seq.depth, seq.K


def run_stream(cfg, intr, state, host_rgb, host_dep, n, C, ba_mode,
               label):
    cs = ChunkedStream(cfg, intr, state, chunk=C, gray=True, ba_mode=ba_mode)
    t_all0 = time.perf_counter()
    feeds = []
    for i in range(n):
        t0 = time.perf_counter()
        nbef = len(cs.ba_stats)
        infl_bef = cs._ba_inflight is not None
        cs.feed(host_rgb[i % len(host_rgb)], host_dep[i % len(host_dep)])
        dt = (time.perf_counter() - t0) * 1e3
        feeds.append(dict(
            i=i, ms=round(dt, 2),
            chunk_dispatch=(i % C == C - 1),
            ba_dispatched=(not infl_bef and cs._ba_inflight is not None),
            ba_merged=(len(cs.ba_stats) > nbef),
        ))
    t0 = time.perf_counter()
    cs.flush()
    flush_ms = (time.perf_counter() - t0) * 1e3
    total = time.perf_counter() - t_all0
    fps = n / total
    slow = [f for f in feeds if f["ms"] > 3.0]
    _log(f"{label}: {fps:.1f} FPS, flush {flush_ms:.0f} ms, "
         f"ba_runs={len(cs.ba_stats)}; slow feeds (>3ms): "
         + " ".join(
             f"[{f['i']}{'C' if f['chunk_dispatch'] else ''}"
             f"{'B' if f['ba_dispatched'] else ''}"
             f"{'M' if f['ba_merged'] else ''} {f['ms']}]" for f in slow))
    return fps, len(cs.ba_stats), cs.state


def main():
    rgb, dep, K = load_seq()
    n_render = len(rgb)
    order = list(range(n_render)) + list(range(n_render - 2, 0, -1))
    host_rgb = [np.ascontiguousarray(rgb[j]) for j in order]
    host_dep = [np.ascontiguousarray(dep[j]) for j in order]
    cfg = DEFAULT_CONFIG
    intr = Intrinsics.from_matrix(K)

    # build a mature map first (tracking from scratch inserts KFs rapidly)
    _log("warm tracking state")
    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    state = init_state(cfg)
    for i in range(40):
        j = order[i % len(order)]
        state, out = step(state, jnp.asarray(rgb[j]), jnp.asarray(dep[j]))
    jax.block_until_ready(out)

    C, n = 16, 96
    # compile warmup for both modes (includes one BA solve + merge)
    _log("compile warmup")
    cs = ChunkedStream(cfg, intr, state, chunk=C, gray=True, ba_mode="async")
    for i in range(3 * C):
        cs.feed(host_rgb[i % len(order)], host_dep[i % len(order)])
    cs.flush()
    assert len(cs.ba_stats) >= 1, "warmup never ran BA (no compile warm)"
    state = cs.state

    # PAIRED reps: the tunnel's congestion swings no-BA itself 36-102
    # FPS across minutes, so unpaired best-of compares different link
    # windows. Alternating off/async back-to-back samples ~the same
    # window per pair; the median per-pair ratio is the honest overlap
    # metric.
    results = {"no_ba_fps": [], "async_ba_fps": [], "ba_runs": [],
               "pair_ratio": []}
    for rep in range(5):
        fps_off, _, state = run_stream(cfg, intr, state, host_rgb, host_dep,
                                       n, C, "off", f"no-BA rep{rep}")
        fps_ba, runs, state = run_stream(cfg, intr, state, host_rgb,
                                         host_dep, n, C, "async",
                                         f"async-BA rep{rep}")
        results["no_ba_fps"].append(round(fps_off, 1))
        results["async_ba_fps"].append(round(fps_ba, 1))
        results["ba_runs"].append(runs)
        results["pair_ratio"].append(round(fps_ba / fps_off, 3))
    results["ratio_median_paired"] = round(
        float(np.median(results["pair_ratio"])), 3)
    results["ratio_best"] = round(
        max(results["async_ba_fps"]) / max(results["no_ba_fps"]), 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
