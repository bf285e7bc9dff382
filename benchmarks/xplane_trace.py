#!/usr/bin/env python
"""Op-level TPU trace of the tracking step -> per-frame floor table.

Runs the full scanned track step under jax.profiler.trace, parses the
captured .xplane.pb directly with tensorflow.tsl's xplane_pb2 (the
tensorboard profile plugin's converter is broken against the installed
TF — CLAUDE.md), aggregates op durations on the TPU device plane, and
prints ms/frame per op (top N) plus the total. This is the
ground-truth stage accounting the VERDICT asked for: micro-benchmarks
carry a 0.1-0.3 ms harness floor and congestion noise; the trace's op
totals do not.

Usage: python benchmarks/xplane_trace.py [top_n]
"""
import glob
import json
import os
import sys
import time
from collections import defaultdict

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
from kbslam.pipeline import init_state, make_track_step, track_step


def _log(m):
    print(f"[xplane {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def run_traced(n_frames=220, trace_dir="/tmp/kbslam_xplane"):
    cfg = DEFAULT_CONFIG
    z = np.load("/tmp/kbslam_bench_seq_v1.npz")
    intr = Intrinsics.from_matrix(z["K"])
    order = list(range(12)) + list(range(10, 0, -1))
    reps = max(1, n_frames // len(order))
    rgb = jnp.asarray(np.stack([z["rgb"][j] for j in order * reps]))
    dep = jnp.asarray(np.stack([z["depth"][j] for j in order * reps]))
    T = rgb.shape[0]

    def body(st, xs):
        r, d = xs
        key = jax.random.fold_in(jax.random.PRNGKey(0), st.frame_count)
        st, o = track_step(st, r, d, None, key, intr, cfg)
        return st, o.num_inliers

    @jax.jit
    def scan(st, rgb, dep):
        return jax.lax.scan(body, st, (rgb, dep))

    st = init_state(cfg)
    st, ninl = scan(st, rgb, dep)
    np.asarray(ninl)  # compile + warm
    _log(f"tracing {T} frames")
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    st, ninl = scan(st, rgb, dep)
    np.asarray(ninl)
    jax.profiler.stop_trace()
    return T, trace_dir


def parse(trace_dir, n_frames, top_n=30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert pbs, f"no xplane.pb under {trace_dir}"
    totals = defaultdict(float)   # op name -> total us
    counts = defaultdict(int)
    device_total = 0.0
    for pb in pbs:
        xs = xplane_pb2.XSpace()
        with open(pb, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name or "XLA Op" in plane.name:
                continue
            stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # XLA Modules line double-counts its children; op lines
                # are named like "XLA Ops" / per-core streams
                if "Module" in line.name or "Step" in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur_us = ev.duration_ps / 1e6
                    totals[name] += dur_us
                    counts[name] += 1
                    device_total += dur_us
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    out = {
        "frames": n_frames,
        "device_total_ms_per_frame": round(device_total / 1e3 / n_frames, 4),
        "ops": [
            {"op": k, "ms_per_frame": round(v / 1e3 / n_frames, 4),
             "count": counts[k]}
            for k, v in rows
        ],
    }
    return out


def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    T, d = run_traced()
    out = parse(d, T, top_n)
    for r in out["ops"]:
        _log(f"{r['ms_per_frame']:8.4f} ms  x{r['count']:6d}  {r['op'][:90]}")
    _log(f"device total: {out['device_total_ms_per_frame']} ms/frame")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
