#!/usr/bin/env python
"""Close the NK=1 VO accuracy gap vs the cv2 oracle (round 4).

With track_keyframes=1 (reference-parity matching, the new default) our
VO-only ATE runs ~1.23-1.30x the cv2 oracle on the 240x320 plane scenes
(oracle [13.43, 16.06, 15.39] mm; ours [17.52, 20.0, 18.9]). At NK=3
we BEAT the oracle (~0.98x), so the deficit is not the frontend — it is
conditioning of the single-keyframe PnP (fewer correspondences, shorter
baselines) interacting with the RANSAC/refinement budget that was tuned
at NK=3. This sweeps the PnP budget knobs at NK=1 against the known
oracle numbers. Tracking runs on whatever platform JAX gives (TPU is
fastest; accuracy is platform-independent).
"""
import dataclasses
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

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.eval.trajectory import ate_rmse
from kbslam.io.synthetic import render_sequence
from kbslam.pipeline import init_state, make_track_step
from kbslam.geom.camera import Intrinsics
from kbslam.slam import pose_T


def _log(m):
    print(f"[nk1gap {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def _cfg240(**pnp_kw):
    return SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128, **pnp_kw),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )


def vo_ate(cfg, seq):
    intr = Intrinsics.from_matrix(seq.K)
    step = make_track_step(cfg, intr, use_mask=False, auto_key=True)
    st = init_state(cfg)
    poses = []
    for i in range(len(seq.rgb)):
        st, out = step(st, jnp.asarray(seq.rgb[i]), jnp.asarray(seq.depth[i]))
        o = jax.device_get(out)
        poses.append(pose_T(np.asarray(o.pose_q), o.pose_t))
    est = np.stack(poses)
    return ate_rmse(est[:, :3, 3], seq.poses[:, :3, 3])


def main():
    seqs = [render_sequence(num_frames=40, height=240, width=320, seed=s)
            for s in range(3)]
    oracle = [13.43, 16.06, 15.39]  # cv2 ReferenceVO, tests/test_parity

    variants = {
        "nk1_base": {},
        "refine6": dict(refine_iters=6),
        "hyp256": dict(num_hypotheses=256),
        "polish4": dict(polish_iters=4),
        "refine6_hyp256": dict(refine_iters=6, num_hypotheses=256),
        "refine10": dict(refine_iters=10),
        "thresh4": dict(reproj_threshold=4.0),
        "refine6_thresh4": dict(refine_iters=6, reproj_threshold=4.0),
    }
    results = {}
    for name, kw in variants.items():
        kw2 = dict(kw)
        hyp = kw2.pop("num_hypotheses", 128)
        cfg = _cfg240(**kw2)
        cfg = cfg.replace(pnp=dataclasses.replace(cfg.pnp,
                                                  num_hypotheses=hyp))
        ates = [vo_ate(cfg, seq) * 1e3 for seq in seqs]
        ratios = [a / o for a, o in zip(ates, oracle)]
        results[name] = dict(ate_mm=[round(a, 2) for a in ates],
                             ratio=[round(r, 3) for r in ratios])
        _log(f"{name:18s} {results[name]}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
