#!/usr/bin/env python
"""Global-BA stress benchmark — BASELINE.json config 5:
200 keyframes / 50k landmarks, camera-sharded PCG on TPU.

Generates a structured synthetic problem (each camera observes a
sliding window of the landmark field — realistic co-visibility), runs
damped Gauss-Newton steps of kbslam.ba.global_ba, and prints one JSON
line with cost trajectory and per-step wall time (hard-barriered).
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

if os.environ.get("STRESS_PLATFORM"):
    # CLAUDE.md gotcha #1: the JAX_PLATFORMS env var is pinned by a
    # sitecustomize; only jax.config.update before backend init wins.
    jax.config.update("jax_platforms", os.environ["STRESS_PLATFORM"])

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from scipy.spatial.transform import Rotation

from kbslam.ba.global_ba import GlobalBAData, global_ba_solve
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_problem(n_cams=200, n_pts=50_000, obs_per_cam=512, noise=0.01,
                  seed=0):
    rng = np.random.default_rng(seed)
    fx = fy = 500.0
    cx = cy = 320.0
    intr = Intrinsics.create(fx, fy, cx, cy)

    # landmark field along a corridor; cameras sweep past it
    pts = np.stack([
        np.linspace(0, 100, n_pts) + rng.normal(0, 0.1, n_pts),
        rng.uniform(-3, 3, n_pts),
        rng.uniform(4, 8, n_pts),
    ], axis=1).astype(np.float32)

    cam_q, cam_t, obs_uv, mp_id, active = [], [], [], [], []
    for i in range(n_cams):
        t = np.array([100.0 * i / n_cams, 0.0, 0.0], np.float32)
        R = Rotation.from_rotvec([0, 0.002 * i, 0]).as_matrix().astype(np.float32)
        # visible landmarks: window around the camera's x position
        center = int(n_pts * i / n_cams)
        cand = rng.choice(np.arange(max(0, center - 2000),
                                    min(n_pts, center + 2000)),
                          size=obs_per_cam, replace=False)
        pc = (pts[cand] - t) @ R
        uv = np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                       fy * pc[:, 1] / pc[:, 2] + cy], -1)
        ok = (pc[:, 2] > 0.5)
        # noisy initial poses except the gauge camera
        Rn, tn = R, t
        if i > 0:
            dR = Rotation.from_rotvec(rng.normal(scale=noise, size=3)).as_matrix()
            Rn = (R @ dR).astype(np.float32)
            tn = t + rng.normal(scale=noise, size=3).astype(np.float32)
        T = SE3.from_rotation_translation(jnp.asarray(Rn), jnp.asarray(tn))
        cam_q.append(np.asarray(T.q))
        cam_t.append(np.asarray(T.t))
        obs_uv.append(uv.astype(np.float32))
        mp_id.append(cand.astype(np.int32))
        active.append(ok)

    P_cap = n_pts
    mp_pos = pts + rng.normal(scale=noise, size=pts.shape).astype(np.float32)
    mp_pos[0] = pts[0]  # scale anchor at truth
    cam_free = np.ones(n_cams, bool)
    cam_free[0] = False
    data = GlobalBAData(
        cam_q=jnp.asarray(np.stack(cam_q)),
        cam_t=jnp.asarray(np.stack(cam_t)),
        obs_uv=jnp.asarray(np.stack(obs_uv)),
        mp_id=jnp.asarray(np.stack(mp_id)),
        active=jnp.asarray(np.stack(active)),
        w_z=jnp.ones((n_cams, obs_per_cam), jnp.float32),
        z_meas=jnp.zeros((n_cams, obs_per_cam), jnp.float32),
        w_d=jnp.zeros((n_cams, obs_per_cam), jnp.float32),
        cam_free=jnp.asarray(cam_free),
        mp_pos=jnp.asarray(mp_pos),
        anchor_mp=jnp.int32(0),
    )
    return data, intr, pts


def main():
    n_cams = int(os.environ.get("STRESS_CAMS", "200"))
    n_pts = int(os.environ.get("STRESS_PTS", "50000"))
    steps = int(os.environ.get("STRESS_STEPS", "4"))
    data, intr, gt = build_problem(n_cams=n_cams, n_pts=n_pts)
    n_dev = int(os.environ.get("STRESS_DEVICES", "1"))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("stream",))
    shard = NamedSharding(mesh, P("stream"))
    rep = NamedSharding(mesh, P())
    data = GlobalBAData(
        *[jax.device_put(x, shard) for x in data[:9]],
        jax.device_put(data.mp_pos, rep),
        jax.device_put(data.anchor_mp, rep),
    )

    landmark_sharded = os.environ.get("STRESS_LM_SHARDED", "0") == "1"
    # cap 25 = the round-3 fixed trip count, for comparable per-round
    # walls; with the warm-started damping later rounds legitimately
    # want deeper PCG solves (the trust region loosens as lambda
    # shrinks), so an uncapped run trades round time for a much lower
    # cost floor (measured: cap 40 reaches cost 4.6 by round 3 at
    # 0.11-0.12 s/round; per PCG iteration ~2.5-3 ms either way)
    pcg_cap = int(os.environ.get("STRESS_PCG_CAP", "25"))
    pcg_tol = float(os.environ.get("STRESS_PCG_TOL", "1e-2"))

    # warm/compile one round, then time ALL remaining LM rounds in ONE
    # dispatch: per-round calls each pay the ~25-80 ms tunnel dispatch
    # RTT on top of device time (CLAUDE.md gotcha #11), which dominated
    # the per-round numbers. Each round = linearize once + damping
    # retries with early-stopped PCG on the cached NE.
    data, costs0, stats0 = global_ba_solve(
        data, intr, mesh, iters=1, pcg_iters=pcg_cap, pcg_tol=pcg_tol,
        landmark_sharded=landmark_sharded, return_stats=True)
    float(np.asarray(costs0[-1]))  # barrier
    costs = [round(float(c), 1) for c in np.asarray(costs0)]
    pcg_used = [int(stats0.pcg_iters[0])]
    retries = [int(stats0.retries[0])]
    lam = float(stats0.lam[-1])  # warm-start damping across calls
    # compile the iters=steps program untimed (outputs discarded; the
    # solve is pure so `data` is unchanged)
    _, _cs, _ = global_ba_solve(
        data, intr, mesh, iters=steps, pcg_iters=pcg_cap, pcg_tol=pcg_tol,
        init_damping=lam,
        landmark_sharded=landmark_sharded, return_stats=True)
    float(np.asarray(_cs[-1]))
    t0 = time.perf_counter()
    data, cs, st = global_ba_solve(
        data, intr, mesh, iters=steps, pcg_iters=pcg_cap, pcg_tol=pcg_tol,
        init_damping=lam,
        landmark_sharded=landmark_sharded, return_stats=True)
    float(np.asarray(cs[-1]))  # hard barrier
    total = time.perf_counter() - t0
    times = [total / steps] * steps
    costs += [round(float(c), 1) for c in np.asarray(cs[1:])]
    pcg_used += [int(x) for x in np.asarray(st.pcg_iters)]
    retries += [int(x) for x in np.asarray(st.retries)]
    print(f"{steps} rounds in one dispatch: {total:.2f}s total, "
          f"{total / steps * 1e3:.0f} ms/round, pcg={pcg_used[1:]}, "
          f"costs={costs[-steps:]}", file=sys.stderr)

    # collective wire bytes PER DEVICE, ring-algorithm estimates from the
    # static shapes x the measured iteration counts (allreduce moves
    # ~2(n-1)/n x bytes; reduce_scatter / all_gather ~(n-1)/n each):
    # per PCG iter: [P,3] f32 reduction (+ gather in the sharded variant,
    # bytes-equivalent); per retry: damped-NE inverse gather (sharded
    # only); per round: H_pp/b_p/p_act reduction + backsub.
    f = (n_dev - 1) / max(n_dev, 1)
    P3, P33 = 12 * n_pts, 36 * n_pts
    it_total = sum(pcg_used[1:]) or pcg_used[0]
    rt_total = sum(retries[1:]) or retries[0]
    rounds = max(len(times), 1)
    if landmark_sharded:
        traffic = (it_total * 2 * f * P3            # scatter+gather / iter
                   + rt_total * f * (P3 + P33)      # Hib + Hpp_inv gathers
                   + rounds * f * (P33 + P3 + 4 * n_pts)  # NE scatter
                   + rounds * 2 * f * P3)           # backsub scatter+gather
    else:
        traffic = (it_total * 2 * f * P3            # psum / iter
                   + rounds * 2 * f * (P33 + P3 + 4 * n_pts)  # NE psum
                   + rounds * 2 * f * P3)           # backsub psum
    err = np.linalg.norm(np.asarray(data.mp_pos) - gt, axis=1)
    print(json.dumps({
        "metric": "global_ba_stress_step_seconds",
        "value": round(min(times) if times else 0.0, 3),
        "unit": "s/GN-round",
        "vs_baseline": None,
        "extra": {
            "cams": n_cams, "landmarks": n_pts,
            "devices": n_dev,
            "landmark_sharded": landmark_sharded,
            "pcg_cap": pcg_cap, "pcg_tol": pcg_tol,
            "pcg_iters_per_round": pcg_used,
            "retries_per_round": retries,
            "cost_trajectory": costs,
            "collective_MB_per_device_total": round(traffic / 1e6, 2),
            "landmark_median_err_m": round(float(np.median(err)), 5),
        },
    }))


if __name__ == "__main__":
    main()
