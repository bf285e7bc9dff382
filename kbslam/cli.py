"""Command-line entry point — the reference's `vo` executable + Makefile
`start` target (main.cpp, Makefile:14-16) as `python -m kbslam.cli`.

Sources:
  synthetic            rendered RGB-D with ground truth (default)
  tum:/path/to/seq     TUM RGB-D sequence directory
  zmq[:tcp://host:p]   live camera-manager stream (reference ingress)
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("kbslam")
    ap.add_argument("--source", default="synthetic")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--ba", choices=["on", "async", "off"], default="on")
    ap.add_argument("--global-ba", action="store_true",
                    help="run a full-map bundle adjustment at the end")
    ap.add_argument("--mask", action="store_true",
                    help="apply static-element masks (reference mask path)")
    ap.add_argument("--viewer", choices=["rerun", "none"], default="none")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--eval", action="store_true",
                    help="print ATE/RPE vs ground truth when available")
    ap.add_argument("--save-trajectory", default=None,
                    help="write TUM-format trajectory to this path")
    ap.add_argument("--save-checkpoint", default=None,
                    help="write the final SLAM state (npz) to this path")
    ap.add_argument("--resume", default=None,
                    help="resume from a checkpoint written by --save-checkpoint")
    ap.add_argument("--cull", action="store_true",
                    help="enable keyframe culling (disabled in the reference)")
    ap.add_argument("--dist", default=None,
                    help="comma-separated k1,k2,p1,p2,k3 lens distortion "
                    "(reference DistCoeffs; zmq handshake value used if unset)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="micro-batch N frames per device dispatch via the "
                    "chunked streaming executor (VO fast path; requires "
                    "--ba off). 0 = per-frame dispatch")
    ap.add_argument("--gray", action="store_true",
                    help="host-side grayscale ingress (1.6x fewer upload "
                    "bytes; only with --chunk)")
    args = ap.parse_args(argv)
    if args.chunk and args.ba != "off":
        ap.error("--chunk is the VO fast path: use it with --ba off")
    if args.gray and not args.chunk:
        ap.error("--gray requires --chunk")
    if args.chunk and (args.mask or args.viewer != "none"):
        ap.error("--chunk supports neither --mask nor --viewer yet")

    from kbslam.config import DEFAULT_CONFIG
    from kbslam.slam import SLAM
    from kbslam.viz.rerun_viewer import Viewer

    gts = []
    dist = ([float(c) for c in args.dist.split(",")]
            if args.dist else None)
    if args.source.startswith("tum:"):
        from kbslam.io.tum import TUMDataset

        ds = TUMDataset(args.source[4:])
        K = ds.K
        cfg = DEFAULT_CONFIG
        import dataclasses

        cfg = cfg.replace(map=dataclasses.replace(cfg.map,
                                                  depth_scale=ds.depth_scale))
        frames = iter(ds)
    elif args.source.startswith("zmq"):
        from kbslam.io.zmq_camera import ZMQCamera, DEFAULT_ENDPOINT

        ep = args.source[4:] if ":" in args.source else DEFAULT_ENDPOINT
        cam = ZMQCamera(ep or DEFAULT_ENDPOINT)
        K, zmq_dist = cam.get_intrinsics()
        if dist is None and zmq_dist is not None and np.any(zmq_dist):
            dist = zmq_dist
        cfg = DEFAULT_CONFIG

        def _gen():
            while True:
                f = cam.grab_frames()
                if f is None:
                    return
                yield f[0], f[1], f[2], None

        frames = _gen()
    elif args.source == "synthetic":
        from kbslam.io.synthetic import render_sequence

        seq = render_sequence(num_frames=args.frames, height=args.height,
                              width=args.width,
                              fx=525.0 * args.width / 640.0)
        K = seq.K
        cfg = DEFAULT_CONFIG
        frames = (
            (seq.rgb[i], seq.depth[i], seq.mask[i], seq.poses[i])
            for i in range(len(seq.rgb))
        )
    else:
        ap.error(f"unknown --source {args.source!r} "
                 "(expected synthetic | tum:<dir> | zmq[:<endpoint>])")

    if (args.height, args.width) != (cfg.image_height, cfg.image_width):
        cfg = cfg.replace(image_height=args.height, image_width=args.width)

    if args.cull:
        import dataclasses

        cfg = cfg.replace(cull=dataclasses.replace(cfg.cull, enabled=True))
    if args.chunk:
        _run_chunked(args, cfg, K, frames, dist)
        return

    mode = {"on": "on_keyframe", "async": "async", "off": "disabled"}[args.ba]
    slam = SLAM(cfg, K, ba_mode=mode, use_mask=args.mask, dist=dist)
    if args.resume:
        from kbslam.io.checkpoint import load_checkpoint

        slam.state, _ = load_checkpoint(args.resume, cfg)
    viewer = Viewer(spawn=True) if args.viewer == "rerun" else None

    n = 0
    for rgb, depth, mask, gt in frames:
        if n >= args.frames:
            break
        d = slam.process(rgb, depth, mask if args.mask else None)
        if gt is not None:
            gts.append(gt)
        if viewer is not None:
            traj = np.stack([T[:3, 3] for T in slam.frame_poses])
            viewer.update(traj, slam.keyframe_positions(), slam.map_points(),
                          rgb, depth, mask)
        if d["frame"] % 30 == 0:
            print(f"frame {d['frame']}: success={d['success']} "
                  f"kf={d['added_kf']} inliers={d['num_inliers']} "
                  f"{d['wall_ms']:.1f} ms", file=sys.stderr)
        n += 1

    if mode == "async":
        slam.finish()
    if args.global_ba:
        costs = slam.run_global_ba()
        print(f"global BA cost: {costs[0]:.2f} -> {costs[-1]:.2f}",
              file=sys.stderr)

    est = np.stack(slam.frame_poses)
    summary = dict(
        frames=n,
        success=sum(x["success"] for x in slam.diagnostics),
        keyframes=slam.num_keyframes,
        ba_runs=len(slam.ba_stats),
        mean_track_ms=float(np.mean([x["wall_ms"] for x in slam.diagnostics][1:]))
        if n > 1 else None,
    )
    if args.eval and len(gts) == n and n > 1:
        from kbslam.eval.trajectory import ate_rmse, rpe

        gt_arr = np.stack(gts)
        summary["ate_rmse_m"] = ate_rmse(est[:, :3, 3], gt_arr[:, :3, 3])
        t_err, r_err = rpe(est, gt_arr)
        summary["rpe_trans_m"] = t_err
        summary["rpe_rot_rad"] = r_err
    if args.save_checkpoint:
        from kbslam.io.checkpoint import save_checkpoint

        save_checkpoint(args.save_checkpoint, slam.state,
                        trajectory=slam.frame_poses)
    if args.save_trajectory:
        with open(args.save_trajectory, "w") as f:
            for i, T in enumerate(est):
                from scipy.spatial.transform import Rotation

                q = Rotation.from_matrix(T[:3, :3]).as_quat()
                f.write(f"{i} {T[0,3]} {T[1,3]} {T[2,3]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    print(json.dumps(summary))


def _run_chunked(args, cfg, K, frames, dist):
    """VO via the chunked streaming executor (kbslam/streaming.py):
    N frames per device dispatch with double-buffered uploads — the
    throughput ingress mode bench.py measures, on the CLI surface."""
    import time

    from kbslam.geom.camera import Intrinsics
    from kbslam.pipeline import init_state
    from kbslam.slam import _quat_to_matrix_np
    from kbslam.streaming import ChunkedStream

    intr = Intrinsics.from_matrix(K, dist=dist)
    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=args.chunk,
                       gray=args.gray)
    results, gts = [], []
    n = 0
    t0 = time.perf_counter()
    for rgb, depth, mask, gt in frames:
        if n >= args.frames:
            break
        results += cs.feed(rgb, depth)
        if gt is not None:
            gts.append(gt)
        n += 1
    results += cs.flush()
    wall = time.perf_counter() - t0

    est = []
    for r in results:
        T = np.eye(4)
        T[:3, :3] = _quat_to_matrix_np(r["pose_q"])
        T[:3, 3] = r["pose_t"]
        est.append(T)
    est = np.stack(est) if est else np.zeros((0, 4, 4))
    summary = dict(
        frames=n,
        success=sum(r["success"] for r in results),
        keyframes=int(np.sum([r["added_kf"] for r in results])),
        chunk=args.chunk,
        gray_ingress=bool(args.gray),
        streaming_fps=round(n / wall, 1) if wall > 0 else None,
    )
    if args.eval and len(gts) == n and n > 1:
        from kbslam.eval.trajectory import ate_rmse, rpe

        gt_arr = np.stack(gts)
        summary["ate_rmse_m"] = ate_rmse(est[:, :3, 3], gt_arr[:, :3, 3])
        t_err, r_err = rpe(est, gt_arr)
        summary["rpe_trans_m"] = t_err
        summary["rpe_rot_rad"] = r_err
    if args.save_trajectory:
        from scipy.spatial.transform import Rotation

        with open(args.save_trajectory, "w") as f:
            for i, T in enumerate(est):
                q = Rotation.from_matrix(T[:3, :3]).as_quat()
                f.write(f"{i} {T[0,3]} {T[1,3]} {T[2,3]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
