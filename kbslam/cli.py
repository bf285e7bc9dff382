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


def _export_mesh(mesh, path, summary, viewer=None):
    """--save-mesh: write the isosurface mesh as binary PLY with vertex
    normals (mapping/mesh.py); with a live viewer, log it once under
    /world/dense/mesh (meshing is host-side — end-of-run only, not the
    keyframe cadence)."""
    from kbslam.mapping.mesh import save_ply, vertex_normals

    normals = vertex_normals(mesh)
    save_ply(path, mesh, normals)
    if viewer is not None:
        viewer.update_dense_mesh(mesh, normals)
    summary["mesh_vertices"] = len(mesh.vertices)
    summary["mesh_faces"] = len(mesh.faces)


def main(argv=None):
    # persistent XLA compile cache: every CLI invocation is a fresh
    # process, and first compiles through the tunneled TPU runtime cost
    # minutes (CLAUDE.md gotcha #9) — cache them across runs
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/kbslam_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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
    ap.add_argument("--loop", action="store_true",
                    help="enable loop closure (place recognition + "
                    "pose-graph correction; capability extension — the "
                    "reference has none). Works per-frame and chunked "
                    "(--chunk: probes run chunk-late)")
    ap.add_argument("--reloc", type=int, default=0, metavar="N",
                    help="relocalize after N consecutive tracking "
                    "failures (0 = reference behavior: lost forever). "
                    "Works per-frame and chunked (--chunk: the probe "
                    "runs chunk-late on the drained fail streak; "
                    "re-anchoring lands from the next chunk boundary)")
    ap.add_argument("--cull", action="store_true",
                    help="enable keyframe culling (disabled in the reference)")
    ap.add_argument("--dense", action="store_true",
                    help="fuse keyframe depth into a dense TSDF volume "
                    "(capability extension — the reference's world model "
                    "is sparse landmarks only). Works per-frame and "
                    "chunked (--chunk: fusion runs chunk-late)")
    ap.add_argument("--save-surface", default=None, metavar="PATH.npy",
                    help="write the TSDF zero-crossing point cloud "
                    "(requires --dense)")
    ap.add_argument("--save-mesh", default=None, metavar="PATH.ply",
                    help="write the TSDF isosurface as a welded triangle "
                    "mesh with vertex normals, binary PLY (requires "
                    "--dense)")
    ap.add_argument("--dense-submaps", type=int, default=0, metavar="K",
                    help="dense submapping: open a new TSDF submap every "
                    "K keyframe insertions, each anchored to its keyframe "
                    "— the dense model then FOLLOWS BA/loop-closure pose "
                    "corrections at extraction time (requires --dense; "
                    "0 = one monolithic world-frame volume)")
    ap.add_argument("--dense-icp", choices=["off", "rescue", "refine"],
                    default="off",
                    help="frame-to-model dense tracking against the TSDF "
                    "(requires --dense, per-frame path only): 'rescue' "
                    "re-acquires the pose from geometry when PnP fails; "
                    "'refine' additionally polishes successful poses. "
                    "With --dense-submaps the model is the newest "
                    "submaps re-posed by their BA/loop-corrected "
                    "anchors, and 'refine' accepts only against submaps "
                    "the current tracking did not build (independent-"
                    "evidence gate)")
    ap.add_argument("--dist", default=None,
                    help="comma-separated k1,k2,p1,p2,k3 lens distortion "
                    "(reference DistCoeffs; zmq handshake value used if unset)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="micro-batch N frames per device dispatch via the "
                    "chunked streaming executor. Works with --ba off (VO) "
                    "and --ba async (concurrent chunk-late local BA). "
                    "0 = per-frame dispatch")
    ap.add_argument("--gray", action="store_true",
                    help="host-side grayscale ingress (1.6x fewer upload "
                    "bytes; only with --chunk)")
    ap.add_argument("--depth-edge-rel", type=float, default=0.0,
                    metavar="R",
                    help="range-aware rim-gate term: spread threshold "
                    "= max(0.15, R*z^2). Set ~4x the sensor's sigma1 "
                    "(0.02 for 5mm@1m) on long-range scenes, where the "
                    "absolute-only gate zeroes all far depth (see "
                    "MapConfig.depth_edge_rel_per_m2). 0 = off")
    ap.add_argument("--viewer-every", type=int, default=0,
                    help="decimate viewer updates to every Nth frame "
                    "(0 = every frame on the per-frame path, once per "
                    "chunk on the chunked path)")
    args = ap.parse_args(argv)
    if args.chunk and args.ba == "on":
        ap.error("--chunk batches frames per dispatch, so synchronous "
                 "per-keyframe BA cannot interleave: use --ba async "
                 "(chunk-late concurrent BA) or --ba off")
    if args.gray and not args.chunk:
        ap.error("--gray requires --chunk")

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
                try:
                    f = cam.grab_frames()
                except TimeoutError as e:
                    # publisher stall: end the stream gracefully so the
                    # accumulated trajectory/summary is still reported
                    # (the reference would block forever in GrabFrames;
                    # crashing mid-run would lose everything)
                    print(f"kbslam: camera timeout ({e}); ending stream",
                          file=sys.stderr)
                    return
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
    if args.depth_edge_rel > 0:
        import dataclasses

        cfg = cfg.replace(map=dataclasses.replace(
            cfg.map, depth_edge_rel_per_m2=args.depth_edge_rel))
    if args.loop or args.reloc:
        import dataclasses

        cfg = cfg.replace(loop=dataclasses.replace(
            cfg.loop, enabled=bool(args.loop), reloc_after=args.reloc))
    if args.dense or args.save_surface or args.save_mesh:
        import dataclasses

        if not args.dense:
            ap.error("--save-surface/--save-mesh require --dense")
        cfg = cfg.replace(dense=dataclasses.replace(cfg.dense,
                                                    enabled=True))
    if args.dense_submaps:
        import dataclasses

        if not args.dense:
            ap.error("--dense-submaps requires --dense")
        cfg = cfg.replace(dense=dataclasses.replace(
            cfg.dense, submap_every=args.dense_submaps))
    if args.dense_icp != "off":
        import dataclasses

        if not args.dense:
            ap.error("--dense-icp requires --dense (the TSDF volume is "
                     "the model)")
        if args.chunk:
            ap.error("--dense-icp runs on the per-frame path only "
                     "(rescue must intervene on the frame that failed; "
                     "chunked tracking has already committed the chunk)")
        cfg = cfg.replace(dense_icp=dataclasses.replace(
            cfg.dense_icp, mode=args.dense_icp))
    if args.chunk:
        _run_chunked(args, cfg, K, frames, dist)
        return

    mode = {"on": "on_keyframe", "async": "async", "off": "disabled"}[args.ba]
    slam = SLAM(cfg, K, ba_mode=mode, use_mask=args.mask, dist=dist)
    if args.resume:
        from kbslam.io.checkpoint import load_checkpoint

        slam.state, _ = load_checkpoint(args.resume, cfg)
        if args.dense and args.dense_submaps:
            from kbslam.io.checkpoint import load_checkpoint_atlas

            atlas, kf_ins = load_checkpoint_atlas(args.resume, cfg)
            if atlas is not None:
                slam.atlas = atlas
                slam._kf_insertions = kf_ins
            else:
                print("warning: checkpoint has no submap atlas — the "
                      "dense map restarts empty and will only cover "
                      "post-resume keyframes", file=sys.stderr)
        elif args.dense:
            from kbslam.io.checkpoint import load_checkpoint_tsdf

            tsdf = load_checkpoint_tsdf(args.resume, cfg)
            if tsdf is not None:
                slam.tsdf = tsdf
            else:
                print("warning: checkpoint has no TSDF volume — the "
                      "dense map restarts empty and will only cover "
                      "post-resume keyframes", file=sys.stderr)
    viewer = Viewer(spawn=True) if args.viewer == "rerun" else None

    n = 0
    for rgb, depth, mask, gt in frames:
        if n >= args.frames:
            break
        d = slam.process(rgb, depth, mask if args.mask else None)
        if gt is not None:
            gts.append(gt)
        if viewer is not None and (not args.viewer_every
                                   or n % args.viewer_every == 0):
            traj = np.stack([T[:3, 3] for T in slam.frame_poses])
            viewer.update(traj, slam.keyframe_positions(), slam.map_points(),
                          rgb, depth, mask)
        # dense cloud updates ride the KEYFRAME cadence, not the
        # --viewer-every phase: insertions rarely align with the
        # decimation grid and the cloud only changes on fusion
        if viewer is not None and args.dense and d["added_kf"]:
            viewer.update_dense(slam.dense_surface()[0])
            # model-predicted view next to the live depth feed
            # (/camera/0/rendered; same raw units -> same JET ramp)
            r = slam.render_view(stride=4)
            if r is not None:
                viewer.update_rendered(
                    np.asarray(r.depth) / cfg.map.depth_scale)
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
    if args.loop:
        summary["loop_closures"] = len(slam.loop_events)
    if args.reloc:
        summary["relocalizations"] = len(slam.reloc_events)
    if args.dense_icp != "off":
        ev = slam.icp_events
        summary["icp_rescues"] = sum(
            1 for e in ev if e["mode"] == "rescue" and e["accepted"])
        summary["icp_refines"] = sum(
            1 for e in ev if e["mode"] == "refine" and e["accepted"])
    if args.dense:
        pts, res = slam.dense_surface()
        vol = slam.tsdf if slam.tsdf is not None else slam.atlas
        summary["tsdf_observed_voxels"] = int(
            (np.asarray(vol.weight) > 0).sum())
        summary["tsdf_surface_points"] = len(pts)
        if slam.atlas is not None:
            summary["tsdf_submaps"] = int(min(int(slam.atlas.count),
                                              slam.atlas.capacity))
        # map-quality metric: rendered-vs-observed depth at the last
        # keyframe (mapping/raycast.render_consistency)
        rc = slam.map_consistency()
        if rc is not None:
            summary["render_consistency"] = rc
        if args.save_surface:
            np.save(args.save_surface, pts)
        if args.save_mesh:
            _export_mesh(slam.dense_mesh(), args.save_mesh, summary,
                         viewer)
    if args.eval and len(gts) == n and n > 1:
        from kbslam.eval.trajectory import ate_rmse, rpe

        gt_arr = np.stack(gts)
        summary["ate_rmse_m"] = ate_rmse(est[:, :3, 3], gt_arr[:, :3, 3])
        # refinement helps whenever ANY solver touched the keyframes —
        # per-keyframe local BA or the end-of-run --global-ba solve
        if mode != "disabled" or args.global_ba:
            refn = slam.refined_trajectory()
            summary["ate_rmse_refined_m"] = ate_rmse(refn[:, :3, 3],
                                                     gt_arr[:, :3, 3])
        t_err, r_err = rpe(est, gt_arr)
        summary["rpe_trans_m"] = t_err
        summary["rpe_rot_rad"] = r_err
    if args.save_checkpoint:
        from kbslam.io.checkpoint import save_checkpoint

        rc = summary.get("render_consistency")
        save_checkpoint(args.save_checkpoint, slam.state,
                        trajectory=slam.frame_poses, tsdf=slam.tsdf,
                        atlas=slam.atlas,
                        kf_insertions=slam._kf_insertions,
                        meta=({f"render_consistency_{k}": v
                               for k, v in rc.items()} if rc else None))
    if args.save_trajectory:
        with open(args.save_trajectory, "w") as f:
            for i, T in enumerate(est):
                from scipy.spatial.transform import Rotation

                q = Rotation.from_matrix(T[:3, :3]).as_quat()
                f.write(f"{i} {T[0,3]} {T[1,3]} {T[2,3]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    print(json.dumps(summary))


def _run_chunked(args, cfg, K, frames, dist):
    """Tracking via the chunked streaming executor (kbslam/streaming.py):
    N frames per device dispatch with double-buffered uploads — the
    throughput ingress mode bench.py measures, on the CLI surface.
    --ba async overlaps chunk-late local BA solves with tracking (the
    reference's detached BA thread, main.cpp:40-47)."""
    import time

    from kbslam.geom.camera import Intrinsics
    from kbslam.pipeline import init_state
    from kbslam.slam import (pose_T, map_keyframe_positions,
                             map_point_positions)
    from kbslam.streaming import ChunkedStream
    from kbslam.viz.rerun_viewer import Viewer

    intr = Intrinsics.from_matrix(K, dist=dist)
    state = init_state(cfg)
    if args.resume:
        from kbslam.io.checkpoint import load_checkpoint

        state, _ = load_checkpoint(args.resume, cfg)
    cs = ChunkedStream(cfg, intr, state, chunk=args.chunk,
                       gray=args.gray, use_mask=args.mask,
                       ba_mode="async" if args.ba == "async" else "off")
    if args.resume and args.dense and args.dense_submaps:
        from kbslam.io.checkpoint import load_checkpoint_atlas

        _atlas, _kf_ins = load_checkpoint_atlas(args.resume, cfg)
        if _atlas is not None:
            cs.atlas = _atlas
            cs._kf_insertions = _kf_ins
            # count of opened submaps and the active anchor, recovered
            # from the atlas itself (same derivation the per-frame
            # shell's checkpoint path uses)
            cs._submaps_opened = int(_atlas.count)
            s = int(_atlas.active_slot())
            cs._active_anchor_kid = int(_atlas.anchor_kf_id[s])
        else:
            print("warning: checkpoint has no submap atlas — the "
                  "dense map restarts empty and will only cover "
                  "post-resume keyframes", file=sys.stderr)
    elif args.resume and args.dense:
        from kbslam.io.checkpoint import load_checkpoint_tsdf

        _tsdf = load_checkpoint_tsdf(args.resume, cfg)
        if _tsdf is not None:
            cs.tsdf = _tsdf
        else:
            print("warning: checkpoint has no TSDF volume — the dense "
                  "map restarts empty and will only cover post-resume "
                  "keyframes", file=sys.stderr)
    viewer = Viewer(spawn=True) if args.viewer == "rerun" else None
    view_every = args.viewer_every or args.chunk
    frame_buf = {}  # frame index -> (rgb, depth, mask) for viewer readout
    traj = []
    last_dense = -10**9  # frame of the last dense viewer extraction

    def _view(drained):
        nonlocal last_dense
        for r in drained:
            traj.append(r["pose_t"])
            if viewer is not None and r["frame"] % view_every == 0:
                rgb_v, dep_v, msk_v = frame_buf[r["frame"]]
                m = cs.state.map
                viewer.update(np.stack(traj), map_keyframe_positions(m),
                              map_point_positions(m), rgb_v, dep_v, msk_v)
            # dense preview follows the keyframe cadence like the
            # per-frame path, but throttled to one extraction per
            # view_every frames: dense_surface() host-syncs the live
            # (possibly still-computing) carry — a hard barrier on the
            # in-flight chunk the double-buffered executor exists to
            # avoid — and re-extracts every submap slot
            if (viewer is not None and args.dense and r["added_kf"]
                    and r["frame"] - last_dense >= view_every):
                viewer.update_dense(cs.dense_surface()[0])
                rv = cs.render_view(stride=4)
                if rv is not None:
                    viewer.update_rendered(
                        np.asarray(rv.depth) / cfg.map.depth_scale)
                last_dense = r["frame"]
        for r in drained:
            frame_buf.pop(r["frame"], None)

    results, gts = [], []
    n = 0
    t0 = time.perf_counter()
    for rgb, depth, mask, gt in frames:
        if n >= args.frames:
            break
        if viewer is not None:
            frame_buf[n] = (rgb, depth, mask)
        got = cs.feed(rgb, depth, mask if args.mask else None)
        _view(got)
        results += got
        if gt is not None:
            gts.append(gt)
        n += 1
    got = cs.flush()
    _view(got)
    results += got
    wall = time.perf_counter() - t0

    if args.global_ba:
        from kbslam.slam import run_global_ba_on_map

        new_map, costs = run_global_ba_on_map(cs.state.map, intr, cfg.ba)
        cs.state = cs.state._replace(map=new_map)
        print(f"global BA cost: {costs[0]:.2f} -> {costs[-1]:.2f}",
              file=sys.stderr)
    est = [pose_T(r["pose_q"], r["pose_t"]) for r in results]
    est = np.stack(est) if est else np.zeros((0, 4, 4))
    rc = cs.map_consistency() if args.dense else None
    if args.save_checkpoint:
        from kbslam.io.checkpoint import save_checkpoint

        # include the per-frame trajectory, matching the per-frame path's
        # checkpoint contents (load_checkpoint's trajectory slot)
        save_checkpoint(args.save_checkpoint, cs.state, trajectory=list(est),
                        tsdf=cs.tsdf, atlas=cs.atlas,
                        kf_insertions=getattr(cs, "_kf_insertions", 0),
                        meta=({f"render_consistency_{k}": v
                               for k, v in rc.items()} if rc else None))
    summary = dict(
        frames=n,
        success=sum(r["success"] for r in results),
        keyframes=int(np.sum([r["added_kf"] for r in results])),
        ba_runs=len(cs.ba_stats),
        chunk=args.chunk,
        gray_ingress=bool(args.gray),
        streaming_fps=round(n / wall, 1) if wall > 0 else None,
    )
    if args.loop:
        summary["loop_closures"] = len(cs.loop_events)
    if args.reloc:
        summary["relocalizations"] = len(cs.reloc_events)
    if args.dense:
        pts, _ = cs.dense_surface()
        vol = cs.tsdf if cs.tsdf is not None else cs.atlas
        summary["tsdf_observed_voxels"] = int(
            (np.asarray(vol.weight) > 0).sum())
        summary["tsdf_surface_points"] = len(pts)
        if cs.atlas is not None:
            summary["tsdf_submaps"] = int(min(int(cs.atlas.count),
                                              cs.atlas.capacity))
        if rc is not None:
            summary["render_consistency"] = rc
        if args.save_surface:
            np.save(args.save_surface, pts)
        if args.save_mesh:
            _export_mesh(cs.dense_mesh(), args.save_mesh, summary, viewer)
    if args.eval and len(gts) == n and n > 1:
        from kbslam.eval.trajectory import ate_rmse, rpe

        gt_arr = np.stack(gts)
        summary["ate_rmse_m"] = ate_rmse(est[:, :3, 3], gt_arr[:, :3, 3])
        if cs.ba_stats or args.global_ba:
            from kbslam.slam import refine_frame_poses

            anchors = [(r["anchor_id"], _anchor_T(r)) for r in results]
            refn = refine_frame_poses(list(est), anchors, cs.state.map)
            summary["ate_rmse_refined_m"] = ate_rmse(refn[:, :3, 3],
                                                     gt_arr[:, :3, 3])
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


def _anchor_T(r):
    from kbslam.slam import pose_T

    return pose_T(r["anchor_q"], r["anchor_t"])


if __name__ == "__main__":
    main()
