"""SLAM system host shell — the reference's main loop (main.cpp:13-63)
as a thin Python driver around two jitted programs.

The reference wires Camera -> Map -> VisualOdometry -> Viewer -> BA and
owns the BA-thread gating (atomic flag + detached thread). Here the
device does all the work: ``track_step`` and ``local_ba`` are two
compiled programs; JAX's async dispatch already overlaps host-side
ingress/decoding with device compute. BA runs immediately after a
keyframe insertion (the reference's commented-out synchronous variant,
main.cpp:48-50, minus its race) or can be deferred/skipped via
``ba_mode``.
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kbslam.config import SLAMConfig
from kbslam.geom.camera import Intrinsics
from kbslam.ba.local_ba import make_local_ba
from kbslam.pipeline import init_state, make_track_step


def _quat_to_matrix_np(q: np.ndarray) -> np.ndarray:
    """Host-side (w, x, y, z) -> 3x3 rotation. Kept in numpy: the jnp
    form costs a full device dispatch per frame, and dispatches floor at
    ~25 ms wall on tunneled TPU runtimes (CLAUDE.md #11)."""
    w, x, y, z = (float(v) for v in q)
    n = (w * w + x * x + y * y + z * z) or 1.0
    s2 = 2.0 / n
    return np.array([
        [1 - s2 * (y * y + z * z), s2 * (x * y - w * z), s2 * (x * z + w * y)],
        [s2 * (x * y + w * z), 1 - s2 * (x * x + z * z), s2 * (y * z - w * x)],
        [s2 * (x * z - w * y), s2 * (y * z + w * x), 1 - s2 * (x * x + y * y)],
    ])


def pose_T(q, t) -> np.ndarray:
    """Host-side 4x4 SE(3) from a (w,x,y,z) quaternion + translation."""
    T = np.eye(4)
    T[:3, :3] = _quat_to_matrix_np(q)
    T[:3, 3] = np.asarray(t, dtype=np.float64)
    return T


def refine_frame_poses(frame_poses, frame_anchors, map_state) -> np.ndarray:
    """Post-hoc keyframe-anchored trajectory correction (see
    SLAM.refined_trajectory). frame_anchors: [(anchor_kf_id, T_anchor
    at track time)]. Shared by the per-frame and chunked paths."""
    ids = np.asarray(map_state.kf_id)
    live = {int(k): i for i, k in enumerate(ids) if k >= 0}
    kf_q = np.asarray(map_state.kf_q)
    kf_t = np.asarray(map_state.kf_t)
    out = []
    for T, (aid, Ta) in zip(frame_poses, frame_anchors):
        if aid >= 0 and aid in live:
            s = live[aid]
            T = pose_T(kf_q[s], kf_t[s]) @ np.linalg.inv(Ta) @ T
        out.append(T)
    return np.stack(out) if out else np.zeros((0, 4, 4))


def map_keyframe_positions(m) -> np.ndarray:
    """Map::GetKeyFramesPositions (Map.cpp:80-89) on a MapState; the
    display remap (x,-z,-y) is applied by the viewer."""
    valid = np.asarray(m.kf_id) >= 0
    return np.asarray(m.kf_t)[valid]


def map_point_positions(m) -> np.ndarray:
    """Map::GetMapPointsPositions (Map.cpp:91-101) on a MapState."""
    mp = np.asarray(m.kf_mp)
    P = m.capacity_mp
    live = (mp >= 0) & (mp >= int(m.num_mp) - P)
    slots = np.unique(mp[live]) % P
    return np.asarray(m.mp_pos)[slots] if len(slots) else np.zeros((0, 3))


def run_global_ba_on_map(map_state, intr: Intrinsics, ba_cfg,
                         steps: int = 5, pcg_iters: int = 30,
                         mesh=None):
    """Full-map bundle adjustment over all live keyframes of a MapState
    (the reference has no global BA; this is the config-5 scale path —
    camera-sharded over a device mesh when one is given). Returns
    (new_map_state, per-round costs). Shared by the per-frame SLAM shell
    and the chunked-streaming CLI path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from kbslam.ba.global_ba import (
        GlobalBAData, from_map_state, global_ba_solve, write_back)

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("stream",))
    n_dev = mesh.devices.size
    n_kf = min(int(map_state.num_kf), map_state.capacity_kf)
    # never exceed the ring capacity: after a wrap, a window wider
    # than the ring would alias one slot into two real problem rows
    # (double-counted observations). Round capacity DOWN to a mesh
    # multiple and pad short windows with real=False rows instead.
    cap_down = (map_state.capacity_kf // n_dev) * n_dev
    assert cap_down >= n_dev, "map.max_keyframes < mesh size"
    n_cams = max(((min(n_kf, cap_down) + n_dev - 1) // n_dev) * n_dev,
                 n_dev)

    data, slots, real = from_map_state(map_state, intr, ba_cfg, n_cams)
    shard = NamedSharding(mesh, P("stream"))
    rep = NamedSharding(mesh, P())
    data = GlobalBAData(
        *[jax.device_put(x, shard) for x in data[:9]],
        jax.device_put(data.mp_pos, rep),
        jax.device_put(data.anchor_mp, rep),
    )
    # LM trust-region solve: accept/reject per round, monotone
    # non-increasing costs (Ceres' schedule, Optimizers.cpp:203)
    data, costs = global_ba_solve(data, intr, mesh, iters=steps,
                                  pcg_iters=pcg_iters,
                                  depth_rows=ba_cfg.depth_residuals,
                                  huber_delta=ba_cfg.huber_delta)
    new_map = write_back(map_state, data, slots, real)
    return new_map, [float(c) for c in np.asarray(costs)]


class SLAM:
    """Stateful host wrapper: feed RGB-D frames, read back trajectory/map."""

    def __init__(
        self,
        config: SLAMConfig,
        K: np.ndarray,
        ba_mode: str = "on_keyframe",  # "on_keyframe" | "async" | "disabled"
        use_mask: bool = True,
        seed: int = 0,
        dist=None,  # 5-vector (k1,k2,p1,p2,k3), reference Camera.cpp:108-124
    ):
        assert ba_mode in ("on_keyframe", "async", "disabled")
        self.config = config
        self.intr = Intrinsics.from_matrix(K, dist=dist)
        self.ba_mode = ba_mode
        self.use_mask = use_mask
        self._step = make_track_step(config, self.intr, use_mask=use_mask,
                                     auto_key=True, seed=seed)
        self._ba = make_local_ba(config.ba, self.intr)
        if ba_mode == "async":
            from kbslam.ba.local_ba import make_async_ba
            from kbslam.ba.merge import make_merge

            # lru_cached factories (see make_local_ba): per-instance jit
            # wrappers retrace on the first solve of every instance.
            # make_async_ba fuses snapshot+solve into one dispatch; the
            # snapshot is a real copy because tracking donates its state
            # buffers every frame.
            self._ba_solve = make_async_ba(config.ba, self.intr)
            self._merge = make_merge(config.ba)
        self._ba_inflight = None  # (snapshot_map, result_map, stats)
        if config.cull.enabled:
            from kbslam.mapping.cull import make_cull

            self._cull = make_cull(config.cull)
        else:
            self._cull = None
        if config.loop.enabled:
            from kbslam.loop.runner import LoopCloser

            self._loop = LoopCloser(config, self.intr)
        else:
            self._loop = None
        self.tsdf = None
        self._integrate = None
        self.atlas = None
        self._submap_start = self._submap_fuse = None
        self._kf_insertions = 0
        if config.dense.enabled:
            if config.dense.submap_every > 0:
                from kbslam.mapping.submap import (empty_atlas,
                                                   make_submap_ops)

                self.atlas = empty_atlas(config.dense,
                                         config.dense.max_submaps)
                self._submap_start, self._submap_fuse = make_submap_ops(
                    config.dense, self.intr, config.dense.max_submaps,
                    config.map.depth_scale)
            else:
                from kbslam.mapping.dense import empty_tsdf, make_integrate

                self.tsdf = empty_tsdf(config.dense)
                self._integrate = make_integrate(config.dense, self.intr,
                                                 config.map.depth_scale)
        if config.dense_icp.mode != "off":
            if not config.dense.enabled:
                raise ValueError("dense_icp requires dense.enabled "
                                 "(the TSDF volume is the model)")
            if config.dense_icp.mode not in ("rescue", "refine"):
                raise ValueError(f"unknown dense_icp.mode "
                                 f"{config.dense_icp.mode!r}")
            if config.dense.submap_every > 0:
                # submap-atlas model: align against the newest
                # dense_icp.atlas_slots submaps re-posed by their
                # anchors' CURRENT ring poses — recovery follows
                # BA/loop corrections (mapping/icp.align_depth_to_atlas)
                from kbslam.mapping.icp import make_icp_atlas

                self._icp_atlas = make_icp_atlas(
                    config.dense, config.dense_icp, self.intr,
                    config.map.depth_scale)
                self._icp = None
            else:
                from kbslam.mapping.icp import make_icp

                self._icp = make_icp(config.dense, config.dense_icp,
                                     self.intr, config.map.depth_scale)
                self._icp_atlas = None
        else:
            self._icp = self._icp_atlas = None
        self._last_icp_qt = None  # chained rescue poses (host side)
        self._last_kf_view = None  # (pose_q, pose_t, host depth) @ last KF
        self.icp_events: List[dict] = []
        if config.loop.reloc_after > 0:
            from kbslam.loop.reloc import make_reloc_step

            self._reloc = make_reloc_step(
                config, self.intr, use_mask=use_mask,
                word_bits=config.loop.word_bits,
                score_min=config.loop.reloc_score_min,
                min_inliers=config.loop.reloc_min_inliers, seed=seed)
        else:
            self._reloc = None
        self._fail_streak = 0
        # public alias of the runner's event list (same list object)
        self.loop_events: List[dict] = (
            self._loop.events if self._loop is not None else [])
        self.reloc_events: List[dict] = []
        self.state = init_state(config)
        self._ones_mask = None  # cached device buffer for mask-less callers
        self._frame = 0
        self.trajectory: List[np.ndarray] = []   # [4,4] poses, successes only
        self.frame_poses: List[np.ndarray] = []  # per input frame (held on failure)
        self.frame_anchors: List[tuple] = []     # (anchor_kf_id, T_anchor@track)
        self.diagnostics: List[dict] = []
        self.ba_stats: List[dict] = []

    def _record_ba_stats(self, stats, wall_ms=None):
        s = jax.device_get(stats)
        self.ba_stats.append(dict(
            initial_cost=float(s.initial_cost),
            final_cost=float(s.final_cost),
            iterations=int(s.iterations),
            accepted=int(s.accepted),
            num_pruned=int(s.num_pruned),
            wall_ms=wall_ms,
        ))

    def process(self, rgb, depth, mask=None) -> dict:
        """Track one frame; runs local BA when a keyframe was inserted."""
        args = [self.state, jnp.asarray(rgb), jnp.asarray(depth)]
        if self.use_mask:
            if mask is not None:
                args.append(jnp.asarray(mask))
            else:
                # constant tensor: upload once, not 307 KB/frame over a
                # 20-60 MB/s link
                if (self._ones_mask is None
                        or self._ones_mask.shape != rgb.shape[:2]):
                    self._ones_mask = jnp.ones(rgb.shape[:2], jnp.uint8)
                args.append(self._ones_mask)
        t0 = time.perf_counter()
        self.state, out = self._step(*args)
        o = jax.device_get(out)

        # keyframe culling: implemented-but-disabled in the reference
        # (Map.cpp:63); flag-gated here with the same keep rules
        if self._cull is not None and bool(o.added_kf):
            self.state = self.state._replace(map=self._cull(self.state.map))

        ran_ba = False
        if self.ba_mode == "on_keyframe" and bool(o.added_kf):
            tb = time.perf_counter()
            new_map, stats = self._ba(self.state.map)
            self.state = self.state._replace(map=new_map)
            self._record_ba_stats(stats,
                                  wall_ms=(time.perf_counter() - tb) * 1e3)
            ran_ba = True
        elif self.ba_mode == "async":
            # merge-if-ready FIRST so loop probes below see a quiet pipe;
            # the new solve dispatches LAST so it runs on the corrected
            # map (probing between dispatch and merge is forbidden — the
            # merge would write pre-correction poses over the ring)
            ran_ba = self._async_ba_merge()

        if self._reloc is not None:
            o = self._reloc_tick(o, args[1:])

        # frame-to-model dense tracking (mapping/icp.py; capability
        # extension — geometry-only pose source, no texture needed).
        # AFTER the reloc tick (a reloc'd frame is a keyframe and skips
        # refine below) and BEFORE dense fusion so a rescued pose is the
        # one the volume would see.
        if self._icp is not None or self._icp_atlas is not None:
            o = self._icp_tick(o, args[2])

        # dense TSDF fusion at the keyframe cadence (mapping/dense.py;
        # capability extension — the reference has no dense world model).
        # AFTER the reloc tick: a relocalization-inserted keyframe sets
        # added_kf with the recovered pose, and its depth belongs in the
        # volume like any other insertion.
        if self._integrate is not None and bool(o.added_kf):
            self.tsdf = self._integrate(self.tsdf, args[2],
                                        jnp.asarray(o.pose_q),
                                        jnp.asarray(o.pose_t))
        elif self.atlas is not None and bool(o.added_kf):
            # submap atlas (mapping/submap.py): every submap_every-th
            # insertion opens a fresh submap ANCHORED at the new
            # keyframe (global id = num_kf-1 — insertion already
            # bumped the counter); fusion goes into the active submap
            # in its anchor-camera frame, so BA/loop corrections to the
            # anchor keyframe re-pose the chunk at extraction time.
            q, t = jnp.asarray(o.pose_q), jnp.asarray(o.pose_t)
            if self._kf_insertions % self.config.dense.submap_every == 0:
                self.atlas = self._submap_start(
                    self.atlas, q, t, int(self.state.map.num_kf) - 1)
            # fuse against the anchor's CURRENT ring pose — the frame
            # pose lives in the current (corrected) gauge, and mixing
            # gauges double-applies corrections at extraction
            # (integrate_active docstring). Ordering within this tick
            # keeps the pair in one gauge: the loop tick (the only
            # RIGID gauge change) runs AFTER fusion, and the async-BA
            # merge above is not a gauge change — the window's newest
            # snapshot keyframe is held constant (ba/merge.py), o.pose
            # chains through it, so the post-merge anchor pose is
            # simply the best same-gauge estimate at fusion time.
            aq, at = self._anchor_pose_now()
            self.atlas = self._submap_fuse(self.atlas, args[2], q, t,
                                           aq, at)
            self._kf_insertions += 1

        # last-keyframe view (pose + host depth ref): the render/
        # consistency surfaces (render_view, map_consistency) anchor
        # at the newest keyframe, where the model is freshest
        if self.config.dense.enabled and bool(o.added_kf):
            self._last_kf_view = (np.asarray(o.pose_q),
                                  np.asarray(o.pose_t), depth)

        if self._loop is not None:
            if bool(o.added_kf):
                self._loop.note_insertions()
            self.state = self._loop.tick(self.state, self._frame,
                                         self._ba_inflight)

        if (self.ba_mode == "async" and bool(o.added_kf)
                and self._ba_inflight is None):
            # ONE async dispatch: snapshot-copy + solve fused
            self._ba_inflight = self._ba_solve(self.state.map)

        T = pose_T(np.asarray(o.pose_q), o.pose_t)
        if bool(o.success) or self._frame == 0:
            self.trajectory.append(T)
        self.frame_poses.append(T)
        Ta = pose_T(np.asarray(o.anchor_q), o.anchor_t)
        self.frame_anchors.append((int(o.anchor_id), Ta))

        diag = dict(
            frame=self._frame,
            success=bool(o.success),
            added_kf=bool(o.added_kf),
            ran_ba=ran_ba,
            inlier_ratio=float(o.inlier_ratio),
            num_matches=int(o.num_matches),
            num_inliers=int(o.num_inliers),
            num_features=int(o.num_features),
            wall_ms=(time.perf_counter() - t0) * 1e3,
        )
        self.diagnostics.append(diag)
        self._frame += 1
        return diag

    def _icp_tick(self, o, depth_dev):
        """Frame-to-model dense tracking tick (config.dense_icp):

        - PnP failed -> "rescue"/"refine": align the depth frame to the
          TSDF from the last emitted pose (chained across consecutive
          rescues — the device-held pose doesn't know about them) and,
          when the acceptance gates pass, emit the recovered pose as a
          success. The device map state is untouched: the next PnP still
          anchors to the last keyframe exactly like the reference's
          skip-until-PnP-succeeds contract, but the trajectory (and any
          consumer of per-frame poses) keeps flowing through texture
          starvation.
        - PnP succeeded and mode == "refine": polish the pose against
          the volume, accepted only when the robust SDF RMSE strictly
          improves. Skipped on keyframe frames — the inserted keyframe
          pose belongs to the sparse pipeline/BA, and diverging from it
          would make the emitted pose inconsistent with the map.

        Model selection: the monolithic volume when dense.submap_every
        == 0; otherwise the newest dense_icp.atlas_slots submaps,
        re-posed by their anchors' CURRENT ring poses. With the atlas,
        "refine" EXCLUDES the active submap — the polish must be
        supported by independent evidence (geometry fused under poses
        not correlated with the most recent drift), which kills the
        frame-to-model drift-reinforcement failure the monolithic
        refine gate measured (exp_icp_ate.py: ~100% acceptance, one
        3.4x ATE regression).
        """
        cfg = self.config.dense_icp
        ok = bool(o.success)
        if ok:
            self._last_icp_qt = None
            if cfg.mode != "refine" or bool(o.added_kf):
                return o
            q0, t0 = jnp.asarray(o.pose_q), jnp.asarray(o.pose_t)
        elif self._last_icp_qt is not None:
            q0, t0 = self._last_icp_qt
        else:
            # hold-pose-on-failure: o already carries the last device-
            # known pose
            q0, t0 = jnp.asarray(o.pose_q), jnp.asarray(o.pose_t)
        if self._icp is not None:
            r = jax.device_get(self._icp(self.tsdf, depth_dev, q0, t0))
        else:
            from kbslam.mapping.submap import recent_slots_with_poses

            win = recent_slots_with_poses(
                self.atlas, self.state.map, cfg.atlas_slots,
                exclude_active=ok)
            if win is None:
                return o  # no (independent) submap evidence yet
            slots, aq, at = win
            r = jax.device_get(self._icp_atlas(
                self.atlas, jnp.asarray(slots), jnp.asarray(aq),
                jnp.asarray(at), depth_dev, q0, t0))
        accepted = (int(r.num_valid) >= cfg.min_points
                    and float(r.rmse) <= cfg.accept_rmse_m
                    and float(r.rmse) <= float(r.rmse_init))
        if ok:
            # refine: additionally require strict improvement
            accepted = accepted and float(r.rmse) < float(r.rmse_init)
        self.icp_events.append(dict(
            frame=self._frame, mode=("refine" if ok else "rescue"),
            accepted=accepted, num_valid=int(r.num_valid),
            rmse_init=float(r.rmse_init), rmse=float(r.rmse)))
        if not accepted:
            return o
        if not ok:
            self._last_icp_qt = (jnp.asarray(r.q), jnp.asarray(r.t))
            # deliberately NOT resetting _fail_streak: the SPARSE
            # pipeline is still lost (PnP keeps anchoring to a stale
            # keyframe) — relocalization re-anchors the map and must
            # still fire on schedule; rescue only keeps the emitted
            # trajectory flowing in the meantime.
        return o._replace(success=jnp.bool_(True), pose_q=r.q, pose_t=r.t)

    def _reloc_tick(self, o, frame_args):
        """After reloc_after consecutive failures, attempt to re-anchor
        tracking via place recognition (loop/reloc.py). On success the
        frame becomes a fresh keyframe and its recovered pose replaces
        the held one in this frame's output/diagnostics."""
        if bool(o.success) or self.num_keyframes == 0:
            self._fail_streak = 0
            return o
        self._fail_streak += 1
        if self._fail_streak < self.config.loop.reloc_after:
            return o
        if self._ba_inflight is not None:
            return o  # a pending merge would clobber the fresh anchor
        new_state, r = self._reloc(self.state, *frame_args)
        self.state = new_state
        if not bool(r.success):
            return o
        self._fail_streak = 0
        self.reloc_events.append(dict(
            frame=self._frame, matched_id=int(self.state.map.kf_id[r.slot])
            if int(r.slot) < self.state.map.capacity_kf else -1,
            score=float(r.score), inliers=int(r.num_inliers)))
        return o._replace(success=r.success, added_kf=jnp.bool_(True),
                          pose_q=r.pose_q, pose_t=r.pose_t,
                          num_inliers=r.num_inliers,
                          anchor_id=self.state.map.num_kf - 1,
                          anchor_q=r.pose_q, anchor_t=r.pose_t)

    def _async_ba_merge(self) -> bool:
        """The merge half of the reference's BA-thread gating
        (main.cpp:22-47), functional: at most one solve in flight;
        tracking never blocks on it; results merge into the live map
        once ready. The dispatch half lives in process() AFTER the loop
        tick so a new solve always sees post-correction poses."""
        if self._ba_inflight is None:
            return False
        snapshot, result, stats = self._ba_inflight
        if not all(leaf.is_ready() for leaf in jax.tree.leaves(stats)):
            return False
        self.state = self.state._replace(
            map=self._merge(self.state.map, snapshot, result))
        self._record_ba_stats(stats)
        self._ba_inflight = None
        return True

    def run_global_ba(self, steps: int = 5, pcg_iters: int = 30,
                      mesh=None) -> list:
        """Full-map bundle adjustment over all live keyframes (the
        reference has no global BA; this is the config-5 scale path —
        camera-sharded over a device mesh when one is given)."""
        new_map, costs = run_global_ba_on_map(
            self.state.map, self.intr, self.config.ba,
            steps=steps, pcg_iters=pcg_iters, mesh=mesh)
        self.state = self.state._replace(map=new_map)
        return costs

    def refined_trajectory(self) -> np.ndarray:
        """Frame poses re-expressed against BA-refined keyframes.

        Each tracked pose chained off the then-current newest keyframe
        (the BA gauge, so online estimates never feel the refinement —
        reference main.cpp semantics: the poses vector is never
        revisited). This applies the standard post-hoc correction
        T_i' = T_a(final) T_a(track)^-1 T_i, where a is frame i's
        anchor keyframe: the full trajectory inherits the window
        solves' accuracy (keyframe ATE is ~10x better than online ATE
        on hard scenes, measured). Frames whose anchor left the ring
        keep their online pose. The reference cannot produce this
        output — its BA discards exactly this information.
        """
        return refine_frame_poses(self.frame_poses, self.frame_anchors,
                                  self.state.map)

    def finish(self):
        """Drain any in-flight async BA, then any loop probes it was
        deferring (end-of-sequence)."""
        if self._ba_inflight is not None:
            snapshot, result, stats = self._ba_inflight
            jax.block_until_ready(stats)
            self.state = self.state._replace(
                map=self._merge(self.state.map, snapshot, result))
            self._record_ba_stats(stats)
            self._ba_inflight = None
        if self._loop is not None:
            self.state = self._loop.tick(self.state, self._frame, None)

    # --- map accessors (Map::GetKeyFramesPositions / GetMapPointsPositions,
    # Map.cpp:80-101 — display remap (x,-z,-y) applied by the viewer) ------
    def keyframe_positions(self) -> np.ndarray:
        return map_keyframe_positions(self.state.map)

    def _anchor_poses_now(self) -> dict:
        """kf_id -> CURRENT ring pose per live submap anchor
        (mapping/submap.anchor_poses_now, shared with the chunked
        executor)."""
        from kbslam.mapping.submap import anchor_poses_now

        return anchor_poses_now(self.atlas, self.state.map)

    def _anchor_pose_now(self):
        """(q, t) of the ACTIVE submap's anchor keyframe at its current
        ring pose (the gauge frame poses live in); falls back to the
        stored last-used anchor pose if the ring slot was reallocated.
        Derived from the atlas itself so it survives checkpoint
        resume."""
        s = int(self.atlas.active_slot())
        kid = int(self.atlas.anchor_kf_id[s])
        m = self.state.map
        cap = m.kf_id.shape[0]
        if kid >= 0 and int(m.kf_id[kid % cap]) == kid:
            return m.kf_q[kid % cap], m.kf_t[kid % cap]
        return self.atlas.anchor_q[s], self.atlas.anchor_t[s]

    def dense_surface(self) -> tuple:
        """Zero-crossing point cloud of the dense model (requires
        ``config.dense.enabled``): (points [M,3] world, |tsdf| residual
        [M]). Monolithic volume: mapping/dense.py surface_points.
        Submap atlas (dense.submap_every > 0): the union of per-submap
        surfaces, each re-posed by its anchor keyframe's CURRENT pose —
        this is the path on which loop-closure/BA corrections reach the
        dense model (mapping/submap.py)."""
        if self.atlas is not None:
            from kbslam.mapping.submap import extract_atlas_surface

            return extract_atlas_surface(self.atlas, self.config.dense,
                                         self._anchor_poses_now())
        if self.tsdf is None:
            raise RuntimeError("dense mapping disabled "
                               "(SLAMConfig.dense.enabled)")
        from kbslam.mapping.dense import surface_points

        return surface_points(self.tsdf, self.config.dense)

    def dense_mesh(self):
        """TSDF zero-isosurface as a TriangleMesh (requires
        ``config.dense.enabled``; offline/host-side like dense_surface).
        Monolithic volume: one welded mesh (mapping/mesh.py). Submap
        atlas: per-submap meshes re-posed by their anchors' CURRENT
        poses and concatenated — welded within each submap, not across
        seams (overlapping chunks are distinct rigid bodies by
        design)."""
        from kbslam.mapping.mesh import marching_tetrahedra

        if self.atlas is not None:
            from kbslam.mapping.submap import atlas_mesh

            return atlas_mesh(self.atlas, self.config.dense,
                              self._anchor_poses_now())
        if self.tsdf is None:
            raise RuntimeError("dense mapping disabled "
                               "(SLAMConfig.dense.enabled)")
        return marching_tetrahedra(self.tsdf, self.config.dense)

    def _scaled_intr(self, stride: int):
        """Downsampled pinhole for stride-decimated rendering: pixel i
        of the small image is full-res pixel i*stride, so
        (i*s − cx)/fx == (i − cx/s)/(fx/s) — exact, and the Brown-
        Conrady coefficients live in normalized coords (unchanged)."""
        if stride == 1:
            return (self.intr, self.config.image_height,
                    self.config.image_width)
        i = self.intr
        return (Intrinsics(i.fx / stride, i.fy / stride, i.cx / stride,
                           i.cy / stride, i.dist),
                self.config.image_height // stride,
                self.config.image_width // stride)

    def render_view(self, q=None, t=None, stride: int = 1):
        """Raycast the dense model from camera-to-world (q, t)
        (default: the last inserted keyframe's pose) — the model-
        predicted depth/normal view (mapping/raycast.py), logged by the
        CLI under /camera/0/rendered at the keyframe cadence. Returns a
        RaycastResult with world-frame normals, or None when no dense
        model / no keyframe exists yet. ``stride`` renders every
        stride-th pixel: the full 640x480 render is gather-bound at
        ~384 ms on TPU v5e (20M ray samples), stride 4 cuts it 16x —
        the CLI viewer entity uses stride 4."""
        from kbslam.geom.se3 import quat_rotate
        from kbslam.mapping.raycast import make_raycast, resolve_render_model

        if q is None:
            if self._last_kf_view is None:
                return None
            q, t, _ = self._last_kf_view
        vol, pose, anchor = resolve_render_model(
            self.tsdf, self.atlas, self.state.map, q, t)
        if vol is None:
            return None
        intr_s, H, W = self._scaled_intr(stride)
        f = make_raycast(self.config.dense, intr_s, H, W)
        r = f(vol, pose.q, pose.t)
        if anchor is not None:
            # normals come back in the submap's local frame
            n = quat_rotate(anchor.q, r.normal.reshape(-1, 3))
            r = r._replace(normal=n.reshape(r.normal.shape))
        return r

    def map_consistency(self, stride: int = 2) -> Optional[dict]:
        """Rendered-vs-observed depth agreement at the last inserted
        keyframe (mapping/raycast.render_consistency) — the map-quality
        metric surfaced in the CLI --eval summary and checkpoint
        metadata: drift shows up as growing disagreement between what
        the fused model predicts and what the sensor saw. None until a
        dense-fused keyframe exists. Default stride 2 (4x cheaper
        render; the median/p90/coverage statistics are insensitive to
        pixel decimation)."""
        from kbslam.mapping.raycast import (render_consistency,
                                            resolve_render_model)

        if self._last_kf_view is None:
            return None
        q, t, depth = self._last_kf_view
        vol, pose, _ = resolve_render_model(
            self.tsdf, self.atlas, self.state.map, q, t)
        if vol is None:
            return None
        intr_s, H, W = self._scaled_intr(stride)
        depth_m = (np.asarray(depth, np.float32)[::stride, ::stride]
                   * self.config.map.depth_scale)[:H, :W]
        return render_consistency(vol, pose, depth_m, intr_s,
                                  self.config.dense)

    def map_points(self) -> np.ndarray:
        return map_point_positions(self.state.map)

    @property
    def num_keyframes(self) -> int:
        return int(self.state.map.num_kf)
