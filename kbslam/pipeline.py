"""The per-frame tracking step — the reference's hot path as ONE pure
jitted function.

Mirrors VisualOdometry::Track (VisualOdometry.cpp:129-172) +
Map::AddKeyframe/CreateMapPoints (Map.cpp:7-65) + the keyframe policy,
with identical thresholds, but restructured TPU-first: extract, match,
PnP, policy, and insertion all trace into a single XLA program with
static shapes; keyframe insertion is a lax.cond over masked scatters
instead of a mutex-guarded mutation.

Reference behavioral quirks preserved on purpose:
  - ShouldAddKeyFrame runs whenever >=4 match pairs exist, even if PnP
    failed (inlier ratio 0 then forces insertion once the frame gap
    passes) — VisualOdometry.cpp:146-152.
  - On PnP failure the pose is not advanced (main.cpp:35-38).
  - Map points are created from the PREVIOUS keyframe's depth at its
    keypoint, placed with the previous keyframe's current pose
    (Map.cpp:28-55).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kbslam.config import SLAMConfig
from kbslam.frontend import orb
from kbslam.geom.camera import Intrinsics, depth_at, unproject
from kbslam.geom.se3 import SE3
from kbslam.mapping import policy as kf_policy
from kbslam.mapping.state import MapState, create_map_points, empty_map, insert_keyframe
from kbslam.matching.hamming import knn2_ratio_match
from kbslam.pnp.ransac import ransac_pnp


class TrackState(NamedTuple):
    map: MapState
    pose_q: jnp.ndarray        # current camera pose T_wc (poses.back())
    pose_t: jnp.ndarray
    frames_since_kf: jnp.ndarray  # int32
    frame_count: jnp.ndarray      # int32

    @property
    def pose(self) -> SE3:
        return SE3(self.pose_q, self.pose_t)


class TrackOutput(NamedTuple):
    pose_q: jnp.ndarray
    pose_t: jnp.ndarray
    success: jnp.ndarray       # bool — a new pose was estimated
    added_kf: jnp.ndarray      # bool
    inlier_ratio: jnp.ndarray  # float32
    num_matches: jnp.ndarray   # int32 ratio-test survivors
    num_inliers: jnp.ndarray   # int32
    num_features: jnp.ndarray  # int32 valid ORB keypoints
    # anchor keyframe = newest keyframe AFTER this frame's insertion,
    # with its pose as tracking saw it. Frame poses chain off this
    # keyframe; when BA later refines it, the host can re-express the
    # frame pose against the refined anchor (SLAM.refined_trajectory).
    anchor_id: jnp.ndarray     # int32 (-1 = no keyframe yet)
    anchor_q: jnp.ndarray      # [4]
    anchor_t: jnp.ndarray      # [3]


class PendingInsert(NamedTuple):
    """Deferred keyframe-insertion payload (multistream scan path).

    Under vmap, even the branchless masked-scatter insertion executes
    its full scatter/fusion compute every frame (~0.37 ms/stream
    measured, benchmarks/exp_multistream2.py). The deferred mode
    captures everything insertion needs at flag time and applies it
    once per K scan steps in an UNBATCHED outer loop — structurally,
    not via lax.cond (a batched cond lowers to both-branch execution;
    a scalar cond still copy-selects the carry). Safe because the
    policy's min_frame_gap (10) exceeds K: at most one pending exists
    per window. Insertion lands up to K-1 frames late — the same
    contract as the chunked executor's chunk-late BA."""

    do: jnp.ndarray        # bool — a keyframe was flagged
    fresh: jnp.ndarray     # bool — map was empty at flag time (skip fusion)
    pose_q: jnp.ndarray    # [4]
    pose_t: jnp.ndarray    # [3]
    kp_xy: jnp.ndarray     # [F, 2]
    kp_depth: jnp.ndarray  # [F]
    kp_desc: jnp.ndarray   # [F, 256] uint8
    kp_valid: jnp.ndarray  # [F] bool
    fuse_idx: jnp.ndarray  # [F] int32 match.best_idx vs the last KF
    fuse_ok: jnp.ndarray   # [F] bool  match.is_match vs the last KF


def empty_pending(cfg: SLAMConfig) -> PendingInsert:
    F = cfg.orb.max_features
    return PendingInsert(
        do=jnp.bool_(False), fresh=jnp.bool_(False),
        pose_q=jnp.array([1.0, 0, 0, 0], jnp.float32),
        pose_t=jnp.zeros(3, jnp.float32),
        kp_xy=jnp.zeros((F, 2), jnp.float32),
        kp_depth=jnp.zeros((F,), jnp.float32),
        kp_desc=jnp.zeros((F, 256), jnp.uint8),
        kp_valid=jnp.zeros((F,), bool),
        fuse_idx=jnp.zeros((F,), jnp.int32),
        fuse_ok=jnp.zeros((F,), bool),
    )


def apply_pending(m: MapState, p: PendingInsert, intr: Intrinsics,
                  cfg: SLAMConfig) -> MapState:
    """Apply one stream's deferred insertion (no-op when p.do=False —
    same masked-scatter gating as the branchless path)."""
    from kbslam.frontend.orb import Features
    from kbslam.matching.hamming import MatchResult

    F = cfg.orb.max_features
    zf = jnp.zeros((F,), jnp.float32)
    feats = Features(xy=p.kp_xy, response=zf, angle=zf,
                     level=jnp.zeros((F,), jnp.int32),
                     valid=p.kp_valid, desc=p.kp_desc)
    m2 = insert_keyframe(m, feats, p.kp_depth, SE3(p.pose_q, p.pose_t),
                         do=p.do)
    zi = jnp.zeros((F,), jnp.int32)
    fuse = MatchResult(best_idx=p.fuse_idx, best_dist=zi, second_dist=zi,
                       is_match=p.fuse_ok)
    return create_map_points(m2, fuse, intr.fx, intr.fy, intr.cx, intr.cy,
                             do=p.do & jnp.logical_not(p.fresh))


def init_state(cfg: SLAMConfig) -> TrackState:
    return TrackState(
        map=empty_map(cfg.map, cfg.orb),
        pose_q=jnp.array([1.0, 0, 0, 0], jnp.float32),
        pose_t=jnp.zeros(3, jnp.float32),
        frames_since_kf=jnp.int32(0),
        frame_count=jnp.int32(0),
    )


def track_step(
    state: TrackState,
    rgb: jnp.ndarray,      # [H, W, 3] uint8
    depth: jnp.ndarray,    # [H, W] uint16
    mask: Optional[jnp.ndarray],  # [H, W] uint8/bool nonzero=keep, or None
    key: jnp.ndarray,      # PRNG key for RANSAC (fixed per frame = determinism)
    intr: Intrinsics,
    cfg: SLAMConfig,
    defer_insert: bool = False,
) -> tuple[TrackState, TrackOutput]:
    """defer_insert=True skips the in-step map insertion and returns a
    third element (PendingInsert) instead — the multistream scan applies
    it once per K steps (see PendingInsert)."""
    # TPU f32 matmuls default to bf16 passes; the geometry path (DLT
    # normal matrices, GN solves) needs real f32. Explicit-bf16 matmuls
    # (descriptors, Hamming) are unaffected by this setting.
    with jax.default_matmul_precision("highest"):
        return _track_step_impl(state, rgb, depth, mask, key, intr, cfg,
                                defer_insert)


def extract_frame(rgb, depth, mask, intr, cfg):
    """L3 frontend: ORB under mask (VisualOdometry.cpp:138) + keypoint
    depth with the occlusion-rim gate + one-shot undistortion. Shared by
    the tracking step and relocalization (loop/reloc.py)."""
    feats = orb.extract(rgb, mask, cfg.orb)
    # stage boundary: materialize the frontend outputs. Without this,
    # XLA fuses the gather-heavy descriptor producer into the Hamming
    # matmul's tiling and recomputes it per tile (measured 70+ ms/frame
    # instead of ~2 ms on TPU v5e).
    feats = jax.lax.optimization_barrier(feats)
    depth_kp = depth_at(depth, feats.xy, cfg.map.depth_scale)
    if cfg.map.depth_edge_max_spread > 0:
        # occlusion-rim gate (see MapConfig.depth_edge_max_spread): 3x3
        # max/min depth pooling over the full image (VPU reduce_window,
        # hole-aware: zeros excluded from the min), then two keypoint
        # lookups. Rim keypoints keep their 2D role; only depth is zeroed.
        dmax = jax.lax.reduce_window(depth, jnp.uint16(0), jax.lax.max,
                                     (3, 3), (1, 1), "SAME")
        no_hole = jnp.where(depth > 0, depth, jnp.uint16(65535))
        dmin = jax.lax.reduce_window(no_hole, jnp.uint16(65535), jax.lax.min,
                                     (3, 3), (1, 1), "SAME")
        spread = (depth_at(dmax, feats.xy, cfg.map.depth_scale)
                  - depth_at(dmin, feats.xy, cfg.map.depth_scale))
        thr = cfg.map.depth_edge_max_spread
        if cfg.map.depth_edge_rel_per_m2 > 0:
            # range-aware threshold (see MapConfig.depth_edge_rel_per_m2):
            # z^2 sensor noise makes the 3x3 spread grow with range even
            # on smooth surfaces; scale the gate so it keeps firing on
            # true rims without zeroing all long-range depth.
            thr = jnp.maximum(thr,
                              cfg.map.depth_edge_rel_per_m2 * depth_kp**2)
        depth_kp = jnp.where(spread <= thr, depth_kp, 0.0)
    if intr.has_distortion:
        # rectify keypoints ONCE (cv::undistortPoints inverse model);
        # depth/patches already sampled at raw coords above, and every
        # downstream consumer (PnP, unprojection, map store, BA) then
        # operates on pinhole coordinates — the same geometry OpenCV
        # computes internally when the reference passes DistCoeffs to
        # solvePnPRansac (VisualOdometry.cpp:72, Camera.cpp:108-124).
        from kbslam.geom.camera import undistort_points
        feats = feats._replace(xy=undistort_points(intr, feats.xy))
    return feats, depth_kp


def _track_step_impl(state, rgb, depth, mask, key, intr, cfg,
                     defer_insert=False):
    m = state.map
    empty = m.is_empty()

    feats, depth_kp = extract_frame(rgb, depth, mask, intr, cfg)

    # --- match vs the last keyframe(s) (VisualOdometry.cpp:144) -----------
    slot = m.last_slot()
    NK = max(1, int(cfg.track_keyframes))
    if NK == 1:
        q_desc = m.kf_desc[slot]
        q_valid = m.kf_kp_valid[slot] & jnp.logical_not(empty)
        # keyframe-camera-frame back-projection (VisualOdometry.cpp:52-54);
        # zero-depth pairs participate exactly like the reference and fall
        # to RANSAC as outliers.
        pts3d = unproject(intr, m.kf_kp_xy[slot], m.kf_kp_depth[slot])
    else:
        # concatenated bank of the last NK keyframes; 3D points in WORLD
        # coordinates so one PnP constrains against all of them.
        # Rows are pulled with statically-unrolled per-slot dynamic
        # slices, NOT a vector gather kf_desc[kslots]: XLA lowers the
        # dynamic multi-row gather of the [capacity, F, 32B] descriptor
        # ring as a full-ring async copy (~50 MB/frame measured in the
        # profile — 4x 16-row slice-starts per frame); per-slot
        # dynamic_slice moves only the NK referenced rows (~2.4 MB).
        ids = m.num_kf - 1 - jnp.arange(NK)
        kslots = jnp.maximum(ids, 0) % m.capacity_kf
        kreal = ids >= 0

        def bank(arr):
            rows = [jax.lax.dynamic_index_in_dim(arr, kslots[i], axis=0,
                                                 keepdims=True)
                    for i in range(NK)]
            return jnp.concatenate(rows, axis=0)          # [NK, ...]

        q_desc = bank(m.kf_desc).reshape(-1, m.kf_desc.shape[-1])
        q_valid = (
            bank(m.kf_kp_valid) & kreal[:, None]
        ).reshape(-1) & jnp.logical_not(empty)
        p_cam = unproject(
            intr, bank(m.kf_kp_xy), bank(m.kf_kp_depth))  # [NK, F, 3]
        kf_T = SE3(bank(m.kf_q)[:, None, :], bank(m.kf_t)[:, None, :])
        pts3d = kf_T.apply(p_cam).reshape(-1, 3)              # world frame

    match = knn2_ratio_match(
        q_desc, q_valid, feats.desc, feats.valid,
        cfg.matcher.ratio, cross_check=cfg.matcher.cross_check,
    )

    num_matches = jnp.sum(match.is_match.astype(jnp.int32))
    attempted = (num_matches >= cfg.pnp.min_points) & jnp.logical_not(empty)

    # --- correspondence compaction -----------------------------------------
    # keep the top-M ratio-test matches ordered by Hamming distance
    # (PROSAC order): every downstream PnP tensor shrinks from the padded
    # bank size to M, and matches land PACKED at the front so RANSAC
    # sampling skips its packing sort. Attribute rows move with one-hot
    # incidence matmuls, not gathers (45 ns/element serial on TPU).
    from kbslam.ops.incidence import incidence_gather

    M = min(cfg.pnp.max_correspondences, q_desc.shape[0])
    score = jnp.where(match.is_match,
                      match.best_dist.astype(jnp.float32), jnp.inf)
    _, cidx = jax.lax.top_k(jax.lax.optimization_barrier(-score), M)
    sel_valid = match.is_match[cidx]
    pts3d_m = incidence_gather(cidx, pts3d)                     # [M, 3]
    t_idx = match.best_idx[cidx]                                # [M]
    train_tab = jnp.concatenate([feats.xy, depth_kp[:, None]], axis=1)
    train_m = incidence_gather(t_idx, train_tab)                # [M, 3]
    pts2d = train_m[:, :2]
    # current-frame depth lift: powers the Kabsch half of the RANSAC
    # hypothesis budget (coplanar-robust); scoring stays 2D-reprojection
    depth_curr = jnp.where(sel_valid, train_m[:, 2], 0.0)
    pts3d_obs = unproject(intr, pts2d, depth_curr)

    # --- PnP-RANSAC (VisualOdometry.cpp:64-97) ----------------------------
    pnp = ransac_pnp(
        key, pts3d_m, pts2d, sel_valid, intr, cfg.pnp,
        points3d_obs=pts3d_obs, obs_valid=depth_curr > 0,
        valid_packed=True,
    )
    success = pnp.success & attempted

    # reference-faithful inlier ratio: inliers / ALL ratio-test matches
    # (VisualOdometry.cpp:91). The compacted PnP scores only the top-M
    # matches; on match-rich frames (> max_correspondences survivors)
    # the dropped tail must still count in both numerator and
    # denominator or the policy's 0.4 gate sees a biased ratio.
    from kbslam.geom.camera import project

    pc_all = pnp.T_cw.apply(pts3d)
    uv_all, z_all = project(intr, pc_all)
    uv_obs_all = incidence_gather(match.best_idx, feats.xy)
    err2_all = jnp.sum((uv_all - uv_obs_all) ** 2, axis=-1)
    thr2 = cfg.pnp.reproj_threshold * cfg.pnp.reproj_threshold
    inl_all = (err2_all < thr2) & (z_all > 0) & match.is_match
    num_inliers_all = jnp.sum(inl_all.astype(jnp.int32))
    ratio_all = num_inliers_all.astype(jnp.float32) / jnp.maximum(
        num_matches.astype(jnp.float32), 1.0)

    last_kf_pose = SE3(m.kf_q[slot], m.kf_t[slot])
    if NK == 1:
        # reference chaining: T = kf.pose * T_cw^-1 (VisualOdometry.cpp:85-89)
        new_pose = last_kf_pose.compose(pnp.T_cw.inverse()).normalize()
    else:
        # world-frame solve: the camera pose is directly T_cw^-1
        new_pose = pnp.T_cw.inverse().normalize()
    pose = SE3(
        jnp.where(success, new_pose.q, state.pose_q),
        jnp.where(success, new_pose.t, state.pose_t),
    )

    # --- keyframe policy (VisualOdometry.cpp:99-126) ----------------------
    # the reference's framesSinceLastKf static increments inside
    # ShouldAddKeyFrame, which runs only on frames with >=4 match pairs
    # (VisualOdometry.cpp:102-103,146-150) — frames with match dropouts
    # do NOT advance the counter
    frames_since = state.frames_since_kf + attempted.astype(jnp.int32)
    ratio_for_policy = jnp.where(success, ratio_all, 0.0)
    add_kf = (
        kf_policy.should_add_keyframe(
            pose, last_kf_pose, frames_since, ratio_for_policy, cfg.policy
        )
        & attempted
    )
    do_insert = empty | add_kf

    # --- insertion + landmark fusion (VisualOdometry.cpp:155-166) ---------
    # fusion uses matches against the previous-last keyframe only (the
    # first F rows of the concatenated bank when NK > 1)
    F = feats.capacity
    fuse_match = match._replace(
        best_idx=match.best_idx[:F],
        best_dist=match.best_dist[:F],
        second_dist=match.second_dist[:F],
        is_match=match.is_match[:F],
    )

    if defer_insert:
        # capture the insertion payload; the caller applies it once per
        # K scan steps (see PendingInsert) — the map is untouched here
        pending = PendingInsert(
            do=do_insert, fresh=empty,
            pose_q=pose.q, pose_t=pose.t,
            kp_xy=feats.xy, kp_depth=depth_kp,
            kp_desc=feats.desc, kp_valid=feats.valid,
            fuse_idx=fuse_match.best_idx, fuse_ok=fuse_match.is_match,
        )
        new_map = m
    elif cfg.branchless_insert:
        # masked-scatter gating instead of lax.cond: required under vmap
        # (multistream), where cond executes both branches AND pays a
        # full-map select copy every frame (see SLAMConfig).
        new_map = insert_keyframe(m, feats, depth_kp, pose, do=do_insert)
        new_map = create_map_points(new_map, fuse_match, intr.fx, intr.fy,
                                    intr.cx, intr.cy,
                                    do=do_insert & jnp.logical_not(empty))
    else:
        def _insert(mp: MapState) -> MapState:
            mp = insert_keyframe(mp, feats, depth_kp, pose)
            return jax.lax.cond(
                empty,
                lambda s: s,
                lambda s: create_map_points(s, fuse_match, intr.fx, intr.fy,
                                            intr.cx, intr.cy),
                mp,
            )

        new_map = jax.lax.cond(do_insert, _insert, lambda s: s, m)

    a_slot = new_map.last_slot()
    anchor_id = new_map.num_kf - 1  # -1 while the map is empty

    new_state = TrackState(
        map=new_map,
        pose_q=pose.q,
        pose_t=pose.t,
        frames_since_kf=jnp.where(add_kf, 0, frames_since),
        frame_count=state.frame_count + 1,
    )
    out = TrackOutput(
        pose_q=pose.q,
        pose_t=pose.t,
        success=success,
        added_kf=do_insert,
        inlier_ratio=ratio_for_policy,
        num_matches=num_matches,
        num_inliers=num_inliers_all,
        num_features=feats.count(),
        anchor_id=anchor_id,
        anchor_q=new_map.kf_q[a_slot],
        anchor_t=new_map.kf_t[a_slot],
    )
    if defer_insert:
        return new_state, out, pending
    return new_state, out


def make_track_step(cfg: SLAMConfig, intr: Intrinsics, use_mask: bool = True,
                    auto_key: bool = False, seed: int = 0):
    """jit-compiled track_step closure with static config.

    auto_key=True derives the per-frame RANSAC key inside the program
    (fold_in(PRNGKey(seed), frame_count)): same determinism, and the
    host loop passes no key at all — avoids per-frame key slicing,
    which costs a dispatch round-trip on tunneled TPU runtimes.
    """

    if auto_key:
        if use_mask:
            def step(state, rgb, depth, mask):
                key = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         state.frame_count)
                return track_step(state, rgb, depth, mask, key, intr, cfg)
        else:
            def step(state, rgb, depth):
                key = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         state.frame_count)
                return track_step(state, rgb, depth, None, key, intr, cfg)
    elif use_mask:
        def step(state, rgb, depth, mask, key):
            return track_step(state, rgb, depth, mask, key, intr, cfg)
    else:
        def step(state, rgb, depth, key):
            return track_step(state, rgb, depth, None, key, intr, cfg)

    return jax.jit(step, donate_argnums=(0,))
